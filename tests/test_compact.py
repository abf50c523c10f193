"""Small-file compaction tests: the streaming sink's batch_id=N
directories consolidate into size-targeted files with identical
contents AND an identical partition layout (so batch-replay overwrite
stays correct), the swap never exposes a half-written mix, and
re-compaction is a no-op."""

import os
import threading

from pyspark.sql import functions as F

from data_ingestion_task_spark.sources.compact import compact_parquet_dir, dir_stats


def _make_fragmented_sink(spark, base):
    # Simulate 8 micro-batches of the idempotent sink layout.
    for b in range(8):
        spark.range(b * 100, (b + 1) * 100).select(
            F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
        ).repartition(4).write.mode("overwrite").parquet(f"{base}/batch_id={b}")


def test_compact_preserves_contents_and_reduces_files(spark, tmp_path):
    base = str(tmp_path / "sink")
    _make_fragmented_sink(spark, base)
    before = spark.read.parquet(base)
    before_rows = sorted(r.doc_id for r in before.select("doc_id").collect())
    stats0 = dir_stats(spark, base)
    assert stats0["n_files"] >= 32  # 8 batches x 4 files

    res = compact_parquet_dir(spark, base, target_file_bytes=1 << 30)
    assert res["compacted"] is True
    assert res["files_after"] < res["files_before"]

    after = spark.read.parquet(base)
    after_rows = sorted(r.doc_id for r in after.select("doc_id").collect())
    assert after_rows == before_rows
    # partition provenance survives as a column
    assert "batch_id" in after.columns
    assert after.select("batch_id").distinct().count() == 8


def test_compact_preserves_batch_partition_layout(spark, tmp_path):
    """ADVICE r3 (medium): the compacted sink must keep batch_id=N
    directories, so a checkpoint replay's overwrite of batch_id=K/ and
    any later micro-batch land in a layout Spark partition discovery
    still accepts, with no duplicated rows."""
    base = str(tmp_path / "sink3")
    _make_fragmented_sink(spark, base)
    res = compact_parquet_dir(spark, base, target_file_bytes=1 << 30)
    assert res["compacted"] is True
    assert res["partition_cols"] == ["batch_id"]
    subdirs = sorted(
        d for d in os.listdir(base) if not d.startswith("_") and not d.startswith(".")
    )
    assert subdirs == [f"batch_id={b}" for b in range(8)], subdirs

    # Checkpoint replay of batch 3: overwrite its partition dir exactly
    # as the sink would; then a brand-new batch 8 appends a new dir.
    spark.range(300, 400).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    ).repartition(4).write.mode("overwrite").parquet(f"{base}/batch_id=3")
    spark.range(800, 900).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    ).write.mode("overwrite").parquet(f"{base}/batch_id=8")

    after = spark.read.parquet(base)
    assert after.count() == 900  # no replay duplicates, new batch present
    assert after.select("doc_id").distinct().count() == 900
    # and the mixed state is still compactable
    res2 = compact_parquet_dir(spark, base, target_file_bytes=1 << 30)
    assert res2["compacted"] is True
    assert spark.read.parquet(base).count() == 900


def test_mixed_flat_and_partitioned_layout_raises(spark, tmp_path):
    base = str(tmp_path / "sink4")
    spark.range(100).selectExpr("id AS doc_id", "id % 3 AS batch_id").write.parquet(base)
    spark.range(100, 200).selectExpr("id AS doc_id").write.mode("overwrite").parquet(
        f"{base}/batch_id=9"
    )
    try:
        compact_parquet_dir(spark, base, target_file_bytes=1 << 30)
        raise AssertionError("mixed layout must be rejected loudly")
    except ValueError as e:
        assert "mixed partition layouts" in str(e)


def test_crash_between_swap_renames_recovers(spark, tmp_path):
    """A crash after rename(path->old) but before rename(tmp->path)
    leaves no live dir; the next compaction call must restore the
    original data and complete normally (ADVICE r3)."""
    base = str(tmp_path / "sink5")
    _make_fragmented_sink(spark, base)
    # Simulate the crash window state.
    os.rename(base, base + ".__compact_old__")
    os.mkdir(base + ".__compact_tmp__")  # half-written garbage
    res = compact_parquet_dir(spark, base, target_file_bytes=1 << 30)
    assert res["compacted"] is True
    assert spark.read.parquet(base).count() == 800
    assert not os.path.exists(base + ".__compact_old__")
    assert not os.path.exists(base + ".__compact_tmp__")


def test_concurrent_reader_sees_old_or_new_never_partial(spark, tmp_path):
    """A reader racing the swap may transiently find the path missing
    (documented, retry-safe) but any SUCCESSFUL read must return the
    full 800-row contents — never a partially swapped directory."""
    base = str(tmp_path / "sink6")
    _make_fragmented_sink(spark, base)
    stop = threading.Event()
    bad: list = []
    reads = [0]

    def reader():
        while not stop.is_set():
            try:
                got = spark.read.parquet(base).count()
            except Exception:
                continue  # transiently-missing path: retry by contract
            reads[0] += 1
            if got != 800:
                bad.append(got)

    t = threading.Thread(target=reader)
    t.start()
    try:
        res = compact_parquet_dir(spark, base, target_file_bytes=1 << 30)
    finally:
        stop.set()
        t.join()
    assert res["compacted"] is True
    assert reads[0] > 0, "reader thread never completed a read"
    assert not bad, f"reader observed partial contents: {bad}"


def test_recompaction_is_noop(spark, tmp_path):
    base = str(tmp_path / "sink2")
    _make_fragmented_sink(spark, base)
    first = compact_parquet_dir(spark, base, target_file_bytes=1 << 30)
    assert first["compacted"] is True
    second = compact_parquet_dir(spark, base, target_file_bytes=1 << 30)
    assert second["compacted"] is False
    assert spark.read.parquet(base).count() == 800
