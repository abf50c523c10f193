"""Small-file compaction tests: the streaming sink's batch_id=N
directories consolidate into size-targeted files with identical
contents, atomically, and re-compaction is a no-op."""

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


def test_recompaction_is_noop(spark, tmp_path):
    base = str(tmp_path / "sink2")
    _make_fragmented_sink(spark, base)
    first = compact_parquet_dir(spark, base, target_file_bytes=1 << 30)
    assert first["compacted"] is True
    second = compact_parquet_dir(spark, base, target_file_bytes=1 << 30)
    assert second["compacted"] is False
    assert spark.read.parquet(base).count() == 800
