"""Store-backed streaming exact dedup (streaming/store_dedup.py):
unbounded-horizon rejection (a re-post in a much later batch — and in
a whole NEW query run — is rejected), store-grain exactly-once across
a mid-drain kill, and verdict parity with the batch delta operator."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from data_ingestion_task_spark.sources.tables import load_table
from data_ingestion_task_spark.streaming.store_dedup import (
    fingerprint_store,
    start_store_dedup_ingest,
    store_admitted,
)


def _mtime_order(inbox) -> None:
    parts = sorted(
        (p for p in os.listdir(inbox) if p.endswith(".parquet")),
        key=lambda p: os.path.getmtime(os.path.join(inbox, p)),
    )
    for i, p in enumerate(parts):
        os.utime(os.path.join(inbox, p), (1_700_000_000 + 60 * i,) * 2)


def test_store_gate_rejects_reposts_across_batches_and_runs(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    inbox = tmp_path / "sd_inbox"
    # batch files by doc_id thirds; re-posts of file-0 content arrive LAST
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).write.mode("append").parquet(str(inbox))
    reposts = docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == 0)).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    reposts.coalesce(1).write.mode("append").parquet(str(inbox))
    _mtime_order(inbox)

    schema = spark.read.parquet(str(inbox)).schema
    store = fingerprint_store(spark, str(tmp_path / "sd_store"), n_buckets=8)
    q = start_store_dedup_ingest(
        spark,
        str(inbox),
        str(tmp_path / "sd_ckpt"),
        schema,
        store,
        verdict_dir=str(tmp_path / "sd_verdicts"),
        max_files_per_trigger=1,
        query_name="sd_t1",
    )
    q.awaitTermination(180)

    admitted = store_admitted(store)
    n_distinct = docs.select("text").distinct().count()
    assert admitted.count() == n_distinct  # one canonical per content
    # every re-post lost to the standing registry: no +1_000_000 canonical
    assert admitted.filter(F.col("corpus_doc_id") >= 1_000_000).count() == 0
    verdicts = spark.read.parquet(str(tmp_path / "sd_verdicts"))
    rp = verdicts.filter(F.col("doc_id") >= 1_000_000)
    assert rp.count() == reposts.count()
    assert rp.filter(F.col("verdict") != "dup_of_corpus").count() == 0

    # a brand-NEW query run (fresh checkpoint, new inbox) re-posting the
    # same content is still rejected — the registry is durable state,
    # not a watermark window
    inbox2 = tmp_path / "sd_inbox2"
    docs.filter(F.col("doc_id") % 3 == 1).withColumn(
        "doc_id", F.col("doc_id") + 2_000_000
    ).write.parquet(str(inbox2))
    q2 = start_store_dedup_ingest(
        spark,
        str(inbox2),
        str(tmp_path / "sd_ckpt2"),
        schema,
        store,
        verdict_dir=str(tmp_path / "sd_verdicts2"),
        query_name="sd_t2",
    )
    q2.awaitTermination(180)
    assert store_admitted(store).count() == n_distinct  # nothing new
    v2 = spark.read.parquet(str(tmp_path / "sd_verdicts2"))
    assert v2.filter(F.col("verdict") != "dup_of_corpus").count() == 0


def test_store_gate_exactly_once_at_store_grain_across_kill(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    inbox = tmp_path / "sk_inbox"
    for i in range(6):
        docs.filter(F.col("doc_id") % 6 == i).write.mode("append").parquet(str(inbox))
    _mtime_order(inbox)
    schema = spark.read.parquet(str(inbox)).schema
    store = fingerprint_store(spark, str(tmp_path / "sk_store"), n_buckets=8)
    ckpt = str(tmp_path / "sk_ckpt")
    q1 = start_store_dedup_ingest(
        spark,
        str(inbox),
        ckpt,
        schema,
        store,
        verdict_dir=str(tmp_path / "sk_verdicts"),
        max_files_per_trigger=1,
        query_name="sk_kill",
    )
    t0 = time.monotonic()
    while time.monotonic() - t0 < 120:
        if any(p and p.get("numInputRows", 0) > 0 for p in (q1.recentProgress or [])):
            break
        time.sleep(0.1)
    q1.stop()
    q1.awaitTermination(60)
    q2 = start_store_dedup_ingest(
        spark,
        str(inbox),
        ckpt,
        schema,
        store,
        verdict_dir=str(tmp_path / "sk_verdicts"),
        max_files_per_trigger=1,
        query_name="sk_resume",
    )
    q2.awaitTermination(180)
    got = {
        (r["fingerprint"], r["corpus_doc_id"])
        for r in store_admitted(store).collect()
    }
    # first-INGESTED canonical: files arrive in doc_id%6 order, so the
    # winner is argmin over (file index, doc_id) — equals plain min
    # when contents are unique, and stays correct if the raw table
    # carries duplicate texts across files
    from data_ingestion_task_spark.functions.text import fingerprint_md5

    want = {
        (r["fingerprint"], r["w"]["doc_id"])
        for r in docs.select(
            fingerprint_md5(F.col("text")).alias("fingerprint"),
            F.struct((F.col("doc_id") % 6).alias("file_i"), "doc_id").alias("w"),
        )
        .groupBy("fingerprint")
        .agg(F.min("w").alias("w"))
        .collect()
    }
    assert got == want


def test_dual_gate_horizon_absorbs_store_rejects(spark, sf_dir, tmp_path):
    """VERDICT r10 missing #2 acceptance: the composed dual gate. A
    within-horizon re-post is absorbed by the watermark RAM gate and
    never touches the store — it appears in NO verdict-log row (the
    log records every doc the store gate judged, so absence IS the
    no-merge evidence). A re-post in a brand-new run (fresh checkpoint
    — RAM state gone) still reaches the store gate and is rejected by
    the durable registry."""
    from data_ingestion_task_spark.streaming.store_dedup import (
        start_dual_dedup_ingest,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    inbox = tmp_path / "dg_inbox"
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(str(inbox))
    # within-horizon re-posts arrive in a LATER micro-batch of the
    # same run (maxFilesPerTrigger=1 forces file-per-batch)
    reposts = docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 3 == 0)).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    reposts.coalesce(1).write.mode("append").parquet(str(inbox))
    _mtime_order(inbox)

    schema = spark.read.parquet(str(inbox)).schema
    store = fingerprint_store(spark, str(tmp_path / "dg_store"), n_buckets=8)
    q = start_dual_dedup_ingest(
        spark,
        str(inbox),
        str(tmp_path / "dg_ckpt"),
        schema,
        store,
        verdict_dir=str(tmp_path / "dg_verdicts"),
        max_files_per_trigger=1,
        query_name="dg_t1",
    )
    q.awaitTermination(240)

    verdicts = spark.read.parquet(str(tmp_path / "dg_verdicts"))
    # the RAM gate ate every within-horizon re-post BEFORE the store
    # gate: no verdict row, no canonical, nothing judged
    assert verdicts.filter(F.col("doc_id") >= 1_000_000).count() == 0
    assert (
        store_admitted(store).filter(F.col("corpus_doc_id") >= 1_000_000).count()
        == 0
    )
    n_store = store_admitted(store).count()
    assert n_store == docs.filter(F.col("doc_id") % 2 == 0).select("text").distinct().count()

    # cross-RUN re-post: fresh checkpoint -> the RAM state is gone, so
    # the re-post reaches the store gate — and the durable registry
    # rejects it
    inbox2 = tmp_path / "dg_inbox2"
    reposts.withColumn("doc_id", F.col("doc_id") + 1_000_000).coalesce(1).write.parquet(
        str(inbox2)
    )
    q2 = start_dual_dedup_ingest(
        spark,
        str(inbox2),
        str(tmp_path / "dg_ckpt2"),
        schema,
        store,
        verdict_dir=str(tmp_path / "dg_verdicts2"),
        query_name="dg_t2",
    )
    q2.awaitTermination(240)
    v2 = spark.read.parquet(str(tmp_path / "dg_verdicts2"))
    assert v2.count() > 0  # these DID reach the store gate
    assert v2.filter(F.col("verdict") != "dup_of_corpus").count() == 0
    assert store_admitted(store).count() == n_store
