"""Streaming ingestion tests (SURVEY §2.10): exactly-once file-source
ingest with checkpoint resume, run-summary foreachBatch stats, and
watermarked windowed counts matching their batch twin."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from data_ingestion_task_spark.sources.tables import load_table, table_path
from data_ingestion_task_spark.streaming.ingest import (
    ingest_transform,
    start_document_ingest,
    start_windowed_event_counts,
)


def test_document_ingest_exactly_once(spark, sf_dir, tmp_path):
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    inbox.mkdir()
    shutil.copy(table_path(sf_dir, "documents"), inbox / "batch1.parquet")

    schema = spark.read.parquet(str(inbox / "batch1.parquet")).schema
    summaries: list[dict] = []
    q = start_document_ingest(
        spark, str(inbox), str(out), str(ckpt), schema, on_batch_summary=summaries.append
    )
    q.awaitTermination(120)

    batch = ingest_transform(load_table(spark, sf_dir, "documents"))
    n1 = batch.count()
    got = spark.read.parquet(str(out))
    assert got.count() == n1
    # streamed rows are exactly the batch-transform rows
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0
    # run-summary stats (ocr_agent run stats) agree with the batch agg
    total_words = batch.agg(F.sum("word_len")).collect()[0][0]
    assert sum(s["docs"] for s in summaries) == n1
    assert sum(s["words"] for s in summaries) == total_words

    # second drop: only NEW files are ingested (checkpoint resume)
    extra = load_table(spark, sf_dir, "documents").limit(7).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    extra.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "extra"))
    for i, f in enumerate((tmp_path / "extra").glob("*.parquet")):
        shutil.copy(f, inbox / f"batch2_{i}.parquet")
    q2 = start_document_ingest(spark, str(inbox), str(out), str(ckpt), schema)
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == n1 + 7


def test_windowed_counts_match_batch_twin(spark, sf_dir, tmp_path):
    # consolidate events (nanos → micros) into a streamable inbox
    inbox = tmp_path / "ev_inbox"
    events = load_table(spark, sf_dir, "events").select("ts", "event_type")
    events.write.parquet(str(inbox))

    schema = spark.read.parquet(str(inbox)).schema
    q = start_windowed_event_counts(
        spark, str(inbox), str(tmp_path / "ev_ckpt"), schema, query_name="win_counts"
    )
    q.awaitTermination(120)

    streamed = spark.table("win_counts")
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).count() == 0
