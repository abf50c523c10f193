"""Watermark-bounded streaming exact dedup (streaming/dedup.py): the
streamed survivor set must equal the batch pipeline's distinct
fingerprint set (same fingerprint expression as the oracle-checked
``dedup_exact``), and within-batch duplicates must collapse too."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_task_spark.sources.tables import load_table
from data_ingestion_task_spark.streaming.dedup import (
    first_occurrence_fingerprints,
    start_dedup_ingest,
)


def test_stream_dedup_matches_batch_survivor_set(spark, sf_dir, tmp_path):
    inbox = tmp_path / "dedup_inbox"
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    # re-posts: every 7th doc arrives AGAIN under a new doc_id (the
    # same-content/new-key case at-ingest dedup exists for), plus the
    # corpus's own splits in two files so duplicates span files
    reposts = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(str(inbox))
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(str(inbox))
    reposts.write.mode("append").parquet(str(inbox))
    arriving = docs.unionByName(reposts)

    schema = spark.read.parquet(str(inbox)).schema
    q = start_dedup_ingest(
        spark,
        str(inbox),
        str(tmp_path / "ckpt"),
        schema,
        query_name="dedup_docs_t1",
    )
    q.awaitTermination(120)

    out = spark.table("dedup_docs_t1")
    streamed = [r["fingerprint"] for r in out.select("fingerprint").collect()]
    batch = {
        r["fingerprint"]
        for r in first_occurrence_fingerprints(arriving).collect()
    }
    # exactly one survivor per distinct content fingerprint
    assert len(streamed) == len(set(streamed)) == len(batch)
    assert set(streamed) == batch
    # the arriving stream actually HAS duplicates, so the operator did work
    assert arriving.count() > len(batch)
    # survivors carry the full consolidated row (ingest_transform)
    for c in ("doc_id", "text", "char_len", "quality", "_arrival_ts"):
        assert c in out.columns
