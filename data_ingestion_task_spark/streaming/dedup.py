"""Ingest-time exact dedup (SURVEY §2.10 extension): the streaming
twin of the oracle-checked ``dedup_exact`` query — documents arriving
on the watched-folder inbox are dropped when a document with the same
content fingerprint was already admitted within the watermark horizon.

Spark-first shape: ``dropDuplicatesWithinWatermark`` (the purpose-built
operator, Spark 3.5+) over the md5 content fingerprint the batch
pipeline already computes (``functions/text.fingerprint_md5`` — the
SAME expression as ``dedup_exact``'s, so batch and stream agree on
what "identical content" means).

Why watermark-bounded and not plain ``dropDuplicates`` (which also
works on streams): plain dedup keeps EVERY fingerprint ever seen in
the state store — unbounded growth, the classic streaming-dedup OOM at
100 TB/day. The watermarked form expires state past the horizon, so
state size is (arrival rate × horizon), a knob — the standard
at-ingest dedup contract (re-posts of old content past the horizon are
re-admitted; the periodic BATCH ``dedup_exact`` pass over the
accumulated corpus catches those, which is exactly how production
pipelines split the two).

Scale: the only exchange is the stream side hashing on fingerprint to
co-locate duplicates with their state shard; state rows are one
fingerprint + timestamp each. No Python boundary anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..functions.text import fingerprint_md5
from .ingest import document_stream, ingest_transform


def dedup_stream(
    stream: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "_arrival_ts",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Drop rows whose ``fingerprint_col`` was already seen within the
    watermark horizon. If ``ts_col`` is absent an arrival-time column
    is stamped (processing-time semantics — the inbox regime, where
    files carry no event time); pass an existing event-time column to
    dedup on event time instead. Which duplicate survives is
    first-arrival (per micro-batch execution order) — the streaming
    analogue of ``dedup_exact``'s lowest-id rule, where "first" is
    arrival order rather than key order."""
    if ts_col not in stream.columns:
        stream = stream.withColumn(ts_col, F.current_timestamp())
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [fingerprint_col]
    )


def start_dedup_ingest(
    spark: SparkSession,
    inbox: str,
    checkpoint: str,
    schema: StructType,
    watermark: str = "10 minutes",
    query_name: str = "deduped_docs",
) -> StreamingQuery:
    """inbox → consolidate (fingerprint et al.) → watermark-bounded
    exact dedup → in-memory table ``query_name`` (swap for a parquet
    sink in production). ``availableNow`` drains the backlog and
    stops — the batch-style run mode used by tests."""
    stream = ingest_transform(document_stream(spark, inbox, schema))
    return (
        dedup_stream(stream, watermark=watermark)
        .writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def first_occurrence_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The batch twin the test compares against: one row per distinct
    content fingerprint (the survivor SET of any exact dedup,
    whatever the survivor rule)."""
    return docs.select(fingerprint_md5(F.col(text_col)).alias("fingerprint")).distinct()
