"""Multimodal blob plans: opaque binary payloads + typed metadata
(operators/multimodal.py). The profile query exercises the real
mapInPandas byte-level feature path (length + md5 over raw bytes);
the oracle recomputes both from the source text column — byte
lengths via UTF-8 encode, checksums via md5 — an independent
derivation that never touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_blob, blob_features
from ..sources.tables import load_table
from .registry import query


@query(
    "multimodal_blob_profile",
    oracle="""
    SELECT source,
           COUNT(*) AS n_blobs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_unique,
           MAX(octet_length(encode(text))) AS max_bytes
    FROM documents GROUP BY source ORDER BY source
    """,
)
def multimodal_blob_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob-column profile per source: attach binary payloads
    (UTF-8 bytes standing in for image content), run the batched
    byte-feature extractor (mapInPandas over the binary column), and
    aggregate — the ingest-side accounting a multimodal corpus needs
    (bytes, distinct payloads) before any decode."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    feats = blob_features(attach_blob(d))
    return (
        feats.groupBy("source")
        .agg(
            F.count("*").alias("n_blobs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("checksum").alias("n_unique"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("source")
    )
