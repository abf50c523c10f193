"""Parquet table readers for the engine's canonical tables.

The driver's testdata (TESTDATA.md) ships one parquet file per table;
at 100 TB the same loader points at a partitioned directory per table
(``.../lineitem/dt=*/...``) and nothing else changes — Spark handles
partition discovery/pruning. Always read through these helpers so
scans share schema handling and (later) bucketing metadata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions that should always be broadcast in joins.
BROADCAST_TABLES = {"region", "nation"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, split: bool = False
) -> DataFrame:
    """Columnar parquet scan; Catalyst pushes filters/projection into it.

    ``events.ts`` normalization: the generator has shipped the column
    as parquet TIMESTAMP(NANOS) (which the Spark reader rejects — read
    nanos as long, integer ``div``; epoch-nanos exceed 2^53 so double
    math would corrupt low bits) and as TIMESTAMP(µs, no tz) (which
    Spark reads as TIMESTAMP_NTZ — rejected by ``withWatermark`` and
    event-time windows). Both land on TIMESTAMP_LTZ here; the session
    TZ is pinned to UTC (session.py / registry.PINNED_CONF) so the
    NTZ→LTZ cast is value-identical and matches DuckDB reading the
    same file.

    ``split=True``: round-robin repartition to the session's
    parallelism before a COMPUTE-HEAVY narrow stage (md5/regex per
    row). The local testdata is one single-row-group file — an
    unsplittable 1-partition scan that would serialize the map. On
    production data (many files / row groups per table) scans
    parallelize natively and this shuffle of the raw scan is wasteful:
    callers should pass split=True only when per-row compute dominates
    a 1-file-scale input."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    if split:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
