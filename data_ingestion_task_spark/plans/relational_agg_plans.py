"""Relational aggregations: scans → hash-aggs, pivots, exact/approx
distinct counts (SURVEY.md §2.4; split from ``relational_plans.py`` in
round 7 so one module edit no longer re-certifies 19 sibling queries).

Scale notes (100 TB): every aggregation here is a single hash
aggregate with map-side partial combine; no driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


def _dec(col, scale: int = 2):
    """Exact money arithmetic: DOUBLE → DECIMAL before summing so both
    engines sum exactly and emit bitwise-identical doubles.
    (Deliberately duplicated per relational module — a shared helper
    module would couple the three modules' certification hashes.)"""
    c = col if isinstance(col, F.Column) else F.col(col)
    return c.try_cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Aggregation spine (TPC-H Q1 style) — the flagship relational query.
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2025-06-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter (pushed to parquet) → hash-agg with partial
    combine. Mirrors the reference's metric-rollup style aggregations
    (code/python/metrics_8_6.py:36-64) on numeric columns."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec(li.l_extendedprice) * (1 - _dec(li.l_discount))
    charge = disc_price * (1 + _dec(li.l_tax))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2025-06-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(li.l_quantity)).cast("double").alias("sum_qty"),
            F.sum(_dec(li.l_extendedprice)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec(li.l_quantity)).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec(li.l_extendedprice)).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "value_counts",
    oracle="""
    SELECT lang AS value, COUNT(*) AS count
    FROM documents GROUP BY lang ORDER BY count DESC, value
    """,
)
def value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas value_counts (Neww_Fai.py:163) as groupBy-count."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.col("lang").alias("value"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), "value")
    )


@query(
    "grouped_nunique",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def grouped_nunique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby(label).fn.nunique() (Neww_Fai.py:168-169)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


@query(
    "describe_stats",
    oracle="""
    SELECT source,
           COUNT(n_chars) AS cnt,
           CAST(CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) / COUNT(n_chars) AS DOUBLE) AS mean_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source ORDER BY source
    """,
)
def describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.describe() essentials (Neww_Fai.py:173-175) — count/mean/
    min/max per group; exact-sum mean for oracle parity."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("n_chars").alias("cnt"),
            (F.sum(F.col("n_chars").try_cast("decimal(18,0)")).cast("double") / F.count("n_chars"))
            .alias("mean_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


@query(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas pivot_table / crosstab (post_pro_9_8.py:118-124,
    rag_2_26_1.py:171-182). Explicit pivot values → single-pass agg,
    no extra distinct-values job."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("O").alias("status_O"),
            F.col("F").alias("status_F"),
            F.col("P").alias("status_P"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "distinct_two_stage",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def distinct_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact distinct-count: pre-distinct on (key, value)
    spreads a hot key over hash(key, value) partitions, then the
    per-key count is a tiny second agg — the salting pattern for
    exact DISTINCT at scale (a single-shuffle countDistinct funnels
    every distinct value of a hot key through one reducer; the
    reference's skew is 82% one label, Neww_Fai.py:645-652). Two
    measures share the first shuffle via grouping on both pairs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey", "l_suppkey"
    )
    parts = (
        li.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(F.count("*").alias("n_parts"))
    )
    supps = (
        li.select("l_returnflag", "l_suppkey").distinct()
        .groupBy("l_returnflag").agg(F.count("*").alias("n_supps"))
    )
    return parts.join(supps, "l_returnflag").orderBy("l_returnflag")


@query(
    "approx_distinct_tolerance",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_exact,
           TRUE AS approx_within_5pct
    FROM orders
    """,
)
def approx_distinct_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB cardinality path: HyperLogLog++ ``approx_count_distinct``
    (no shuffle of distinct values — fixed 2^p-register sketch per
    partition, merged associatively) next to the exact count. The query
    EMITS its own acceptance check: ``approx_within_5pct`` must come
    back true, so the correctness gate fails if the sketch ever drifts
    past 5% — the estimate itself is engine-specific and deliberately
    not hash-compared."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_approx"),
    )
    return agg.select(
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(0.05)
        ).alias("approx_within_5pct"),
    )
