"""Skew-mitigation plans: the salting operator certified end-to-end.

``operators.skew.salted_join`` (SCALE.md §4 — the explicit recipe for
a pathological hot join key the reference corpus exhibits, Bank
Statement = 82% of pages per Neww_Fai.py:645-652) was pytest-only
until round 6; this module registers it against the driver's DuckDB
oracle gate, whose SQL is a PLAIN join+rollup — proving the salt
spread/replicate/drop dance is row-identical to the unsalted join,
not just shaped right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..sources.tables import load_table
from .registry import query


@query(
    "salted_dim_join_rollup",
    oracle="""
    SELECT p.p_brand AS brand,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(round(l.l_quantity, 2) AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand ORDER BY brand
    """,
)
def salted_dim_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe fact×dim rollup: lineitem ⋈ part via
    ``salted_join`` (n_salts=8; the salt is a deterministic hash of
    ``l_orderkey``, so retries land identically), then a per-brand
    rollup. The oracle's unsalted SQL is the row-identity proof.

    Scale shape: the big side's shuffle volume is unchanged (each row
    gains only a tiny ``_salt`` int) while every hot ``p_partkey``'s
    rows spread across 8 reducer sub-keys; the small side replicates
    8× — the classic trade, worth it exactly when one key would
    otherwise pin a straggler reducer. (For dims this small a
    broadcast join — ``dim_join_rollup`` — is the first choice; the
    salted plan is the recipe for when BOTH sides are too big to
    broadcast and the key histogram is spiked.)"""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", F.round("l_quantity", 2).alias("_qty")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li.withColumnRenamed("l_partkey", "p_partkey"),
        p,
        key="p_partkey",
        big_row_key="l_orderkey",
        n_salts=8,
    )
    return (
        joined.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("_qty").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("brand")
    )
