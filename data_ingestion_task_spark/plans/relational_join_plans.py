"""Relational filters, masked updates, joins and unions
(SURVEY.md §2.2-2.3; split from ``relational_plans.py`` in round 7 so
one module edit no longer re-certifies 19 sibling queries).

Scale notes (100 TB): dimension joins broadcast (region/nation are
tiny); the fact-fact join shuffles on its natural key with AQE picking
the physical strategy; filters push to the parquet scan.
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
# Filters / masked conditional update
# ---------------------------------------------------------------------------


@query(
    "range_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word_min <= x <= word_max range mask (Neww_Fai.py:808-811) +
    label equality filter (Neww_Fai.py:904); both push to the scan."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(10, 20) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "conditional_update",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' AND o_totalprice > 200000
                THEN 'EXPEDITE' ELSE o_orderpriority END AS o_orderpriority
    FROM orders ORDER BY o_orderkey
    """,
)
def conditional_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked assignment df.loc[mask, col] = v (post_9_9.py:1-39) as
    when/otherwise — vectorized, no row loop."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when((o.o_orderstatus == "O") & (o.o_totalprice > 200000), F.lit("EXPEDITE"))
        .otherwise(o.o_orderpriority)
        .alias("o_orderpriority"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "dim_join_rollup",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name ORDER BY region, nation
    """,
)
def dim_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact × two broadcast dims. At 100 TB nation/region
    are broadcast — zero shuffle for the join; one shuffle for the
    agg."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("total_acctbal"),
        )
        .orderBy("region", "nation")
    )


@query(
    "anti_join_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    ORDER BY c.c_custkey
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (customers with no in-progress orders) — pred↔GT
    alignment family (SURVEY §2.3); AQE picks broadcast/shuffled side
    at runtime. The status filter keeps the result non-trivial at
    every sf (every customer has *some* order in the testdata)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "zip_join_alignment",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    ORDER BY o.o_orderkey
    """,
)
def zip_join_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's positional concat-axis-1 'join'
    (privateb_4_8.py:64-65) re-expressed as a keyed equi-join —
    the only scale-safe form (positional alignment breaks under
    partitioning)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec(li.l_extendedprice) * (1 - _dec(li.l_discount))
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_lines"))
        .orderBy("o_orderkey")
    )


@query(
    "union_by_name",
    oracle="""
    SELECT 'customer' AS party_type, c_name AS name, c_nationkey AS nationkey,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
    UNION ALL
    SELECT 'supplier' AS party_type, s_name AS name, s_nationkey AS nationkey,
           CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier
    ORDER BY party_type, name
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rename→reorder→concat rows (wordschrstokens.py:29-45) as
    unionByName."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("party_type"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("party_type"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").cast("double").alias("acctbal"),
    )
    return c.unionByName(s).orderBy("party_type", "name")
