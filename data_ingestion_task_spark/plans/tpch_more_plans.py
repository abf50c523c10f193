"""TPC-H Q5 and Q10 analogues — the snowflake-traversal (region →
nation → customer/supplier) and returned-item-reporting shapes that
complete the classic OLAP trio started by ``pricing_summary`` (Q1,
relational_agg_plans.py) and ``shipping_priority`` (Q3,
tpch_plans.py). New leaf module so registering them costs only their
own certification hashes (the window-budget rule).

Scale notes (100 TB):

- Q5: region/nation/supplier are true dimensions — filtered first and
  broadcast, so the nation name and the supplier nation key reach the
  fact rows with ZERO fact-side shuffle for them. The two fact-scaled
  exchanges are the ones the data model forces: lineitem⋈orders on
  the orderkey both sides carry natively, and the result⋈customer on
  custkey (customer is 0.15·SF in TPC-H — past broadcast range at
  100 TB, so it shuffles; AQE picks the side). The same-nation
  predicate (c_nationkey = s_nationkey) is applied as a join filter,
  not a post-filter, so mismatched rows never reach the aggregate.
- Q10: one selective date window on orders (pushed to the parquet
  scan) and the returnflag filter on lineitem (likewise pushed); the
  aggregate is map-side combined on custkey (grouping by the customer
  attributes rides along functionally); the global top-20 is a
  ``TakeOrderedAndProject`` — per-partition heaps, no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

#: Q5 parameters (region/date window picked for the synthetic range).
_Q5_REGION = "ASIA"
_Q5_FROM, _Q5_TO = "1996-01-01", "1998-01-01"
#: Q10 parameters: one quarter of returned items, top-20 customers.
_Q10_FROM, _Q10_TO = "1996-01-01", "1996-07-01"
_Q10_TOPN = 20

_REVENUE_SQL = """CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)"""


def _revenue_col() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )


@query(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation, {_REVENUE_SQL} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND CAST(o.o_orderdate AS DATE) >= DATE '{_Q5_FROM}'
      AND CAST(o.o_orderdate AS DATE) < DATE '{_Q5_TO}'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analogue: revenue per nation from orders where the
    customer and the supplier share the nation, one region, two-year
    window. The full snowflake traversal: region filters nation,
    nation keys supplier and customer, and only the two fact-scaled
    joins shuffle (see module scale notes). Revenue sums exact DECIMAL
    then casts DOUBLE (the Q3 parity idiom), ties broken by nation."""
    r = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == _Q5_REGION)
        .select("r_regionkey")
    )
    n = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate").cast("date") >= F.lit(_Q5_FROM).cast("date"))
            & (F.col("o_orderdate").cast("date") < F.lit(_Q5_TO).cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue_col()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


@query(
    "returned_item_report",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           {_REVENUE_SQL} AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND CAST(o.o_orderdate AS DATE) >= DATE '{_Q10_FROM}'
      AND CAST(o.o_orderdate AS DATE) < DATE '{_Q10_TO}'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, custkey
    LIMIT {_Q10_TOPN}
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue: the top-20 (``_Q10_TOPN``) customers by revenue
    lost to returned items in one quarter. Both selective predicates
    (returnflag, date window) sit on scan columns and push to the
    parquet readers; the customer attributes and nation name ride the
    custkey grouping functionally; the global top-20 is a
    ``TakeOrderedAndProject``. Revenue parity as in Q3/Q5."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate").cast("date") >= F.lit(_Q10_FROM).cast("date"))
            & (F.col("o_orderdate").cast("date") < F.lit(_Q10_TO).cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(_revenue_col()).cast("double").alias("revenue"))
        .select("custkey", "name", "revenue", "acctbal", "nation")
        .orderBy(F.desc("revenue"), "custkey")
        .limit(_Q10_TOPN)
    )
