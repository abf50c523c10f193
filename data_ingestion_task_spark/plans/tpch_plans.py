"""Classic multi-join OLAP rollups on the TPC-H-shaped tables — the
canonical join-ordering/broadcast showcases (pricing_summary, the Q1
analogue, lives in relational_agg_plans.py; a separate module keeps
the relational families' certification hashes decoupled).

Scale notes (100 TB): customer is the selective dimension — filtered
FIRST and broadcast into orders (no shuffle of the fact side on the
build key), then orders⋈lineitem shuffles on the join key both sides
carry natively (l_orderkey/o_orderkey), which AQE can convert to a
sort-merge with coalesced partitions. The date filters sit directly on
scan columns so they push to the parquet reader (PushedFilters), and
the aggregate is map-side combined on (orderkey, orderdate, priority).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

#: Q3 parameters (segment/date picked for the synthetic data's range).
_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1998-06-01"
_Q3_TOPN = 10


@query(
    "shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
      AND CAST(o.o_orderdate AS DATE) < DATE '{_Q3_DATE}'
      AND CAST(l.l_shipdate AS DATE) > DATE '{_Q3_DATE}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderdate, orderkey
    LIMIT {_Q3_TOPN}
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analogue: top-10 unshipped orders by revenue for one
    market segment. The segment-filtered customer dimension is
    broadcast (no fact shuffle on the build side); revenue sums exact
    DECIMAL then casts DOUBLE so the ranking key is bit-identical in
    both engines (ties broken by orderdate, orderkey); the global
    top-10 is a ``TakeOrderedAndProject`` — per-partition heaps, no
    full sort exchange."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _Q3_SEGMENT)
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").cast("date") < F.lit(_Q3_DATE).cast("date"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").cast("date") > F.lit(_Q3_DATE).cast("date"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.desc("revenue"), "orderdate", "orderkey")
        .limit(_Q3_TOPN)
    )
