"""Embedding-table split shared by the vector and refine plan modules.

Lives in its own leaf module so `refine_plans` (which only needs the
query/index split and its DuckDB CTE prefix) does not put ALL of
`vector_plans` into its certification dep closure — before round 5,
any vector_plans edit uncertified the entire refine family through
this one import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

DIM = 64
_D_VNORM = (
    "list_transform(CAST(embedding AS DOUBLE[]), "
    "x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))))"
)

_D_SPLIT = f"""
    WITH n AS (
      SELECT vec_id, label, {_D_VNORM} AS v FROM embeddings
    ), q AS (SELECT vec_id AS query_id, label AS query_label, v FROM n WHERE vec_id % 5 = 0),
       x AS (SELECT vec_id AS neighbor_id, label AS neighbor_label, v FROM n WHERE vec_id % 5 <> 0),
       p AS (SELECT q.query_id, q.query_label, x.neighbor_id, x.neighbor_label,
                    list_dot_product(q.v, x.v) AS sim
             FROM q CROSS JOIN x),
       r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rnk
             FROM p)
"""


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("query_label"), "embedding"
    )
    x = e.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("neighbor_label"), "embedding"
    )
    return q, x
