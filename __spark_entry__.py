"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every registered operator from
``data_ingestion_task_spark.plans`` (SURVEY.md §2 inventory) with its
DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_task_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ingest → derive → filter → aggregate → normalize over
    sf0.001 (driver checks rows > 0, stable schema)."""
    qs = registry.queries_dict()
    flagship = qs.get("doc_ingest_profile", qs["pricing_summary"])
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query (omitted ⇒ rows-only check)."""
    return registry.oracle_dict()
