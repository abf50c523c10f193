"""Shared metric-frame builders (SURVEY §2.12) used by the evaluation
plans and the api facade."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def accuracy_rollup(long: DataFrame) -> DataFrame:
    """(field, ok∈{0,1}) long frame → per-field
    ``n_correct/support/accuracy`` with an appended Overall row
    (metrics_8_6.py:36-64 get_metrics_table). One exchange serves both
    grouping sets via ``rollup``."""
    return (
        long.rollup("field")
        .agg(
            F.sum("ok").cast("bigint").alias("n_correct"),
            F.count("*").alias("support"),
            F.round(F.sum("ok").cast("double") / F.count("*"), 6).alias("accuracy"),
        )
        .select(
            F.coalesce(F.col("field"), F.lit("Overall")).alias("field"),
            "n_correct",
            "support",
            "accuracy",
        )
        .orderBy("field")
    )
