"""Hopping (sliding) event-time windows — the missing member of the
events window family (tumbling / session / daily / multi-resolution /
interval live in events_plans.py and interval_plans.py; a separate
module keeps their certification hashes decoupled).

Scale notes (100 TB): a hop of slide s inside duration d fans each
event into exactly d/s rows (4 here) BEFORE the aggregation — the
fan-out is a narrow generate, and the per-window aggregate is map-side
combined, so the exchange carries (window, type) partials, not the
4× event stream. ``F.window(ts, d, s)`` is the same operator Structured
Streaming uses, so this plan runs under ``readStream`` + watermark
unchanged (the streaming/ingest.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

#: Window duration / slide (seconds).
_HOP_DURATION_S = 3600
_HOP_SLIDE_S = 900

_D_VAL_DEC = "CAST(round(value, 6) AS DECIMAL(18,6))"


@query(
    "events_hopping_window",
    oracle=f"""
    SELECT epoch(time_bucket(INTERVAL '{_HOP_SLIDE_S} seconds', ts))::BIGINT
             - o * {_HOP_SLIDE_S} AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM({_D_VAL_DEC}) AS DOUBLE) AS sum_value
    FROM events
    CROSS JOIN (SELECT unnest(generate_series(0,
                  {_HOP_DURATION_S // _HOP_SLIDE_S - 1})) AS o)
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows hopping every 15 minutes per event_type: each
    event contributes to exactly 4 overlapping windows (duration/slide),
    with count, distinct users, and the exact-decimal value sum. The
    oracle replays the fan-out as an explicit 4-offset cross join from
    the 15-minute bucket; ``F.window``'s epoch-aligned origin matches
    DuckDB's ``time_bucket``. NULL event times are excluded on both
    sides (the multires-rollup contract)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(
            F.window("ts", f"{_HOP_DURATION_S} seconds", f"{_HOP_SLIDE_S} seconds").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )
