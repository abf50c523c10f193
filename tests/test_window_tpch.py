"""Invariant tests for the hopping-window and TPC-H Q3 queries."""

from pyspark.sql import functions as F

from data_ingestion_task_spark.plans.tpch_plans import (
    _Q3_DATE,
    _Q3_TOPN,
    shipping_priority,
)
from data_ingestion_task_spark.plans.window_plans import (
    _HOP_DURATION_S,
    _HOP_SLIDE_S,
    events_hopping_window,
)
from data_ingestion_task_spark.sources.tables import load_table


def test_hopping_fanout_exact(spark, sf_dir):
    out = events_hopping_window(spark, sf_dir)
    rows = out.collect()
    fanout = _HOP_DURATION_S // _HOP_SLIDE_S
    n_events = (
        load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull()).count()
    )
    # every event lands in exactly duration/slide windows
    assert sum(r["n_events"] for r in rows) == fanout * n_events
    # window starts are slide-aligned and distinct per (window, type)
    assert all(r["window_start"] % _HOP_SLIDE_S == 0 for r in rows)
    assert len({(r["window_start"], r["event_type"]) for r in rows}) == len(rows)
    # spot-check one window against a direct range count
    r0 = rows[len(rows) // 2]
    direct = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .filter(F.col("event_type") == r0["event_type"])
        .filter(F.unix_timestamp("ts") >= r0["window_start"])
        .filter(F.unix_timestamp("ts") < r0["window_start"] + _HOP_DURATION_S)
        .count()
    )
    assert direct == r0["n_events"]


def test_q3_topn_ordered_and_filtered(spark, sf_dir):
    rows = shipping_priority(spark, sf_dir).collect()
    assert 0 < len(rows) <= _Q3_TOPN
    for a, b in zip(rows, rows[1:]):
        assert (a["revenue"], ) >= (b["revenue"], )
    for r in rows:
        assert r["orderdate"] < _Q3_DATE  # ISO strings compare like dates
        assert r["revenue"] > 0
