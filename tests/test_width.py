"""widen_if_narrow (functions/width.py): the scan-width guard must
repartition a starved (single-partition) frame to session parallelism
and leave an already-parallel frame UNTOUCHED (no exchange added)."""

from __future__ import annotations

from data_ingestion_task_spark.functions.width import widen_if_narrow


def test_narrow_frame_is_widened(spark):
    df = spark.range(100).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    wide = widen_if_narrow(df)
    assert (
        wide.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # round-robin repartition: same rows, just spread
    assert sorted(r["id"] for r in wide.collect()) == list(range(100))


def test_healthy_frame_passes_through_unchanged(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 2)
    wide = widen_if_narrow(df)
    # identical object — no exchange, no plan delta
    assert wide is df


def test_min_parts_override(spark):
    df = spark.range(10).coalesce(1)
    assert widen_if_narrow(df, min_parts=4).rdd.getNumPartitions() == 4
