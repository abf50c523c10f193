"""Scan-width guard for compute-heavy narrow stages over unsplittable
inputs (optimization guide §2.5 "Input skew: one huge unsplittable
file … otherwise repartition immediately after the read").

The local testdata ships one single-row-group parquet file per table,
so every scan is ONE task and all pre-shuffle narrow work (regex
tokenization, md5 fingerprints, per-row normalization) serializes on
one core regardless of ``local[N]``. The same layout happens in
production whenever an upstream writer emits few huge row groups or
gzip text. :func:`widen_if_narrow` is the scale-adaptive remedy:

- healthy layout (scan partitions >= session parallelism, i.e. every
  real cluster scan of real data): RETURNS THE INPUT UNCHANGED — no
  exchange, no plan delta;
- starved layout: one round-robin repartition to the session
  parallelism, an exchange of the RAW NARROW rows (linear, the
  cheapest point in the plan) that unlocks N-way parallelism for the
  per-row compute above it.

This generalizes the repo's existing per-call-site ``load_table(...,
split=True)`` idiom (sources/tables.py) with a partition-count guard
so library functions can apply it to caller-supplied frames without
taxing already-parallel inputs. The guard costs one physical-plan
compilation (``df.rdd`` — metadata only, no job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_if_narrow(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default
    parallelism ONLY when its current plan yields fewer partitions
    (unsplittable-input starvation); otherwise return it unchanged.
    Streaming frames pass through untouched (no static partitioning
    to inspect; micro-batch planning handles width)."""
    if df.isStreaming:
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
