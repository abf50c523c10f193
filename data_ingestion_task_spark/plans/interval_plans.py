"""Interval (range-containment) join, binned so it never degenerates
into a nested-loop compare (beyond-reference scale operator, same
family as the dedup/ANN suite — the reference's single-node flow never
needs one, a 100-TB event store does: campaign attribution, outage
blame windows, feature joins against validity intervals).

The naive formulation — ``points JOIN intervals ON ts BETWEEN lo AND
hi`` — has no equi-key, so Spark plans BroadcastNestedLoopJoin: every
point is compared against every interval, O(N·M) at any cluster size
(and the registry lint bans the CartesianProduct it falls back to).
The scale-safe shape used here:

1. pick a bin width ≥ the max interval length (2 h here);
2. explode each interval to the 1–2 bins it overlaps (≤ 2 because
   width ≥ length — the interval table at most doubles);
3. equi-join on ``bin`` (hash join — broadcast here since campaign
   anchors are dimension-sized; shuffle-hash on ``bin`` when both
   sides are fact-sized), then re-check exact containment.

Each point lands in exactly ONE bin, so a point×interval match is
produced at most once — no post-join dedup. Time-uniform bins have no
skew; the containment filter runs inside the same codegen stage as
the join. The same binning carries any interval length: width tracks
``max(hi - lo)`` (or long intervals are range-partitioned into
segments), a knob, not a redesign.

Scale knobs, because bin width trades three quantities:

- ``W = max interval length`` (this module) minimizes interval
  replication (≤ 2×) but caps shuffle parallelism at ``timespan / W``
  distinct bin keys — fine while the interval side broadcasts (no
  shuffle at all, the registered case: anchors are dimension-sized).
- When BOTH sides are fact-sized, drop the broadcast hint (shuffle-
  hash equi-join on ``bin``) and SHRINK ``W``: points still map to one
  bin each, intervals replicate to ``len/W + 1`` bins, and bin
  cardinality — i.e. reducer parallelism — multiplies by the same
  factor. Replication cost lands only on the (smaller) interval side;
  ``W ≈ len/64`` turns a year of 2-hour windows into ~280k bin keys,
  enough to feed a 1000-executor shuffle without salting.

Query semantics (deterministic from the ``events`` table alone —
TESTDATA.md ships no interval table): every 97th event anchors a
2-hour half-open attribution window ``[ts, ts+7200s)`` tagged with
its event_type; each window reports how many events / distinct users
/ exact-decimal value fell inside it. The anchor itself matches its
own window, so every window has ≥ 1 row (inner join loses nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

#: Bin width (seconds) — must stay ≥ the interval length below.
BIN_S = 7200
#: Interval length (seconds), half-open [start, start + LEN).
LEN_S = 7200
#: Anchor sampling modulus: event_id % MOD == 0 opens a window.
ANCHOR_MOD = 97

_D_VAL_DEC = "CAST(round(value, 6) AS DECIMAL(18,6))"


@query(
    "events_multires_rollup",
    oracle=f"""
    WITH b AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
             {_D_VAL_DEC} AS v
      FROM events
      WHERE ts IS NOT NULL
    )
    SELECT day, hour,
           COUNT(*) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS sum_value,
           CASE WHEN day IS NULL THEN 3
                WHEN hour IS NULL THEN 1
                ELSE 0 END AS lvl
    FROM b GROUP BY ROLLUP(day, hour)
    ORDER BY lvl, day, hour
    """,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hour, day, and grand
    totals in ONE pass via ``rollup(day, hour)`` — the multi-
    resolution rollup a time-series store materializes per refresh.

    Why one pass wins at 100 TB: three separate aggregations scan the
    fact table three times; a rollup scans ONCE — Catalyst plans an
    Expand (×3 rows, one copy per grouping set) feeding a single
    partial-then-final hash aggregate, and because the rollup keys are
    tiny-cardinality (day, hour), map-side partial aggregation
    collapses the expanded rows back to ~3× the hour-grain group count
    before the one shuffle. The level tag is derived from the NULLed
    keys (not ``grouping_id()``) so the DuckDB twin computes it with
    the identical CASE — engine-portable, and 3 = grand total keeps
    the same bit values Spark's grouping_id would give. Because the
    tag comes from NULLed keys, NULL timestamps are filtered BEFORE
    the rollup (ADVICE r6 #4): a day=NULL/hour=NULL base group would
    otherwise be tagged as — and collide with — the grand-total row.

    In production the three grains land in a partitioned materialized
    table and refresh incrementally per closed day-partition; the
    registered query is the per-refresh computation."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    b = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("bigint").alias("hour"),
        F.round(F.col("value"), 6).cast("decimal(18,6)").alias("v"),
    )
    return (
        b.rollup("day", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .withColumn(
            "lvl",
            F.when(F.col("day").isNull(), F.lit(3))
            .when(F.col("hour").isNull(), F.lit(1))
            .otherwise(F.lit(0)),
        )
        .orderBy("lvl", "day", "hour")
    )


@query(
    "events_interval_join",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, user_id,
             {_D_VAL_DEC} AS v
      FROM events
    ),
    iv AS (
      SELECT event_id AS interval_id, event_type AS tag,
             CAST(floor(epoch(ts)) AS BIGINT) AS start_s
      FROM events WHERE event_id % {ANCHOR_MOD} = 0
    )
    SELECT iv.interval_id, iv.tag,
           COUNT(*) AS n_events,
           COUNT(DISTINCT pts.user_id) AS n_users,
           CAST(SUM(pts.v) AS DOUBLE) AS sum_value
    FROM iv JOIN pts
      ON pts.ts_s >= iv.start_s AND pts.ts_s < iv.start_s + {LEN_S}
    GROUP BY 1, 2
    ORDER BY interval_id
    """,
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned point-in-interval join (module docstring): anchors →
    2-bin explode → broadcast hash equi-join on ``bin`` → exact
    containment filter → per-window rollup. The oracle is the naive
    BETWEEN join — DuckDB can afford it at sf0.01, which is exactly
    why it makes a good independent witness for the binned plan."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        F.unix_timestamp("ts").alias("ts_s"),
        "user_id",
        F.round(F.col("value"), 6).cast("decimal(18,6)").alias("v"),
    ).withColumn("bin", F.floor(F.col("ts_s") / BIN_S))
    iv = (
        e.filter(F.col("event_id") % ANCHOR_MOD == 0)
        .select(
            F.col("event_id").alias("interval_id"),
            F.col("event_type").alias("tag"),
            F.unix_timestamp("ts").alias("start_s"),
        )
        # explode to every bin the half-open window overlaps (≤ 2).
        .withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("start_s") / BIN_S),
                    F.floor((F.col("start_s") + LEN_S - 1) / BIN_S),
                )
            ),
        )
    )
    joined = pts.join(F.broadcast(iv), "bin").where(
        (F.col("ts_s") >= F.col("start_s"))
        & (F.col("ts_s") < F.col("start_s") + LEN_S)
    )
    return (
        joined.groupBy("interval_id", "tag")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .orderBy("interval_id")
    )
