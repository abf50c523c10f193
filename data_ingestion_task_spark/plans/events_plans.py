"""Events / time-series plans over the ``events`` table (SURVEY §2.10
batch half): tumbling-window aggregation, gap-based sessionization,
daily activity, JSON props extraction, and the §2.8 JSON repair chain
(code-fence strip + brace-trim) exercised on deterministically
mangled payloads.

The same transformations run unchanged under Structured Streaming
(``data_ingestion_task_spark.streaming``) — these batch plans are the
oracle-checkable twins of that path.

Scale notes (100 TB): window aggs shuffle once on (window, type) —
low cardinality, map-side partial aggs absorb volume; sessionization
shuffles once on user_id and then is a narrow sort within partition
(Spark sorts within user partitions, no global sort); JSON extraction
is a narrow map stage (``get_json_object`` is JVM-side, no Python).

Timestamps: compared as epoch seconds (BIGINT) per the registry
parity rules; session TZ pinned UTC. ``value`` is DOUBLE — summed via
DECIMAL(18,6) so both engines reduce exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import hash64
from ..sources.tables import load_table
from .registry import query

_D_VAL_DEC = "CAST(round(value, 6) AS DECIMAL(18,6))"


def _val_dec() -> F.Column:
    return F.round(F.col("value"), 6).cast("decimal(18,6)")


# ---------------------------------------------------------------------------
# Tumbling window aggregation
# ---------------------------------------------------------------------------


@query(
    "events_tumbling_window",
    oracle=f"""
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM({_D_VAL_DEC}) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window per event_type: count, distinct users,
    exact-decimal value sum — ``F.window`` so the identical expression
    runs under readStream with a watermark (ocr_agent_8_29.py run-stats
    reimagined as event-time windows)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_val_dec()).cast("double").alias("sum_value"),
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


# ---------------------------------------------------------------------------
# Gap-based sessionization
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800  # 30 min


@query(
    "events_sessionization",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             LAG(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL OR ts_s - prev_ts > {SESSION_GAP_S} THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, event_id, ts_s,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts_s) AS session_start,
           MAX(ts_s) AS session_end,
           MAX(ts_s) - MIN(ts_s) AS duration_s
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → running sum = session id → per-session stats. One shuffle
    on user_id; both windows share the same partitioning so Spark
    reuses the exchange + sort."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_s")
    )
    wo = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts_s").over(wo).isNull()
            | (F.col("ts_s") - F.lag("ts_s").over(wo) > SESSION_GAP_S),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_s").alias("session_start"),
            F.max("ts_s").alias("session_end"),
            (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# Daily activity
# ---------------------------------------------------------------------------


@query(
    "events_daily_activity",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           COUNT(DISTINCT user_id) AS dau,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN {_D_VAL_DEC} ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             AS purchase_value,
           round(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS error_rate
    FROM events GROUP BY 1 ORDER BY day
    """,
)
def events_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + event volume + purchase value + error
    rate: the run-summary stats of the OCR-agent design
    (ocr_agent_8_29.py:28-29) generalized to event telemetry."""
    e = load_table(spark, sf_dir, "events")
    purchase = F.when(F.col("event_type") == "purchase", _val_dec()).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count("*").alias("n_events"),
            F.sum(purchase).cast("double").alias("purchase_value"),
            F.round(
                F.sum((F.col("event_type") == "error").cast("int")).cast("double") / F.count("*"),
                6,
            ).alias("error_rate"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# JSON props extraction (§2.8 JSON→columns)
# ---------------------------------------------------------------------------


@query(
    "events_props_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(props::JSON ->> 'k' AS BIGINT)) AS min_k,
           MAX(CAST(props::JSON ->> 'k' AS BIGINT)) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props → typed columns (csv_single_3.py:110-111 JSON→
    DataFrame): ``get_json_object`` is JVM-side so extraction stays
    inside whole-stage codegen — no Python in the hot path."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# JSON repair chain (§2.8 brace-trim + code-fence strip)
# ---------------------------------------------------------------------------


@query(
    "json_repair_extract",
    oracle=f"""
    WITH mangled AS (
      SELECT event_id, props,
             CASE ('0x' || substr(md5('m:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 4
               WHEN 0 THEN '```json' || chr(10) || props || chr(10) || '```'
               WHEN 1 THEN 'Answer: ' || props || ' -- end'
               WHEN 2 THEN 'noise ' || props
               ELSE props
             END AS raw
      FROM events
    ),
    repaired AS (
      SELECT event_id, regexp_extract(raw, '\\{{.*\\}}', 0) AS body FROM mangled
    )
    SELECT COUNT(*) AS n,
           CAST(SUM(CASE WHEN body IS NOT NULL AND body <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
           CAST(SUM(CAST(body::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k
    FROM repaired
    """,
)
def json_repair_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-output JSON repair (confirmation_service.py:36-43 brace
    trim; full_test_run.py:33-41 code-fence strip): payloads are
    deterministically mangled (fenced / prefixed / suffixed by hash
    residue), repaired with one DOTALL brace-extraction regex, then
    parsed. All columnar regex — the multi-stage Python repair UDF
    (json_error.py) exists for genuinely broken JSON, but the 95%
    path never leaves the JVM."""
    e = load_table(spark, sf_dir, "events").select("event_id", "props")
    h = hash64(F.concat(F.lit("m:"), F.col("event_id").cast("string")))
    raw = (
        F.when(h % 4 == 0, F.concat(F.lit("```json\n"), F.col("props"), F.lit("\n```")))
        .when(h % 4 == 1, F.concat(F.lit("Answer: "), F.col("props"), F.lit(" -- end")))
        .when(h % 4 == 2, F.concat(F.lit("noise "), F.col("props")))
        .otherwise(F.col("props"))
    )
    body = F.regexp_extract(raw, r"(?s)\{.*\}", 0)
    k = F.get_json_object(F.col("body"), "$.k").cast("bigint")
    return (
        e.select("event_id", body.alias("body"))
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("body").isNotNull() & (F.col("body") != "")).cast("int")).alias(
                "n_parsed"
            ),
            F.sum(k).alias("sum_k"),
        )
    )


@query(
    "json_repair_udf_recover",
    oracle="""
    SELECT COUNT(*) AS n,
           COUNT(*) AS n_repaired,
           CAST(SUM(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    """,
)
def json_repair_udf_recover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python repair fallback (json_error.py multi-stage chain as
    an Arrow-batched pandas UDF): payloads are mangled five ways —
    prose+code-fence wrap, trailing comma, single-quoted, truncated
    (brace lost), clean — and every class must be recovered, so the
    oracle is simply the aggregate over the ORIGINAL clean payloads.
    At scale this UDF runs only on the minority of rows the JVM-side
    regex path failed to parse."""
    from ..functions.json_repair import repair_json_udf

    e = load_table(spark, sf_dir, "events").select("event_id", "props")
    h = hash64(F.concat(F.lit("u:"), F.col("event_id").cast("string")))
    raw = (
        F.when(h % 5 == 0, F.concat(F.lit("Sure! Here it is:\n```json\n"), F.col("props"), F.lit("\n```")))
        .when(h % 5 == 1, F.regexp_replace(F.col("props"), r"\}$", ",}"))
        .when(h % 5 == 2, F.translate(F.col("props"), '"', "'"))
        .when(h % 5 == 3, F.expr("substring(props, 1, length(props) - 1)"))
        .otherwise(F.col("props"))
    )
    repaired = repair_json_udf()(raw)
    k = F.get_json_object(F.col("repaired"), "$.k").cast("bigint")
    return e.select(repaired.alias("repaired")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("repaired").isNotNull().cast("int")).alias("n_repaired"),
        F.sum(k).alias("sum_k"),
    )
