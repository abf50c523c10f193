"""Calibration reporting beyond scalar ECE: the reliability-diagram
table plus ECE / MCE / Brier in one pass — the calibration baseline
deliverable the reference planned for its classifier confidences
(code/python/meeting_6_11.py: "compute raw ECE/MCE/Brier, and produce
a reliability diagram"; scalar ECE itself: README.md:4-17, implemented
as eval_plans.ece_calibration).

Scale: identical shape to ece_calibration — one hash-agg over the
scored corpus down to 10 bin rows, then a 10-row aggregate for the
summary metrics. The Brier sum crosses every document, so the
per-doc squared error is carried as fixed-scale DECIMAL to keep the
grand total order-independent."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64
from .eval_plans import _classified, _d_classified, _d_hash64
from .registry import query


@query(
    "calibration_report",
    oracle=f"""
    WITH clf AS ({_d_classified()}),
    scored AS (
      SELECT CASE WHEN true_label = pred_label THEN 1 ELSE 0 END AS correct,
             0.5 + CAST({_d_hash64("'conf:' || CAST(doc_id AS VARCHAR)")} % 500 AS DOUBLE) / 1000 AS confidence
      FROM clf
    ),
    per_bin AS (
      SELECT LEAST(CAST(floor(confidence * 10) AS INTEGER), 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(confidence) AS sum_conf,
             SUM(CAST(correct AS DOUBLE)) AS sum_correct,
             SUM(CAST(round((confidence - correct) * (confidence - correct), 6)
                      AS DECIMAL(12,6))) AS sum_sq
      FROM scored GROUP BY bin
    ),
    bins AS (
      SELECT CAST(bin AS VARCHAR) AS bin, n,
             round(sum_conf / n, 6) AS avg_conf,
             round(sum_correct / n, 6) AS avg_acc,
             round(abs(sum_conf / n - sum_correct / n), 6) AS value,
             abs(sum_conf / n - sum_correct / n) * n AS gap_w,
             sum_conf, sum_correct, sum_sq
      FROM per_bin
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n, SUM(sum_conf) AS sc,
             SUM(sum_correct) AS scor, SUM(gap_w) AS gw,
             MAX(value) AS mce, CAST(SUM(sum_sq) AS DOUBLE) AS ssq
      FROM bins
    )
    SELECT bin, n, avg_conf, avg_acc, value FROM bins
    UNION ALL
    SELECT 'ECE', n, round(sc / n, 6), round(scor / n, 6), round(gw / n, 6) FROM tot
    UNION ALL
    SELECT 'MCE', n, round(sc / n, 6), round(scor / n, 6), mce FROM tot
    UNION ALL
    SELECT 'BRIER', n, round(sc / n, 6), round(scor / n, 6), round(ssq / n, 6) FROM tot
    ORDER BY bin
    """,
)
def calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE + MCE + Brier over the classified
    corpus (deterministic hash confidences in [0.5, 1), same scenario
    as ``ece_calibration``). Ten bin rows carry (n, avg_conf, avg_acc,
    |gap|); the ECE row weights gaps by bin mass, MCE takes the worst
    bin, Brier is the mean squared confidence error — the three
    numbers a temperature-scaling experiment starts from."""
    clf = _classified(spark, sf_dir)
    conf = (
        F.lit(0.5)
        + (hash64(F.concat(F.lit("conf:"), F.col("doc_id").cast("string"))) % 500).cast("double")
        / 1000
    )
    correct = (F.col("true_label") == F.col("pred_label")).cast("int")
    scored = clf.select(correct.alias("correct"), conf.alias("confidence"))
    sq = F.round(
        (F.col("confidence") - F.col("correct")) * (F.col("confidence") - F.col("correct")), 6
    ).cast("decimal(12,6)")
    per_bin = (
        scored.groupBy(
            F.least(F.floor(F.col("confidence") * 10).cast("int"), F.lit(9)).alias("bin")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("confidence").alias("sum_conf"),
            F.sum(F.col("correct").cast("double")).alias("sum_correct"),
            F.sum(sq).alias("sum_sq"),
        )
    )
    gap = F.abs(F.col("sum_conf") / F.col("n") - F.col("sum_correct") / F.col("n"))
    bins = per_bin.select(
        F.col("bin").cast("string").alias("bin"),
        "n",
        F.round(F.col("sum_conf") / F.col("n"), 6).alias("avg_conf"),
        F.round(F.col("sum_correct") / F.col("n"), 6).alias("avg_acc"),
        F.round(gap, 6).alias("value"),
        (gap * F.col("n")).alias("gap_w"),
        "sum_conf",
        "sum_correct",
        "sum_sq",
    )
    tot = bins.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sum_conf").alias("sc"),
        F.sum("sum_correct").alias("scor"),
        F.sum("gap_w").alias("gw"),
        F.max("value").alias("mce"),
        F.sum("sum_sq").cast("double").alias("ssq"),
    )
    summary = tot.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("ECE").alias("bin"),
                    F.col("n"),
                    F.round(F.col("sc") / F.col("n"), 6).alias("avg_conf"),
                    F.round(F.col("scor") / F.col("n"), 6).alias("avg_acc"),
                    F.round(F.col("gw") / F.col("n"), 6).alias("value"),
                ),
                F.struct(
                    F.lit("MCE").alias("bin"),
                    F.col("n"),
                    F.round(F.col("sc") / F.col("n"), 6).alias("avg_conf"),
                    F.round(F.col("scor") / F.col("n"), 6).alias("avg_acc"),
                    F.col("mce").alias("value"),
                ),
                F.struct(
                    F.lit("BRIER").alias("bin"),
                    F.col("n"),
                    F.round(F.col("sc") / F.col("n"), 6).alias("avg_conf"),
                    F.round(F.col("scor") / F.col("n"), 6).alias("avg_acc"),
                    F.round(F.col("ssq") / F.col("n"), 6).alias("value"),
                ),
            )
        ).alias("s")
    ).select("s.bin", "s.n", "s.avg_conf", "s.avg_acc", "s.value")
    return (
        bins.select("bin", "n", "avg_conf", "avg_acc", "value")
        .unionByName(summary)
        .orderBy("bin")
    )
