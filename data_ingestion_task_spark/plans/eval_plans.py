"""Evaluation / metrics plans (SURVEY §2.12) — first-class operators:
field-accuracy rollup, confusion matrix, per-class P/R/F1 report,
validation-status tagging, ECE calibration bins, classifier agreement,
doc-level all-pages-correct accuracy, correlation sweep, sample-size
calculator.

The testdata has no prediction columns, so each plan synthesizes a
deterministic prediction scenario inside the query from the portable
60-bit md5 hash (``functions.text.hash64`` ↔ DuckDB
``('0x'||substr(md5(s),1,15))::BIGINT``): a classifier that mislabels
a hash-selected ~20% of documents by shifting the true language one
step around a fixed ring, and an extractor whose per-field values go
missing / spurious / wrong on disjoint hash residues. Both engines
regenerate the exact same scenario bit-for-bit, making every metric
hash-checkable.

Scale notes (100 TB): every metric here is one shuffle (a groupBy on
a low-cardinality key) over a narrow projection; rollup/grouping-sets
reuse the same exchange. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64
from ..sources.tables import load_table
from .registry import query

LANG_RING = ["de", "en", "es", "fr", "zh"]  # sorted; pred shifts one step

# ---------------------------------------------------------------------------
# Shared scenario builders (Spark + DuckDB twins)
# ---------------------------------------------------------------------------


def _d_hash64(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _ring_case(col: str) -> str:
    arms = " ".join(
        f"WHEN '{lang}' THEN '{LANG_RING[(i + 1) % len(LANG_RING)]}'"
        for i, lang in enumerate(LANG_RING)
    )
    return f"CASE {col} {arms} END"


def _ring_shift(col: Column) -> Column:
    out = F.lit(None).cast("string")
    for i, lang in enumerate(LANG_RING):
        out = F.when(col == lang, F.lit(LANG_RING[(i + 1) % len(LANG_RING)])).otherwise(out)
    return out


def _classified(spark: SparkSession, sf_dir: str, salt: str = "clf", mod: int = 5) -> DataFrame:
    """documents + (true_label, pred_label): mislabel (ring-shift) the
    rows where hash64('{salt}:'||doc_id) % mod == 0."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", F.col("lang").alias("true_label"))
    h = hash64(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string")))
    pred = F.when(h % mod == 0, _ring_shift(F.col("true_label"))).otherwise(F.col("true_label"))
    return d.withColumn("pred_label", pred)


def _d_classified(salt: str = "clf", mod: int = 5) -> str:
    h = _d_hash64(f"'{salt}:' || CAST(doc_id AS VARCHAR)")
    return f"""
      SELECT doc_id, lang AS true_label,
             CASE WHEN {h} % {mod} = 0 THEN {_ring_case('lang')} ELSE lang END AS pred_label
      FROM documents
    """


# Long-form extraction results: 3 fields per doc; per (doc, field) the
# hash residue decides missing GT (spurious pred), missing pred, or a
# wrong value — mirrors post_pro_8_13.py / metrics_8_6.py long form.
_FIELDS = ["lang", "source", "len_bucket"]


def _extraction_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        (F.col("n_chars") - F.col("n_chars") % 500).cast("string").alias("len_bucket"),
    )
    long = d.select(
        "doc_id",
        F.expr(
            "stack(3, 'lang', lang, 'source', source, 'len_bucket', len_bucket)"
        ).alias("field", "value"),
    )
    h = hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("field")))
    gt = F.when(h % 13 == 1, F.lit(None)).otherwise(F.col("value"))
    pred = (
        F.when(h % 13 == 2, F.lit(None))
        .when(h % 10 == 0, F.concat(F.lit("XX_"), F.col("value")))
        .otherwise(F.col("value"))
    )
    return long.select(
        "doc_id", "field", gt.alias("ground_truth"), pred.alias("predicted_value")
    )


_D_EXTRACTION_LONG = f"""
      WITH base AS (
        SELECT doc_id, lang, source,
               CAST(n_chars - n_chars % 500 AS VARCHAR) AS len_bucket
        FROM documents
      ), long AS (
        SELECT doc_id, 'lang' AS field, lang AS value FROM base
        UNION ALL SELECT doc_id, 'source', source FROM base
        UNION ALL SELECT doc_id, 'len_bucket', len_bucket FROM base
      ), scenario AS (
        SELECT doc_id, field,
               CASE WHEN {_d_hash64("CAST(doc_id AS VARCHAR) || ':' || field")} % 13 = 1
                    THEN NULL ELSE value END AS ground_truth,
               CASE WHEN {_d_hash64("CAST(doc_id AS VARCHAR) || ':' || field")} % 13 = 2
                    THEN NULL
                    WHEN {_d_hash64("CAST(doc_id AS VARCHAR) || ':' || field")} % 10 = 0
                    THEN 'XX_' || value
                    ELSE value END AS predicted_value
        FROM long
      )
"""


# ---------------------------------------------------------------------------
# Field accuracy rollup (metrics_8_6.py get_metrics_table + Overall)
# ---------------------------------------------------------------------------


@query(
    "field_accuracy_rollup",
    oracle=_D_EXTRACTION_LONG
    + """
    SELECT COALESCE(field, 'Overall') AS field,
           CAST(SUM(CASE WHEN ground_truth IS NOT NULL AND predicted_value IS NOT NULL
                              AND trim(ground_truth) = trim(predicted_value)
                         THEN 1 ELSE 0 END) AS BIGINT) AS correct,
           COUNT(*) AS support,
           round(CAST(SUM(CASE WHEN ground_truth IS NOT NULL AND predicted_value IS NOT NULL
                                    AND trim(ground_truth) = trim(predicted_value)
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 100, 6) AS accuracy_pct
    FROM scenario
    GROUP BY ROLLUP(field)
    ORDER BY field
    """,
)
def field_accuracy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-field correct/support/accuracy% with an appended Overall row
    (metrics_8_6.py:36-64) — natural ``rollup`` use: one exchange
    serves both grouping sets."""
    long = _extraction_long(spark, sf_dir)
    correct = (
        F.col("ground_truth").isNotNull()
        & F.col("predicted_value").isNotNull()
        & (F.trim("ground_truth") == F.trim("predicted_value"))
    ).cast("bigint")
    return (
        long.select("field", correct.alias("c"))
        .rollup("field")
        .agg(
            F.sum("c").alias("correct"),
            F.count("*").alias("support"),
            F.round(F.sum("c").cast("double") / F.count("*") * 100, 6).alias("accuracy_pct"),
        )
        .select(F.coalesce("field", F.lit("Overall")).alias("field"), "correct", "support", "accuracy_pct")
        .orderBy("field")
    )


# ---------------------------------------------------------------------------
# Confusion matrix (rag_2_26_1.py crosstab)
# ---------------------------------------------------------------------------


@query(
    "confusion_matrix",
    oracle=f"""
    WITH clf AS ({_d_classified()})
    SELECT true_label,
           {", ".join(f"CAST(SUM(CASE WHEN pred_label = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS pred_{p}" for p in LANG_RING)}
    FROM clf GROUP BY true_label ORDER BY true_label
    """,
)
def confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.crosstab(actual, predicted) (rag_2_26_1.py:171-182) as
    groupBy(actual).pivot(predicted).count with a FIXED label domain
    so the schema is deterministic at any scale."""
    clf = _classified(spark, sf_dir)
    out = (
        clf.groupBy("true_label")
        .pivot("pred_label", LANG_RING)
        .count()
        .na.fill(0, LANG_RING)
    )
    return out.select(
        "true_label", *[F.col(p).cast("bigint").alias(f"pred_{p}") for p in LANG_RING]
    ).orderBy("true_label")


# ---------------------------------------------------------------------------
# Per-class precision / recall / F1 / support (classification_report)
# ---------------------------------------------------------------------------


@query(
    "classification_report",
    oracle=f"""
    WITH clf AS ({_d_classified()}),
    tp AS (SELECT true_label AS label, COUNT(*) AS tp FROM clf
           WHERE true_label = pred_label GROUP BY true_label),
    byt AS (SELECT true_label AS label, COUNT(*) AS support FROM clf GROUP BY true_label),
    byp AS (SELECT pred_label AS label, COUNT(*) AS predicted FROM clf GROUP BY pred_label),
    per AS (
      SELECT byt.label,
             COALESCE(tp.tp, 0) AS tp, byt.support, COALESCE(byp.predicted, 0) AS predicted,
             CAST(COALESCE(tp.tp, 0) AS DOUBLE) / NULLIF(COALESCE(byp.predicted, 0), 0) AS precision,
             CAST(COALESCE(tp.tp, 0) AS DOUBLE) / byt.support AS recall
      FROM byt LEFT JOIN tp USING (label) LEFT JOIN byp USING (label)
    )
    SELECT label,
           round(COALESCE(precision, 0), 6) AS precision,
           round(recall, 6) AS recall,
           round(COALESCE(2 * precision * recall / NULLIF(precision + recall, 0), 0), 6) AS f1,
           support
    FROM per ORDER BY label
    """,
)
def classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sklearn classification_report re-expressed as pure aggregations
    (Faiss_2_10.py:552-559, rag_2_26_1.py:218-237): TP / per-true
    support / per-pred counts joined into P/R/F1 per label."""
    clf = _classified(spark, sf_dir)
    tp = (
        clf.filter(F.col("true_label") == F.col("pred_label"))
        .groupBy(F.col("true_label").alias("label"))
        .agg(F.count("*").alias("tp"))
    )
    byt = clf.groupBy(F.col("true_label").alias("label")).agg(F.count("*").alias("support"))
    byp = clf.groupBy(F.col("pred_label").alias("label")).agg(F.count("*").alias("predicted"))
    per = (
        byt.join(tp, "label", "left")
        .join(byp, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            "support",
            F.coalesce("predicted", F.lit(0)).alias("predicted"),
        )
    )
    precision = F.col("tp").cast("double") / F.nullif(F.col("predicted"), F.lit(0))
    recall = F.col("tp").cast("double") / F.col("support")
    f1 = 2 * precision * recall / F.nullif(precision + recall, F.lit(0))
    return (
        per.select(
            "label",
            F.round(F.coalesce(precision, F.lit(0.0)), 6).alias("precision"),
            F.round(recall, 6).alias("recall"),
            F.round(F.coalesce(f1, F.lit(0.0)), 6).alias("f1"),
            "support",
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Validation status tagging (ext_3_4.py:8-33)
# ---------------------------------------------------------------------------


@query(
    "validation_status_counts",
    oracle=_D_EXTRACTION_LONG
    + """
    , tagged AS (
      SELECT field,
             CASE WHEN ground_truth IS NULL AND predicted_value IS NULL THEN 'MATCH'
                  WHEN ground_truth IS NULL THEN 'FALSE_POSITIVE'
                  WHEN predicted_value IS NULL THEN 'MISSING'
                  WHEN trim(ground_truth) = trim(predicted_value) THEN 'MATCH'
                  ELSE 'MISMATCH' END AS status
      FROM scenario
    )
    SELECT field, status, COUNT(*) AS n,
           round(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY field) * 100, 6) AS pct
    FROM tagged GROUP BY field, status ORDER BY field, status
    """,
)
def validation_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH / MISSING / FALSE_POSITIVE / MISMATCH tagging per
    extraction row + per-field composition % (ext_3_4.py:8-33) — a
    ``when`` cascade, one groupBy, one window."""
    from pyspark.sql.window import Window

    long = _extraction_long(spark, sf_dir)
    status = (
        F.when(F.col("ground_truth").isNull() & F.col("predicted_value").isNull(), "MATCH")
        .when(F.col("ground_truth").isNull(), "FALSE_POSITIVE")
        .when(F.col("predicted_value").isNull(), "MISSING")
        .when(F.trim("ground_truth") == F.trim("predicted_value"), "MATCH")
        .otherwise("MISMATCH")
    )
    counts = long.select("field", status.alias("status")).groupBy("field", "status").agg(
        F.count("*").alias("n")
    )
    total = F.sum("n").over(Window.partitionBy("field"))
    return (
        counts.withColumn("pct", F.round(F.col("n").cast("double") / total * 100, 6))
        .orderBy("field", "status")
    )


# ---------------------------------------------------------------------------
# ECE calibration (README.md compute_ece)
# ---------------------------------------------------------------------------


@query(
    "ece_calibration",
    oracle=f"""
    WITH clf AS ({_d_classified()}),
    scored AS (
      SELECT doc_id,
             CASE WHEN true_label = pred_label THEN 1 ELSE 0 END AS correct,
             0.5 + CAST({_d_hash64("'conf:' || CAST(doc_id AS VARCHAR)")} % 500 AS DOUBLE) / 1000 AS confidence
      FROM clf
    ),
    binned AS (
      SELECT LEAST(CAST(floor(confidence * 10) AS INTEGER), 9) AS bin, correct, confidence
      FROM scored
    )
    SELECT COALESCE(CAST(bin AS VARCHAR), 'ECE') AS bin,
           COUNT(*) AS n,
           round(CAST(SUM(confidence) AS DOUBLE) / COUNT(*), 6) AS avg_conf,
           round(CAST(SUM(correct) AS DOUBLE) / COUNT(*), 6) AS avg_acc,
           round(SUM(abs_gap_w), 6) AS ece_contrib
    FROM (
      SELECT bin, correct, confidence,
             abs(AVG(confidence) OVER (PARTITION BY bin) - AVG(CAST(correct AS DOUBLE)) OVER (PARTITION BY bin))
               / (SELECT COUNT(*) FROM binned) AS abs_gap_w
      FROM binned
    )
    GROUP BY ROLLUP(bin)
    ORDER BY bin
    """,
)
def ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error, 10 bins (README.md:4-17
    compute_ece): per-bin avg confidence vs avg accuracy; the rollup
    row sums |gap|·(n_bin/N) into the scalar ECE. Confidence is a
    deterministic hash-derived pseudo-probability in [0.5, 1)."""
    from pyspark.sql.window import Window

    clf = _classified(spark, sf_dir)
    conf = (
        F.lit(0.5)
        + (hash64(F.concat(F.lit("conf:"), F.col("doc_id").cast("string"))) % 500).cast("double")
        / 1000
    )
    scored = clf.select(
        (F.col("true_label") == F.col("pred_label")).cast("int").alias("correct"),
        conf.alias("confidence"),
    )
    binned = scored.withColumn(
        "bin", F.least(F.floor(F.col("confidence") * 10).cast("int"), F.lit(9))
    )
    # Single pass: partial-agg to 10 bin rows first (one shuffle over the
    # data), THEN take the grand total via a window over those 10 rows —
    # no driver-side count() rerunning the scenario subtree.
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("confidence").alias("sum_conf"),
        F.sum(F.col("correct").cast("double")).alias("sum_correct"),
    )
    w_all = Window.partitionBy()  # 10 rows — single-partition window is free here
    contrib_raw = (
        F.abs(F.col("sum_conf") / F.col("n") - F.col("sum_correct") / F.col("n"))
        * F.col("n")
        / F.sum("n").over(w_all)
    )
    return (
        per_bin.withColumn("contrib_raw", contrib_raw)
        .rollup("bin")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_conf").alias("sc"),
            F.sum("sum_correct").alias("scor"),
            F.sum("contrib_raw").alias("cr"),
        )
        .select(
            F.coalesce(F.col("bin").cast("string"), F.lit("ECE")).alias("bin"),
            "n",
            F.round(F.col("sc") / F.col("n"), 6).alias("avg_conf"),
            F.round(F.col("scor") / F.col("n"), 6).alias("avg_acc"),
            F.round("cr", 6).alias("ece_contrib"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Classifier agreement (rag_6.py:108-128)
# ---------------------------------------------------------------------------


@query(
    "classifier_agreement",
    oracle=f"""
    WITH a AS ({_d_classified('clf', 5)}),
         b AS ({_d_classified('clf2', 7)}),
         c AS ({_d_classified('clf3', 3)}),
    j AS (
      SELECT a.doc_id, a.pred_label AS p1, b.pred_label AS p2, c.pred_label AS p3
      FROM a JOIN b USING (doc_id) JOIN c ON a.doc_id = c.doc_id
    )
    SELECT COUNT(*) AS n,
           round(CAST(SUM(CASE WHEN p1 = p2 AND p2 = p3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS all3_agree,
           round(CAST(SUM(CASE WHEN p1 = p2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS agree_12,
           round(CAST(SUM(CASE WHEN p1 = p3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS agree_13,
           round(CAST(SUM(CASE WHEN p2 = p3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS agree_23
    FROM j
    """,
)
def classifier_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement % across 3 classifier outputs (rag_6.py:108-128):
    three hash-salted scenario classifiers joined on doc_id, pairwise
    and all-3 agreement as avg of boolean casts."""
    a = _classified(spark, sf_dir, "clf", 5).withColumnRenamed("pred_label", "p1")
    b = _classified(spark, sf_dir, "clf2", 7).select("doc_id", F.col("pred_label").alias("p2"))
    c = _classified(spark, sf_dir, "clf3", 3).select("doc_id", F.col("pred_label").alias("p3"))
    j = a.join(b, "doc_id").join(c, "doc_id")

    def rate(cond: Column) -> Column:
        return F.round(F.sum(cond.cast("int")).cast("double") / F.count("*"), 6)

    return j.agg(
        F.count("*").alias("n"),
        rate((F.col("p1") == F.col("p2")) & (F.col("p2") == F.col("p3"))).alias("all3_agree"),
        rate(F.col("p1") == F.col("p2")).alias("agree_12"),
        rate(F.col("p1") == F.col("p3")).alias("agree_13"),
        rate(F.col("p2") == F.col("p3")).alias("agree_23"),
    )


# ---------------------------------------------------------------------------
# Doc-level all-pages-correct accuracy (Faiss_2_10.py:537-550)
# ---------------------------------------------------------------------------


@query(
    "doc_level_accuracy",
    oracle=f"""
    WITH pages AS (
      SELECT l_orderkey AS fn, l_linenumber AS page,
             CASE WHEN {_d_hash64("CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % 10 <> 0
                  THEN 1 ELSE 0 END AS page_correct
      FROM lineitem
    ),
    docs AS (
      SELECT fn, MIN(page_correct) AS doc_correct, COUNT(*) AS n_pages
      FROM pages GROUP BY fn
    )
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(doc_correct) AS BIGINT) AS n_all_correct,
           round(CAST(SUM(doc_correct) AS DOUBLE) / COUNT(*), 6) AS doc_accuracy,
           round(CAST(SUM(n_pages) AS DOUBLE) / COUNT(*), 6) AS avg_pages
    FROM docs
    """,
)
def doc_level_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level accuracy = every page of the doc classified correctly
    (Faiss_2_10.py:537-550): per-page correctness flag →
    groupBy(fn).min → avg. lineitem plays the page table (order =
    doc, linenumber = page)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("fn"), F.col("l_linenumber").alias("page")
    )
    h = hash64(
        F.concat(F.col("fn").cast("string"), F.lit(":"), F.col("page").cast("string"))
    )
    pages = li.withColumn("page_correct", (h % 10 != 0).cast("int"))
    docs = pages.groupBy("fn").agg(
        F.min("page_correct").alias("doc_correct"), F.count("*").alias("n_pages")
    )
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_correct").cast("bigint").alias("n_all_correct"),
        F.round(F.sum("doc_correct").cast("double") / F.count("*"), 6).alias("doc_accuracy"),
        F.round(F.sum("n_pages").cast("double") / F.count("*"), 6).alias("avg_pages"),
    )


# ---------------------------------------------------------------------------
# Correlation sweep (gra_4_24.py:46-135)
# ---------------------------------------------------------------------------

_CORR_METRICS = ["l_quantity", "l_discount", "l_tax", "l_partkey"]


@query(
    "correlation_sweep",
    oracle=f"""
    {" UNION ALL ".join(
        f"SELECT '{m}' AS metric, round(corr({m}, l_extendedprice), 6) AS corr_vs_price,"
        f" round(abs(corr({m}, l_extendedprice)), 6) AS abs_corr FROM lineitem"
        for m in _CORR_METRICS
    )}
    ORDER BY abs_corr DESC, metric
    """,
)
def correlation_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of size metrics vs a response variable,
    ranked by |corr| (gra_4_24.py:46-135). One aggregate pass computes
    all pairs; no driver loop."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        *[F.corr(m, "l_extendedprice").alias(m) for m in _CORR_METRICS]
    )
    long = row.select(
        F.expr(
            "stack({}, {})".format(
                len(_CORR_METRICS),
                ", ".join(f"'{m}', {m}" for m in _CORR_METRICS),
            )
        ).alias("metric", "c")
    )
    return (
        long.select(
            "metric",
            F.round("c", 6).alias("corr_vs_price"),
            F.round(F.abs("c"), 6).alias("abs_corr"),
        )
        .orderBy(F.desc("abs_corr"), "metric")
    )


# ---------------------------------------------------------------------------
# Sample-size calculator (email_717.py:14-92, doc_8_14:14-64)
# ---------------------------------------------------------------------------


@query(
    "sample_size_calc",
    oracle=f"""
    WITH clf AS ({_d_classified()}),
    acc AS (
      SELECT CAST(SUM(CASE WHEN true_label = pred_label THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS p, COUNT(*) AS n
      FROM clf
    )
    SELECT round(p, 6) AS observed_p,
           n,
           CAST(ceil(1.96 * 1.96 * p * (1 - p) / (0.05 * 0.05)) AS BIGINT) AS n_required_95_5,
           CAST(ceil(1.96 * 1.96 * p * (1 - p) / (0.03 * 0.03)) AS BIGINT) AS n_required_95_3,
           round(1.96 * sqrt(p * (1 - p) / n), 6) AS margin_at_n
    FROM acc
    """,
)
def sample_size_calc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n = Z²·p·(1−p)/E² sample-size justification (email_717.py:14-92,
    validation_confirmation_feedback.py:26-74) driven by the observed
    scenario accuracy: required n at ±5% and ±3%, and the margin of
    error the actual n delivers."""
    clf = _classified(spark, sf_dir)
    acc = clf.agg(
        (
            F.sum((F.col("true_label") == F.col("pred_label")).cast("int")).cast("double")
            / F.count("*")
        ).alias("p"),
        F.count("*").alias("n"),
    )
    p, n = F.col("p"), F.col("n")
    z2 = 1.96 * 1.96
    return acc.select(
        F.round(p, 6).alias("observed_p"),
        n.alias("n"),
        F.ceil(F.lit(z2) * p * (1 - p) / F.lit(0.05 * 0.05)).cast("bigint").alias("n_required_95_5"),
        F.ceil(F.lit(z2) * p * (1 - p) / F.lit(0.03 * 0.03)).cast("bigint").alias("n_required_95_3"),
        F.round(F.lit(1.96) * F.sqrt(p * (1 - p) / n), 6).alias("margin_at_n"),
    )
