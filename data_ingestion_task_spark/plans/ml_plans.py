"""ML-head plans (SURVEY §2.11): deterministic nearest-centroid
classifier over the frozen ``embeddings`` table — fit (per-label mean
embedding, exact-decimal partial sums) and predict (cosine argmax,
label-asc tie-break) — evaluated per class. The hash-residue
train/test split (hash64('ml:'||vec_id) % 5 == 0 → test) is
group-free and portable, so the DuckDB oracle reproduces fit +
predict + eval bit-for-bit.

Iterative heads (MLP / logistic regression via Spark ML) live in
operators/ml.py with pytest coverage — non-convex training isn't
SQL-reproducible, so it stays off the oracle surface by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64
from ..operators.ml import centroid_fit, centroid_predict
from ..sources.tables import load_table
from .registry import query

_DIM = 64


def _d_centroid_head(suffix: str, label_expr: str) -> str:
    """DuckDB centroid fit+predict CTEs over ``base`` (vec_id, v, h)
    for one head whose training label is ``label_expr``."""
    return f"""
    comp_{suffix} AS (
      SELECT {label_expr} AS lab, d,
             CAST(SUM(CAST(v[d] AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS c
      FROM base, generate_series(1, {_DIM}) AS g(d)
      WHERE h <> 0 GROUP BY 1, d
    ),
    cent_{suffix} AS (SELECT lab AS cand, list(c ORDER BY d) AS cv FROM comp_{suffix} GROUP BY lab),
    top_{suffix} AS (
      SELECT vec_id, cand,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY round(list_dot_product(v, cv)
                              / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 9) DESC,
                        cand) AS rn
      FROM (SELECT * FROM base WHERE h = 0) b CROSS JOIN cent_{suffix}
    ),
    pred_{suffix} AS (SELECT vec_id, cand AS pred FROM top_{suffix} WHERE rn = 1)"""


@query(
    "combined_head_eval",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, label, CASE WHEN vec_id % 3 = 0 THEN 'True' ELSE 'False' END AS first_pg,
             CAST(embedding AS DOUBLE[]) AS v,
             ('0x' || substr(md5('cmb:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 5 AS h
      FROM embeddings
    ),
    {_d_centroid_head("doc", "CAST(label AS VARCHAR)")},
    {_d_centroid_head("fp", "first_pg")},
    joined AS (
      SELECT b.vec_id,
             CAST(b.label AS VARCHAR) || ':' || b.first_pg AS actual,
             d.pred AS doc_pred, f.pred AS fp_pred,
             d.pred || ':' || f.pred AS predicted
      FROM (SELECT * FROM base WHERE h = 0) b
      JOIN pred_doc d USING (vec_id) JOIN pred_fp f USING (vec_id)
    )
    SELECT actual AS combined_label,
           COUNT(*) AS n_test,
           CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN doc_pred = split_part(actual, ':', 1) THEN 1 ELSE 0 END) AS BIGINT) AS doc_correct,
           CAST(SUM(CASE WHEN fp_pred = split_part(actual, ':', 2) THEN 1 ELSE 0 END) AS BIGINT) AS fp_correct,
           round(CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM joined GROUP BY actual ORDER BY combined_label
    """,
)
def combined_head_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined two-head evaluation (fai_combined_3_12.py:196-228
    combined-label report; combined_fai_3_13.py:280-384 eval): ONE
    shared feature frame feeds a doc-type head and a first-page head
    (deterministic centroid heads — the oracle-checkable stand-in for
    the Spark ML pair in operators/ml.fit_combined_heads, which pytest
    covers); predictions re-join on vec_id into the ``label:first_pg``
    combined codec and are scored per combined label.

    first_pg ground truth is the deterministic vec_id % 3 flag, kept
    as the reference's string-typed 'True'/'False' booleans
    (rag_3_3.py:667-668)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("string").alias("label"),
        F.when(F.col("vec_id") % 3 == 0, "True").otherwise("False").alias("first_pg"),
        "embedding",
    )
    h = hash64(F.concat(F.lit("cmb:"), F.col("vec_id").cast("string"))) % 5
    train = e.filter(h != 0)
    test = e.filter(h == 0)

    doc_preds = centroid_predict(test, centroid_fit(train, label_col="label"))
    fp_preds = centroid_predict(
        test.select("vec_id", F.col("first_pg").alias("label"), "embedding"),
        centroid_fit(train.select(F.col("first_pg").alias("label"), "embedding")),
    ).select("vec_id", F.col("pred_label").alias("fp_pred"))

    joined = (
        doc_preds.select(
            "vec_id", F.col("true_label").alias("doc_true"), F.col("pred_label").alias("doc_pred")
        )
        .join(fp_preds, "vec_id")
        .join(test.select("vec_id", "first_pg"), "vec_id")
    )
    actual = F.concat_ws(":", "doc_true", "first_pg")
    predicted = F.concat_ws(":", "doc_pred", "fp_pred")
    ok = (predicted == actual).cast("bigint")
    doc_ok = (F.col("doc_pred") == F.col("doc_true")).cast("bigint")
    fp_ok = (F.col("fp_pred") == F.col("first_pg")).cast("bigint")
    return (
        joined.groupBy(actual.alias("combined_label"))
        .agg(
            F.count("*").alias("n_test"),
            F.sum(ok).alias("n_correct"),
            F.sum(doc_ok).alias("doc_correct"),
            F.sum(fp_ok).alias("fp_correct"),
            F.round(F.sum(ok).cast("double") / F.count("*"), 6).alias("accuracy"),
        )
        .orderBy("combined_label")
    )


@query(
    "centroid_classifier_eval",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             ('0x' || substr(md5('ml:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 5 AS h
      FROM embeddings
    ),
    comp AS (
      SELECT label, d,
             CAST(SUM(CAST(v[d] AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS c
      FROM base, generate_series(1, {_DIM}) AS g(d)
      WHERE h <> 0 GROUP BY label, d
    ),
    cent AS (SELECT label AS cand_label, list(c ORDER BY d) AS cv FROM comp GROUP BY label),
    scored AS (
      SELECT b.vec_id, b.label AS true_label, cent.cand_label,
             round(list_dot_product(b.v, cent.cv)
                   / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(cent.cv, cent.cv))), 9) AS sim
      FROM base b CROSS JOIN cent WHERE b.h = 0
    ),
    top AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cand_label) AS rn
      FROM scored
    )
    SELECT true_label AS label,
           COUNT(*) AS n_test,
           CAST(SUM(CASE WHEN cand_label = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(CAST(SUM(CASE WHEN cand_label = true_label THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM top WHERE rn = 1
    GROUP BY true_label ORDER BY label
    """,
)
def centroid_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit per-label centroids on the train split, cosine-argmax
    predict the test split, report per-class accuracy — the
    deterministic stand-in for the reference's MLP-on-frozen-
    embeddings heads (faiss_3_10.py:149-215), with the fit/predict
    machinery shared with operators/ml.py."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    h = hash64(F.concat(F.lit("ml:"), F.col("vec_id").cast("string"))) % 5
    train = e.filter(h != 0)
    test = e.filter(h == 0)
    centroids = centroid_fit(train)
    preds = centroid_predict(test, centroids)
    correct = (F.col("pred_label") == F.col("true_label")).cast("int")
    return (
        preds.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count("*").alias("n_test"),
            F.sum(correct).alias("n_correct"),
            F.round(F.sum(correct).cast("double") / F.count("*"), 6).alias("accuracy"),
        )
        .orderBy("label")
    )
