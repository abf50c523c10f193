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
