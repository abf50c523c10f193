"""ML-head operators (SURVEY §2.11): the reference trains MLP heads
on frozen sentence embeddings (faiss_3_10.py:149-215,
fai_combined_3_12.py:20-128). Spark-first equivalents:

- ``nearest_centroid_classifier``: deterministic 'linear head' — per-
  label mean embedding (the fit), cosine argmax (the predict). Fully
  SQL-expressible → oracle-checkable (plans/ml_plans.py).
- ``fit_mlp_head`` / ``fit_logreg_head``: real distributed training
  via Spark ML (MultilayerPerceptronClassifier mirrors the reference's
  Linear→ReLU→Linear head; LogisticRegression is the convex fallback)
  on an embedding ``array<float>`` column converted to ml Vectors.

Scale notes: centroid fit is one shuffle on (label, dim) with
map-side partial sums; Spark ML training broadcasts the model per
iteration and aggregates gradients tree-wise — both hold at 1000
executors. Prediction is a broadcast of the (tiny) model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_similarity


def _as_double(col: str) -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def centroid_fit(train: DataFrame, vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Per-label element-wise mean embedding. Exact-decimal partial
    sums (order-independent) + one final IEEE division keep the fit
    bit-reproducible across partitionings and engines."""
    comp = train.select(
        label_col, F.posexplode(_as_double(vec_col)).alias("dim", "val")
    ).groupBy(label_col, "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(28,9)")).cast("double") / F.count("*")
        ).alias("c")
    )
    return comp.groupBy(label_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "c"))), lambda s: s.getField("c")
        ).alias("centroid")
    )


def centroid_predict(
    test: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Cosine argmax over the (broadcast, tiny) centroid table; ties
    broken by ascending label so results are total-order stable."""
    cand = F.broadcast(
        centroids.select(F.col(label_col).alias("cand_label"), "centroid")
    )
    scored = test.select(id_col, label_col, _as_double(vec_col).alias("v")).crossJoin(cand)
    sim = F.round(cosine_similarity(F.col("v"), F.col("centroid")), 9)
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cand_label"))
    return (
        scored.select(id_col, label_col, "cand_label", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col(label_col).alias("true_label"), F.col("cand_label").alias("pred_label"))
    )


def _to_ml_vectors(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.select(
        array_to_vector(_as_double(vec_col)).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )


def fit_mlp_head(
    train: DataFrame,
    dim: int,
    n_classes: int,
    hidden: int = 16,
    vec_col: str = "embedding",
    label_col: str = "label",
    seed: int = 7,
):
    """Linear→ReLU→Linear head on frozen embeddings — the Spark ML
    twin of the reference MLPClassifier (faiss_3_10.py:174-185)."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier

    mlp = MultilayerPerceptronClassifier(
        layers=[dim, hidden, n_classes], seed=seed, maxIter=60, blockSize=64
    )
    return mlp.fit(_to_ml_vectors(train, vec_col, label_col))


def fit_logreg_head(
    train: DataFrame, vec_col: str = "embedding", label_col: str = "label"
):
    """Multinomial logistic head (convex → deterministic optimum)."""
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(maxIter=50, family="multinomial")
    return lr.fit(_to_ml_vectors(train, vec_col, label_col))


class CombinedHeadModel:
    """Two heads over ONE shared feature frame — the Spark-native
    counterpart of the reference CombinedClassifier (shared trunk +
    doc-type head + first-page head, fai_combined_3_12.py:54-128).
    Joint summed-CE backprop through a shared trunk is not Spark ML
    native; the engine keeps the shared-computation property that
    matters at scale (featurize ONCE, cache, train both heads from the
    same materialized frame) and the combined prediction contract
    (combined ``label:first_pg`` codec + per-head softmax confidence,
    predict_document fai_combined_3_12.py:320-356)."""

    def __init__(self, doc_model, fp_model):
        self.doc_model = doc_model
        self.fp_model = fp_model

    def predict(self, df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
        from pyspark.ml.functions import array_to_vector, vector_to_array

        prepared = df.select(id_col, array_to_vector(_as_double(vec_col)).alias("features"))
        doc = self.doc_model.transform(prepared).select(
            id_col,
            F.col("prediction").cast("int").alias("doc_pred"),
            F.array_max(vector_to_array("probability")).alias("doc_conf"),
        )
        fp = self.fp_model.transform(prepared).select(
            id_col,
            (F.col("prediction") == 1.0).alias("fp_pred"),
            F.array_max(vector_to_array("probability")).alias("fp_conf"),
        )
        combined = F.concat_ws(
            ":", F.col("doc_pred").cast("string"),
            F.when(F.col("fp_pred"), "True").otherwise("False"),
        )
        return doc.join(fp, id_col).select(
            id_col, "doc_pred", "fp_pred", combined.alias("combined_label"),
            "doc_conf", "fp_conf",
        )


def fit_combined_heads(
    train: DataFrame,
    dim: int,
    n_classes: int,
    vec_col: str = "embedding",
    doc_label_col: str = "label",
    fp_label_col: str = "first_pg",
    hidden: int = 16,
    seed: int = 7,
) -> CombinedHeadModel:
    """Featurize once → cache → train the doc-type MLP head and the
    binary first-page logistic head from the SAME materialized frame
    (the EmbeddingDataset precompute-once pattern,
    faiss_3_10.py:156-165, applied to both tasks)."""
    from pyspark.ml.classification import LogisticRegression, MultilayerPerceptronClassifier
    from pyspark.ml.functions import array_to_vector

    shared = train.select(
        array_to_vector(_as_double(vec_col)).alias("features"),
        F.col(doc_label_col).cast("double").alias("doc_label"),
        F.col(fp_label_col).cast("boolean").cast("double").alias("fp_label"),
    ).persist()
    try:
        shared.count()  # materialize before both fits branch from it
        mlp = MultilayerPerceptronClassifier(
            layers=[dim, hidden, n_classes], seed=seed, maxIter=60, blockSize=64,
            labelCol="doc_label",
        )
        doc_model = mlp.fit(shared)
        lr = LogisticRegression(maxIter=50, labelCol="fp_label")
        fp_model = lr.fit(shared)
    finally:
        shared.unpersist()
    return CombinedHeadModel(doc_model, fp_model)


def predict_head(model, df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """model.transform + probability/prediction columns
    (fai_combined_3_12.py:320-356 predict_document)."""
    from pyspark.ml.functions import array_to_vector

    prepared = df.select(
        id_col,
        F.col(label_col).alias("true_label"),
        array_to_vector(_as_double(vec_col)).alias("features"),
    )
    return model.transform(prepared).select(
        id_col, "true_label", F.col("prediction").cast("int").alias("pred_label")
    )
