"""Combined multi-task head tests (SURVEY §2.11 CombinedClassifier,
fai_combined_3_12.py:54-128): Spark ML two-head training over one
shared cached feature frame + the combined-label prediction contract."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_ingestion_task_spark.operators.ml import fit_combined_heads
from data_ingestion_task_spark.sources.tables import load_table


def test_combined_heads_train_and_predict(spark, sf_dir):
    # Labels derived FROM the embedding (sign of dims 1-2) so both tasks
    # are learnable — the sf0.001 table's real labels have no linearly
    # separable structure, which would test luck, not training.
    sgn1 = (F.element_at("embedding", 1) > 0).cast("int")
    sgn2 = (F.element_at("embedding", 2) > 0).cast("int")
    e = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("label", sgn1 * 2 + sgn2)
        .withColumn("first_pg", F.element_at("embedding", 3) > 0)
    )
    n_classes = 4
    train = e.filter(F.col("vec_id") % 5 != 0)
    test = e.filter(F.col("vec_id") % 5 == 0)

    model = fit_combined_heads(train, dim=64, n_classes=n_classes)
    preds = model.predict(test)
    rows = preds.collect()
    assert len(rows) == test.count() > 0

    pat = re.compile(r"^\d+:(True|False)$")
    for r in rows:
        # predict_document contract: combined codec + per-head softmax conf
        assert pat.match(r["combined_label"]), r["combined_label"]
        assert r["combined_label"] == f"{r['doc_pred']}:{r['fp_pred']}"
        assert 0.0 < r["doc_conf"] <= 1.0 and 0.0 < r["fp_conf"] <= 1.0

    # both heads beat chance on the learnable synthetic embeddings
    gt = test.select("vec_id", F.col("label").alias("t_doc"), F.col("first_pg").alias("t_fp"))
    scored = preds.join(gt, "vec_id")
    doc_acc = scored.agg(
        F.avg((F.col("doc_pred") == F.col("t_doc")).cast("double"))
    ).collect()[0][0]
    fp_acc = scored.agg(
        F.avg((F.col("fp_pred") == F.col("t_fp")).cast("double"))
    ).collect()[0][0]
    assert doc_acc > 0.6, doc_acc
    assert fp_acc > 0.8, fp_acc
