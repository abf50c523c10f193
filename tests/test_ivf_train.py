"""BLAS-assignment IVF trainer (operators/ivf_train.py): the trained
codebook must be BIT-identical to knn.train_ivf_codebook's on the same
sample (the drift pin for the duplicated recompute expressions and the
lossless-margin assignment claim), and its cached handles must release
cleanly."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_task_spark import api
from data_ingestion_task_spark.operators.ivf_train import train_ivf_codebook_blas
from data_ingestion_task_spark.operators.knn import train_ivf_codebook
from data_ingestion_task_spark.sources.tables import load_table


def _codebook(df):
    return {
        r["centroid_id"]: tuple(r["embedding"]) for r in df.collect()
    }


def test_blas_trainer_matches_jvm_trainer_bitwise(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    jvm = train_ivf_codebook(emb, seed_mod=32, rounds=2)
    blas = train_ivf_codebook_blas(emb, seed_mod=32, rounds=2)
    want = _codebook(jvm)
    got = _codebook(blas)
    assert got == want  # bit-for-bit: same ids, same float64 components
    assert len(got) >= 4
    api.release(blas)
    assert not any(d.storageLevel.useMemory for d in blas._cached_deps)
