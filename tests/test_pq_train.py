"""DataFrame-native PQ codebook trainer (operators/pq_train.py) —
the DECIMAL-quantized twin-able counterpart of pq.train_pq_codebooks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_ingestion_task_spark.operators.pq_train import (
    collect_codebooks,
    train_pq_codebooks_df,
)
from data_ingestion_task_spark.sources.tables import load_table


def _x(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )


def test_trained_books_shape_and_grid(spark, sf_dir):
    x = _x(spark, sf_dir)
    books_df = train_pq_codebooks_df(x, dim=64, m=8, n_codes=16, rounds=2)
    books = collect_codebooks(books_df, 8, 16, 8)
    assert books.shape == (8, 16, 8)
    assert np.isfinite(books).all()
    # trained centroids are means of unit-vector slices — bounded
    assert np.abs(books).max() <= 1.0 + 1e-9


def test_trained_books_layout_invariant(spark, sf_dir):
    """The DECIMAL-quantized sums make the codebooks bit-identical
    whatever the partitioning — the property that lets a static SQL
    oracle reconstruct them (and 'train once, reuse everywhere' hold
    on a cluster)."""
    x = _x(spark, sf_dir)
    a = collect_codebooks(
        train_pq_codebooks_df(x.repartition(1), dim=64, rounds=2), 8, 16, 8
    )
    b = collect_codebooks(
        train_pq_codebooks_df(
            x.repartition(13, "neighbor_id"), dim=64, rounds=2
        ),
        8,
        16,
        8,
    )
    assert (a == b).all()


def test_trained_books_reject_bad_dim(spark, sf_dir):
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks_df(_x(spark, sf_dir), dim=63, m=8)


def test_trained_books_reject_small_sample(spark, sf_dir):
    x = _x(spark, sf_dir).limit(5)
    with pytest.raises(ValueError, match="< n_codes"):
        train_pq_codebooks_df(x, dim=64, n_codes=16)


def test_trained_query_contract(spark, sf_dir):
    """ivfpq_trained_topk returns the knn contract: ≤k rows per query,
    rank 1..k dense, sims descending true cosines."""
    from data_ingestion_task_spark.plans.ivfpq_trained_plans import (
        ivfpq_trained_topk,
    )

    rows = ivfpq_trained_topk(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = [r["rnk"] for r in rs]
        assert ranks == list(range(1, len(rs) + 1))
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.000001 <= s <= 1.000001 for s in sims)
