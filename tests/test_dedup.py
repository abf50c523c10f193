"""embedding_near_dup scale routing: the exact route must FAIL LOUD
above the broadcast cap (never silently degrade), and the documented
above-cap route (``method="lsh"``) must apply the identical exact
predicate over bucket candidates — precision 1.0, recall < 1."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_task_spark.operators.knn import (
    BroadcastIndexTooLarge,
    normalize_embeddings,
)
from data_ingestion_task_spark.plans.dedup_plans import embedding_near_dup_pairs

THRESHOLD, DIM = 0.35, 64


def _emb(spark, sf_dir):
    return normalize_embeddings(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
    )


def test_exact_route_raises_above_cap(spark, sf_dir):
    e = _emb(spark, sf_dir)
    with pytest.raises(BroadcastIndexTooLarge):
        embedding_near_dup_pairs(
            e, threshold=THRESHOLD, dim=DIM, method="exact", max_index_rows=10
        ).collect()


def test_lsh_route_ignores_cap_and_is_subset_of_exact(spark, sf_dir):
    e = _emb(spark, sf_dir)
    exact = {
        (r.vec_a, r.vec_b): r.sim
        for r in embedding_near_dup_pairs(
            e, threshold=THRESHOLD, dim=DIM, method="exact"
        ).collect()
    }
    # the lsh route takes no broadcast at all — a cap that would stop
    # the exact route is irrelevant to it (max_index_rows unused)
    lsh = {
        (r.vec_a, r.vec_b): r.sim
        for r in embedding_near_dup_pairs(
            e, threshold=THRESHOLD, dim=DIM, method="lsh", n_bits=2
        ).collect()
    }
    assert lsh, "lsh route found no pairs — bucket join broken"
    # precision 1.0 with IDENTICAL sims (same JVM dot, same rounding)
    for pair, sim in lsh.items():
        assert pair in exact and exact[pair] == sim
    # recall documented < 1 but must be non-trivial at 2 bits
    assert len(lsh) >= len(exact) * 0.2


def test_unknown_method_rejected(spark, sf_dir):
    with pytest.raises(ValueError, match="method"):
        embedding_near_dup_pairs(
            _emb(spark, sf_dir), threshold=THRESHOLD, dim=DIM, method="ann"
        )


def test_incremental_ingest_verdict_census(spark, sf_dir):
    """The planted split exercises every verdict with known counts:
    20 dup_of_corpus (sources i<30, i≡0 mod 3 whose +200000 copy lands
    corpus-side, plus copies of i≡1 sources landing batch-side), 10
    dup_in_batch (the +300000 same-batch plants of sources 30..57≡0),
    and every canonical id must resolve to the group's minimum."""
    from data_ingestion_task_spark.plans.dedup_plans import incremental_ingest_dedup

    rows = incremental_ingest_dedup(spark, sf_dir).collect()
    by_verdict = {}
    for r in rows:
        by_verdict.setdefault(r.verdict, []).append(r)
    assert len(by_verdict["dup_of_corpus"]) == 20
    assert len(by_verdict["dup_in_batch"]) == 10
    assert len(by_verdict["new"]) == len(rows) - 30
    # dup_in_batch: each +300000 plant points at its batch-side source
    for r in by_verdict["dup_in_batch"]:
        assert r.doc_id == r.canonical_doc_id + 300000
    # dup_of_corpus canonicals live corpus-side (never ≡ 0 mod 3)
    for r in by_verdict["dup_of_corpus"]:
        assert r.canonical_doc_id % 3 != 0
    # new docs are their own canonical
    for r in by_verdict["new"]:
        assert r.doc_id == r.canonical_doc_id
