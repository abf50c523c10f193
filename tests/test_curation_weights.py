"""Invariant tests for the round-4 curation queries: dedup-aware
sampling weights (dedup_plans) and embedding-space decontamination
(vector_plans) — properties beyond the DuckDB parity check (mass
conservation, self-contamination recall, weight bounds)."""

from pyspark.sql import functions as F

from data_ingestion_task_spark.plans.dedup_plans import (
    dedup_cluster_canonical,
    dedup_sampling_weights,
)
from data_ingestion_task_spark.plans.vector_plans import (
    _DECON_TAU,
    semantic_decontamination,
)
from data_ingestion_task_spark.sources.tables import load_table


def test_dedup_weights_bounded_and_conserved(spark, sf_dir):
    rows = dedup_sampling_weights(spark, sf_dir).collect()
    assert rows, "no sources"
    for r in rows:
        # soft-dedup can only shrink a source's token mass, never grow it
        assert r["weighted_tokens"] <= r["raw_tokens"] + 1e-6
        assert 0 <= r["n_duped_docs"] <= r["n_docs"]
    # total weighted mass ~= one document's worth per cluster: equals
    # the sum over clusters of (cluster tokens)/size, which is strictly
    # less than raw mass iff any cluster has size > 1 (planted dups
    # guarantee some do)
    assert sum(r["weighted_tokens"] for r in rows) < sum(r["raw_tokens"] for r in rows)
    # every doc in the planted-dup corpus is accounted for exactly once
    n_docs = sum(r["n_docs"] for r in rows)
    assert n_docs == dedup_cluster_canonical(spark, sf_dir).count()


def test_semantic_decontamination_catches_planted_bench(spark, sf_dir):
    out = semantic_decontamination(spark, sf_dir)
    rows = out.collect()
    e = load_table(spark, sf_dir, "embeddings")
    bench_ids = {
        r["vec_id"] for r in e.filter(F.col("vec_id") % 29 == 0).select("vec_id").collect()
    }
    by_vec = {r["vec_id"]: r for r in rows}
    assert len(by_vec) == len(rows), "one row per contaminated vector"
    # every benchmark member is its own worst contamination: flagged
    # against itself at sim ~1.0
    for b in bench_ids:
        assert b in by_vec
        assert by_vec[b]["bench_id"] == b
        assert abs(by_vec[b]["sim"] - 1.0) < 1e-9
    # nothing below the threshold leaks through
    assert all(r["sim"] >= _DECON_TAU - 1e-9 for r in rows)
