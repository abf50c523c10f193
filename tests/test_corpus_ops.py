"""Invariant tests for the corpus-curation operators (corpus_plans) —
properties the DuckDB parity check cannot express (conservation,
redaction completeness, temperature monotonicity)."""

from pyspark.sql import functions as F

from data_ingestion_task_spark.functions.text import word_len
from data_ingestion_task_spark.plans.corpus_plans import (
    _INJ_EMAIL_MOD,
    N_SHARDS,
    corpus_shard_manifest,
    mixture_temperature,
    pii_redaction,
    repetition_profile,
)
from data_ingestion_task_spark.sources.tables import load_table


def test_pii_redaction_is_complete_and_counts_injections(spark, sf_dir):
    rows = {r["rule"]: r for r in pii_redaction(spark, sf_dir).collect()}
    # the composed redact_pii chain must leave zero matches behind
    assert rows["residual_after_redaction"]["n_docs"] == 0
    assert rows["residual_after_redaction"]["n_spans"] == 0
    # every injected email is found: exactly the doc_id % 7 == 0 docs
    d = load_table(spark, sf_dir, "documents")
    expected = d.filter(F.col("doc_id") % _INJ_EMAIL_MOD == 0).count()
    assert rows["email"]["n_docs"] == expected
    assert rows["email"]["n_spans"] == expected


def test_repetition_profile_partitions_the_corpus(spark, sf_dir):
    prof = repetition_profile(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in prof) == total
    for r in prof:
        assert 0.0 <= r["avg_top_bigram_frac"] <= 1.0
        assert 0.0 <= r["avg_dup5_frac"] <= 1.0
        # bucket is consistent with the average it aggregates
        assert r["top_bigram_bucket"] <= r["avg_top_bigram_frac"] * 10 + 1


def test_shard_manifest_conserves_docs_and_tokens(spark, sf_dir):
    man = corpus_shard_manifest(spark, sf_dir).collect()
    assert len(man) <= N_SHARDS
    assert all(0 <= r["shard_id"] < N_SHARDS for r in man)
    d = load_table(spark, sf_dir, "documents")
    expected = d.agg(
        F.count("*").alias("docs"), F.sum(word_len(F.col("text"))).alias("toks")
    ).collect()[0]
    assert sum(r["n_docs"] for r in man) == expected["docs"]
    assert sum(r["n_tokens"] for r in man) == expected["toks"]
    assert all(r["min_order_key"] <= r["max_order_key"] for r in man)


def test_mixture_temperature_upweights_the_tail(spark, sf_dir):
    rows = mixture_temperature(spark, sf_dir).collect()
    # weights are a distribution
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["n_kept"] <= r["n_total"]
        assert 0.0 <= r["target_rate"] <= 1.0
    # T=2 temperature: keep-rate ∝ 1/sqrt(n) — smaller sources never
    # get a lower target rate than larger ones
    by_size = sorted(rows, key=lambda r: r["n_total"], reverse=True)
    for big, small in zip(by_size, by_size[1:]):
        assert small["target_rate"] >= big["target_rate"] - 1e-9
