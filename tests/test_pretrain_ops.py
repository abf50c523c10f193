"""Invariant tests for the pretraining-corpus operators — properties
the DuckDB parity check cannot express (conservation, funnel chaining,
planted-recall guarantees)."""

from pyspark.sql import functions as F

from data_ingestion_task_spark.functions.text import word_len
from data_ingestion_task_spark.plans.pretrain_plans import (
    PACK_BUDGET,
    _QF_RULES,
    benchmark_contamination,
    quality_filter_funnel,
    sequence_packing,
)
from data_ingestion_task_spark.sources.tables import load_table


def test_sequence_packing_conserves_tokens_and_docs(spark, sf_dir):
    packs = sequence_packing(spark, sf_dir)
    agg = packs.agg(
        F.sum("n_docs").alias("docs"), F.sum("tokens").alias("toks")
    ).collect()[0]
    d = load_table(spark, sf_dir, "documents")
    expected = d.agg(
        F.count("*").alias("docs"),
        F.sum(F.least(word_len(F.col("text")), F.lit(PACK_BUDGET))).alias("toks"),
    ).collect()[0]
    assert agg["docs"] == expected["docs"]
    assert agg["toks"] == expected["toks"]
    # every pack holds at least one doc and fill_ratio is consistent
    bad = packs.filter(
        (F.col("n_docs") < 1)
        | (F.abs(F.col("fill_ratio") - F.col("tokens") / PACK_BUDGET) > 1e-6)
    ).count()
    assert bad == 0


def test_quality_funnel_chains(spark, sf_dir):
    rows = {r["rule"]: r for r in quality_filter_funnel(spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "documents").count()
    assert rows[_QF_RULES[0]]["n_evaluated"] == total
    for a, b in zip(_QF_RULES, _QF_RULES[1:]):
        # docs passing rule a are exactly the docs evaluated by rule b
        assert rows[a]["n_passed"] == rows[b]["n_evaluated"]
        assert rows[a]["n_failed"] + rows[a]["n_passed"] == rows[a]["n_evaluated"]


def test_contamination_catches_every_planted_twin(spark, sf_dir):
    flagged = benchmark_contamination(spark, sf_dir)
    # every planted benchmark twin (every 29th doc, 3 words dropped)
    # must flag its own source document
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    bench_ids = {r.doc_id for r in d.filter(F.col("doc_id") % 29 == 0).collect()}
    self_hits = {
        r.bench_id
        for r in flagged.filter(F.col("doc_id") == F.col("bench_id")).collect()
    }
    assert bench_ids == self_hits
