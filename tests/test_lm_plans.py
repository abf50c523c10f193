"""Invariant tests for the corpus-LM scoring queries (lm_plans):
trigram accounting exactness, nll bounds, and TF-IDF ranking sanity —
properties beyond the DuckDB parity check."""

import math

from pyspark.sql import functions as F

from data_ingestion_task_spark.functions.text import normalized_for_fingerprint
from data_ingestion_task_spark.plans._text_shared import spark_norm_words
from data_ingestion_task_spark.plans.lm_plans import (
    _TFIDF_K,
    char_trigram_perplexity,
    tfidf_topk_terms,
)
from data_ingestion_task_spark.sources.tables import load_table


def test_trigram_counts_and_nll_bounds(spark, sf_dir):
    out = {r["doc_id"]: r for r in char_trigram_perplexity(spark, sf_dir).collect()}
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", normalized_for_fingerprint(F.col("text")).alias("txt"))
        .collect()
    )
    total_tri = sum(max(len(r["txt"]) - 2, 0) for r in docs)
    for r in docs:
        n = len(r["txt"]) - 2
        if n < 1:
            assert r["doc_id"] not in out  # no model support
            continue
        got = out[r["doc_id"]]
        # overlapping trigram count is exactly len-2
        assert got["n_tri"] == n
        # nll of any trigram is in (0, ln(total)]: count ranges 1..total
        assert 0.0 < got["avg_nll"] <= math.log(total_tri) + 1e-6
    assert set(out) == {r["doc_id"] for r in docs if len(r["txt"]) >= 3}


def test_tfidf_topk_ranked_and_grounded(spark, sf_dir):
    rows = tfidf_topk_terms(spark, sf_dir).collect()
    words_by_doc = {
        r["doc_id"]: list(r["ws"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", spark_norm_words("text").alias("ws"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["rk"])
        # dense ranks 1..k, scores non-increasing, tf is the true count
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _TFIDF_K
        for a, b in zip(rs, rs[1:]):
            assert a["tfidf"] >= b["tfidf"] - 1e-9
        for r in rs:
            assert words_by_doc[doc_id].count(r["term"]) == r["tf"]
    # every doc with at least one word surfaces
    assert set(by_doc) == {d for d, ws in words_by_doc.items() if ws}


def test_tfidf_idf_join_is_size_routed(spark, sf_dir, monkeypatch):
    """VERDICT r9 #5: the idf join broadcasts only while the measured
    vocabulary fits _IDF_BROADCAST_BYTES; with the budget forced to 0
    the plan must carry NO broadcast of the idf side (shuffled join),
    and the results must be identical either way."""
    import data_ingestion_task_spark.plans.lm_plans as lm

    df_b = lm.tfidf_topk_terms(spark, sf_dir)
    plan_b = df_b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b or "BroadcastExchange" in plan_b
    rows_b = df_b.collect()
    monkeypatch.setattr(lm, "_IDF_BROADCAST_BYTES", 0)
    # AQE would re-broadcast a small shuffled side at runtime (its
    # job); the lint checks the COMPILED strategy switch, so pin the
    # planner's own auto-broadcast off for the routed plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df_s = lm.tfidf_topk_terms(spark, sf_dir)
        plan_s = df_s._jdf.queryExecution().executedPlan().toString()
        # the only compiled broadcast left is the 1-row n_docs scalar
        # (BroadcastNestedLoopJoin); the term-keyed equi-join must not
        # be a BroadcastHashJoin anymore
        assert "BroadcastHashJoin" not in plan_s
        assert "SortMergeJoin" in plan_s or "ShuffledHashJoin" in plan_s
        assert df_s.collect() == rows_b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    from data_ingestion_task_spark import api

    api.release(df_b)
    api.release(df_s)
