"""Physical-plan property tests: the scale claims in SCALE.md are
asserted against `.explain` output, not just documented — filter
pushdown reaches the parquet scan, projections prune the read schema,
dimension joins broadcast, kNN never plans a cartesian product, and
narrow stages stay shuffle-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_task_spark.plans import registry


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = registry.queries_dict()

    def explain(name: str) -> str:
        df = qs[name](spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    return explain


def test_filter_pushed_to_scan(plans):
    plan = plans("pricing_summary")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:200]


def test_projection_prunes_scan(plans):
    # doc_ingest_profile needs text+source only; doc_id/lang/n_chars
    # must not be read from parquet
    plan = plans("doc_ingest_profile")
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "text" in read_schema and "source" in read_schema
    assert "n_chars" not in read_schema and "doc_id" not in read_schema


def test_dim_join_broadcasts(plans):
    plan = plans("dim_join_rollup")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_knn_has_no_cartesian_product(plans):
    for q in ("knn_cosine_topk", "ann_lsh_topk", "ann_ivf_topk"):
        plan = plans(q)
        assert "CartesianProduct" not in plan, q


def test_chunk_explode_is_shuffle_free(plans):
    plan = plans("chunk_explode")
    # narrow map + generate only; the single orderBy for output
    # determinism is the one allowed exchange
    assert plan.count("Exchange") <= 1
    assert "Generate" in plan  # posexplode, not a Python UDTF


def test_normalizers_stay_jvm_side(plans):
    # §2.7 normalization must not plan any Python evaluation
    # (WholeStageCodegen spans only materialize once AQE finalizes the
    # plan, so the checkable static property is the absence of Python.)
    for q in ("money_normalization", "date_sanity", "acct_last4"):
        plan = plans(q)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, q
        assert "MapInPandas" not in plan, q


def test_extraction_python_stage_is_single(plans):
    # one Arrow-batched mapInPandas stage, no row-at-a-time Python
    plan = plans("w2_extraction_e2e")
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_sequence_packing_prunes_and_bounds_shuffles(plans):
    plan = plans("sequence_packing")
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema
    # bucket window + pack agg/order — never a global (single-partition)
    # window over the corpus
    assert "SinglePartition" not in plan.split("Window")[0]


def test_mixture_sample_is_narrow_until_agg(plans):
    plan = plans("mixture_weighted_sample")
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "doc_id" in read_schema and "source" in read_schema
    assert "text" not in read_schema
    # hash-residue filter is pure expression work: agg + order only
    assert plan.count("Exchange") <= 2


def test_contamination_broadcasts_benchmark_side(plans):
    # the benchmark shingle side is small by nature — it must broadcast,
    # and nothing may plan a cartesian product
    plan = plans("benchmark_contamination")
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_star_components_converges_on_long_chain(spark):
    """The case min-label propagation's 24-round cap CANNOT handle: a
    60-node chain (diameter 59). Large-star/small-star contracts it in
    O(log n) rounds (SCALE.md's escape hatch, dedup_cluster_star) and
    labels every node with the component minimum."""
    from data_ingestion_task_spark.plans.dedup_plans import _star_components

    n = 60
    chain = [(i, i + 1) for i in range(n - 1)] + [(i + 1, i) for i in range(n - 1)]
    # a second, disjoint chain offset by 1000 — labels must not bleed
    chain += [(1000 + i, 1001 + i) for i in range(9)] + [
        (1001 + i, 1000 + i) for i in range(9)
    ]
    edges = spark.createDataFrame(chain, "a long, b long")
    labels, cached = _star_components(edges)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    for dep in cached:
        dep.unpersist()
    assert got == {**{i: 0 for i in range(n)}, **{1000 + i: 1000 for i in range(10)}}


def test_star_cluster_query_matches_propagation_query(spark, sf_dir):
    """dedup_cluster_star and dedup_cluster_canonical implement the
    same contract — identical output row-for-row on the same corpus."""
    qs = registry.queries_dict()
    a = sorted(map(tuple, qs["dedup_cluster_canonical"](spark, sf_dir).collect()))
    b = sorted(map(tuple, qs["dedup_cluster_star"](spark, sf_dir).collect()))
    assert a == b


def test_kmeans_broadcasts_codebook_no_cartesian(plans):
    plan = plans("ivf_kmeans_refine")
    assert "CartesianProduct" not in plan
    # codebook joins are broadcast nested-loop (crossed with a
    # broadcast side), never a shuffled product
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_lsh_topk_ranks_without_window(plans):
    # the top-1 + candidate count come from ONE aggregate with
    # map-side partial combine (the exchange carries one row per
    # query, not the full pair set); a Window over the pairs must not
    # reappear
    plan = plans("ann_lsh_topk")
    assert "Window" not in plan
    assert "partial_max" in plan  # map-side combine before the shuffle
