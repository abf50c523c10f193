"""Invariant tests for embedding_curation_plans: a full numpy replica
of the SemDeDup rule (assignment + prune flags must match exactly) and
quantization error bounds from first principles."""

import numpy as np
from pyspark.sql import functions as F

from data_ingestion_task_spark.plans.embedding_curation_plans import (
    _CENTROID_MOD,
    _SEMDEDUP_TAU,
    embedding_int8_quantize_audit,
    semdedup_cluster_prune,
)
from data_ingestion_task_spark.sources.tables import load_table


def _vectors(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("x"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([list(r["x"]) for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def test_semdedup_matches_numpy_replica(spark, sf_dir):
    ids, mat = _vectors(spark, sf_dir)
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cmask = ids % _CENTROID_MOD == 1
    cids, cmat = ids[cmask], n[cmask]
    sims = n @ cmat.T
    # argmax with centroid-id-asc tie-break (cids ascending + argmax
    # first-occurrence)
    assign = cids[np.argmax(sims, axis=1)]
    pruned = set()
    by_cluster: dict[int, list[int]] = {}
    for i, c in enumerate(assign):
        by_cluster.setdefault(int(c), []).append(i)
    for members in by_cluster.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                a, b = members[ai], members[bi]  # ids sorted => a_id < b_id
                if float(n[a] @ n[b]) > _SEMDEDUP_TAU:
                    pruned.add(int(ids[b]))
    got = {r["vec_id"]: r for r in semdedup_cluster_prune(spark, sf_dir).collect()}
    assert set(got) == set(int(i) for i in ids)
    for i, vid in enumerate(ids):
        assert got[int(vid)]["centroid_id"] == int(assign[i])
        assert got[int(vid)]["pruned"] == (int(vid) in pruned)
    # the lowest id of every cluster can never be pruned
    for c, members in by_cluster.items():
        assert not got[int(ids[members[0]])]["pruned"]
    assert pruned, "corpus should contain some semantic near-dups"


def test_quantize_audit_error_bounds(spark, sf_dir):
    rows = embedding_int8_quantize_audit(spark, sf_dir).collect()
    ids, mat = _vectors(spark, sf_dir)
    by_id = {r["vec_id"]: r for r in rows}
    assert set(by_id) == set(int(i) for i in ids)
    for i, vid in enumerate(ids):
        r = by_id[int(vid)]
        scale = np.abs(mat[i]).max() / 127
        assert abs(r["scale"] - scale) == 0.0  # identical IEEE chain
        # round-to-nearest: component error is at most half a step
        assert r["max_abs_err"] <= scale / 2 + 1e-12
        # the max-magnitude component always lands on ±127 => nonzero
        assert 1 <= r["nnz"] <= len(mat[i])
        assert 0.0 <= r["rel_sq_err"] < 1e-3
