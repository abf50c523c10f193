"""IVF-PQ registered query — the composition that completes the ANN
ladder (exact → PQ → LSH → IVF → IVF-PQ) under the driver's
correctness gate. Lives in its own leaf module so the r6-proven
oracle parity (``tests/test_ivfpq_oracle.py``) certifies one query,
not a sibling family.

Why this index is the 100 TB shape (FAISS ``IndexIVFPQ``, the
billion-vector layout the reference's flat ``IndexFlatIP``
— `code/python/Faiss_2_10.py:70-146` — grows into): the corpus stays
distributed AND narrow — inverted lists are ``(centroid_id, id,
m uint8 codes)``, ~8× fewer bytes per shuffled row than IVF's raw
vectors — while only the (√N-sized) centroid set and the tiny PQ
codebooks broadcast. Measured 2.2× faster than IVF at 30× data
(SCALE.md §0b A/B).
"""

from __future__ import annotations

from math import isqrt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ivfpq import (
    build_ivfpq_index,
    derive_codebooks,
    duckdb_ivfpq_sql,
    knn_join_ivfpq,
)
from ..operators.knn import knn_join_exact
from ._vector_shared import DIM, _D_VNORM, _split
from .registry import query

_K, _N_PROBE, _OVERSCAN = 3, 2, 8

#: md5-derived deterministic codebooks (no training, no SparkSession)
#: so the oracle below is a STATIC string over the same parquet bytes.
#: Trained codebooks (``train_pq_codebooks``) have better recall and
#: are the library path — ``knn_join_ivfpq`` takes either.
_BOOKS = derive_codebooks(DIM, m=8, n_codes=16)

_ORACLE = f"""
    SELECT qid AS query_id, rank AS rnk, nid AS neighbor_id,
           round(sim, 9) AS sim
    FROM ({duckdb_ivfpq_sql(
        _BOOKS,
        k=_K,
        centroid_mod="isqrt",
        n_probe=_N_PROBE,
        overscan=_OVERSCAN,
        emb_table="embeddings",
    )})
    ORDER BY query_id, rnk
"""


@query("ann_ivfpq_topk", oracle=_ORACLE)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k with IVF coarse pruning + PQ-coded
    inverted lists (FAISS ``IndexIVFPQ`` analogue, ``by_residual=False``
    flavor): √N id-residue centroids → every index vector assigned and
    PQ-encoded in one narrow Arrow pass → each query probes its 2
    nearest cells → ADC-scored shortlist (k·overscan) → exact re-rank
    so surfaced sims are true cosines. Bit-exact against the DuckDB
    reconstruction (``tests/test_ivfpq_oracle.py``). See
    ``operators/ivfpq.knn_join_ivfpq`` for the per-stage shuffle
    analysis."""
    q, x = _split(spark, sf_dir)
    x = x.select("neighbor_id", "embedding")
    n = x.count()
    cent_mod = max(25, n // isqrt(n)) if n else 25
    res = knn_join_ivfpq(
        x,
        q.select("query_id", "embedding"),
        k=_K,
        centroid_mod=cent_mod,
        n_probe=_N_PROBE,
        overscan=_OVERSCAN,
        codebooks=_BOOKS,
        # The query side is the corpus's 1-in-5 split — dimension-table
        # sized at every probed SF (6 MB at sf3), so the ADC stage runs
        # broadcast-queries: candidate rows carry codes only (the wide
        # _qv column was the measured 30x cost center, SCALE.md §0b).
        broadcast_queries=True,
    )
    return res.select(
        "query_id",
        F.col("rank").alias("rnk"),
        "neighbor_id",
        F.round("sim", 9).alias("sim"),
    ).orderBy("query_id", "rnk")


# ---------------------------------------------------------------------------
# Overscan recall audit — the IVF-PQ member of the audit trio
# (ann_recall_audit sweeps LSH bits, ivf_recall_audit sweeps n_probe)
# ---------------------------------------------------------------------------

#: ADC-shortlist widths to sweep (k·overscan candidates re-ranked).
_AUDIT_OVERSCANS = (1, 4, 8)
#: 1-in-N deterministic query sample for the exact baseline — the same
#: knob (and the same value) as the LSH/IVF audits, so the three
#: tables are directly comparable.
_AUDIT_SAMPLE_MOD = 50


def _d_ivfpq_branch(o: int) -> str:
    """One overscan setting of the audit as a DuckDB SELECT."""
    return f"""
    SELECT {o} AS overscan,
           (SELECT COUNT(*) FROM q0) AS n_queries,
           CAST((SELECT COUNT(*) FROM pq{o}) AS DOUBLE)
             / (SELECT COUNT(*) FROM q0) AS avg_returned,
           CAST((SELECT COUNT(*) FROM pq{o} p
                 JOIN ex ON ex.query_id = p.qid AND ex.neighbor_id = p.nid)
                AS DOUBLE)
             / ({_K} * (SELECT COUNT(*) FROM q0)) AS recall_at_{_K}
    """


@query(
    "ivfpq_recall_audit",
    oracle=f"""
    WITH q0 AS (
      SELECT vec_id AS query_id, {_D_VNORM} AS v FROM embeddings
      WHERE vec_id % {_AUDIT_SAMPLE_MOD} = 0
    ),
    x0 AS (
      SELECT vec_id AS neighbor_id, {_D_VNORM} AS v FROM embeddings
      WHERE vec_id % 5 <> 0
    ),
    ep AS (SELECT q0.query_id, x0.neighbor_id,
                  list_dot_product(q0.v, x0.v) AS sim
           FROM q0 CROSS JOIN x0),
    ex AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS rnk
        FROM ep) WHERE rnk <= {_K}
    ),
    {",".join(
        f'''pq{o} AS (SELECT qid, nid FROM ({duckdb_ivfpq_sql(
            _BOOKS, k=_K, centroid_mod="isqrt", n_probe=_N_PROBE,
            overscan=o, emb_table="embeddings",
        )}) WHERE qid % {_AUDIT_SAMPLE_MOD} = 0)'''
        for o in _AUDIT_OVERSCANS
    )}
    {" UNION ALL ".join(_d_ivfpq_branch(o) for o in _AUDIT_OVERSCANS)}
    ORDER BY overscan
    """,
)
def ivfpq_recall_audit(
    spark: SparkSession, sf_dir: str, *, sample_mod: int = _AUDIT_SAMPLE_MOD
) -> DataFrame:
    """The overscan tuning table for the IVF-PQ path — completes the
    audit trio (LSH sweeps n_bits, IVF sweeps n_probe; IVF-PQ's own
    knob is the ADC shortlist width): for each overscan, recall@3 of
    the re-ranked top-k against the exact broadcast search over the
    same deterministic 1-in-50 query sample, plus the average rows
    actually returned per query (thin cells can return < k).

    Overscan cuts the shortlist BEFORE the exact re-rank, so a wider
    branch's output cannot be derived by filtering a narrower one (the
    shared-prefix trick the IVF audit uses does not apply) — but the
    BUILD is knob-independent, so the inverted lists are built ONCE
    (``build_ivfpq_index``, persisted) and every branch sweeps only
    the probe/ADC/rerank stages: exactly the frozen-index production
    tuning shape. Query filtering after the fact equals querying the
    sample directly because every IVF-PQ stage past the build is
    per-query independent."""
    q, x = _split(spark, sf_dir)
    q = q.filter(F.col("query_id") % sample_mod == 0).select("query_id", "embedding")
    x = x.select("neighbor_id", "embedding")
    nq = q.count()
    if nq == 0:
        # A corpus too small for the 1-in-50 sample to hit any query
        # would otherwise surface as a bare ZeroDivisionError below
        # (ADVICE r7 #4) — match the empty-centroid guard style. The
        # guard runs BEFORE the exact baseline is persisted/computed so
        # the error path neither leaks a cached frame nor pays for a
        # pointless exact search (code-review r8 catch).
        raise ValueError(
            f"ivfpq_recall_audit: query sample is empty (sample_mod="
            f"{sample_mod} selected 0 of the query ids); lower "
            "sample_mod for corpora this small"
        )
    n = x.count()
    cent_mod = max(25, n // isqrt(n)) if n else 25
    exact = (
        knn_join_exact(x, q, k=_K)
        .select("query_id", "neighbor_id")
        .withColumn("_hit", F.lit(1))
        .persist()
    )
    exact.count()
    idx = build_ivfpq_index(x, centroid_mod=cent_mod, codebooks=_BOOKS)
    lists = idx.lists.persist()
    idx = idx._replace(lists=lists)
    # Single-job union shape (the ann/ivf audit convention): every
    # overscan branch is tagged and unioned so ONE aggregate action
    # evaluates the whole sweep — the persisted lists make the shared
    # build run once inside it.
    union = None
    for o in _AUDIT_OVERSCANS:
        res = knn_join_ivfpq(
            None, q, k=_K, n_probe=_N_PROBE, overscan=o, index=idx,
            broadcast_queries=True,
        )
        branch = res.join(exact, ["query_id", "neighbor_id"], "left").withColumn(
            "overscan", F.lit(o)
        )
        union = branch if union is None else union.unionByName(branch)
    stats = {
        r["overscan"]: r
        for r in union.groupBy("overscan")
        .agg(
            F.count("*").alias("tot"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("hits"),
        )
        .collect()
    }
    out_rows = []
    for o in _AUDIT_OVERSCANS:
        r = stats.get(o)
        tot = r["tot"] if r is not None else 0
        hits = r["hits"] if r is not None else 0
        out_rows.append((o, nq, tot / nq, hits / (_K * nq)))
    exact.unpersist()
    lists.unpersist()
    return spark.createDataFrame(
        out_rows,
        f"overscan bigint, n_queries bigint, avg_returned double, recall_at_{_K} double",
    ).orderBy("overscan")
