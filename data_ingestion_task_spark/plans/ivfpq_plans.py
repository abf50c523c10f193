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

from ..operators.ivfpq import derive_codebooks, duckdb_ivfpq_sql, knn_join_ivfpq
from ._vector_shared import DIM, _split
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
    )
    return res.select(
        "query_id",
        F.col("rank").alias("rnk"),
        "neighbor_id",
        F.round("sim", 9).alias("sim"),
    ).orderBy("query_id", "rnk")
