"""Embedding-space corpus curation: semantic dedup and storage
quantization — the vector-side complements of plans/dedup_plans.py
(text-side near-dup) and plans/vector_plans.py (search).

- ``semdedup_cluster_prune`` — SemDeDup (Abbas et al. 2023): cluster
  the embedding space, then drop a vector when a LOWER-ID member of
  its own cluster sits above a cosine threshold. Clustering bounds the
  candidate set per vector to its cell, which is what makes semantic
  dedup tractable where all-pairs cosine is not.
- ``embedding_int8_quantize_audit`` — symmetric per-vector int8
  quantization (scale = max|x|/127, the FAISS ``SQ8``/vector-DB
  storage norm) with a per-vector reconstruction-error report: the
  go/no-go audit before committing a 4× storage cut on an embedding
  column at 100 TB.

Scale notes (100 TB):
- semdedup: centroid assignment is the shared BLAS-prefiltered
  broadcast pass (`operators/knn._nearest_centroid`, bit-identical to
  the exact expansion); the pairwise stage shuffles on ``centroid_id``
  only, so the quadratic term is Σ cell² — with nlist ≈ √N cells that
  is O(N^1.5) worst-case and near-linear on balanced cells, never the
  corpus-wide N². The id-residue centroid rule here (vec_id % 25 == 1)
  is the same static-oracle device as ``knn_join_ivfpq``; production
  callers pass a trained codebook through the same operators.
- quantize audit: pure per-row column expressions, one scan, zero
  shuffles. The per-row scale/q/e vectors are let-bound as real
  projection columns (computed once per row) — referencing the scale
  expression inside the per-element lambda would re-evaluate the
  array_max per element (interpreted HOFs do no CSE; the
  word_shingles lesson).

Parity armor: assignment tie-breaks on (sim DESC, centroid_id ASC)
with exact sequential dots in both engines (the certified IVF
pattern); quantization is the identical IEEE chain per element
(``least(greatest(floor(x/scale + 0.5), -127), 127)``) so q, recon,
and every error metric are bit-equal doubles — no rounding needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import dot
from ..operators.knn import _nearest_centroid, normalize_embeddings
from ..sources.tables import load_table
from ._vector_shared import _D_VNORM
from .registry import query

#: Cosine threshold above which a same-cluster lower-id vector
#: shadows this one (matches embedding_near_dup's near-dup bar).
_SEMDEDUP_TAU = 0.35
#: Id-residue rule for derived centroids (the knn_join_ivfpq default).
_CENTROID_MOD = 25


# ---------------------------------------------------------------------------
# SemDeDup: cluster-bounded semantic near-dup pruning
# ---------------------------------------------------------------------------


@query(
    "semdedup_cluster_prune",
    oracle=f"""
    WITH n AS (SELECT vec_id, {_D_VNORM} AS v FROM embeddings),
    cent AS (
      SELECT vec_id AS centroid_id, v AS cv FROM n
      WHERE vec_id % {_CENTROID_MOD} = 1
    ),
    asg AS (
      SELECT vec_id, v, centroid_id FROM (
        SELECT n.vec_id, n.v, cent.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, cent.cv) DESC, cent.centroid_id
               ) AS rk
        FROM n CROSS JOIN cent) WHERE rk = 1
    ),
    pruned AS (
      SELECT DISTINCT b.vec_id
      FROM asg a JOIN asg b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) > {_SEMDEDUP_TAU}
    )
    SELECT asg.vec_id, asg.centroid_id,
           pruned.vec_id IS NOT NULL AS pruned
    FROM asg LEFT JOIN pruned USING (vec_id)
    ORDER BY vec_id
    """,
)
def semdedup_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: assign every vector to its
    argmax-cosine centroid (id-residue derived centroids, BLAS-
    prefiltered broadcast assignment — bit-identical to the exact
    expansion), then inside each cluster mark ``pruned`` for any
    vector with a lower-id cluster-mate above cosine 0.35. Keeping the
    lowest id per close-set is the paper's "keep one random member"
    made deterministic. Emits every vector with its cluster and the
    prune flag — the training set is ``pruned = false``."""
    e = normalize_embeddings(load_table(spark, sf_dir, "embeddings"))
    xn = e.select("vec_id", F.col("embedding").alias("_xv"))
    cent = xn.filter(F.col("vec_id") % _CENTROID_MOD == 1).select(
        F.col("vec_id").alias("centroid_id"), F.col("_xv").alias("_cv")
    )
    asg = _nearest_centroid(xn, cent, "vec_id")
    a = asg.select(
        F.col("vec_id").alias("a_id"), F.col("_xv").alias("a_v"), "centroid_id"
    )
    b = asg.select(
        F.col("vec_id").alias("b_id"), F.col("_xv").alias("b_v"), "centroid_id"
    )
    pruned = (
        a.join(b, "centroid_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(dot(F.col("a_v"), F.col("b_v")) > _SEMDEDUP_TAU)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("pruned", F.lit(True))
    )
    return (
        asg.select("vec_id", "centroid_id")
        .join(pruned, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.coalesce(F.col("pruned"), F.lit(False)).alias("pruned"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Int8 quantization audit
# ---------------------------------------------------------------------------


@query(
    "embedding_int8_quantize_audit",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
    ),
    s AS (
      SELECT vec_id, x,
             list_max(list_transform(x, a -> abs(a))) / 127 AS scale
      FROM v
    ),
    q AS (
      SELECT vec_id, x, scale,
             list_transform(x, a ->
               least(greatest(floor(a / scale + 0.5), -127), 127)) AS qv
      FROM s
    ),
    e AS (
      SELECT vec_id, x, scale, qv,
             list_transform(generate_series(1, len(x)),
                            i -> x[i] - qv[i] * scale) AS ev
      FROM q
    )
    SELECT vec_id,
           scale,
           len(list_filter(qv, a -> a <> 0)) AS nnz,
           list_max(list_transform(ev, a -> abs(a))) AS max_abs_err,
           list_dot_product(ev, ev) / list_dot_product(x, x) AS rel_sq_err
    FROM e ORDER BY vec_id
    """,
)
def embedding_int8_quantize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: quantize each
    component to ``clamp(floor(x/scale + 0.5), ±127)`` with
    ``scale = max|x|/127``, reconstruct, and report per-vector error
    (max abs component error — bounded by scale/2 — and relative
    squared error vs the original norm) plus the surviving-nonzero
    count. One narrow projection chain, no shuffle; each derived
    vector is a real column so HOF lambdas never re-evaluate the
    row-level reductions. All metrics are raw doubles — both engines
    run the identical IEEE chain, so no rounding is needed for the
    value hash."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    s = v.withColumn(
        "scale", F.array_max(F.transform("x", lambda a: F.abs(a))) / 127
    )
    q = s.withColumn(
        "qv",
        F.transform(
            "x",
            lambda a: F.least(
                F.greatest(F.floor(a / F.col("scale") + 0.5), F.lit(-127.0)),
                F.lit(127.0),
            ),
        ),
    )
    e = q.withColumn(
        "ev", F.zip_with("x", "qv", lambda a, b: a - b * F.col("scale"))
    )
    return e.select(
        "vec_id",
        "scale",
        F.size(F.filter("qv", lambda a: a != 0)).cast("bigint").alias("nnz"),
        F.array_max(F.transform("ev", lambda a: F.abs(a))).alias("max_abs_err"),
        (dot(F.col("ev"), F.col("ev")) / dot(F.col("x"), F.col("x"))).alias(
            "rel_sq_err"
        ),
    ).orderBy("vec_id")
