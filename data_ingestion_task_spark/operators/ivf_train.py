"""BLAS-assignment IVF codebook trainer — the big-sample variant of
``knn.train_ivf_codebook`` behind the corpus-tracking trained IVF-PQ
lifecycle (``plans/ivfpq_scaled_plans.py``, VERDICT r9 #2).

Why a second trainer: ``train_ivf_codebook``'s assignment is the plain
JVM broadcast-expansion argmax — the right trade for the PINNED
≤1024-row sample, where collect-free lazy chaining beats everything
(see its docstring). But a corpus-TRACKING cap (``scaled_sample_cap``:
sample ≈ 32·√N, nlist ≈ √N) makes the expansion sample·nlist ≈ 32·N
interpreted array-dots per round — measured 419 s of an sf10 lifecycle
run (vs ~46 s for the entire static search). This trainer swaps only
the assignment for :func:`..knn._nearest_centroid` — the BLAS
prefilter + exact-JVM re-score helper the IVF family's full-index
assignment already rides — which is provably assignment-identical
(numpy decides WHICH pairs get the exact dot, never the score; 1e-6
margin on unit vectors, see its docstring). The recompute and
renormalize stages are expression-identical to
``train_ivf_codebook``'s (operators/knn.py — change both together;
``tests/test_ivf_train.py`` pins codebook equality between the two
trainers), so the trained artifact, and therefore the DuckDB twin's
static k-means CTEs, are bit-for-bit unchanged.

Cost shape: per round, one matmul sweep (sample × nlist in BLAS) +
exact re-scores for the ~1 surviving candidate per row + the
(centroid, dim)-ary decimal recompute. The price of the BLAS path is
one bounded driver collect per round (the nlist-row centroid frame —
``_nearest_centroid`` needs the matrix), so each round's centroids are
persisted and handed out via ``_cached_deps`` rather than re-deriving
the whole chain per collect (the r9 lesson that motivated the pinned
trainer's collect-free shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import _nearest_centroid, normalize_embeddings


def train_ivf_codebook_blas(
    index_df: DataFrame,
    index_id: str = "neighbor_id",
    vec_col: str = "embedding",
    seed_mod: int = 25,
    rounds: int = 2,
) -> DataFrame:
    """Spherical k-means, semantics identical to
    ``knn.train_ivf_codebook`` (seeds = ids ≡ 1 mod ``seed_mod``,
    argmax-cosine assignment with lowest-centroid tie-break, DECIMAL-
    quantized renormalized means, empty clusters drop out) with the
    assignment stage on the BLAS prefilter. Returns ``(centroid_id,
    <vec_col>)``; the persisted per-round centroid frames (and the
    persisted normalized sample) ride out on ``_cached_deps`` —
    release via ``api.release`` after materializing the result."""
    deps: list[DataFrame] = []
    xn = (
        normalize_embeddings(index_df, vec_col)
        .select(F.col(index_id).alias("_id"), F.col(vec_col).alias("_xv"))
        .persist()  # swept once per round by the BLAS stage
    )
    deps.append(xn)
    cent = xn.filter(F.col("_id") % seed_mod == 1).select(
        F.col("_id").alias("centroid_id"), F.col("_xv").alias("_cv")
    )
    for _ in range(rounds):
        assigned = _nearest_centroid(xn, cent, "_id")
        # Recompute + renormalize: expression-identical to
        # train_ivf_codebook (operators/knn.py) — change both together.
        means = (
            assigned.select("centroid_id", F.posexplode("_xv").alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum(F.round(F.col("val"), 9).cast("decimal(12,9)")).alias("s"),
                F.count("*").alias("c"),
            )
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos",
                            (F.col("s").cast("double") / F.col("c")).alias("m"),
                        )
                    )
                ).alias("_pm")
            )
            .select("centroid_id", F.col("_pm").getField("m").alias("_m"))
        )
        norm = F.sqrt(F.aggregate(F.col("_m"), F.lit(0.0), lambda a, v: a + v * v))
        cent = (
            means.select("centroid_id", "_m", norm.alias("_n"))
            .select(
                "centroid_id",
                F.transform(F.col("_m"), lambda v: v / F.col("_n")).alias("_cv"),
            )
            .persist()  # next round's _nearest_centroid collects this
        )
        deps.append(cent)
    out = cent.select("centroid_id", F.col("_cv").alias(vec_col))
    out._cached_deps = deps
    return out
