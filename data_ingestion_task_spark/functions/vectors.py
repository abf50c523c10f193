"""Vector math over ``array<float>`` columns, expressed as higher-order
array functions (JVM-side, no Python).

Reference: L2-normalize `code/python/Neww_Fai.py:339-340`, cosine/IP
similarity conversions `code/python/Faiss_2_10.py:485` /
`code/python/Fai_new.py:180`. Cross-engine determinism: every element
is cast to DOUBLE before arithmetic and reduction is sequential
left-to-right in both Spark ``aggregate`` and the DuckDB oracle, so
results are bitwise-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with elementwise double promotion."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm2(a: Column) -> Column:
    """‖a‖₂."""
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column) -> Column:
    """a / ‖a‖₂ (NULL-safe: zero vector stays zero). Mirrors
    faiss.normalize_L2 before an IP index."""
    n = norm2(a)
    return F.when(n == 0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: x.cast("double") / n)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(‖a‖·‖b‖); NULL when either norm is 0."""
    denom = norm2(a) * norm2(b)
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(dot(a, b) / denom)


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance (IndexFlatL2 semantics)."""
    diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v * v))


def ip_to_unit(sim: Column) -> Column:
    """Inner-product → [0,1] score: (1+d)/2 (Fai_new.py:180)."""
    return (F.lit(1.0) + sim) / F.lit(2.0)


def cosine_dist_to_sim(dist: Column) -> Column:
    """cosine distance → similarity: 1 - max(0, dist)
    (Faiss_2_10.py:485)."""
    return F.lit(1.0) - F.greatest(dist, F.lit(0.0))
