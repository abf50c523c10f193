"""Scale-aware trained IVF-PQ (VERDICT r9 #2): the corpus-tracking
twin of ``ivfpq_trained_topk`` whose training-sample cap GROWS with
the index — ``scaled_sample_cap`` = ``seed_mod · isqrt(N)`` (floored
at the 1024 pin), so the id-residue coarse seeding yields nlist ≈ √N
and trained IVF cells stay √N-sized as the corpus grows.

Why this exists: the pinned query freezes nlist at ~32 forever
(training O(1) in N), and the frozen shape measured 32.0× at 100×
data vs 11.0× for the √N-seeded static ``ann_ivfpq_topk``
(SCALE.md §0c). This query is the production lifecycle — retrain with
a corpus-derived cap — under the same bit-exact oracle gate: the
DuckDB twin recomputes the cap with the exact integer-sqrt idiom
(``s0`` + correction, the ``cmod`` pattern of ``duckdb_ivfpq_sql``)
inside the sample CTE's LIMIT, so both engines draw the identical
hash-sample and every trained artifact matches bit-for-bit.

Cost accounting at 100 TB: the extra price over the pinned query is
trainer work — a sample×nlist BLAS matmul sweep per coarse Lloyd
round (``operators/ivf_train.train_ivf_codebook_blas``; the naive JVM
expansion's 32·N interpreted dots measured 419 s of the sf10 run
before the swap) plus the sample-bounded PQ trainer — paid only at
(re)train time. The search side inherits ``ann_ivfpq_topk``'s
measured ~11× at 100× because cells no longer grow with N. Extra
bounded actions: the index-side ``count()`` deriving the cap
(metadata-grade; production reads table stats) and one nlist-row
centroid collect per training round (the BLAS helper's contract).

Reference analogue: the FAISS index is rebuilt per corpus at setup
(`/root/reference/code/python/faiss_implimentation.py:164-173`) —
retraining as the corpus grows is the reference's lifecycle too.

Recall at the grown nlist (r11 A/B, ``tools/recall_ab.py``, exact
baseline on the 1-in-50 query sample, k=3 / n_probe=2 / overscan=8):
recall@3 scaled vs frozen-trained vs derived = **0.101 / 0.129 /
0.079 at sf1** and **0.058 / 0.067 / 0.047 at sf10**. The scaled
lifecycle keeps the trained-codebook advantage over the derived
id-residue centroids (~1.25×) but gives back 13–22% vs the FROZEN
trained pin — exactly the fixed-n_probe-at-growing-nlist trade: at
nlist ≈ √N the searched fraction is n_probe/√N, so recall at constant
n_probe falls as the corpus grows while the frozen pin silently pays
cells ∝ N instead (the 32.0×-at-100× wall this query exists to
avoid). The production answer is REGISTERED below:
``ivfpq_scaled_probe_topk`` holds the searched fraction at nlist/16
(``scaled_n_probe``) and measured recall@3 **0.169 at sf1 / 0.102 at
sf10** — beating even the frozen pin (+31% / +52%) at the same
candidate budget ((nlist/16)·√N ≈ N/16 ≈ the frozen pin's 2·N/32),
because the budget is spent across many well-trained √N-cells instead
of two huge stale ones. The wall parity is MEASURED: same-session
sf10 A/B probe-rule 840.1s vs frozen 868.5s (0.97×) — equal wall,
+52% recall, so the probe rule strictly dominates the frozen pin
(SCALE.md §0c for the full sweep and the load-ambient caveats). This
query keeps n_probe=2 as the fixed-knob twin the A/B compares
against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.pq_train import scaled_sample_cap
from .ivfpq_trained_plans import (
    _N_PROBE,
    _SAMPLE,
    _SEED_MOD,
    _trained_lifecycle,
    _trained_oracle,
)
from .registry import query

#: The oracle's LIMIT expression: ``GREATEST(floor, seed_mod·isqrt(n))``
#: over the index side, with isqrt as floor(sqrt(double)) plus the
#: exact ±1 correction — bit-identical to ``scaled_sample_cap`` for
#: every n below 2^52 (the double-precision exactness bound; corpus
#: row counts live far below it).
_SCALED_LIMIT = f"""(
    SELECT GREATEST({_SAMPLE}, {_SEED_MOD} * (s0 + CASE
               WHEN (s0 + 1) * (s0 + 1) <= n THEN 1
               WHEN s0 * s0 > n THEN -1
               ELSE 0 END))
    FROM (SELECT COUNT(*) AS n,
                 CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s0
          FROM xn))"""


@query("ivfpq_scaled_topk", oracle=_trained_oracle(_SCALED_LIMIT))
def ivfpq_scaled_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full trained IVF-PQ lifecycle with the sample cap tracking
    corpus size (nlist ≈ √N): count the index side, derive
    ``scaled_sample_cap``, train both codebooks on that hash-sample,
    search with the certified probe → ADC → exact-re-rank pipeline.
    The lifecycle body is shared source with the pinned
    ``ivfpq_trained_topk`` (``_trained_lifecycle``); the two deltas
    are the cap derivation and the coarse trainer's assignment stage
    (BLAS prefilter — assignment-identical, see
    ``operators/ivf_train.py``; sample·nlist ≈ 32·N interpreted JVM
    dots per round measured 419 s of the sf10 lifecycle before the
    swap)."""
    from ..operators.ivf_train import train_ivf_codebook_blas
    from ._vector_shared import _split

    _, x = _split(spark, sf_dir)
    cap = scaled_sample_cap(x.count(), seed_mod=_SEED_MOD, floor=_SAMPLE)
    return _trained_lifecycle(
        spark, sf_dir, cap, coarse_trainer=train_ivf_codebook_blas
    )


#: Searched-fraction divisor for the corpus-tracking probe rule:
#: n_probe = max(_N_PROBE, nlist // 16) holds the searched cell
#: fraction at ~1/16 as nlist ≈ √N grows — the §module-docstring
#: recall give-back (13–22% at fixed n_probe=2) is what this buys
#: back, at candidate cost still √N-bounded per extra probe.
_PROBE_DIV = 16

#: The oracle's probe count as a scalar subquery over the TRAINED
#: centroid CTE (kcn) — the same GREATEST(floor, nlist // div) the
#: Spark side computes from the persisted codebook's row count, so
#: both engines probe the identical cell set.
_NPV_TAIL = f""",
npv AS (SELECT GREATEST({_N_PROBE}, COUNT(*) // {_PROBE_DIV}) AS np
        FROM kcn)"""


def scaled_n_probe(nlist: int) -> int:
    """The corpus-tracking probe rule: hold the searched fraction at
    ~1/``_PROBE_DIV`` of the (√N-sized) cell count, floored at the
    registered pin."""
    return max(_N_PROBE, nlist // _PROBE_DIV)


@query(
    "ivfpq_scaled_probe_topk",
    oracle=_trained_oracle(
        _SCALED_LIMIT, n_probe="(SELECT np FROM npv)", extra_ctes_tail=_NPV_TAIL
    ),
)
def ivfpq_scaled_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ivfpq_scaled_topk`` with the PROBE side also corpus-tracking:
    n_probe = max(2, nlist // 16) (``scaled_n_probe``), turning the
    module docstring's production guidance — scale n_probe as nlist
    grows or give back recall — into a certified query instead of
    prose. At the driver's sf0.01 both rules floor to n_probe=2 (tiny
    nlist), so the gate certifies the DERIVATION machinery; the recall
    effect lives at sf1/sf10 (`tools/recall_ab.py`, SCALE.md §0c).
    Oracle parity: the probe count is a scalar subquery over the
    trained-centroid CTE, bit-equal to the Spark side's
    ``codebook.count() // 16`` because the codebook itself is
    parity-pinned (``tests/test_ivf_train.py``)."""
    from ..operators.ivf_train import train_ivf_codebook_blas
    from ._vector_shared import _split

    _, x = _split(spark, sf_dir)
    cap = scaled_sample_cap(x.count(), seed_mod=_SEED_MOD, floor=_SAMPLE)
    return _trained_lifecycle(
        spark,
        sf_dir,
        cap,
        coarse_trainer=train_ivf_codebook_blas,
        probe_rule=scaled_n_probe,
    )
