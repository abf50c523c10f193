"""Skew mitigation operators (SCALE.md §4): salting for hot join keys.

The reference corpus is heavily skewed (Bank Statement = 82% of pages,
Neww_Fai.py:645-652). AQE's skew-join split handles most cases at
runtime; ``salted_join`` is the explicit recipe for the pathological
hot key in a sort-merge join — the big side spreads each key across
``n_salts`` sub-keys (deterministic hash of a row key, NOT rand(), so
retries/restages land identically), the small side replicates
``n_salts``×. Shuffle volume: big side unchanged, small side ×salts —
the classic trade."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    big_row_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key shuffle
    spread across ``n_salts`` partitions per key value.

    ``big_row_key`` must be any column that varies within a key group
    (a row id) — its hash picks the salt deterministically. Result is
    row-identical to ``big.join(small, key, how)`` for the supported
    join types: inner and left (big-side-preserving). Right/full outer
    are rejected — the replicated small side would emit one
    null-extended row per unmatched salt replica."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how.lower().replace("_", "") not in {"inner", "left", "leftouter"}:
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: the "
            "small side is replicated per salt, so right/full outer would "
            "produce spurious null-extended rows for unmatched replicas"
        )
    salt = F.pmod(F.xxhash64(F.col(big_row_key)), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
