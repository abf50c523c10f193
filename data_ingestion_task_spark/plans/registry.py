"""Named-query registry: each engine operator is exposed as a named
query ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a
DuckDB oracle twin — the driver's correctness gate (see repo-root
``__spark_entry__.py``).

Parity rules that every registered query follows (so the driver's
order-insensitive value-hash matches bit-for-bit):

- Alias every computed column identically in Spark and SQL.
- Money/measure sums go through exact DECIMAL arithmetic (double
  sums are order-dependent); averages are ``CAST(dec_sum AS DOUBLE) /
  count`` so both engines do one identical IEEE division.
- Window functions only emit ``row_number`` alongside the FULL
  ordering key, so tied rows permute into identical output rows.
- Timestamps are compared as dates / epoch integers, session TZ
  pinned to UTC.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an engine query under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Deterministic semantics regardless of the caller's
            # session defaults: UTC timestamps; non-ANSI (try_* style)
            # null-on-error casts like the oracle's.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.ansi.enabled", "false")
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "")
        return wrapped

    return deco


_LOADED = False


def load_all() -> None:
    """Import every plan module so its @query decorators run."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        dedup_plans,
        eval_plans,
        events_plans,
        extract_plans,
        ml_plans,
        multimodal_plans,
        normalize_plans,
        refine_plans,
        relational_plans,
        text_plans,
        vector_plans,
    )

    _LOADED = True


def queries_dict() -> dict[str, QueryFn]:
    load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_dict() -> dict[str, str]:
    load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
