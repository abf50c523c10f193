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

import contextlib
import functools
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Session confs every registered query requires AT EXECUTION TIME.
#: Because DataFrames are lazy, the @query wrapper pins these for the
#: session and deliberately does NOT restore them afterwards — restoring
#: before the caller collects would silently change cast/timezone
#: semantics mid-plan. Library callers embedding queries in a session
#: with different settings should collect inside ``pinned_conf(spark)``
#: to get save/restore isolation.
PINNED_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
}


@contextlib.contextmanager
def pinned_conf(spark: SparkSession) -> Iterator[None]:
    """Pin :data:`PINNED_CONF` for the duration of the block, then
    restore the caller's previous values (including unset)."""
    prev: dict[str, str | None] = {}
    for k, v in PINNED_CONF.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


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
            # null-on-error casts like the oracle's. Left pinned after
            # return — see PINNED_CONF for why, and pinned_conf() for
            # callers needing isolation.
            for k, v in PINNED_CONF.items():
                spark.conf.set(k, v)
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
        doctype_plans,
        encode_plans,
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
