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
import hashlib
import inspect
import json
import os
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
    content_hash: str = ""  # sha256 of (fn source, oracle) at registration


def _content_hash(fn: Callable, oracle: str | None) -> str:
    """Fingerprint of a query's observable definition: its function
    source (decorators included) + oracle SQL. Any edit to either makes
    the query sort back into the driver's bounded check prefix (see
    ``_ordered_names``). Helper-function edits are NOT captured — when
    a shared helper changes semantics, evict its dependents from
    ``driver_checked.json`` via ``tools/record_driver_check.py --evict``."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # REPL-defined fn: treat as always-changed
        src = ""
    h = hashlib.sha256()
    h.update(src.encode())
    h.update(b"\0")
    h.update((oracle or "").encode())
    return h.hexdigest()


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

        REGISTRY[name] = QuerySpec(
            name=name,
            fn=wrapped,
            oracle=oracle,
            doc=fn.__doc__ or "",
            content_hash=_content_hash(fn, oracle),
        )
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
        pretrain_plans,
        refine_plans,
        relational_plans,
        text_plans,
        vector_plans,
    )

    _LOADED = True


#: Ledger of queries certified by an external driver check: maps query
#: name -> content hash (``QuerySpec.content_hash``) at the time the
#: driver last verified it green. Maintained ONLY by
#: ``tools/record_driver_check.py`` from CORRECTNESS_r*.json artifacts
#: — never hand-curated. A query whose current hash differs from (or is
#: absent in) the ledger is UNCERTIFIED and sorts first so the driver's
#: bounded check prefix always covers changed-or-new queries before the
#: long-stable remainder.
CHECKED_LEDGER_PATH = os.path.join(os.path.dirname(__file__), "driver_checked.json")


def checked_ledger() -> dict[str, str]:
    try:
        with open(CHECKED_LEDGER_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def uncertified_names() -> list[str]:
    """Registered queries whose current definition was never verified
    by a driver check (new, or edited since their last green check), in
    registration order."""
    load_all()
    ledger = checked_ledger()
    return [n for n, spec in REGISTRY.items() if ledger.get(n) != spec.content_hash]


def _ordered_names() -> list[str]:
    """Uncertified queries first (registration order), then certified
    ones (registration order). This is the single ordering rule — no
    hand-picked priority list. The external harness checks a bounded
    prefix of this dict, so the invariant this enforces is: nothing
    changed-since-last-check can rotate out of the checked window."""
    load_all()
    ledger = checked_ledger()
    stale = [n for n in ledger if n not in REGISTRY]
    assert not stale, (
        f"driver_checked.json names no longer registered: {stale} — "
        "rerun tools/record_driver_check.py or remove them"
    )
    first = [n for n, spec in REGISTRY.items() if ledger.get(n) != spec.content_hash]
    rest = [n for n, spec in REGISTRY.items() if ledger.get(n) == spec.content_hash]
    return first + rest


def queries_dict() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_dict() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle
    }
