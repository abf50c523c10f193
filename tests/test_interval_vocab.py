"""Semantics tests for the round-6 additions: the binned
range-containment join (plans/interval_plans.py) and the BPE pair
round (plans/vocab_plans.py).

The driver's DuckDB oracle already cross-validates both on the shipped
testdata; these tests pin the EDGE semantics the random testdata may
never hit — exact half-open boundary points, an interval straddling a
bin boundary — and a hand-computed pair tally."""

from __future__ import annotations

import datetime as dt

import pytest

from data_ingestion_task_spark.plans import registry

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def crafted_events_dir(spark, tmp_path_factory):
    """events.parquet with every interval boundary case:

    anchor event_id=0 (0 % 97 == 0) at T0 = 01:30:00 — NOT bin-aligned,
    so its [T0, T0+7200) window straddles the 02:00 bin boundary.
    Points: T0-1s (out), T0 (in: the anchor), T0+1 (in, first bin),
    T0+7199 (in, SECOND bin — crosses 02:00), T0+7200 (out, exact
    exclusive end).
    """
    t0 = dt.datetime(2024, 1, 1, 1, 30, 0, tzinfo=UTC)

    def ev(eid, off_s, uid):
        return (eid, t0 + dt.timedelta(seconds=off_s), uid, "click", 1.0, "{}")

    # Second anchor event_id=97 at 04:00:00 exactly — epoch % 7200
    # == 0, so its window occupies exactly ONE bin (the sequence()
    # explode degenerates to a single element) and must still match.
    aligned = 9000  # 01:30 + 9000s = 04:00:00 UTC
    rows = [
        ev(0, 0, 10),  # the anchor itself
        ev(1, -1, 11),  # just before start → out
        ev(2, 1, 12),  # in, same bin as anchor
        ev(3, 7199, 13),  # in, next bin (past 02:00)
        ev(4, 7200, 14),  # exact exclusive end → out
        ev(97, aligned, 20),  # bin-aligned anchor
        ev(98, aligned + 7199, 21),  # in, same (single) bin
        ev(99, aligned + 7200, 22),  # out
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = str(tmp_path_factory.mktemp("crafted") / "sf")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    return out


def test_interval_join_half_open_boundaries(spark, crafted_events_dir):
    q = registry.queries_dict()["events_interval_join"]
    rows = {r.interval_id: r for r in q(spark, crafted_events_dir).collect()}
    assert set(rows) == {0, 97}
    r = rows[0]
    assert r.tag == "click"
    # anchor + offsets 1 and 7199 are in; -1 and 7200 are out —
    # and 7199 only matches because the interval exploded into the
    # second bin.
    assert r.n_events == 3
    assert r.n_users == 3
    assert r.sum_value == pytest.approx(3.0)
    # bin-aligned window: single-bin explode, same half-open edges
    r97 = rows[97]
    assert r97.n_events == 2 and r97.n_users == 2


def test_bpe_pair_counts_by_hand(spark, tmp_path_factory):
    # "abab" ×2 docs and "ba!  ba" ×1: tokenizer lowercases, strips
    # punctuation, splits on whitespace. Vocab: abab (wc 2), ba (wc 2
    # — two tokens in one doc). Pairs: abab → ab,ba,ab; ba → ba.
    # Totals: ab = 2*2 = 4, ba = 2*1 + 2*1 = 4.
    rows = [
        (1, "abab", "en", "s", 4),
        (2, "ABAB", "en", "s", 4),
        (3, "ba!  ba", "en", "s", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path_factory.mktemp("craftedv") / "sf")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    q = registry.queries_dict()["bpe_pair_merge"]
    got = {r.pair: r.pair_count for r in q(spark, out).collect()}
    assert got == {"ab": 4, "ba": 4}


def test_multires_rollup_excludes_null_ts(spark, tmp_path_factory):
    # ADVICE r6 #4: a NULL-ts base group (day=NULL, hour=NULL) would be
    # tagged lvl=3 and collide with the grand-total row; the rollup
    # must filter NULL ts first, so totals count only timestamped rows.
    t0 = dt.datetime(2024, 1, 1, 1, 30, 0, tzinfo=UTC)
    rows = [
        (1, t0, 10, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), 11, "click", 2.0, "{}"),
        (3, None, 12, "click", 100.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = str(tmp_path_factory.mktemp("craftednull") / "sf")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    q = registry.queries_dict()["events_multires_rollup"]
    res = q(spark, out).collect()
    totals = [r for r in res if r.lvl == 3]
    assert len(totals) == 1, f"grand-total collision: {totals}"
    assert totals[0].n_events == 2
    assert totals[0].sum_value == pytest.approx(3.0)
