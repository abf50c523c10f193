"""Property tests (SURVEY §5 strategy depth): algebraic invariants of
the hashing encoder (pure-Python twin, hypothesis) and exhaustive
deterministic batteries for the money round trip and the chunker —
each battery is ONE Spark job over a generated frame, not a job per
example."""

from __future__ import annotations

import random
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestion_task_spark.operators.encode import hashing_embed

words_st = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8),
    min_size=0,
    max_size=30,
)


@settings(max_examples=150, deadline=None)
@given(words_st, st.integers(0, 2**31))
def test_encoder_permutation_invariant(ws: list[str], seed: int) -> None:
    """Bucket sums are order-independent → any word permutation embeds
    identically (this is why the vector is exact under any partitioning)."""
    shuffled = ws[:]
    random.Random(seed).shuffle(shuffled)
    assert hashing_embed(" ".join(ws), 16, "enc") == hashing_embed(" ".join(shuffled), 16, "enc")


@settings(max_examples=150, deadline=None)
@given(words_st, words_st)
def test_encoder_concatenation_additive(a: list[str], b: list[str]) -> None:
    """embed(a ⧺ b) = embed(a) + embed(b) elementwise — counts add."""
    va = hashing_embed(" ".join(a), 16, "enc")
    vb = hashing_embed(" ".join(b), 16, "enc")
    vab = hashing_embed(" ".join(a + b), 16, "enc")
    assert vab == [x + y for x, y in zip(va, vb)]


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
def test_encoder_normalization_invariant(s: str) -> None:
    """Case and punctuation never change the embedding (tokens are
    casefolded and stripped before hashing). ASCII only: multi-char
    case folds like 'ß'→'SS' legitimately change tokenization, and the
    cross-engine contract is ASCII text."""
    assert hashing_embed(s, 16, "enc") == hashing_embed(s.upper(), 16, "enc")
    assert hashing_embed(s, 16, "enc") == hashing_embed("!!" + s + "??", 16, "enc")


def test_money_roundtrip_battery(spark):
    """format_money ∘ money_decimal is the identity on canonical
    display strings, and money_decimal recovers the signed value from
    every §2.7 render variant — checked for a dense value grid in one
    Spark job."""
    from data_ingestion_task_spark.functions import normalize as N

    cents = list(range(0, 2_000_000, 9_973)) + [1, 99, 100, 999_999_999]
    rows = [(str(i), Decimal(c) / 100 * (1 if i % 2 else -1)) for i, c in enumerate(cents)]
    df = spark.createDataFrame(rows, "id string, v decimal(18,2)")
    disp = N.format_money(F.col("v"))
    variants = {
        "plain": F.col("v").cast("string"),
        "parens": F.concat(F.lit("($"), F.abs(F.col("v")).cast("string"), F.lit(")")),
        "trailing": F.concat(F.abs(F.col("v")).cast("string"), F.lit("-")),
        "credit": F.concat(F.abs(F.col("v")).cast("string"), F.lit(" CR")),
        "pretty": F.concat(F.lit("$"), F.format_number(F.abs(F.col("v")), 2)),
    }
    checks = df.select(
        # round trip: parse(display(v)) == v
        (N.money_decimal(disp) == F.col("v")).alias("rt"),
        # idempotence: display(parse(display(v))) == display(v)
        (N.format_money(N.money_decimal(disp)) == disp).alias("idem"),
        # every §2.7 render variant parses back to the signed value
        (N.money_decimal(variants["plain"]) == F.col("v")).alias("plain_rt"),
        (N.money_decimal(variants["parens"]) == -F.abs(F.col("v"))).alias("p_neg"),
        (N.money_decimal(variants["trailing"]) == -F.abs(F.col("v"))).alias("t_neg"),
        (N.money_decimal(variants["credit"]) == -F.abs(F.col("v"))).alias("c_neg"),
        (N.money_decimal(variants["pretty"]) == F.abs(F.col("v"))).alias("pr_pos"),
    )
    agg = checks.agg(
        *[F.sum(F.when(F.col(c), 0).otherwise(1)).alias(c) for c in checks.columns]
    ).collect()[0]
    assert all(v == 0 for v in agg.asDict().values()), agg.asDict()


def test_chunker_battery(spark):
    """Chunk count and word conservation for every text length 0..300:
    n_chunks = |range(0, max(n-1,0)+1, step)| and the concatenation of
    chunks re-covers each word exactly once plus `overlap` repeats per
    chunk boundary (except a short tail)."""
    from data_ingestion_task_spark.functions.text import explode_chunks

    CHUNK, OVER = 64, 16
    step = CHUNK - OVER
    rows = [(n, " ".join(f"w{i}" for i in range(n))) for n in range(0, 301, 3) if n > 0]
    df = spark.createDataFrame(rows, "n int, text string")
    chunks = explode_chunks(df, text_col="text", id_cols=["n"], chunk_size=CHUNK, overlap=OVER)
    got = {
        r["n"]: (r["n_chunks"], r["total_words"])
        for r in chunks.groupBy("n")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.size(F.split("chunk_text", " "))).alias("total_words"),
        )
        .collect()
    }
    for n, _ in rows:
        starts = list(range(0, max(n - 1, 0) + 1, step))
        exp_chunks = len(starts)
        exp_words = sum(min(CHUNK, n - s) for s in starts)
        assert got[n] == (exp_chunks, exp_words), (n, got[n], (exp_chunks, exp_words))
