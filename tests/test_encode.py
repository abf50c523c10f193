"""Encoder stage + tokenizer tests (SURVEY §2.6 embed / §2.2
num_tokens): deterministic hashing encoder parity (driver twin vs
pandas_udf vs DuckDB), pluggability seam, gated real-model paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_task_spark.operators.encode import (
    duckdb_hashing_encoder_sql,
    encode_text,
    hashing_embed,
    hashing_encoder_udf,
    num_tokens,
    sentence_transformer_encoder_udf,
    token_count_udf,
)

TEXTS = [
    "The quick brown Fox! jumps over 42 lazy-dogs.",
    "  spaced   out\ttabs and\nnewlines  ",
    "",
    "UPPER lower MiXeD 123 ... !!!",
]


def test_hashing_embed_deterministic_and_signed():
    v1 = hashing_embed(TEXTS[0], 16, "enc")
    v2 = hashing_embed(TEXTS[0], 16, "enc")
    assert v1 == v2
    assert len(v1) == 16
    assert all(float(x).is_integer() for x in v1)  # exact ±1 sums
    assert hashing_embed("", 16, "enc") == [0.0] * 16
    # salt changes the embedding
    assert hashing_embed(TEXTS[0], 16, "other") != v1


def test_udf_matches_driver_twin(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id int, text string")
    got = {
        r["id"]: r["emb"]
        for r in df.select("id", hashing_encoder_udf(16)(F.col("text")).alias("emb")).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == hashing_embed(t, 16, "enc"), t


def test_memo_cap_eviction_preserves_bit_equality(monkeypatch):
    """Filling the per-worker memo past its cap (guide §5: bound
    long-lived executor state) must drop-and-rebuild without changing
    a single output bit — every entry is a pure md5 derivation."""
    import data_ingestion_task_spark.operators.encode as enc
    import pandas as pd

    monkeypatch.setattr(enc, "_HASH_BUCKET_MEMO_MAX", 4)
    monkeypatch.setattr(enc, "_HASH_BUCKET_MEMO", {})
    udf = enc.hashing_encoder_udf(16)
    # the wrapped python function of the pandas_udf
    fn = udf.func
    texts = pd.Series(TEXTS + ["alpha beta gamma delta epsilon zeta eta theta"])
    out1 = fn(texts)
    memo = enc._HASH_BUCKET_MEMO[("enc", 16)]
    assert len(memo) <= 4  # cap enforced (cleared + refilled)
    out2 = fn(texts)  # second pass crosses the cap again
    for a, b, t in zip(out1, out2, texts):
        assert a == b == enc.hashing_embed(t, 16, "enc")


def test_duckdb_twin_matches(duck):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(TEXTS)))
        + ") t(id, text)",
        TEXTS,
    )
    sql = "WITH " + duckdb_hashing_encoder_sql("src", "id", "text", 16) + \
          " SELECT id, v FROM enc_vecs ORDER BY id"
    for id_, v in con.execute(sql).fetchall():
        assert list(v) == hashing_embed(TEXTS[id_], 16, "enc")


def test_encode_text_pluggable(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id int, text string")
    out = encode_text(df, dim=8).select("doc_id", "embedding").collect()
    assert len(out[0]["embedding"]) == 8
    # swap in a custom encoder column fn
    custom = encode_text(df, encoder=lambda c: F.array(F.length(c).cast("double")))
    assert custom.collect()[0]["embedding"] == [11.0]


def test_sentence_transformer_gate():
    with pytest.raises(ImportError, match="sentence-transformers"):
        sentence_transformer_encoder_udf()


def test_token_count_udf_with_injected_tokenizer(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    counts = [
        r["n"]
        for r in df.select(
            token_count_udf(tokenize_fn=str.split)(F.col("text")).alias("n")
        ).collect()
    ]
    assert counts == [len(t.split()) for t in TEXTS]


def test_token_count_udf_gate_without_transformers():
    import importlib

    if importlib.util.find_spec("transformers") is None:
        with pytest.raises(ImportError, match="transformers"):
            token_count_udf()


def test_num_tokens_falls_back_to_bpe_ish(spark):
    df = spark.createDataFrame([("hello, world! 42",)], "text string")
    real = df.select(num_tokens(F.col("text"), prefer_real=True).alias("n")).collect()[0]["n"]
    est = df.select(num_tokens(F.col("text")).alias("n")).collect()[0]["n"]
    # transformers absent in this container → both take the BPE-ish path
    assert real == est == 5  # [hello][,][world][!][42]


def test_wordnet_expander_gate():
    import importlib.util

    from data_ingestion_task_spark.operators.encode import wordnet_expander_udf

    if importlib.util.find_spec("nltk") is None:
        with pytest.raises(ImportError, match="nltk"):
            wordnet_expander_udf()


def test_expand_query_terms_column(spark):
    from data_ingestion_task_spark.functions.text import expand_query_terms

    df = spark.createDataFrame([("the BIG slow join",)], "q string")
    out = df.select(
        expand_query_terms(F.col("q"), {"big": "large", "join": "merge"}).alias("e")
    ).collect()[0]["e"]
    assert out == "the BIG large slow join merge"
