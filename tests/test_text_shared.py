"""The hoisted cross-engine tokenizer (plans/_text_shared): the Spark
expression and the DuckDB string must tokenize identically, or every
query built on either silently certifies against a drifted twin."""

from __future__ import annotations

import duckdb

from data_ingestion_task_spark.plans._text_shared import (
    D_NORM_WORDS,
    spark_norm_words,
)

FIXTURE = [
    "plain lower words",
    "  Mixed CASE  with   runs of    spaces  ",
    "tabs\tand\nnewlines\r\nand\fformfeed",
    "punct,u.at;io:n! st&ri(pp)ed? 'quo\"tes' [brack]ets {braces}",
    "digits 123 mix3d t0kens 0x2a",
    "unicode Héllo çafé naïve 北京 привет",
    "nbsp a b stays joined",
    "",
    "   ",
    "hyphen-ated under_scored dot.ted",
    "trailing punctuation!!!",
    "!!?!",
]


def test_spark_and_duckdb_tokenizers_agree(spark):
    df = spark.createDataFrame([(t,) for t in FIXTURE], ["text"])
    got_spark = [r[0] for r in df.select(spark_norm_words()).collect()]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT {D_NORM_WORDS} FROM (SELECT ? AS text)", [t]
        ).fetchone()[0]
        for t in FIXTURE
    ]
    assert got_spark == got_duck


def test_retrieval_and_text_plans_share_the_definition():
    # the hoist's point: one definition object, no copies left to drift
    from data_ingestion_task_spark.plans import retrieval_plans, text_plans

    assert retrieval_plans._D_RETRIEVAL_WORDS is D_NORM_WORDS
    assert text_plans._D_NORM_WORDS is D_NORM_WORDS
    assert retrieval_plans._spark_tokens is spark_norm_words
