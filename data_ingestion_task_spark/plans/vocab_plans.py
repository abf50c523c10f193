"""Tokenizer-induction primitive: one distributed BPE merge round
(beyond-reference training-corpus operator, sibling of the dedup /
mixture / packing suite in ``pretrain_plans``).

BPE training is "count adjacent symbol pairs, merge the most frequent,
repeat". The scale-critical trick (same one SentencePiece/HF tokenizers
use single-node) is that pair counts decompose over the WORD VOCABULARY,
not the token stream: tally each distinct word once with its corpus
frequency, then weight its internal pairs by that frequency. The pair
stage therefore runs over vocabulary-sized data (sublinear in corpus
bytes — web-scale corpora have ~10⁷ distinct words per 10¹² tokens)
while the only corpus-sized pass is the combiner-friendly word count:
map-side partial aggs absorb the token stream before the one shuffle
on ``w``. A full tokenizer train is a short driver loop over this
primitive with the winning pair folded into the symbolization; the
engine registers the single round — the loop adds no new plan shape.
The loop itself ships as ``operators/bpe.py::train_bpe`` (vocab-grain
state, boundary-guarded merge fold, per-round localCheckpoint),
verified against an independent pure-Python BPE in tests/test_bpe.py.

Catalyst note (SCALE.md generator trap): the token array is
materialized in its OWN projection below the explode; exploding the
raw tokenizer expression would hoist the regex Project above the
Generate and re-run it per token row (measured 142 s vs 6 s at sf1 on
the retrieval family's identical frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._text_shared import D_NORM_WORDS, spark_norm_words
from .registry import query

#: Pairs reported per round (top-k by weighted frequency).
TOP_PAIRS = 32


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → ``(w, wc)`` vocabulary with frequencies: the shared
    FIRST stage of the registered ``bpe_pair_merge`` round and the
    ``operators/bpe.py`` trainer — defined once so the tokenizer
    call and the ≥2-length floor cannot drift between the certified
    primitive and the loop that iterates it (the same single-source
    rule ``_text_shared`` enforces for the tokenizer itself).
    The token array is materialized in its own projection below the
    explode (module docstring Catalyst note)."""
    toks = docs.select(spark_norm_words(text_col).alias("toks"))
    words = toks.select(F.explode("toks").alias("w"))
    return (
        words.where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )


@query(
    "bpe_pair_merge",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({D_NORM_WORDS}) AS w FROM documents
    ),
    vocab AS (
      SELECT w, COUNT(*) AS wc FROM toks WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                                   i -> substr(w, i, 2))) AS pair,
             wc
      FROM vocab
    )
    SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT {TOP_PAIRS}
    """,
)
def bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge round over ``documents``: corpus word counts →
    per-vocab-word adjacent character pairs weighted by word frequency
    → top-``TOP_PAIRS`` merge candidates. Total order (count DESC, pair
    ASC) makes the limit boundary deterministic; the global top-k
    plans as TakeOrderedAndProject (per-partition heaps), never a full
    sort."""
    vocab = word_counts(load_table(spark, sf_dir, "documents"))
    pair_arr = vocab.select(
        F.expr(
            "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
        ).alias("ps"),
        "wc",
    )
    pairs = pair_arr.select(F.explode("ps").alias("pair"), "wc")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(TOP_PAIRS)
    )
