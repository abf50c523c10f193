"""Distributed BPE tokenizer training: the full merge loop over the
pair-count primitive registered as ``bpe_pair_merge``
(plans/vocab_plans.py — see its module docstring for why pair counts
run at VOCABULARY grain, the property that makes BPE train on a
100-TB corpus: one corpus-sized word count, then every round touches
only distinct words weighted by frequency).

Representation: each vocab word is a symbol string — symbols joined
by a separator byte that the corpus tokenizer guarantees can never
appear inside a token (``_SEP``, U+001F; tokens are ``[a-z0-9]+``).
A merge round is then:

1. count adjacent symbol pairs across the vocab, weighted by word
   frequency (same shape as the registered primitive);
2. pick the most frequent pair — ties broken lexicographically, so
   training is deterministic on any cluster layout;
3. fold it into the vocabulary with one JVM regex replace of
   ``a␟b`` → ``ab`` guarded by zero-width symbol-boundary assertions
   ``(?<![^␟])…(?![^␟])`` (also true at string edges). The boundary
   guards stop the pair from matching INSIDE a longer symbol (symbols
   ``ab|c`` must not match pair ``(b, c)``), and because lookarounds
   consume nothing, the shared separator between back-to-back
   occurrences stays available: ``a a a a`` under merge (a,a) becomes
   ``aa aa`` — BPE's leftmost-first non-overlapping order — not
   ``aa a a``. Symbols are ``[a-z0-9]+`` (the corpus tokenizer's
   alphabet), so the pair needs no regex quoting.

The loop state is the (sym_str, wc) vocab frame: VOCABULARY-sized, so
each round is a small job regardless of corpus size. It is
re-materialized per round via ``localCheckpoint`` (the unrolled
deep-plan alternative is measured slower under AQE — see SKILL
gotchas / dedup loops) and the previous round's blocks are REALLY
freed through ``functions/cache.release_frame``.

The driver-side part is just the argmax collect (one 2-field row per
round) and loop control — no data rows ever reach the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cache import release_frame
from ..plans.vocab_plans import word_counts

#: Symbol separator — outside the tokenizer's [a-z0-9] alphabet.
_SEP = "\x1f"


def initial_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → ``(sym_str, wc)``: the one corpus-sized pass, built on
    the SAME ``word_counts`` stage as the certified ``bpe_pair_merge``
    primitive (single-source, review finding r6 — tokenizer call and
    length floor cannot drift); each word then becomes its character
    symbols joined by ``_SEP``."""
    return word_counts(docs, text_col).select(
        F.array_join(
            F.filter(F.split("w", ""), lambda c: c != ""), _SEP
        ).alias("sym_str"),
        "wc",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts at vocabulary grain (the registered
    primitive's shape, over symbols instead of characters)."""
    syms = vocab.select(F.split("sym_str", _SEP).alias("s"), "wc").where(
        F.size("s") >= 2
    )
    pair_arr = syms.select(
        F.expr(
            f"transform(sequence(1, size(s) - 1),"
            f" i -> concat(s[i - 1], '{_SEP}', s[i]))"
        ).alias("ps"),
        "wc",
    )
    return (
        pair_arr.select(F.explode("ps").alias("pair"), "wc")
        .groupBy("pair")
        .agg(F.sum("wc").alias("pair_count"))
    )


def train_bpe(
    spark: SparkSession,
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Run ``n_merges`` BPE rounds; returns ``(merges, vocab)`` where
    ``merges`` is the ordered list of merged symbol pairs and
    ``vocab`` the final ``(sym_str, wc)`` frame (caller owns its
    lifetime). Stops early when no pair occurs twice."""
    vocab = initial_vocab(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < 2:
            break
        a, b = best[0]["pair"].split(_SEP)
        merges.append((a, b))
        pat = f"(?<![^{_SEP}]){a}{_SEP}{b}(?![^{_SEP}])"
        nxt = vocab.withColumn(
            "sym_str", F.regexp_replace("sym_str", pat, a + b)
        ).localCheckpoint()
        release_frame(vocab)
        vocab = nxt
    return merges, vocab
