"""Corpus-level quality-score library: the DataFrame-shaped scoring
functions behind the registered ``char_trigram_perplexity`` and
``dsir_importance_weights`` queries (plans/lm_plans.py,
plans/quality_plans.py), extracted so ``api.curate_corpus`` can score
raw documents itself instead of demanding precomputed score frames.

Both functions take ANY docs frame (column names parameterized), not a
(spark, sf_dir) pair — the registered queries are thin ``load_table``
wrappers around these, so the oracle-certified expressions and the
library expressions are the same code object.

Reference parity: the reference scores documents with KenLM perplexity
and DSIR importance weights as free-standing library calls its
pipelines compose (the same shape as these functions); see the quality
scoring stages cited in plans/lm_plans.py / plans/quality_plans.py
module docstrings.

Scale notes (100 TB): unchanged from the registered queries — the
trigram rate table is alphabet-bounded (≤ 37³ rows) and the DSIR rate
table is ``n_buckets`` rows (256 default), so both models broadcast at
any corpus size; the only corpus-scale exchanges are map-side-combined
hash aggregates on (doc, key) and doc grains.

Parity armor (certified r6): every ``ln()`` argument is a ratio of
exactly-representable integers cast to double for ONE identical IEEE
division per engine; each log value is rounded to 6 dp and cast
DECIMAL(18,6) BEFORE any per-doc sum, so summation order cannot
perturb a value hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash64, normalized_for_fingerprint
from .width import widen_if_narrow

#: DSIR hashed-unigram bucket count (re-exported by plans/quality_plans).
DSIR_BUCKETS = 256


def trigram_nll(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    character-trigram unigram model (the portable CCNet/KenLM quality
    proxy): ``avg_nll = -mean_i ln(count(tri_i) / total_trigrams)``.
    ``exp(avg_nll)`` is the perplexity; filtering its head/tail is the
    CCNet quality split. Returns ``(id_col, n_tri, avg_nll)``; docs
    shorter than one normalized trigram are absent (no model support).

    The trigram rate table is alphabet-bounded (≤ 37³ rows at any
    corpus size) and broadcast back onto the (doc, trigram, count)
    grain; both corpus-scale aggregations are map-side combined.
    Overlapping trigrams come from ONE JVM regex pass (zero-width
    lookahead ``(?=(.{3})).`` — 3× faster than an interpreted
    higher-order ``transform``+``substring`` chain, measured at
    sf0.1); the model and the per-doc score both derive from the
    persisted (doc, tri, k) grain so the explode runs once. Caller
    contract: the persisted grain rides out as ``_cached_deps``
    (release via ``api.release``)."""
    a = _trigram_grain(docs, text_col, id_col).persist()
    rate = trigram_rate_from_grain(a)
    out = (
        a.join(F.broadcast(rate), "tri")
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_tri"),
            F.round(
                F.sum(F.col("k") * F.col("nll")).cast("double") / F.sum("k"), 6
            ).alias("avg_nll"),
        )
    )
    out._cached_deps = [a]
    return out


def _trigram_grain(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The (id, tri, k) grain both the model and the per-doc score
    derive from (one JVM regex pass — module docstring)."""
    # The regex normalize + trigram explode is the per-row cost center;
    # widen a starved (single-row-group) scan so it parallelizes
    # (no-op on healthy layouts — functions/width.py).
    t = (
        widen_if_narrow(docs.select(id_col, text_col))
        .select(id_col, normalized_for_fingerprint(F.col(text_col)).alias("txt"))
        .filter(F.length("txt") >= 3)
    )
    tri = t.select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.col("txt"), F.lit("(?=(.{3}))."), 1)
        ).alias("tri"),
    )
    return tri.groupBy(id_col, "tri").agg(F.count("*").alias("k"))


def trigram_rate_from_grain(grain: DataFrame) -> DataFrame:
    """The trigram model ``(tri, nll DECIMAL(18,6))`` from a (id, tri,
    k) grain — alphabet-bounded (≤ 37³ rows), broadcastable forever."""
    c = grain.groupBy("tri").agg(F.sum("k").alias("cnt"))
    tot = c.agg(F.sum("cnt").alias("n"))
    return c.crossJoin(F.broadcast(tot)).select(
        "tri",
        F.round(-F.log(F.col("cnt").cast("double") / F.col("n").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("nll"),
    )


def trigram_rate_model(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train the character-trigram model alone — the FROZEN-model
    artifact a streaming scorer broadcasts (``streaming/curate.py``'s
    scored admission) or a batch sweep reuses across calls. Same
    expressions as :func:`trigram_nll`'s internal model, so scoring
    new docs against it reproduces the certified values bit-for-bit
    wherever the model's support covers them."""
    return trigram_rate_from_grain(_trigram_grain(docs, text_col, id_col))


def dsir_logweights(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """DSIR (Xie et al. 2023) importance weight per document: hashed
    unigram bucket counts for the target slice (rows where
    ``target_pred`` holds — e.g. ``F.col("lang") == "en"``) vs the raw
    corpus, Laplace-smoothed, and each doc scores the mean log ratio
    of its words' buckets. Positive ⇒ looks like the target
    distribution; resample ∝ exp(weight). Returns ``(id_col,
    *carry_cols [any_value], n_words, dsir_logweight)``.

    The rate table is ``n_buckets`` rows (broadcast both ways); the
    per-doc mean is one map-side-combined aggregate on ``id_col``.
    A NULL ``target_pred`` counts as out-of-target (same as false)."""
    w = _word_buckets(docs, target_pred, text_col, id_col, n_buckets, carry_cols)
    rate = dsir_rate_from_buckets(w, n_buckets)
    return (
        w.join(F.broadcast(rate), "bucket")
        .groupBy(id_col)
        .agg(
            *[F.any_value(F.col(c)).alias(c) for c in carry_cols],
            F.count("*").alias("n_words"),
            F.round(F.sum("lr").cast("double") / F.count("*"), 6).alias(
                "dsir_logweight"
            ),
        )
    )


def _word_buckets(
    docs: DataFrame,
    target_pred: Column,
    text_col: str,
    id_col: str,
    n_buckets: int,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The (id, [carry], _is_target, bucket) word grain both the rate
    table and the per-doc mean derive from."""
    # Same starved-scan guard as the trigram grain: the normalize +
    # word explode serializes on a 1-partition input otherwise.
    docs = widen_if_narrow(docs)
    d = docs.select(
        id_col,
        *carry_cols,
        F.coalesce(target_pred, F.lit(False)).alias("_is_target"),
        normalized_for_fingerprint(F.col(text_col)).alias("t"),
    )
    return d.select(
        id_col, *carry_cols, "_is_target", F.explode(F.split(F.col("t"), " ")).alias("word")
    ).select(
        id_col,
        *carry_cols,
        "_is_target",
        (hash64(F.col("word")) % n_buckets).alias("bucket"),
    )


def dsir_rate_from_buckets(w: DataFrame, n_buckets: int) -> DataFrame:
    """The DSIR rate table ``(bucket, lr DECIMAL(18,6), n_buckets)``
    from a word grain — ``n_buckets`` rows, broadcastable forever.
    The table stamps its own modulus (the same ``n_buckets`` column
    :func:`dsir_rate_model` pins) so a rate table built through THIS
    path — not just the full trainer — can feed
    ``streaming/curate.py``'s modulus-deriving scorer (ADVICE r11 #4;
    a legacy un-stamped table forced a manual column add)."""
    r = w.groupBy("bucket").agg(F.count("*").alias("cr"))
    t = w.filter(F.col("_is_target")).groupBy("bucket").agg(F.count("*").alias("ct"))
    tot = w.agg(
        F.count("*").alias("R"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("T"),
    )
    return (
        r.join(t, "bucket", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log(
                    ((F.col("ct") + 1) * (F.col("R") + n_buckets)).cast("double")
                    / ((F.col("cr") + 1) * (F.col("T") + n_buckets)).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lr"),
        )
        .withColumn("n_buckets", F.lit(n_buckets))
    )


def dsir_rate_model(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Train the DSIR rate table alone — the FROZEN-model artifact for
    streaming scored admission / cross-sweep reuse, same expressions
    as :func:`dsir_logweights`' internal model. The table carries its
    own modulus as a constant ``n_buckets`` column so a scorer can
    never pair the model with a different bucket count silently
    (``hash64(word) % wrong_modulus`` returns plausible-but-wrong
    rates, no error — ADVICE r10 #2); ``streaming/curate.py``'s
    ``dsir_logweight_score`` derives its modulus from this column."""
    return dsir_rate_from_buckets(
        _word_buckets(docs, target_pred, text_col, id_col, n_buckets), n_buckets
    )
