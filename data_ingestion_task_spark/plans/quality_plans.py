"""Training-corpus curation operators beyond doc-level dedup (the
LLM-data-pipeline mandate, same family as plans/dedup_plans.py /
plans/corpus_plans.py): exact-substring span detection, DSIR-style
importance weights, and a Gopher-style rule filter.

- ``substring_dup_spans`` — the *span-grain* exact-dedup signal
  (Lee et al. 2022, "Deduplicating Training Data Makes Language
  Models Better"): doc-level MinHash misses a 200-word boilerplate
  block pasted into otherwise-distinct documents; repeated k-word
  spans find it.
- ``dsir_importance_weights`` — Data Selection via Importance
  Resampling (Xie et al. 2023): per-doc log importance weight
  ``mean_w log(p_target(bucket(w)) / p_raw(bucket(w)))`` over hashed
  unigram buckets, target = the in-domain slice.
- ``gopher_quality_filter`` — the rule-based quality gate of Rae et
  al. 2021 (Gopher §A1.1): per-rule booleans + an overall keep flag,
  all in EXACT integer arithmetic (cross-multiplied ratios, no float
  thresholds) so the oracle matches bit-for-bit.

Scale notes (100 TB):
- spans: the only shuffle is the group-by on a 60-bit span HASH —
  span text never rides the exchange (the corpus_plans repetition-
  profile lesson: hashing shingles pre-shuffle was its 13.3×→3.8×
  fix); map-side partial aggregation collapses within-doc repeats
  before the wire.
- DSIR: one narrow explode; the rate table is 256 rows (broadcast
  both ways); the per-doc mean is one map-side-combined aggregate on
  doc_id. Log-ratio values are rounded to 6 dp THEN summed as exact
  DECIMAL — only 256 distinct ln() evaluations exist per run, so
  cross-engine float drift has 256 chances, not |corpus| chances.
- Gopher: pure column expressions, one scan, no shuffle at all
  (the keep decision is per-row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.corpus_scores import DSIR_BUCKETS, dsir_logweights
from ..functions.text import hash64, normalized_for_fingerprint, words
from ..sources.tables import load_table
from .registry import query

#: Span width (words) for exact-substring detection.
SPAN_K = 8

_D_NORM_TEXT = (
    "regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9\\s]', '', 'g'), "
    "'\\s+', ' ', 'g')"
)
_D_RAW_WS = "str_split_regex(trim(text), '\\s+')"


def _d_hash64(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
# Exact-substring span dedup signal
# ---------------------------------------------------------------------------

#: Corpus with a planted boilerplate overlap: docs 0-49 re-appear at
#: doc_id+300000 with their first 10 words dropped — every full k-word
#: span of the suffix collides with the original, the exact signal
#: span-grain dedup exists to catch (doc-level exact dedup sees two
#: DIFFERENT fingerprints). Source docs need ≥ SPAN_K+10 words so the
#: copy still yields spans.
_D_SPAN_CORPUS = f"""
      SELECT doc_id, {_D_NORM_TEXT} AS t FROM documents
      UNION ALL
      SELECT doc_id + 300000 AS doc_id,
             array_to_string(str_split({_D_NORM_TEXT}, ' ')[11 :], ' ') AS t
      FROM documents
      WHERE doc_id < 50 AND len(str_split({_D_NORM_TEXT}, ' ')) >= {SPAN_K + 10}
"""


def _span_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", normalized_for_fingerprint(F.col("text")).alias("t")
    )
    ws = F.split(F.col("t"), " ")
    copies = (
        d.filter((F.col("doc_id") < 50) & (F.size(ws) >= SPAN_K + 10))
        .select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat_ws(" ", F.slice(ws, 11, F.size(ws) - 10)).alias("t"),
        )
    )
    return d.unionByName(copies)


@query(
    "substring_dup_spans",
    oracle=f"""
    WITH corpus AS ({_D_SPAN_CORPUS}),
    t AS (SELECT doc_id, str_split(t, ' ') AS ws FROM corpus),
    spans AS (
      SELECT doc_id,
             {_d_hash64(f"array_to_string(ws[i : i + {SPAN_K - 1}], ' ')")} AS span_hash
      FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - {SPAN_K - 1})) AS i
            FROM t)
    )
    SELECT span_hash,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_total,
           MIN(doc_id) AS first_doc
    FROM spans GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY first_doc, span_hash
    """,
)
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated k-word spans (k=8): every span is
    hashed to 60 bits in the SAME narrow stage that generates it, so
    the group-by exchange carries ``(hash, doc_id)`` — never text.
    Emits spans seen in ≥ 2 distinct docs with occurrence counts; a
    downstream pass joins back on the hash to excise the actual bytes
    (not registered — the detection is the scale-critical part)."""
    c = _span_corpus(spark, sf_dir)
    ws = F.split(F.col("t"), " ")
    spans = c.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(ws) >= SPAN_K,
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - SPAN_K + 1),
                    lambda i: hash64(F.concat_ws(" ", F.slice(ws, i, SPAN_K))),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("span_hash"),
    )
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_total"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("first_doc", "span_hash")
    )


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             {_d_hash64("word")} % {DSIR_BUCKETS} AS bucket
      FROM (SELECT doc_id, lang, unnest(str_split({_D_NORM_TEXT}, ' ')) AS word
            FROM documents)
    ),
    r AS (SELECT bucket, COUNT(*) AS cr FROM w GROUP BY bucket),
    t AS (SELECT bucket, COUNT(*) AS ct FROM w WHERE lang = 'en' GROUP BY bucket),
    tot AS (SELECT COUNT(*) AS R,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS T
            FROM w),
    rate AS (
      SELECT r.bucket,
             CAST(round(ln(
               CAST((COALESCE(t.ct, 0) + 1) * (tot.R + {DSIR_BUCKETS}) AS DOUBLE)
               / CAST((r.cr + 1) * (tot.T + {DSIR_BUCKETS}) AS DOUBLE)
             ), 6) AS DECIMAL(18,6)) AS lr
      FROM r LEFT JOIN t USING (bucket) CROSS JOIN tot
    )
    SELECT w.doc_id, ANY_VALUE(w.lang) AS lang,
           COUNT(*) AS n_words,
           CAST(round(CAST(SUM(rate.lr) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
             AS dsir_logweight
    FROM w JOIN rate USING (bucket)
    GROUP BY w.doc_id
    ORDER BY doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) importance weight per document: hashed
    unigram bucket counts for the target slice (``lang='en'`` stands in
    for the in-domain sample) vs the raw corpus, Laplace-smoothed, and
    each doc scores the mean log ratio of its words' buckets. Positive
    ⇒ looks like the target distribution; resample ∝ exp(weight).

    Thin ``load_table`` wrapper around the library function
    ``functions.corpus_scores.dsir_logweights`` (extracted r9 so
    ``api.curate_corpus`` can score raw docs itself) — the certified
    expressions and their parity armor (integer-product ln arguments,
    6-dp DECIMAL log-ratios summed exactly) live there; this adds only
    the target predicate, the carried ``lang`` column, and the
    oracle's ORDER BY."""
    return dsir_logweights(
        load_table(spark, sf_dir, "documents"),
        target_pred=F.col("lang") == "en",
        carry_cols=("lang",),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Gopher-style rule filter
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is"]


@query(
    "gopher_quality_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_D_RAW_WS} AS ws, trim(text) AS txt FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             len(array_to_string(ws, '')) AS n_word_chars,
             len(list_intersect(list_distinct(list_transform(ws, w -> lower(w))),
                                {_GOPHER_STOPWORDS!r})) AS n_stop,
             len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
             len(txt) - len(replace(txt, '#', ''))
               + (len(txt) - len(replace(txt, '...', ''))) // 3 AS n_sym
      FROM t
    )
    SELECT doc_id, n_words,
           n_words >= 20 AND n_words <= 100000 AS word_count_ok,
           3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words AS mean_word_len_ok,
           10 * n_sym <= n_words AS symbol_ok,
           n_stop >= 2 AS stopwords_ok,
           5 * n_alpha >= 4 * n_words AS alpha_ok,
           (n_words >= 20 AND n_words <= 100000)
             AND (3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words)
             AND (10 * n_sym <= n_words)
             AND (n_stop >= 2)
             AND (5 * n_alpha >= 4 * n_words) AS keep
    FROM m ORDER BY doc_id
    """,
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule filter (Rae et al. 2021 §A1.1, the subset that is
    exact-arithmetic portable): word-count band, mean-word-length band,
    symbol-to-word ratio, stopword presence, alpha-word ratio — each
    emitted as its own flag so downstream can audit WHICH rule killed a
    doc, plus the conjunction ``keep``. Ratio thresholds are
    cross-multiplied integers (``5·n_alpha ≥ 4·n_words``), never float
    division, so both engines compare identical bigints."""
    return gopher_flags(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


def gopher_flags(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """DataFrame-shaped Gopher rule filter (the library entry behind
    the registered query, reused by ``api.curate_corpus``): emits
    ``keep_cols`` + ``n_words`` + one boolean per rule + the
    conjunction ``keep``. Same exact-integer arithmetic as the oracle.
    The trimmed-text working column uses a collision-proof internal
    alias so an input that itself carries a ``txt`` column (passed
    through ``keep_cols``) cannot collide with it (ADVICE r9 #4)."""
    _t = "__gopher_txt"
    if _t in keep_cols:
        raise ValueError(f"keep_cols may not contain the internal alias {_t!r}")
    d = docs.select(*keep_cols, F.trim(F.col(text_col)).alias(_t))
    ws = words(F.col(_t))
    m = d.select(
        *keep_cols,
        F.size(ws).cast("bigint").alias("n_words"),
        F.length(F.concat_ws("", ws)).cast("bigint").alias("n_word_chars"),
        F.size(
            F.array_intersect(
                F.array_distinct(F.transform(ws, F.lower)),
                F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
            )
        )
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("bigint").alias("n_alpha"),
        (
            (F.length(_t) - F.length(F.replace(F.col(_t), F.lit("#"), F.lit(""))))
            + F.floor(
                (
                    F.length(_t)
                    - F.length(F.replace(F.col(_t), F.lit("..."), F.lit("")))
                )
                / 3
            )
        )
        .cast("bigint")
        .alias("n_sym"),
    )
    word_count_ok = (F.col("n_words") >= 20) & (F.col("n_words") <= 100000)
    mwl_ok = (3 * F.col("n_words") <= F.col("n_word_chars")) & (
        F.col("n_word_chars") <= 10 * F.col("n_words")
    )
    symbol_ok = 10 * F.col("n_sym") <= F.col("n_words")
    stop_ok = F.col("n_stop") >= 2
    alpha_ok = 5 * F.col("n_alpha") >= 4 * F.col("n_words")
    return m.select(
        *keep_cols,
        "n_words",
        word_count_ok.alias("word_count_ok"),
        mwl_ok.alias("mean_word_len_ok"),
        symbol_ok.alias("symbol_ok"),
        stop_ok.alias("stopwords_ok"),
        alpha_ok.alias("alpha_ok"),
        (word_count_ok & mwl_ok & symbol_ok & stop_ok & alpha_ok).alias("keep"),
    )
