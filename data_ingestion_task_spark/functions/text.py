"""Text analysis column expressions: lengths, truncation, chunking,
tokens, language-ID, quality scoring, fingerprints, shingles.

Reference: derivations `code/python/Neww_Fai.py:661-662`, truncation
`code/python/Faiss_2_10.py:410-418`, chunking
`code/python/Faiss_2_10.py:222-243` / `code/python/rag_3_4.py:343-353`.
All JVM-side (split/slice/transform/sequence) — chunking is a pure
array expression + ``posexplode``, no Python, so it scales to 100 TB
as a narrow map stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Lengths / tokens
# ---------------------------------------------------------------------------


def char_len(text: Column) -> Column:
    """len(text) (Neww_Fai.py:661)."""
    return F.length(text).cast("bigint")


def words(text: Column) -> Column:
    """Whitespace tokenization, no empty tokens (pandas str.split())."""
    return F.split(F.trim(text), r"\s+")


def word_len(text: Column) -> Column:
    """len(text.split()) (Neww_Fai.py:662); 0 for empty/blank."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(words(text))).cast("bigint")


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate without a model: count word-piece-like
    units (runs of letters, digits, or single punctuation). Stands in
    for the HF tokenizer count (wordschrstokens.py:12-22)."""
    toks = F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    return F.size(toks).cast("bigint")


# ---------------------------------------------------------------------------
# Truncation (keep_lines / truncate_doc_text)
# ---------------------------------------------------------------------------


def truncate_lines(text: Column, top_n: int, bottom_n: int) -> Column:
    """Keep first ``top_n`` + last ``bottom_n`` lines; short docs pass
    through unchanged (Faiss_2_10.py:413-415, rag_2.py:52-61)."""
    lines = F.split(text, "\n")
    n = F.size(lines)
    head = F.slice(lines, 1, top_n)
    tail = F.slice(lines, -bottom_n, bottom_n)
    return F.when(n <= top_n + bottom_n, text).otherwise(
        F.concat_ws("\n", F.concat(head, tail))
    )


def truncate_words(text: Column, top_n: int, bottom_n: int) -> Column:
    """Word-level variant used before embedding."""
    ws = words(text)
    n = F.size(ws)
    return F.when(n <= top_n + bottom_n, F.trim(text)).otherwise(
        F.concat_ws(" ", F.concat(F.slice(ws, 1, top_n), F.slice(ws, -bottom_n, bottom_n)))
    )


# ---------------------------------------------------------------------------
# Chunking with overlap (the reference's lolo_chunks)
# ---------------------------------------------------------------------------


def chunk_starts(n_words: Column, chunk_size: int, overlap: int) -> Column:
    """0-based word offsets of each chunk: 0, step, 2·step, … while
    start < n_words, step = chunk_size - overlap (guarded > 0, mirrors
    rag_3_4.py:349)."""
    step = max(1, chunk_size - overlap)
    return F.sequence(F.lit(0), F.greatest(n_words - 1, F.lit(0)), F.lit(step))


def chunk_text_array(text: Column, chunk_size: int, overlap: int) -> Column:
    """array<string> of overlapping word-window chunks."""
    ws = words(text)
    starts = chunk_starts(F.size(ws), chunk_size, overlap)
    return F.transform(starts, lambda s: F.concat_ws(" ", F.slice(ws, s + 1, chunk_size)))


def explode_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    chunk_size: int = 250,
    overlap: int = 10,
) -> DataFrame:
    """Doc table → chunk table (doc ids…, chunk_idx, chunk_text,
    first_chunk). One narrow stage; no shuffle."""
    id_cols = id_cols or ["doc_id"]
    arr = chunk_text_array(F.col(text_col), chunk_size, overlap)
    return (
        df.select(*id_cols, F.posexplode(arr).alias("chunk_idx", "chunk_text"))
        .withColumn("first_chunk", F.col("chunk_idx") == 0)
    )


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic) & quality scoring
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "es", "una", "que"],
}


def _marker_hits(text: Column, markers: list[str]) -> Column:
    ws_arr = F.split(F.lower(F.trim(text)), r"\s+")
    return F.size(F.filter(ws_arr, lambda w: w.isin(*markers)))


def lang_id(text: Column) -> Column:
    """Pick the language whose stopword markers hit most; 'und'
    (undetermined) when nothing hits."""
    hits = {lang: _marker_hits(text, m) for lang, m in _LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # reversed() so that earlier languages win ties (en first).
    for lang in reversed(list(hits)):
        out = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: Column) -> Column:
    """Heuristic doc quality in [0,1]: blend of length band, alpha
    ratio, stopword presence, and low punctuation noise. Deterministic,
    model-free (training-data pipeline filter)."""
    n_chars = F.length(text).cast("double")
    n_words = word_len(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z ]", "")).cast("double")
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")).cast("double")
    stop_hits = _marker_hits(text, _LANG_MARKERS["en"]).cast("double")
    len_band = F.when((n_words >= 10) & (n_words <= 100000), F.lit(1.0)).otherwise(F.lit(0.2))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, F.least(stop_hits / n_words * 5, F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    score = (
        len_band * 0.25 + alpha_ratio * 0.35 + (1.0 - F.least(punct_ratio * 4, F.lit(1.0))) * 0.2
        + stop_ratio * 0.2
    )
    return F.round(score, 6)


# ---------------------------------------------------------------------------
# Fingerprints / shingles (dedup building blocks)
# ---------------------------------------------------------------------------


def normalized_for_fingerprint(text: Column) -> Column:
    """Casefold + collapse whitespace + strip punctuation — canonical
    form for near-dup detection."""
    t = F.lower(F.trim(text))
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    return F.regexp_replace(t, r"\s+", " ")


def fingerprint_md5(text: Column) -> Column:
    """Deterministic 128-bit doc fingerprint of the normalized text.
    md5 exists in both Spark and DuckDB → oracle-checkable."""
    return F.md5(normalized_for_fingerprint(text))


def hash64(s: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5, base-16.
    Matches DuckDB ``('0x'||substr(md5(s),1,15))::BIGINT`` exactly."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def expand_query_terms(text: Column, synonyms: dict[str, str]) -> Column:
    """Query expansion (RAG_1.py:56-75): append each word's first
    synonym after the word. The deterministic engine default uses an
    explicit synonym map (broadcast as a literal CASE chain — pure JVM,
    no Python); the gated WordNet variant lives in
    operators/encode.wordnet_expander_udf."""

    def expand_one(w: Column) -> Column:
        syn = F.lit("")
        for k, v in synonyms.items():
            syn = F.when(F.lower(w) == k.lower(), F.lit(" " + v)).otherwise(syn)
        return F.concat(w, syn)

    return F.concat_ws(" ", F.transform(words(text), expand_one))


def word_shingles(text: Column, k: int = 3) -> Column:
    """array<string> of k-word shingles over the normalized text; docs
    shorter than k words yield one whole-text shingle.

    The words array is LET-BOUND via a one-element ``transform`` so
    the regex-normalize+split chain runs once per document. Naively
    referencing the split expression inside the per-position lambda
    re-evaluates it for EVERY shingle position (higher-order
    functions are interpreted, no common-subexpression elimination) —
    O(positions × text_length) regex work, ~30× slower on real docs.
    """

    def body(ws: Column) -> Column:
        starts = F.sequence(F.lit(1), F.greatest(F.size(ws) - (k - 1), F.lit(1)))
        return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(ws, i, k)))

    bound = F.transform(
        F.array(F.split(normalized_for_fingerprint(text), " ")), body
    )
    return F.element_at(bound, 1)
