"""Text/chunk layer plans: ingestion profiling, chunking with overlap,
truncation, token statistics, language-ID, quality scoring,
fingerprinting — the document-side operator families of SURVEY §2.2,
§2.6 (chunking) and the training-data text-analysis extensions.

Scale: chunk-explode and every per-doc derivation are narrow map
stages (no shuffle); the profile aggregations are single hash-aggs
with map-side combine. At 100 TB the chunker's output is wider than
its input — this layout (explode → downstream filter on chunk
columns) lets Catalyst push chunk-level predicates into the same
stage, never materializing dropped chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources.tables import load_table
from ._text_shared import D_NORM_WORDS, spark_norm_words
from .registry import query

# DuckDB twins of the text expression library (kept in one place so
# every oracle uses identical formulas).
_D_WORDS = "str_split_regex(trim(text), '\\s+')"
_D_WORDLEN = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_D_WORDS}) END"
_D_STOPHITS = (
    f"len(list_filter(str_split_regex(lower(trim(text)), '\\s+'), "
    f"w -> w IN ('the','and','of','to','a','in','is')))"
)


def _d_hits(markers: list[str]) -> str:
    quoted = ",".join(f"'{m}'" for m in markers)
    return (
        f"len(list_filter(str_split_regex(lower(trim(text)), '\\s+'), "
        f"w -> w IN ({quoted})))"
    )


_D_LANG = f"""
    CASE WHEN greatest(h_en, h_de, h_fr, h_es) > 0 AND h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
         WHEN greatest(h_en, h_de, h_fr, h_es) > 0 AND h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
         WHEN greatest(h_en, h_de, h_fr, h_es) > 0 AND h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
         WHEN greatest(h_en, h_de, h_fr, h_es) > 0 AND h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
         ELSE 'und' END
"""

_D_QUALITY = """
    round(
      (CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 1.0 ELSE 0.2 END) * 0.25
      + (CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END) * 0.35
      + (1.0 - least((CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END) * 4, 1.0)) * 0.2
      + (CASE WHEN n_words > 0 THEN least(stop_hits / n_words * 5, 1.0) ELSE 0.0 END) * 0.2,
    6)
"""


@query(
    "doc_ingest_profile",
    oracle=f"""
    WITH derived AS (
      SELECT doc_id, source,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST({_D_WORDLEN} AS DOUBLE) AS n_words,
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE) AS alpha,
             CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
             CAST({_D_STOPHITS} AS DOUBLE) AS stop_hits,
             {_d_hits(['the','and','of','to','a','in','is'])} AS h_en,
             {_d_hits(['der','die','und','das','ist','nicht'])} AS h_de,
             {_d_hits(['le','la','les','et','est','une'])} AS h_fr,
             {_d_hits(['el','los','las','es','una','que'])} AS h_es
      FROM documents
    ), scored AS (
      SELECT doc_id, source, n_chars, n_words, {_D_LANG} AS lang_pred,
             CAST({_D_QUALITY} AS DECIMAL(10,6)) AS q
      FROM derived
    )
    SELECT lang_pred, source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_words AS BIGINT)) AS BIGINT) AS total_words,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
           CAST(CAST(SUM(q) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_quality
    FROM scored
    WHERE n_words >= 5
    GROUP BY lang_pred, source
    ORDER BY lang_pred, source
    """,
)
def doc_ingest_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (entry): ingest documents → derive char/word lengths
    (Neww_Fai.py:661-662) + language-ID + quality score → range filter
    → grouped profile. The reference's dataset-profiling loop
    (Neww_Fai.py:160-175) as one declarative plan: scan → narrow
    derivations → single hash-agg."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        "source",
        T.char_len(t).alias("n_chars"),
        T.word_len(t).alias("n_words"),
        T.lang_id(t).alias("lang_pred"),
        T.quality_score(t).try_cast("decimal(10,6)").alias("q"),
    )
    return (
        scored.filter(F.col("n_words") >= 5)
        .groupBy("lang_pred", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("q").cast("double") / F.count("*")).alias("avg_quality"),
        )
        .orderBy("lang_pred", "source")
    )


@query(
    "chunk_explode",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_D_WORDS} AS ws FROM documents
    ), s AS (
      SELECT doc_id, ws,
             unnest(generate_series(0, greatest(len(ws) - 1, 0), 48)) AS st
      FROM w
    )
    SELECT doc_id,
           CAST(st // 48 AS INTEGER) AS chunk_idx,
           array_to_string(ws[st+1 : st+64], ' ') AS chunk_text,
           CAST(len(ws[st+1 : st+64]) AS INTEGER) AS n_chunk_words,
           (st = 0) AS first_chunk
    FROM s ORDER BY doc_id, chunk_idx
    """,
)
def chunk_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking with overlap (Faiss_2_10.py:222-243, rag_3_4.py:343-353):
    64-word windows, 16-word overlap (step 48), per-chunk index and
    first-chunk flag (Fai_new.py:93-112) — pure array expression +
    posexplode, no Python, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    chunks = T.explode_chunks(d, text_col="text", id_cols=["doc_id"], chunk_size=64, overlap=16)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_text",
        F.size(F.split(F.col("chunk_text"), " ")).alias("n_chunk_words"),
        "first_chunk",
    ).orderBy("doc_id", "chunk_idx")


@query(
    "doc_truncation",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, trim(text) AS t, {_D_WORDS} AS ws FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(ws) <= 20 THEN t
                ELSE array_to_string(ws[1:10], ' ') || ' ' ||
                     array_to_string(ws[len(ws)-9 : len(ws)], ' ') END AS truncated,
           CAST(least(len(ws), 20) AS BIGINT) AS kept_words
    FROM w ORDER BY doc_id
    """,
)
def doc_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep_lines/truncate_doc_text (Faiss_2_10.py:413-415,
    rag_2.py:52-61): keep first 10 + last 10 words before embedding —
    the reference's manual 'column pruning' preserved as an explicit
    stage."""
    d = load_table(spark, sf_dir, "documents")
    trunc = T.truncate_words(F.col("text"), 10, 10)
    return d.select(
        "doc_id",
        trunc.alias("truncated"),
        F.least(T.word_len(F.col("text")), F.lit(20)).cast("bigint").alias("kept_words"),
    ).orderBy("doc_id")


@query(
    "token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS BIGINT) AS n_tokens
    FROM documents ORDER BY doc_id
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """char/word/token counting (wordschrstokens.py:12-22) — the
    BPE-ish token count runs as a JVM regexp, not a Python tokenizer
    UDF, so it stays inside whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        T.char_len(t).alias("n_chars"),
        T.word_len(t).alias("n_words"),
        T.token_count_bpe_ish(t).alias("n_tokens"),
    ).orderBy("doc_id")


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9\\s]', '', 'g'),
                              '\\s+', ' ', 'g')) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5 document fingerprint over casefolded,
    punctuation-stripped, whitespace-collapsed text — the exact-dedup
    key (training-data pipeline primitive)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", T.fingerprint_md5(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Corpus vocabulary / length-distribution analytics
# ---------------------------------------------------------------------------

_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is",
    "der", "die", "und", "le", "la", "les", "el", "los",
]

# Shared cross-engine tokenizer (hoisted to _text_shared in r6 —
# retrieval_plans uses the same definition).
_D_NORM_WORDS = D_NORM_WORDS


@query(
    "term_doc_frequency",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({_D_NORM_WORDS})) AS term FROM documents
    )
    SELECT term, COUNT(*) AS doc_freq
    FROM tok
    WHERE term NOT IN ({", ".join(f"'{w}'" for w in _STOPWORDS)})
    GROUP BY term
    ORDER BY doc_freq DESC, term
    LIMIT 20
    """,
)
def term_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile: top-20 terms by DOCUMENT frequency,
    stopword-filtered — the training-data curation staple (and the
    classic distributed wordcount, but per-doc-distinct so one hot
    term in one doc can't dominate). Per-doc token dedup happens in
    the narrow map (array_distinct) BEFORE the explode, so the shuffle
    carries each (doc, term) once."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(spark_norm_words())
    return (
        d.select("doc_id", F.explode(toks).alias("term"))
        .filter(~F.col("term").isin(_STOPWORDS))
        .groupBy("term")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "term")
        .limit(20)
    )


@query(
    "doc_length_histogram",
    oracle=f"""
    WITH w AS (
      SELECT CAST(least({_D_WORDLEN} // 50, 19) AS BIGINT) AS bucket,
             {_D_WORDLEN} AS n_words
      FROM documents
    )
    SELECT bucket,
           bucket * 50 AS words_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM w GROUP BY bucket ORDER BY bucket
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-distribution histogram (50-word buckets, top-coded at
    bucket 19) — the quality-filter design tool for length cutoffs.
    One narrow bucket map + one low-cardinality agg."""
    d = load_table(spark, sf_dir, "documents")
    n_words = T.word_len(F.col("text"))
    bucket = F.least(F.floor(n_words / 50), F.lit(19)).cast("bigint")
    return (
        d.select(bucket.alias("bucket"), n_words.alias("n_words"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
        .select("bucket", (F.col("bucket") * 50).alias("words_lo"), "n_docs", "total_words")
        .orderBy("bucket")
    )
