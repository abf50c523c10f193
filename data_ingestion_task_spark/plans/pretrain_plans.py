"""Pretraining-corpus assembly operators — the steps between "deduped
documents" and "training batches" that a 100 TB pipeline needs and the
reference's single-node pandas flow never reaches: context-window
sequence packing, per-source mixture sampling, and benchmark
decontamination. (Extends the dedup/text family of dedup_plans.py /
text_plans.py; reference anchor: the corpus ops of SURVEY §2.4's
balanced sampling and §2.2's token accounting, generalized to
training-set construction.)

Scale notes (100 TB):
- sequence packing is embarrassingly parallel by construction: docs
  are hash-bucketed and packed WITHIN buckets, so the cumulative-sum
  window partitions by bucket — no global ordering, no single-partition
  window. One shuffle on (bucket).
- mixture sampling is a pure narrow filter (hash-residue per row
  against a per-source rate) — zero shuffles before the audit agg;
  deterministic, so resampling a grown corpus keeps prior picks
  (reservoir-free, restart-safe).
- decontamination shuffles on the shingle hash (short key), exactly
  the MinHash-LSH economics: candidate pairs only where an n-gram
  actually collides, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64, word_len, word_shingles
from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Context-window sequence packing
# ---------------------------------------------------------------------------

PACK_BUDGET = 512  # tokens per pack (whitespace tokens in tests)
PACK_BUCKETS = 32  # parallel packers; one window partition each


@query(
    "sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             least(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                        ELSE len(str_split_regex(trim(text), '\\s+')) END,
                   {PACK_BUDGET}) AS tok,
             ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % {PACK_BUCKETS} AS bucket
      FROM documents
    ),
    packed AS (
      SELECT bucket, tok,
             (SUM(tok) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - tok) // {PACK_BUDGET} AS pack_seq
      FROM toks
    )
    SELECT CAST(bucket * 1099511627776 + pack_seq AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS tokens,
           round(CAST(SUM(tok) AS DOUBLE) / {PACK_BUDGET}, 6) AS fill_ratio
    FROM packed GROUP BY bucket, pack_seq ORDER BY pack_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget training sequences
    (first-fit-in-arrival-order packing, the concat-then-split scheme
    used to build pretraining batches): docs are hash-assigned to one
    of {PACK_BUCKETS} independent packers, and within a packer the
    running token total assigns each doc to the pack where its payload
    starts. Per-doc token counts are capped at the budget (oversized
    docs are truncated upstream at tokenize time). ``pack_id`` gives
    each bucket 2^40 pack slots (~half a PB of 512-token packs per
    bucket) so ids cannot collide at the scales this operator
    advertises.

    The window partitions by bucket — cumulative sums never serialize
    the corpus through one partition, which is what makes this hold at
    1000 executors: add buckets, not window depth. Output is the
    pack-level manifest (docs, tokens, fill ratio)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from pyspark.sql.window import Window

    toks = d.select(
        "doc_id",
        F.least(word_len(F.col("text")), F.lit(PACK_BUDGET)).alias("tok"),
        (hash64(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))) % PACK_BUCKETS).alias(
            "bucket"
        ),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.select(
        "bucket",
        "tok",
        ((F.sum("tok").over(w) - F.col("tok")) / PACK_BUDGET).cast("bigint").alias("pack_seq"),
    )
    return (
        packed.groupBy("bucket", "pack_seq")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("tokens"),
        )
        .select(
            (F.col("bucket") * F.lit(1 << 40) + F.col("pack_seq")).cast("bigint").alias("pack_id"),
            "n_docs",
            "tokens",
            F.round(F.col("tokens").cast("double") / PACK_BUDGET, 6).alias("fill_ratio"),
        )
        .orderBy("pack_id")
    )


# ---------------------------------------------------------------------------
# Per-source mixture sampling
# ---------------------------------------------------------------------------

#: Target sampling rate per source (a training-mix recipe: keep all of
#: the high-quality sources, progressively downsample the rest). Keys
#: are the corpus's actual source ids (src0..src19 in the testdata);
#: in production this dict IS the mix recipe under review.
MIXTURE_RATES: dict[str, float] = {
    "src0": 1.0,
    "src1": 1.0,
    "src2": 0.75,
    "src3": 0.5,
    "src4": 0.5,
    "src5": 0.25,
}
_MIX_DEFAULT = 0.1  # long-tail sources: heavy downsample


@query(
    "mixture_weighted_sample",
    oracle=f"""
    WITH marked AS (
      SELECT source,
             ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 10000 AS r,
             CASE source
               {" ".join(f"WHEN '{s}' THEN {int(r * 10000)}" for s, r in MIXTURE_RATES.items())}
               ELSE {int(_MIX_DEFAULT * 10000)} END AS thresh
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN r < thresh THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(SUM(CASE WHEN r < thresh THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS kept_rate
    FROM marked GROUP BY source ORDER BY source
    """,
)
def mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction: per-source target rates applied as a
    DETERMINISTIC hash-residue filter (keep doc iff
    hash(doc_id) % 10000 < rate·10000) — no rand(), so the sample is
    reproducible under retries, stable when the corpus grows (old docs
    keep their verdict), and needs zero shuffles or state; this is the
    scale-safe version of the reference's per-label pandas ``sample(count)``
    balancing (Neww_Fai.py:209-216). Output audits realized vs target
    rate per source."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    r = hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 10000
    thresh = F.lit(int(_MIX_DEFAULT * 10000))
    expr = None
    for s, rate in MIXTURE_RATES.items():
        cond = F.col("source") == s
        expr = F.when(cond, int(rate * 10000)) if expr is None else expr.when(
            cond, int(rate * 10000)
        )
    thresh = expr.otherwise(thresh)
    kept = (r < thresh).cast("int")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(kept).cast("bigint").alias("n_kept"),
        )
        .select(
            "source",
            "n_total",
            "n_kept",
            F.round(F.col("n_kept").cast("double") / F.col("n_total"), 6).alias("kept_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_CONTAM_K = 5  # shingle width (words)
_CONTAM_MIN_HITS = 3  # distinct shared shingles to flag


def _d_shingles(col: str, k: int) -> str:
    """DuckDB k-word shingles over the dedup-normalized text of
    ``col`` — the oracle twin of functions.text.word_shingles (same
    normalize: lower, strip non-alnum, collapse whitespace)."""
    norm = (
        f"regexp_replace(regexp_replace(lower(trim({col})), '[^a-z0-9\\s]', '', 'g'), "
        f"'\\s+', ' ', 'g')"
    )
    ws = f"str_split({norm}, ' ')"
    return (
        f"list_transform(generate_series(1, greatest(len({ws}) - {k - 1}, 1)), "
        f"i -> array_to_string({ws}[i : i + {k - 1}], ' '))"
    )


@query(
    "benchmark_contamination",
    oracle=f"""
    WITH bench_raw AS (
      SELECT doc_id AS bench_id,
             array_to_string(str_split_regex(trim(text), '\\s+')
               [4 : len(str_split_regex(trim(text), '\\s+'))], ' ') AS text
      FROM documents WHERE doc_id % 29 = 0
    ),
    corpus_sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform({_d_shingles('text', _CONTAM_K)},
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))) AS h
      FROM documents
    ),
    bench_sh AS (
      SELECT bench_id, unnest(list_distinct(list_transform({_d_shingles('text', _CONTAM_K)},
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))) AS h
      FROM bench_raw
    )
    SELECT c.doc_id, b.bench_id, CAST(COUNT(DISTINCT c.h) AS BIGINT) AS shared_shingles
    FROM corpus_sh c JOIN bench_sh b USING (h)
    GROUP BY c.doc_id, b.bench_id
    HAVING COUNT(DISTINCT c.h) >= {_CONTAM_MIN_HITS}
    ORDER BY doc_id, bench_id
""",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination screen: flag training documents sharing >=
    {_CONTAM_MIN_HITS} distinct {_CONTAM_K}-gram shingles with any
    benchmark item. The benchmark here is synthesized from the corpus
    itself (every 29th doc, first 3 words dropped — a paraphrase-like
    twin the screen must still catch, hitting its source doc through
    dozens of surviving shingles). A doc that IS a benchmark item
    flags itself by design — exact copies are the worst contamination.

    Plan shape: explode distinct shingle hashes on both sides, inner
    equi-join on the 64-bit hash, count distinct shared shingles per
    (doc, bench) pair. The shuffle key is the shingle hash — candidate
    pairs materialize only where an n-gram actually collides (the
    LSH-family economics of dedup_plans; word-soup corpora produce
    ~zero accidental {_CONTAM_K}-gram collisions, real corpora produce
    exactly the overlaps you want surfaced)."""
    from ..functions.text import words

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(word_shingles(F.col("text"), _CONTAM_K), lambda s: hash64(s))
            )
        ).alias("h"),
    )
    ws = words(F.col("text"))
    bench_docs = (
        d.filter(F.col("doc_id") % 29 == 0)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.concat_ws(" ", F.slice(ws, 4, F.greatest(F.size(ws) - 3, F.lit(1)))).alias(
                "text"
            ),
        )
    )
    bench_sh = bench_docs.select(
        "bench_id",
        F.explode(
            F.array_distinct(
                F.transform(word_shingles(F.col("text"), _CONTAM_K), lambda s: hash64(s))
            )
        ).alias("h"),
    )
    return (
        corpus_sh.join(bench_sh, "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.countDistinct("h").cast("bigint").alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= _CONTAM_MIN_HITS)
        .orderBy("doc_id", "bench_id")
    )


# ---------------------------------------------------------------------------
# Quality-filter funnel
# ---------------------------------------------------------------------------

_QF_MIN_WORDS, _QF_MAX_WORDS = 20, 100_000
_QF_MIN_MWL, _QF_MAX_MWL = 2.0, 12.0
_QF_MAX_SYMBOL_RATIO = 0.10
_QF_STOPWORDS = ["the", "and", "of", "to", "in"]
_QF_MIN_STOPWORDS = 2
_QF_RULES = ["word_count", "mean_word_len", "symbol_ratio", "stopword_presence"]


@query(
    "quality_filter_funnel",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                  ELSE len(str_split_regex(trim(text), '\\s+')) END AS wc,
             len(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
             len(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS symbols,
             {" + ".join(
                 f"(CASE WHEN ' ' || lower(text) || ' ' LIKE '% {w} %' THEN 1 ELSE 0 END)"
                 for w in _QF_STOPWORDS
             )} AS n_stop
      FROM documents
    ),
    f AS (
      SELECT CASE
        WHEN wc < {_QF_MIN_WORDS} OR wc > {_QF_MAX_WORDS} THEN 1
        WHEN CAST(nonspace AS DOUBLE) / wc < {_QF_MIN_MWL}
          OR CAST(nonspace AS DOUBLE) / wc > {_QF_MAX_MWL} THEN 2
        WHEN CAST(symbols AS DOUBLE) / greatest(nonspace, 1) > {_QF_MAX_SYMBOL_RATIO} THEN 3
        WHEN n_stop < {_QF_MIN_STOPWORDS} THEN 4
        ELSE 0 END AS ff
      FROM m
    )
    SELECT rule, n_evaluated, n_failed, n_evaluated - n_failed AS n_passed
    FROM (
      {" UNION ALL ".join(
          f"SELECT {i + 1} AS stage, '{r}' AS rule, "
          f"CAST(SUM(CASE WHEN ff = 0 OR ff >= {i + 1} THEN 1 ELSE 0 END) AS BIGINT) AS n_evaluated, "
          f"CAST(SUM(CASE WHEN ff = {i + 1} THEN 1 ELSE 0 END) AS BIGINT) AS n_failed FROM f"
          for i, r in enumerate(_QF_RULES)
      )}
    ) ORDER BY stage
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality funnel: word-count bounds → mean
    word length → symbol ratio → stopword presence, applied in order,
    with per-rule evaluated/failed/passed accounting (first failing
    rule claims the doc). This is the rejection report a corpus
    curator reads to see WHICH rule eats the data — the per-rule
    attribution the reference's ad-hoc notebook filters never had.

    One narrow projection computes every signal from the text column
    in a single pass (no per-rule scans), then one tiny conditional
    aggregation — at 100 TB this is a map + one 4-row agg."""
    d = load_table(spark, sf_dir, "documents").select("text")
    wc = word_len(F.col("text"))
    nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    symbols = F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9\s]", ""))
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    n_stop = None
    for w in _QF_STOPWORDS:
        c = padded.contains(f" {w} ").cast("int")
        n_stop = c if n_stop is None else n_stop + c
    mwl = nonspace.cast("double") / wc
    ff = (
        F.when((wc < _QF_MIN_WORDS) | (wc > _QF_MAX_WORDS), 1)
        .when((mwl < _QF_MIN_MWL) | (mwl > _QF_MAX_MWL), 2)
        .when(symbols.cast("double") / F.greatest(nonspace, F.lit(1)) > _QF_MAX_SYMBOL_RATIO, 3)
        .when(n_stop < _QF_MIN_STOPWORDS, 4)
        .otherwise(0)
    )
    marked = d.select(ff.alias("ff"))
    aggs = []
    for i, r in enumerate(_QF_RULES):
        stage = i + 1
        aggs.append(
            F.struct(
                F.lit(r).alias("rule"),
                F.sum(((F.col("ff") == 0) | (F.col("ff") >= stage)).cast("int"))
                .cast("bigint")
                .alias("n_evaluated"),
                F.sum((F.col("ff") == stage).cast("int")).cast("bigint").alias("n_failed"),
            ).alias(f"s{stage}")
        )
    row = marked.agg(*aggs)
    stages = row.select(
        F.explode(F.array(*[F.col(f"s{i + 1}") for i in range(len(_QF_RULES))])).alias("s")
    )
    return stages.select(
        F.col("s.rule").alias("rule"),
        F.col("s.n_evaluated").alias("n_evaluated"),
        F.col("s.n_failed").alias("n_failed"),
        (F.col("s.n_evaluated") - F.col("s.n_failed")).alias("n_passed"),
    )
