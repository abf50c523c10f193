"""Corpus-selection operators: which documents make the training cut
(the LLM-data-pipeline mandate, sibling of plans/quality_plans.py which
scores docs and plans/pretrain_plans.py which mixes them).

- ``token_budget_selection`` — fill a token budget (40% of the corpus)
  with the highest-quality documents first: the compute-budget-driven
  selection step every pretraining run ends with (select-then-train,
  e.g. DSIR/DoReMi pipelines resample to a fixed token count).
- ``language_balanced_sample`` — deterministic per-language cap: the
  head-language cap of multilingual corpus builds (CC pipelines cap
  English so the tail survives temperature mixing).
- ``domain_frequency_cap`` — per-source cap accounting (C4 / RefinedWeb
  cap documents per domain to bound single-site influence): how many
  docs each source keeps/loses under the cap, plus the rank-1 survivor.

Scale notes (100 TB):
- token budget: the global prefix-sum is decomposed so NO unpartitioned
  window exists: (1) per-score totals (≤ |score levels| ≈ 8 rows) with
  a strictly-higher-score prior via tiny self-join, (2) per-(score,
  bucket) subtotals cumulated by a window partitioned by score over
  BUCKET-grain rows (corpus/1024 rows, not corpus rows), (3) the only
  document-grain window partitions by (score, bucket) — ~1024 docs per
  partition regardless of corpus size. Widen the bucket (doc_id div B)
  so the bucket-grain frame stays executor-sized; selection is decided
  by cross-multiplied integers (``10·cum ≤ 4·T``), no float division.
- language cap: one window partitioned by lang ordered by a 60-bit
  md5-derived rank hash — the shuffle key is the language (low
  cardinality but the window is a top-N prune, and AQE skew-split
  handles a 90%-English corpus; the cap means only CAP rows per lang
  survive the window stage).
- domain cap: per-source counts are a map-side-combined aggregate; the
  rank-1 survivor rides the same hash-min aggregation (no second scan,
  no window at the doc grain — ``min_by`` over the rank hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import hash64
from ..sources.tables import load_table
from ._text_shared import D_NORM_WORDS, spark_norm_words
from .registry import query

#: Quality score = number of DISTINCT corpus stopwords present (0-7) —
#: the exact-integer quality proxy (same list as the Gopher filter's
#: stopword rule; a doc hitting more of them reads more like prose).
_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is"]
#: Budget: select while 10·cum_tokens ≤ 4·total_tokens (= 40%).
_BUDGET_NUM, _BUDGET_DEN = 4, 10
#: Documents per doc_id bucket for the hierarchical prefix sum.
_BUCKET = 1024
#: Per-language cap for the balanced sample.
_LANG_CAP = 60
#: Per-source cap for domain frequency accounting.
_DOMAIN_CAP = 30


def _d_hash64(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def capped_by_key(
    df: DataFrame, key_col: str, cap: int, salt: str, id_col: str = "doc_id"
) -> DataFrame:
    """DataFrame-shaped deterministic per-key cap (the library entry
    behind ``language_balanced_sample``, reused by
    ``api.curate_corpus``): rank rows within each ``key_col`` group by
    a salted 60-bit md5 hash of ``id_col`` (ties by id) and keep
    ``rk ≤ cap``. Adds the ``rk`` column; drops the internal hash."""
    d = df.withColumn(
        "_capH",
        hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
    )
    w = Window.partitionBy(key_col).orderBy("_capH", id_col)
    return (
        d.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= cap)
        .drop("_capH")
    )


# ---------------------------------------------------------------------------
# Token-budget selection
# ---------------------------------------------------------------------------


@query(
    "token_budget_selection",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             len(ws) AS n_tok,
             len(list_intersect(list_distinct(ws), {_STOPWORDS!r})) AS score
      FROM (SELECT doc_id, {D_NORM_WORDS} AS ws FROM documents)
    ),
    tot AS (SELECT SUM(n_tok) AS t FROM d),
    c AS (
      SELECT doc_id, score, n_tok,
             SUM(n_tok) OVER (ORDER BY score DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    )
    SELECT doc_id, score, n_tok
    FROM c CROSS JOIN tot
    WHERE {_BUDGET_DEN} * cum <= {_BUDGET_NUM} * tot.t
    ORDER BY score DESC, doc_id
    """,
)
def token_budget_selection(
    spark: SparkSession, sf_dir: str, *, bucket: int = _BUCKET
) -> DataFrame:
    """Quality-first token-budget selection: rank documents by an
    exact-integer quality score (distinct stopwords present, desc; ties
    by doc_id) and keep the prefix whose cumulative token count stays
    within 40% of the corpus. The oracle states the spec as ONE global
    running sum; the engine computes the identical prefix sum without
    any unpartitioned window, in three partitioned pieces:

    1. score-grain totals + strictly-higher-score prior (tiny self-join
       over ≤ len(stopwords)+1 rows, broadcast);
    2. (score, bucket)-grain subtotals with the bucket prior from a
       window partitioned by score over BUCKET-grain rows (corpus/1024
       rows ride this exchange, not documents);
    3. the only document-grain window partitions by (score, bucket) —
       ≤ 1024 rows per partition at any corpus size.

    Selection is cross-multiplied integers (``10·cum ≤ 4·T``) — no
    float division anywhere, so the oracle matches bit-for-bit.

    ``bucket`` is the doc_id bucket width (ADVICE r7 #5): widen it so
    the (score, bucket)-grain frame (corpus/bucket rows) stays
    executor-sized at the target scale — 1024 suits the test SFs; a
    100 TB corpus of ~1e11 docs wants ~1e6 so the bucket frame is
    ~1e5 rows. The oracle pins only the default: the bucket
    decomposition is algebraically invisible (any width reproduces the
    same global prefix sum), so non-default widths still match it."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", spark_norm_words("text").alias("ws"))
        .select(
            "doc_id",
            F.size("ws").cast("bigint").alias("n_tok"),
            F.size(
                F.array_intersect(
                    F.array_distinct("ws"),
                    F.array(*[F.lit(s) for s in _STOPWORDS]),
                )
            )
            .cast("bigint")
            .alias("score"),
            F.floor(F.col("doc_id") / bucket).alias("bucket"),
        )
    )
    tot = d.agg(F.sum("n_tok").alias("t"))
    # (1) score-grain prior: tokens in strictly higher scores.
    g = d.groupBy("score").agg(F.sum("n_tok").alias("g_tok"))
    g2 = g.select(F.col("score").alias("score2"), F.col("g_tok").alias("g_tok2"))
    score_prior = (
        g.join(F.broadcast(g2), F.col("score2") > F.col("score"), "left")
        .groupBy("score")
        .agg(F.coalesce(F.sum("g_tok2"), F.lit(0)).alias("score_prior"))
    )
    # (2) bucket-grain prior within each score: buckets are ordered by
    # bucket id, which is doc_id-order-aligned (bucket = doc_id div B).
    wb = (
        Window.partitionBy("score")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bkt = (
        d.groupBy("score", "bucket")
        .agg(F.sum("n_tok").alias("b_tok"))
        .withColumn("bucket_prior", F.coalesce(F.sum("b_tok").over(wb), F.lit(0)))
        .select("score", "bucket", "bucket_prior")
    )
    # (3) document-grain running sum inside one (score, bucket) cell.
    wd = (
        Window.partitionBy("score", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = (
        d.join(F.broadcast(score_prior), "score")
        # The bucket frame is corpus/bucket rows — broadcastable at the
        # test SFs but NOT at the 100 TB mandate, so the join strategy
        # is left to AQE (which still broadcasts it when it fits)
        # instead of being forced (ADVICE r7 #5).
        .join(bkt, ["score", "bucket"])
        .withColumn(
            "cum",
            F.col("score_prior") + F.col("bucket_prior") + F.sum("n_tok").over(wd),
        )
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .filter(_BUDGET_DEN * F.col("cum") <= _BUDGET_NUM * F.col("t"))
        .select("doc_id", "score", "n_tok")
        .orderBy(F.desc("score"), "doc_id")
    )


# ---------------------------------------------------------------------------
# Per-language balanced cap
# ---------------------------------------------------------------------------


@query(
    "language_balanced_sample",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_d_hash64("'lbs:' || doc_id")}, doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, lang, rk FROM r WHERE rk <= {_LANG_CAP}
    ORDER BY lang, rk
    """,
)
def language_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language cap: every doc gets a 60-bit
    md5-derived rank hash (seeded, reproducible in any engine — the
    corpus shuffle idiom), and each language keeps its ``rk ≤ 60``
    head. Head languages are capped, tail languages pass through whole
    — the pre-step to temperature mixing (``mixture_temperature``)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        capped_by_key(d, "lang", _LANG_CAP, salt="lbs")
        .select("doc_id", "lang", "rk")
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# Domain frequency cap accounting
# ---------------------------------------------------------------------------


@query(
    "domain_frequency_cap",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source, {_d_hash64("'dfc:' || doc_id")} AS hh
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           LEAST(COUNT(*), {_DOMAIN_CAP}) AS n_kept,
           GREATEST(COUNT(*) - {_DOMAIN_CAP}, 0) AS n_dropped,
           COUNT(*) > {_DOMAIN_CAP} AS cap_hit,
           MIN_BY(doc_id, printf('%020d%020d', hh, doc_id)) AS first_kept_doc
    FROM h GROUP BY source ORDER BY source
    """,
)
def domain_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap accounting (C4/RefinedWeb-style domain caps):
    how many documents each source would keep and drop under a cap of
    30, plus the rank-1 survivor under the same deterministic hash
    order ``language_balanced_sample`` uses. One map-side-combined
    aggregate — the survivor is a ``min_by`` over the rank hash, so no
    document-grain window and no second scan."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        hash64(F.concat(F.lit("dfc:"), F.col("doc_id").cast("string"))).alias("hh"),
    )
    n = F.count("*")
    return (
        d.groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.least(n, F.lit(_DOMAIN_CAP)).cast("bigint").alias("n_kept"),
            F.greatest(n - _DOMAIN_CAP, F.lit(0)).cast("bigint").alias("n_dropped"),
            (n > _DOMAIN_CAP).alias("cap_hit"),
            F.min_by(
                "doc_id",
                # DuckDB min_by has no tuple key; a zero-padded decimal
                # concat is the same total order in both engines (hh and
                # doc_id are non-negative and < 10^20).
                F.concat(
                    F.lpad(F.col("hh").cast("string"), 20, "0"),
                    F.lpad(F.col("doc_id").cast("string"), 20, "0"),
                ),
            ).alias("first_kept_doc"),
        )
        .orderBy("source")
    )
