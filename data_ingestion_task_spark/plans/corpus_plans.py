"""Corpus-curation plans: PII redaction, Gopher-style repetition
profiling, deterministic shard manifests, and temperature-weighted
source mixing — the second wave of training-data pipeline operators
(first wave: pretrain_plans). These have no reference twin; they are
the public-pipeline operations (C4 / Gopher / The Pile lineage) a
100-TB curation run needs alongside the dedup/quality families.

Scale notes per query are in the docstrings; the shared theme: every
per-doc signal is one narrow JVM projection (regex/array exprs, no
Python), and every aggregate is a hash-agg with map-side combine. No
query here shuffles more than once per branch, and nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.pii import PII_PATTERNS, pii_span_count, redact_pii
from ..functions.text import hash64, word_len, word_shingles
from ..sources.shards import shard_keys
from ..sources.tables import load_table
from .pretrain_plans import _d_shingles
from .registry import query

# ---------------------------------------------------------------------------
# PII detection / redaction (regexes + redactor: functions/pii.py —
# shared with the streaming redacting sink, streaming/enrich.py)
# ---------------------------------------------------------------------------

# The synthetic documents table is PII-free word soup, so the query
# demonstrates redaction on DETERMINISTIC injected spans keyed to
# doc_id residues — honest about being a fixture, reproducible in both
# engines, and exercising every rule including the zero-hit overlap
# cases. In production the injection projection is simply dropped.
_INJ_EMAIL_MOD, _INJ_SSN_MOD, _INJ_PHONE_MOD, _INJ_IP_MOD = 7, 11, 13, 17


def _inject_pii(doc_id: Column, text: Column) -> Column:
    did = doc_id.cast("string")

    def pad(expr: Column, n: int) -> Column:
        return F.lpad(expr.cast("string"), n, "0")

    email = F.concat(F.lit(" contact user"), did, F.lit("@example.com"))
    ssn = F.concat(
        F.lit(" ssn "),
        pad((doc_id * 7) % 1000, 3), F.lit("-"),
        pad((doc_id * 13) % 100, 2), F.lit("-"),
        pad((doc_id * 31) % 10000, 4),
    )
    phone = F.concat(
        F.lit(" call (555) "), pad((doc_id * 3) % 1000, 3), F.lit("-"),
        pad((doc_id * 9) % 10000, 4),
    )
    ip = F.concat(
        F.lit(" ip 10."), ((doc_id) % 256).cast("string"), F.lit("."),
        ((doc_id * 7) % 256).cast("string"), F.lit("."),
        ((doc_id * 13) % 256).cast("string"),
    )
    out = text
    for mod, span in (
        (_INJ_EMAIL_MOD, email),
        (_INJ_SSN_MOD, ssn),
        (_INJ_PHONE_MOD, phone),
        (_INJ_IP_MOD, ip),
    ):
        out = F.concat(out, F.when(doc_id % mod == 0, span).otherwise(F.lit("")))
    return out


def _d_injected() -> str:
    """DuckDB twin of :func:`_inject_pii` over the documents view."""
    return f"""
        text
        || CASE WHEN doc_id % {_INJ_EMAIL_MOD} = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                ELSE '' END
        || CASE WHEN doc_id % {_INJ_SSN_MOD} = 0
                THEN ' ssn ' || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0')
                     || '-' || lpad(CAST((doc_id * 13) % 100 AS VARCHAR), 2, '0')
                     || '-' || lpad(CAST((doc_id * 31) % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
        || CASE WHEN doc_id % {_INJ_PHONE_MOD} = 0
                THEN ' call (555) ' || lpad(CAST((doc_id * 3) % 1000 AS VARCHAR), 3, '0')
                     || '-' || lpad(CAST((doc_id * 9) % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
        || CASE WHEN doc_id % {_INJ_IP_MOD} = 0
                THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
                ELSE '' END
    """


@query(
    "pii_redaction",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id, {_d_injected()} AS t FROM documents
    ), counted AS (
      SELECT
        {", ".join(
            f"len(regexp_extract_all(t, '{pat}')) AS c_{rule}"
            for rule, pat in PII_PATTERNS.items()
        )},
        len(regexp_extract_all(
          {"".join(
              f"regexp_replace("
              for _ in PII_PATTERNS
          )}t{"".join(
              f", '{PII_PATTERNS[r]}', '[{r.upper()}]', 'g')"
              for r in sorted(PII_PATTERNS)
          )},
          '{"|".join(PII_PATTERNS[r] for r in sorted(PII_PATTERNS))}'
        )) AS c_residual
      FROM injected
    )
    SELECT rule, n_docs, n_spans FROM (
      {" UNION ALL ".join(
          f"SELECT '{rule}' AS rule, "
          f"CAST(SUM(CASE WHEN c_{rule} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs, "
          f"CAST(SUM(c_{rule}) AS BIGINT) AS n_spans FROM counted"
          for rule in PII_PATTERNS
      )}
      UNION ALL
      SELECT 'residual_after_redaction' AS rule,
             CAST(SUM(CASE WHEN c_residual > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
             CAST(SUM(c_residual) AS BIGINT) AS n_spans
      FROM counted
    ) ORDER BY rule
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub accounting (C4/Dolma-style): per-rule documents-hit +
    span counts over email/SSN/phone/IPv4 regexes, plus a
    ``residual_after_redaction`` row proving the composed
    :func:`redact_pii` leaves zero matches behind. The corpus text is
    synthetic and PII-free, so deterministic spans keyed to doc_id
    residues are injected first (see ``_inject_pii``) — the rules and
    the redaction chain are the real artifact.

    Scale: inject + count + redact + recount is ONE narrow JVM regex
    projection per document (no Python, no shuffle); the rollup is a
    single 5-struct aggregate — at 100 TB this is a map stage plus a
    one-row exchange."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    injected = _inject_pii(F.col("doc_id"), F.col("text"))
    cols = {
        rule: F.regexp_count(injected, F.lit(pat)).alias(f"c_{rule}")
        for rule, pat in PII_PATTERNS.items()
    }
    counted = d.select(
        *cols.values(),
        pii_span_count(redact_pii(injected)).alias("c_residual"),
    )
    names = [*PII_PATTERNS.keys(), "residual_after_redaction"]
    keys = [*[f"c_{r}" for r in PII_PATTERNS], "c_residual"]
    row = counted.agg(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.sum((F.col(k) > 0).cast("int")).cast("bigint").alias("n_docs"),
                F.sum(F.col(k)).cast("bigint").alias("n_spans"),
            ).alias(f"s_{k}")
            for name, k in zip(names, keys)
        ]
    )
    return (
        row.select(F.explode(F.array(*[f"s_{k}" for k in keys])).alias("s"))
        .select("s.rule", "s.n_docs", "s.n_spans")
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# Repetition profile (Gopher repetition rules)
# ---------------------------------------------------------------------------

_REP_TOP_K = 2  # top n-gram fraction uses word bigrams (Gopher table A1)
_REP_DUP_K = 5  # duplicate n-gram fraction uses 5-gram shingles


@query(
    "repetition_profile",
    oracle=f"""
    WITH g2 AS (
      SELECT doc_id,
             ('0x' || substr(md5(unnest({_d_shingles("text", _REP_TOP_K)})), 1, 15))::BIGINT AS sh
      FROM documents
    ), c2 AS (
      SELECT doc_id, sh, COUNT(*) AS c FROM g2 GROUP BY doc_id, sh
    ), top2 AS (
      SELECT doc_id,
             CAST(round(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS DECIMAL(12,6)) AS top_frac
      FROM c2 GROUP BY doc_id
    ), g5 AS (
      SELECT doc_id,
             ('0x' || substr(md5(unnest({_d_shingles("text", _REP_DUP_K)})), 1, 15))::BIGINT AS sh
      FROM documents
    ), c5 AS (
      SELECT doc_id, sh, COUNT(*) AS c FROM g5 GROUP BY doc_id, sh
    ), dup5 AS (
      SELECT doc_id,
             CAST(round(CAST(SUM(c) - COUNT(*) AS DOUBLE) / SUM(c), 6)
                  AS DECIMAL(12,6)) AS dup_frac
      FROM c5 GROUP BY doc_id
    )
    SELECT CAST(floor(CAST(top_frac AS DOUBLE) * 10) AS INTEGER) AS top_bigram_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(top_frac) AS DOUBLE) / COUNT(*), 6) AS avg_top_bigram_frac,
           round(CAST(SUM(dup_frac) AS DOUBLE) / COUNT(*), 6) AS avg_dup5_frac
    FROM top2 JOIN dup5 USING (doc_id)
    GROUP BY top_bigram_bucket ORDER BY top_bigram_bucket
    """,
)
def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, table A1):
    per document, the fraction of word bigrams claimed by the single
    most frequent bigram (``top_frac``) and the fraction of 5-gram
    shingles that are within-document duplicates (``dup_frac``),
    rolled up into 10%-wide ``top_frac`` buckets — the histogram a
    curator reads to set the repetition cutoffs before filtering.

    Scale: two explode→hash-agg branches, each shuffling once on
    (doc_id, shingle) then once on doc_id (both combine map-side), and
    a doc_id-keyed join of two already-co-partitioned aggregates.
    Shingles are hashed to int64 BEFORE the shuffle (the portable
    md5-prefix hash, same collision behavior in the oracle) so the
    wide (doc_id, 5-gram-string) exchange carries 8-byte keys — at
    sf1 this cut the probe time 25.8s → 7.9s (ratio 13.3x → 3.8x).
    No window, no collect; per-doc
    fractions are fixed-scale DECIMAL so the final averages are
    order-independent."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def per_doc_frac(k: int, frac_expr) -> DataFrame:
        exploded = d.select(
            "doc_id", F.explode(word_shingles(F.col("text"), k)).alias("sh_raw")
        ).select("doc_id", hash64(F.col("sh_raw")).alias("sh"))
        counts = exploded.groupBy("doc_id", "sh").agg(F.count("*").alias("c"))
        return counts.groupBy("doc_id").agg(frac_expr)

    top2 = per_doc_frac(
        _REP_TOP_K,
        F.round(F.max("c").cast("double") / F.sum("c"), 6)
        .cast("decimal(12,6)")
        .alias("top_frac"),
    )
    dup5 = per_doc_frac(
        _REP_DUP_K,
        F.round((F.sum("c") - F.count("*")).cast("double") / F.sum("c"), 6)
        .cast("decimal(12,6)")
        .alias("dup_frac"),
    )
    joined = top2.join(dup5, "doc_id")
    return (
        joined.groupBy(
            F.floor(F.col("top_frac").cast("double") * 10)
            .cast("int")
            .alias("top_bigram_bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("top_frac").alias("sum_top"),
            F.sum("dup_frac").alias("sum_dup"),
        )
        .select(
            "top_bigram_bucket",
            "n_docs",
            F.round(F.col("sum_top").cast("double") / F.col("n_docs"), 6).alias(
                "avg_top_bigram_frac"
            ),
            F.round(F.col("sum_dup").cast("double") / F.col("n_docs"), 6).alias(
                "avg_dup5_frac"
            ),
        )
        .orderBy("top_bigram_bucket")
    )


# ---------------------------------------------------------------------------
# Deterministic shard manifest (global training order without a sort)
# ---------------------------------------------------------------------------

N_SHARDS = 64


@query(
    "corpus_shard_manifest",
    oracle=f"""
    WITH keyed AS (
      SELECT
        ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % {N_SHARDS} AS shard_id,
        ('0x' || substr(md5('order:e0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          AS order_key,
        CASE WHEN text IS NULL OR trim(text) = '' THEN 0
             ELSE len(str_split_regex(trim(text), '\\s+')) END AS n_tokens
      FROM documents
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(order_key) AS min_order_key,
           MAX(order_key) AS max_order_key
    FROM keyed GROUP BY shard_id ORDER BY shard_id
    """,
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order sharding: every document hashes to
    one of 64 shards (``hash('shard:'||doc_id)``) and carries an
    independent intra-shard ``order_key`` hash; the manifest reports
    per-shard doc/token balance plus the key range. The training
    order is (shard_id, order_key) — a full-corpus shuffle with NO
    global sort: the writer is ``partitionBy(shard_id)`` +
    ``sortWithinPartitions(order_key)``, so each shard sorts locally
    and a 100-TB corpus never funnels through a single ordering
    exchange. Epoch reshuffles re-key with a salt ('order:e2:'||id),
    touching no data, only the key projection.

    Scale: one narrow hash projection + one 64-ary hash-agg; token
    sums are exact integers (order-independent)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    keyed = shard_keys(d, "doc_id", N_SHARDS, epoch=0).select(
        "shard_id", "order_key", word_len(F.col("text")).alias("n_tokens")
    )
    return (
        keyed.groupBy("shard_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.min("order_key").alias("min_order_key"),
            F.max("order_key").alias("max_order_key"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# Temperature-weighted source mixture
# ---------------------------------------------------------------------------

#: Temperature T=2 ⇒ weights ∝ count^(1/2). sqrt is IEEE
#: correctly-rounded in both engines (unlike pow), so the oracle twin
#: is bit-exact; other temperatures would need a rounding fence.
_MIXT_TARGET_FRAC = 0.5  # sample down to half the corpus overall


@query(
    "mixture_temperature",
    oracle=f"""
    WITH per_source AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total FROM documents GROUP BY source
    ), rates AS (
      SELECT source, n_total,
             CAST(sq AS DOUBLE) / CAST(SUM(sq) OVER () AS DOUBLE) AS weight,
             least(
               1.0,
               (CAST(sq AS DOUBLE) / CAST(SUM(sq) OVER () AS DOUBLE))
                 * round({_MIXT_TARGET_FRAC} * CAST(SUM(n_total) OVER () AS DOUBLE), 0)
                 / n_total
             ) AS target_rate
      FROM (
        SELECT source, n_total,
               CAST(round(sqrt(CAST(n_total AS DOUBLE)), 6) AS DECIMAL(18,6)) AS sq
        FROM per_source
      )
    ), marked AS (
      SELECT source,
             ('0x' || substr(md5('mixT:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 10000 AS r
      FROM documents
    ), kept AS (
      SELECT m.source,
             CAST(SUM(CASE WHEN m.r < CAST(round(t.target_rate * 10000, 0) AS BIGINT)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM marked m JOIN rates t USING (source) GROUP BY m.source
    )
    SELECT r.source, r.n_total,
           round(r.weight, 6) AS mix_weight,
           round(r.target_rate, 6) AS target_rate,
           k.n_kept,
           round(CAST(k.n_kept AS DOUBLE) / r.n_total, 6) AS kept_rate
    FROM rates r JOIN kept k USING (source) ORDER BY r.source
    """,
)
def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (The Pile / XLM-R style,
    T=2): source weights ∝ sqrt(corpus share), normalized, converted
    to per-source keep rates against a half-of-corpus target, then
    applied as the same deterministic hash-residue filter
    as ``mixture_weighted_sample`` — upweights the tail without a
    hand-written recipe dict. Output audits realized vs target rate.

    Scale: the rate table is a source-cardinality aggregate (~20 rows;
    its unpartitioned window is free at that size), persisted and
    broadcast back onto the corpus for one map-side filter — no
    per-row state, no rand(), restart-safe. Doc-side work: one scan +
    shuffle for the rate aggregate, one scan + shuffle for the kept
    groupBy."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per_source = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n_total"))
    w_all = Window.partitionBy()
    sq = F.round(F.sqrt(F.col("n_total").cast("double")), 6).cast("decimal(18,6)")
    rates = (
        per_source.select("source", "n_total", sq.alias("sq"))
        .select(
            "source",
            "n_total",
            (F.col("sq").cast("double") / F.sum("sq").over(w_all).cast("double")).alias(
                "weight"
            ),
            F.sum("n_total").over(w_all).alias("corpus_n"),
        )
        .select(
            "source",
            "n_total",
            "weight",
            F.least(
                F.lit(1.0),
                F.col("weight")
                * F.round(F.lit(_MIXT_TARGET_FRAC) * F.col("corpus_n").cast("double"), 0)
                / F.col("n_total"),
            ).alias("target_rate"),
        )
        # ~20 rows, referenced twice (broadcast into kept + the final
        # join): persist so the documents scan + per-source agg behind
        # it runs once, not once per reference.
        .persist()
    )
    r = hash64(F.concat(F.lit("mixT:"), F.col("doc_id").cast("string"))) % 10000
    marked = d.select("source", r.alias("r"))
    kept = (
        marked.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.sum(
                (
                    F.col("r")
                    < F.round(F.col("target_rate") * 10000, 0).cast("bigint")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_kept")
        )
    )
    result = (
        rates.join(kept, "source")
        .select(
            "source",
            "n_total",
            F.round("weight", 6).alias("mix_weight"),
            F.round("target_rate", 6).alias("target_rate"),
            "n_kept",
            F.round(F.col("n_kept").cast("double") / F.col("n_total"), 6).alias(
                "kept_rate"
            ),
        )
        .orderBy("source")
    )
    result._cached_deps = [rates]  # library callers: unpersist when done
    return result
