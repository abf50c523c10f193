"""Relational windows, deterministic sampling and splits
(SURVEY.md §2.4-2.5; split from ``relational_plans.py`` in round 7 so
one module edit no longer re-certifies 19 sibling queries).

Scale notes (100 TB): window top-k partitions by the group key so the
shuffle is on the natural key. Sampling/splitting uses an md5-derived
hash — deterministic, seedable, and embarrassingly parallel (no global
sort, unlike pandas ``sample(random_state)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64
from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Windows / top-k
# ---------------------------------------------------------------------------


@query(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3 ORDER BY o_custkey, rnk
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (FAISS search-k analogue, SURVEY §2.5): window
    over the group key — one shuffle on o_custkey; full ordering key
    (price desc, orderkey) makes ties deterministic."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "rnk",
        )
        .orderBy("o_custkey", "rnk")
    )


@query(
    "page_numbering",
    oracle="""
    SELECT event_id, user_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM events ORDER BY user_id, seq
    """,
)
def page_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file page numbering (csv_single_3.py:44) as row_number over
    (user, ts) — the Spark-native replacement for range(1, len+1)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", F.row_number().over(w).cast("bigint").alias("seq"))
        .orderBy("user_id", "seq")
    )


# ---------------------------------------------------------------------------
# Deterministic sampling & splits (hash-based, scale-safe)
# ---------------------------------------------------------------------------


@query(
    "balanced_label_sample",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':42'),1,15))::BIGINT,
                        doc_id) AS rn
      FROM documents)
    WHERE rn <= 20 ORDER BY lang, doc_id
    """,
)
def balanced_label_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label balanced sample (make_data, Neww_Fai.py:209-216) with
    an md5-derived deterministic order instead of pandas
    random_state — reproducible on any cluster size, no global sort
    of the full table (window sorts within label partitions only)."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    rnd = hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":42")))
    w = Window.partitionBy("lang").orderBy(rnd, "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )


@query(
    "group_train_test_split",
    oracle="""
    SELECT split, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
    FROM (
      SELECT user_id, event_id,
             CASE WHEN ('0x'||substr(md5(CAST(user_id AS VARCHAR)||':split42'),1,15))::BIGINT % 100 < 80
                  THEN 'train' ELSE 'test' END AS split
      FROM events)
    GROUP BY split ORDER BY split
    """,
)
def group_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-preserving train/test split (Neww_Fai.py:229-247): hash
    the GROUP key (user) so all of a group lands on one side — no
    leakage, no driver-side unique() list, works at any scale."""
    e = load_table(spark, sf_dir, "events")
    bucket = hash64(F.concat(F.col("user_id").cast("string"), F.lit(":split42"))) % 100
    return (
        e.withColumn("split", F.when(bucket < 80, F.lit("train")).otherwise(F.lit("test")))
        .groupBy("split")
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("split")
    )


@query(
    "dropna_filter",
    oracle="""
    WITH noisy AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5('na:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 7 = 0
                  THEN NULL ELSE text END AS text,
             CASE WHEN ('0x' || substr(md5('nb:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 11 = 0
                  THEN NULL ELSE lang END AS label
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN text IS NOT NULL AND label IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN text IS NULL OR label IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
    FROM noisy
    """,
)
def dropna_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.dropna(subset=['text','label'])`` (Neww_Fai.py:659-660,
    Fai_new.py:81): hash residues null out ~1/7 of texts and ~1/11 of
    labels, then ``na.drop`` keeps complete rows. The counts prove the
    drop semantics (row preserved iff BOTH columns present)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    t_null = hash64(F.concat(F.lit("na:"), F.col("doc_id").cast("string"))) % 7 == 0
    l_null = hash64(F.concat(F.lit("nb:"), F.col("doc_id").cast("string"))) % 11 == 0
    noisy = d.select(
        "doc_id",
        F.when(~t_null, F.col("text")).alias("text"),
        F.when(~l_null, F.col("lang")).alias("label"),
    )
    kept = noisy.na.drop(subset=["text", "label"])
    return noisy.agg(F.count("*").alias("n_total")).crossJoin(
        kept.agg(F.count("*").alias("n_kept"))
    ).select(
        "n_total",
        "n_kept",
        (F.col("n_total") - F.col("n_kept")).alias("n_dropped"),
    )


@query(
    "random_sample_n",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               ORDER BY ('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                        doc_id) AS rn
      FROM documents
    ) WHERE rn <= 25
    ORDER BY doc_id
    """,
)
def random_sample_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.sample(25, random_state=123)`` (Faiss_2_10.py:406) as a
    SEEDED HASH-ORDER sample: order by md5-derived hash of the key,
    take n. Unlike ``rand(seed)`` this is engine-portable and stable
    under repartitioning — the same 25 docs come back on any cluster
    layout. Scale: top-n by hash is a partial top-k per partition +
    one n-row merge, no global sort."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    h = hash64(F.concat(F.lit("smp:"), F.col("doc_id").cast("string")))
    return (
        d.orderBy(h.asc(), F.col("doc_id").asc())
        .limit(25)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )
