"""Relational core: scans, filters, derived columns, joins, aggregates,
windows, pivots, unions, deterministic sampling/splits.

Each query re-expresses an operator family from SURVEY.md §2.2-2.5 over
the driver's TPC-H-ish testdata, with a DuckDB oracle twin.

Scale notes (100 TB): every aggregation here is a single hash
aggregate with map-side partial combine; dimension joins broadcast
(region/nation/supplier are tiny); window top-k partitions by the
group key so the shuffle is on the natural key; no driver-side
collects anywhere. Sampling/splitting uses an md5-derived hash —
deterministic, seedable, and embarrassingly parallel (no global sort,
unlike pandas ``sample(random_state)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64
from ..sources.tables import load_table
from .registry import query


def _dec(col, scale: int = 2):
    """Exact money arithmetic: DOUBLE → DECIMAL before summing so both
    engines sum exactly and emit bitwise-identical doubles."""
    c = col if isinstance(col, F.Column) else F.col(col)
    return c.try_cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Aggregation spine (TPC-H Q1 style) — the flagship relational query.
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2025-06-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter (pushed to parquet) → hash-agg with partial
    combine. Mirrors the reference's metric-rollup style aggregations
    (code/python/metrics_8_6.py:36-64) on numeric columns."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec(li.l_extendedprice) * (1 - _dec(li.l_discount))
    charge = disc_price * (1 + _dec(li.l_tax))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2025-06-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(li.l_quantity)).cast("double").alias("sum_qty"),
            F.sum(_dec(li.l_extendedprice)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec(li.l_quantity)).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec(li.l_extendedprice)).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "value_counts",
    oracle="""
    SELECT lang AS value, COUNT(*) AS count
    FROM documents GROUP BY lang ORDER BY count DESC, value
    """,
)
def value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas value_counts (Neww_Fai.py:163) as groupBy-count."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.col("lang").alias("value"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), "value")
    )


@query(
    "grouped_nunique",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def grouped_nunique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby(label).fn.nunique() (Neww_Fai.py:168-169)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


@query(
    "describe_stats",
    oracle="""
    SELECT source,
           COUNT(n_chars) AS cnt,
           CAST(CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) / COUNT(n_chars) AS DOUBLE) AS mean_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source ORDER BY source
    """,
)
def describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.describe() essentials (Neww_Fai.py:173-175) — count/mean/
    min/max per group; exact-sum mean for oracle parity."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("n_chars").alias("cnt"),
            (F.sum(F.col("n_chars").try_cast("decimal(18,0)")).cast("double") / F.count("n_chars"))
            .alias("mean_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Filters / masked conditional update
# ---------------------------------------------------------------------------


@query(
    "range_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word_min <= x <= word_max range mask (Neww_Fai.py:808-811) +
    label equality filter (Neww_Fai.py:904); both push to the scan."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(10, 20) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "conditional_update",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' AND o_totalprice > 200000
                THEN 'EXPEDITE' ELSE o_orderpriority END AS o_orderpriority
    FROM orders ORDER BY o_orderkey
    """,
)
def conditional_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked assignment df.loc[mask, col] = v (post_9_9.py:1-39) as
    when/otherwise — vectorized, no row loop."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when((o.o_orderstatus == "O") & (o.o_totalprice > 200000), F.lit("EXPEDITE"))
        .otherwise(o.o_orderpriority)
        .alias("o_orderpriority"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "dim_join_rollup",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name ORDER BY region, nation
    """,
)
def dim_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact × two broadcast dims. At 100 TB nation/region
    are broadcast — zero shuffle for the join; one shuffle for the
    agg."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("total_acctbal"),
        )
        .orderBy("region", "nation")
    )


@query(
    "anti_join_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    ORDER BY c.c_custkey
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (customers with no in-progress orders) — pred↔GT
    alignment family (SURVEY §2.3); AQE picks broadcast/shuffled side
    at runtime. The status filter keeps the result non-trivial at
    every sf (every customer has *some* order in the testdata)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "zip_join_alignment",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    ORDER BY o.o_orderkey
    """,
)
def zip_join_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's positional concat-axis-1 'join'
    (privateb_4_8.py:64-65) re-expressed as a keyed equi-join —
    the only scale-safe form (positional alignment breaks under
    partitioning)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec(li.l_extendedprice) * (1 - _dec(li.l_discount))
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_lines"))
        .orderBy("o_orderkey")
    )


@query(
    "union_by_name",
    oracle="""
    SELECT 'customer' AS party_type, c_name AS name, c_nationkey AS nationkey,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
    UNION ALL
    SELECT 'supplier' AS party_type, s_name AS name, s_nationkey AS nationkey,
           CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier
    ORDER BY party_type, name
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rename→reorder→concat rows (wordschrstokens.py:29-45) as
    unionByName."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("party_type"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("party_type"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").cast("double").alias("acctbal"),
    )
    return c.unionByName(s).orderBy("party_type", "name")


# ---------------------------------------------------------------------------
# Windows / top-k / pivots
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


@query(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas pivot_table / crosstab (post_pro_9_8.py:118-124,
    rag_2_26_1.py:171-182). Explicit pivot values → single-pass agg,
    no extra distinct-values job."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("O").alias("status_O"),
            F.col("F").alias("status_F"),
            F.col("P").alias("status_P"),
        )
        .orderBy("o_orderpriority")
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
    "distinct_two_stage",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def distinct_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact distinct-count: pre-distinct on (key, value)
    spreads a hot key over hash(key, value) partitions, then the
    per-key count is a tiny second agg — the salting pattern for
    exact DISTINCT at scale (a single-shuffle countDistinct funnels
    every distinct value of a hot key through one reducer; the
    reference's skew is 82% one label, Neww_Fai.py:645-652). Two
    measures share the first shuffle via grouping on both pairs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey", "l_suppkey"
    )
    parts = (
        li.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(F.count("*").alias("n_parts"))
    )
    supps = (
        li.select("l_returnflag", "l_suppkey").distinct()
        .groupBy("l_returnflag").agg(F.count("*").alias("n_supps"))
    )
    return parts.join(supps, "l_returnflag").orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# dropna (Neww_Fai.py:659-660) and deterministic random sample
# ---------------------------------------------------------------------------


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


@query(
    "approx_distinct_tolerance",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_exact,
           TRUE AS approx_within_5pct
    FROM orders
    """,
)
def approx_distinct_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB cardinality path: HyperLogLog++ ``approx_count_distinct``
    (no shuffle of distinct values — fixed 2^p-register sketch per
    partition, merged associatively) next to the exact count. The query
    EMITS its own acceptance check: ``approx_within_5pct`` must come
    back true, so the correctness gate fails if the sketch ever drifts
    past 5% — the estimate itself is engine-specific and deliberately
    not hash-compared."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_approx"),
    )
    return agg.select(
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(0.05)
        ).alias("approx_within_5pct"),
    )
