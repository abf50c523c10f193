"""Normalization plans: the reference's post-processing stack
(post_pro_9_8.py, postpro_star_9_3.py, doc_promp_8_21.py,
new_prompt_7_2) exercised over the TPC-H-ish testdata.

Pattern: each query SYNTHESIZES messy inputs deterministically from a
numeric/string testdata column (keyed by modulo of the row key), runs
the engine's normalizer, and the DuckDB oracle computes the expected
canonical output DIRECTLY from the clean source value — so the oracle
is an independent derivation, not a re-implementation of the parser.

Scale: all queries are narrow (scan → project), zero shuffles except
final ORDER BY; at 100 TB these run as a single map stage per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import normalize as N
from ..sources.tables import load_table
from .registry import query

# Shared DuckDB fragment: comma-group an up-to-9-digit integer part
# (RE2 has no lookahead, so no single-regex trick).
_DUCK_COMMAS = """
      CASE WHEN length(ip) > 6
           THEN substr(ip,1,length(ip)-6) || ',' || substr(ip,length(ip)-5,3) || ',' || substr(ip,length(ip)-2,3)
           WHEN length(ip) > 3
           THEN substr(ip,1,length(ip)-3) || ',' || substr(ip,length(ip)-2,3)
           ELSE ip END
"""


@query(
    "money_normalization",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS v,
             o_orderkey % 6 AS variant
      FROM orders
    ), parts AS (
      SELECT o_orderkey, variant, v,
             split_part(CAST(v AS VARCHAR), '.', 1) AS ip,
             split_part(CAST(v AS VARCHAR), '.', 2) AS frac
      FROM base
    )
    SELECT o_orderkey,
           CASE WHEN variant = 4 THEN NULL
                WHEN variant IN (1, 2, 3)
                THEN '-$' || {_DUCK_COMMAS} || '.' || frac
                ELSE '$' || {_DUCK_COMMAS} || '.' || frac
           END AS money_canonical
    FROM parts ORDER BY o_orderkey
    """,
)
def money_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """money_or_null over six deterministic messy variants of
    o_totalprice: plain, parenthesized, trailing-minus, CR-suffixed,
    garbage (→NULL), pre-formatted with $/commas. The oracle derives
    the expected canonical string directly from the numeric."""
    o = load_table(spark, sf_dir, "orders", split=True)
    v = F.col("o_totalprice").try_cast("decimal(18,2)")
    plain = v.cast("string")
    variant = F.col("o_orderkey") % 6
    messy = (
        F.when(variant == 0, plain)
        .when(variant == 1, F.concat(F.lit("($"), plain, F.lit(")")))
        .when(variant == 2, F.concat(plain, F.lit("-")))
        .when(variant == 3, F.concat(plain, F.lit(" CR")))
        .when(variant == 4, F.lit("N/A"))
        .otherwise(F.concat(F.lit("$"), F.format_number(v, 2)))
    )
    return (
        o.select("o_orderkey", N.money_or_null(messy).alias("money_canonical"))
        .orderBy("o_orderkey")
    )


@query(
    "credit_sign_enforcement",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM orders
    ), parts AS (
      SELECT o_orderkey, v,
             split_part(CAST(v AS VARCHAR), '.', 1) AS ip,
             split_part(CAST(v AS VARCHAR), '.', 2) AS frac
      FROM base
    )
    SELECT o_orderkey,
           CASE WHEN v = 0 THEN '$0.00'
                ELSE '-$' || {_DUCK_COMMAS} || '.' || frac END AS credit_amount
    FROM parts ORDER BY o_orderkey
    """,
)
def credit_sign_enforcement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_ensure_negative_money (post_pro_9_8.py:75-110): credits forced
    negative except $0.00."""
    o = load_table(spark, sf_dir, "orders", split=True)
    display = N.format_money(F.col("o_totalprice").try_cast("decimal(18,2)"))
    return (
        o.select("o_orderkey", N.ensure_negative_money(display).alias("credit_amount"))
        .orderBy("o_orderkey")
    )


@query(
    "date_sanity",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderkey % 4
             WHEN 0 THEN strftime(o_orderdate, '%-m/%-d/%Y')
             WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
             WHEN 2 THEN NULL  -- shifted +500d beyond the anchor+370 horizon
             ELSE NULL         -- garbage string
           END AS sane_date
    FROM orders ORDER BY o_orderkey
    """,
)
def date_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_date_sane (post_pro_9_8.py:48-73) over four variants of
    o_orderdate: M/d/yyyy (valid), ISO (valid), far-future (+500d past
    the fixed anchor → NULL), garbage (→ NULL). Anchor is pinned to
    the testdata's max date so the oracle is time-independent."""
    o = load_table(spark, sf_dir, "orders", split=True)
    d = F.col("o_orderdate").cast("date")
    anchor = F.lit("2025-12-31").cast("date")  # testdata dates end 2025
    variant = F.col("o_orderkey") % 4
    s = (
        F.when(variant == 0, F.date_format(d, "M/d/yyyy"))
        .when(variant == 1, F.date_format(d, "yyyy-MM-dd"))
        .when(variant == 2, F.date_format(F.date_add(anchor, 500), "M/d/yyyy"))
        .otherwise(F.lit("not a date"))
    )
    return (
        o.select("o_orderkey", N.date_sane(s, today=anchor).alias("sane_date"))
        .orderBy("o_orderkey")
    )


@query(
    "acct_last4",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderkey % 3
             WHEN 0 THEN right('000' || CAST(o_orderkey AS VARCHAR), 4)
             WHEN 1 THEN right('000' || CAST(o_orderkey AS VARCHAR), 4)
             ELSE NULL
           END AS acct_last4
    FROM orders ORDER BY o_orderkey
    """,
)
def acct_last4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account masking (doc_promp_8_21.py:8-23): masked `xxxx1234` and
    `ending in:1234` forms yield last-4; raw digits yield NULL (never
    expose a full account number)."""
    o = load_table(spark, sf_dir, "orders", split=True)
    last4 = F.right(F.concat(F.lit("000"), F.col("o_orderkey").cast("string")), F.lit(4))
    variant = F.col("o_orderkey") % 3
    s = (
        F.when(variant == 0, F.concat(F.lit("xxxxxxxx"), last4))
        .when(variant == 1, F.concat(F.lit("ending in:"), last4))
        .otherwise(F.col("o_orderkey").cast("string"))
    )
    return o.select("o_orderkey", N.acct_last4(s).alias("acct_last4")).orderBy("o_orderkey")


@query(
    "address_vendor_cleanup",
    oracle="""
    SELECT c_custkey,
           'PO Box ' || CAST(c_custkey AS VARCHAR) || ', ' || upper(c_mktsegment) || ' St' AS clean_address,
           CASE WHEN c_custkey % 2 = 0 THEN 'Capital One' ELSE trim(c_name) END AS vendor
    FROM customer ORDER BY c_custkey
    """,
)
def address_vendor_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Address whitespace/PO-Box/comma normalization
    (postpro_star_9_3.py:17-52) + vendor canonicalization
    (doc_promp_8_21.py:25-32) on synthesized messy inputs."""
    c = load_table(spark, sf_dir, "customer")
    messy_addr = F.concat(
        F.lit("  P.O.  Box "),
        F.col("c_custkey").cast("string"),
        F.lit(" ,"),
        F.upper(F.col("c_mktsegment")),
        F.lit("  St ,"),
    )
    messy_vendor = F.when(
        F.col("c_custkey") % 2 == 0, F.lit("CAPITAL  ONE")
    ).otherwise(F.col("c_name"))
    return c.select(
        "c_custkey",
        N.clean_address(messy_addr).alias("clean_address"),
        N.normalize_vendor(messy_vendor).alias("vendor"),
    ).orderBy("c_custkey")


@query(
    "null_canonicalization",
    oracle=r"""
    SELECT p_partkey,
           CASE p_partkey % 4
             WHEN 0 THEN 'NULL' WHEN 1 THEN 'NULL' WHEN 2 THEN 'NULL'
             ELSE trim(p_brand) END AS brand_out,
           upper(trim(regexp_replace(p_name, '[$,''\[\]"]', '', 'g'))) AS name_cleansed
    FROM part ORDER BY p_partkey
    """,
)
def null_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presentation-edge NULL canonicalization (new_prompt_7_2:76-79)
    + the `cleanse` GT canonicalizer (new_prompt_7_2:119-120)."""
    p = load_table(spark, sf_dir, "part")
    variant = F.col("p_partkey") % 4
    messy = (
        F.when(variant == 0, F.lit(None).cast("string"))
        .when(variant == 1, F.lit(""))
        .when(variant == 2, F.lit("no"))
        .otherwise(F.col("p_brand"))
    )
    return p.select(
        "p_partkey",
        N.null_canonical(messy).alias("brand_out"),
        N.cleanse(F.col("p_name")).alias("name_cleansed"),
    ).orderBy("p_partkey")


@query(
    "combined_label_roundtrip",
    oracle="""
    SELECT event_id,
           event_type || ':' || CASE WHEN value > 50 THEN 'true' ELSE 'false' END AS combined,
           event_type AS label_back,
           CASE WHEN value > 50 THEN 'true' ELSE 'false' END AS first_pg_back
    FROM events ORDER BY event_id
    """,
)
def combined_label_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`label:first_pg` codec build + split round-trip
    (Faiss_2_10.py:528-529, Neww_Fai.py:1083-1092)."""
    e = load_table(spark, sf_dir, "events")
    combined = N.combined_label(F.col("event_type"), F.col("value") > 50)
    lab, fp = N.split_combined_label(combined)
    return e.select(
        "event_id",
        combined.alias("combined"),
        lab.alias("label_back"),
        fp.alias("first_pg_back"),
    ).orderBy("event_id")


@query(
    "reference_number_extraction",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0
                THEN strftime(o_orderdate, '%Y%m%d') || 'DP' || right('0000000' || CAST(o_orderkey AS VARCHAR), 7)
                ELSE NULL END AS ref_num
    FROM orders ORDER BY o_orderkey
    """,
)
def reference_number_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """17-char `YYYYMMDD DP NNNNNNN` reference extraction with a
    valid-date check (prompt_3_7.py:1-16): embedded in surrounding
    text when key%3==0; month-13 corruption otherwise (→ NULL)."""
    o = load_table(spark, sf_dir, "orders", split=True)
    d = F.col("o_orderdate").cast("date")
    seven = F.right(F.concat(F.lit("0000000"), F.col("o_orderkey").cast("string")), F.lit(7))
    good = F.concat(F.date_format(d, "yyyyMMdd"), F.lit("DP"), seven)
    bad = F.concat(F.date_format(d, "yyyy"), F.lit("13"), F.date_format(d, "dd"), F.lit("DP"), seven)
    text = F.when(F.col("o_orderkey") % 3 == 0, good).otherwise(bad)
    wrapped = F.concat(F.lit("stmt ref "), text, F.lit(" end"))
    return o.select(
        "o_orderkey", N.reference_number_extract(wrapped).alias("ref_num")
    ).orderBy("o_orderkey")
