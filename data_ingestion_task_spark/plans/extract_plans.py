"""Extraction-pipeline plans (SURVEY §2.9, §3.3): the reference's
core flow — render/ingest OCR-ish statement text → extract fields
(pluggable black box; deterministic regex default via Arrow-batched
``mapInPandas``) → normalize (§2.7 column expressions) → compare to
ground truth → per-field accuracy rollup. Plus the SoR
validation-confirmation rule engine (conf_5_22.py) and the
transactions-array extraction (doc_8_14:105-131).

Each query SYNTHESIZES its documents deterministically from
orders⋈customer (variant = key modulo), so the DuckDB oracle derives
the expected output directly from the clean source columns and the
variant residues — an independent derivation, not a re-run of the
extractor.

Scale notes (100 TB): render + extract + normalize are one narrow map
stage (mapInPandas is the only Python hop, Arrow-batched); the GT
join is an equi-join on the carried doc_id (explicit key — never
positional/monotonically_increasing_id); the metric rollup is one
shuffle on a 5-value key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import normalize as N
from ..operators.extract import STATEMENT_PATTERNS, extract_fields
from ..sources.tables import load_table
from .registry import query


def _docs_with_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer → rendered statement text + GT columns.

    Variants (deterministic residues):
      money  mv = o_orderkey % 6: 0 plain / 1 parens / 2 trailing '-' /
             3 'N/A' (unextractable) / 4 preformatted / 5 'CR' suffix
      date   dv = o_orderkey % 7: 1 'MMM d, yyyy' / 2 ISO / 3 corrupt /
             else 'MM/dd/yyyy'
      acct   av = o_custkey % 9: 0 unmasked 'acct NNNN' (must NULL) /
             else 'ending in:NNNN'
      vendor vv = o_custkey % 4: 0 'CapitalOne' / 1 'Capital One' /
             2 c_name / 3 line missing
    """
    o = load_table(spark, sf_dir, "orders", split=True)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)

    v = F.col("o_totalprice").try_cast("decimal(18,2)")
    plain = v.cast("string")
    mv = F.col("o_orderkey") % 6
    money_raw = (
        F.when(mv == 0, plain)
        .when(mv == 1, F.concat(F.lit("($"), plain, F.lit(")")))
        .when(mv == 2, F.concat(plain, F.lit("-")))
        .when(mv == 3, F.lit("N/A"))
        .when(mv == 4, F.concat(F.lit("$"), F.format_number(v, 2)))
        .otherwise(F.concat(plain, F.lit(" CR")))
    )
    gt_money = F.when(mv == 3, F.lit(None).cast("string")).otherwise(
        F.when(mv.isin(1, 2, 5), N.format_money(-v)).otherwise(N.format_money(v))
    )

    od = F.col("o_orderdate").cast("date")
    dv = F.col("o_orderkey") % 7
    date_raw = (
        F.when(dv == 1, F.date_format(od, "MMM d, yyyy"))
        .when(dv == 2, F.date_format(od, "yyyy-MM-dd"))
        .when(dv == 3, F.lit("99/99/9999"))
        .otherwise(F.date_format(od, "MM/dd/yyyy"))
    )

    digits = F.lpad((F.col("o_custkey") % 10000).cast("string"), 4, "0")
    av = F.col("o_custkey") % 9
    acct_raw = F.when(av == 0, F.concat(F.lit("acct "), digits)).otherwise(
        F.concat(F.lit("ending in:"), digits)
    )

    vv = F.col("o_custkey") % 4
    vendor_raw = (
        F.when(vv == 0, F.lit("CapitalOne"))
        .when(vv == 1, F.lit("Capital One"))
        .when(vv == 2, F.col("c_name"))
        .otherwise(F.lit(None).cast("string"))  # line missing
    )
    gt_vendor = F.when(vv.isin(0, 1), F.lit("Capital One")).otherwise(F.col("c_name"))

    text = F.concat_ws(
        "\n",
        F.lit("ACCOUNT STATEMENT"),
        F.when(vendor_raw.isNotNull(), F.concat(F.lit("Vendor: "), vendor_raw)),
        F.concat(F.lit("Account Number: "), acct_raw),
        F.concat(F.lit("Statement Date: "), date_raw),
        F.concat(F.lit("Total Due: "), money_raw),
        F.lit("Thank you for your business."),
    )
    return j.select(
        F.col("o_orderkey").alias("doc_id"),
        text.alias("text"),
        gt_money.alias("gt_money"),
        od.alias("gt_date"),
        digits.alias("gt_acct"),
        gt_vendor.alias("gt_vendor"),
    )


@query(
    "extraction_e2e_accuracy",
    oracle="""
    WITH j AS (SELECT o_orderkey, o_custkey FROM orders),
    long AS (
      SELECT 'account_last4' AS field,
             CASE WHEN o_custkey % 9 <> 0 THEN 1 ELSE 0 END AS ok FROM j
      UNION ALL
      SELECT 'statement_date', CASE WHEN o_orderkey % 7 <> 3 THEN 1 ELSE 0 END FROM j
      UNION ALL
      SELECT 'total_due', CASE WHEN o_orderkey % 6 <> 3 THEN 1 ELSE 0 END FROM j
      UNION ALL
      SELECT 'vendor_name', CASE WHEN o_custkey % 4 <> 3 THEN 1 ELSE 0 END FROM j
    )
    SELECT COALESCE(field, 'Overall') AS field,
           CAST(SUM(ok) AS BIGINT) AS n_correct,
           COUNT(*) AS support,
           round(CAST(SUM(ok) AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM long GROUP BY ROLLUP(field) ORDER BY field
    """,
)
def extraction_e2e_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end §3.3 pipeline: render statement docs → mapInPandas
    regex extraction → §2.7 normalizers (money_or_null,
    parse_date_multi, acct_last4, normalize_vendor) → GT equi-join on
    doc_id → long form → per-field accuracy ROLLUP with Overall row
    (metrics_8_6.py:36-64). The oracle derives expected accuracy
    independently from the variant residues."""
    docs = _docs_with_gt(spark, sf_dir)
    # GT rides through the Arrow stage: one render pass, no join-back.
    scored = extract_fields(
        docs,
        STATEMENT_PATTERNS,
        passthrough=("gt_money", "gt_date", "gt_acct", "gt_vendor"),
    )

    def ok(c: Column) -> Column:
        return F.coalesce(c.cast("int"), F.lit(0))

    money_ok = ok(N.money_or_null(F.col("raw_money")) == F.col("gt_money"))
    date_ok = ok(N.parse_date_multi(F.col("raw_date")) == F.col("gt_date"))
    acct_ok = ok(N.acct_last4(F.col("raw_account")) == F.col("gt_acct"))
    vendor_ok = ok(N.normalize_vendor(F.col("raw_vendor")) == F.col("gt_vendor"))
    # flags materialized in ONE projection, then stack()-unpivoted —
    # a per-field union would re-run the whole render+extract subtree
    # once per branch.
    flags = scored.select(
        acct_ok.alias("f_acct"),
        date_ok.alias("f_date"),
        money_ok.alias("f_money"),
        vendor_ok.alias("f_vendor"),
    )
    long = flags.select(
        F.expr(
            "stack(4, 'account_last4', f_acct, 'statement_date', f_date, "
            "'total_due', f_money, 'vendor_name', f_vendor) AS (field, ok)"
        )
    )
    from ..operators.metrics import accuracy_rollup

    return accuracy_rollup(long)


# ---------------------------------------------------------------------------
# SoR validation-confirmation rule engine (conf_5_22.py, keyy_4_21.py)
# ---------------------------------------------------------------------------

FIRSTS = ["William", "Robert", "Elizabeth", "Margaret", "John"]
NICKS = ["Bill", "Bob", "Liz", "Peggy", "Jack"]
LASTS = ["Smith", "Jones", "Taylor", "Brown", "Wilson"]
STREETS = ["Maple Street", "Oak Avenue", "Cedar Road"]
STREETS_ABBR = ["Maple St", "Oak Ave", "Cedar Rd"]


def _pick(items: list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in items]), (idx % len(items) + 1).cast("int"))


# Canonical matching normalizers live in functions/normalize.py
# (NICKNAME_MAP matches the FIRSTS/NICKS scenario lists above).
_norm_first = N.normalize_first_name
_norm_addr = N.normalize_street_address


@query(
    "sor_confirmation",
    oracle="""
    SELECT c_custkey,
           CASE c_custkey % 6 WHEN 3 THEN 2 WHEN 4 THEN 1 WHEN 5 THEN 1 ELSE 3 END AS n_matches,
           CASE WHEN c_custkey % 6 IN (0, 1, 2, 3) THEN 'yes' ELSE 'no' END AS decision
    FROM customer ORDER BY c_custkey
    """,
)
def sor_confirmation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """System-of-record validation confirmation (conf_5_22.py:1-103):
    first/last/address are matched with nickname canonicalization and
    street-abbreviation normalization; decision = yes iff ≥2 of 3
    fields match (2-of-3 rule, keyy_4_21.py). Doc-side fields are
    deterministic perturbations of the SoR record (exact / nickname /
    abbreviated / conflicting-last / missing-address / wrong-first+
    street); the oracle derives the verdict from the residue."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    k = F.col("c_custkey")
    fi, li, si, sv = k, k + 2, k, k % 6
    house = (F.lit(100) + k % 900).cast("string")

    sor_first = _pick(FIRSTS, fi)
    sor_last = _pick(LASTS, li)
    sor_addr = F.concat_ws(" ", house, _pick(STREETS, si))

    doc_first = (
        F.when(sv == 1, _pick(NICKS, fi)).when(sv == 5, _pick(FIRSTS, fi + 1)).otherwise(sor_first)
    )
    doc_last = F.when(sv.isin(3, 4), _pick(LASTS, li + 1)).otherwise(sor_last)
    doc_street = (
        F.when(sv == 2, _pick(STREETS_ABBR, si))
        .when(sv == 5, _pick(STREETS, si + 1))
        .when(sv == 4, F.lit(None).cast("string"))
        .otherwise(_pick(STREETS, si))
    )
    doc_addr = F.concat(house, F.lit(" "), doc_street)  # null street → null addr

    from ..operators.confirm import confirm_documents

    frame = c.select(
        "c_custkey",
        doc_first.alias("doc_first"),
        doc_last.alias("doc_last"),
        doc_addr.alias("doc_addr"),
        sor_first.alias("sor_first"),
        sor_last.alias("sor_last"),
        sor_addr.alias("sor_addr"),
    )
    confirmed = confirm_documents(
        frame, "doc_first", "doc_last", "doc_addr", "sor_first", "sor_last", "sor_addr"
    )
    return confirmed.select("c_custkey", "n_matches", "decision").orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Transactions-array extraction (doc_8_14:105-131, private_bb_4_2:62)
# ---------------------------------------------------------------------------

_TXN_LINE = r"(?m)^\d{2}/\d{2}/\d{4} \| \S+ \| \$\d+\.\d{2}$"


@query(
    "transactions_extract",
    oracle="""
    SELECT o_orderkey AS doc_id,
           CAST(t.i AS INTEGER) AS txn_idx,
           strftime(CAST(o_orderdate AS DATE) + CAST(t.i AS INTEGER), '%m/%d/%Y') AS posted_date,
           'V' || CAST(o_orderkey % 50 AS VARCHAR) AS vendor,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) + t.i AS DOUBLE) AS amount
    FROM orders, generate_series(0, 2) AS t(i)
    ORDER BY doc_id, txn_idx
    """,
)
def transactions_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested transactions table per statement: render 3 txn lines per
    order, extract them with one regexp_extract_all → split →
    posexplode into a child table keyed by doc_id (the ArrayType↔child
    -table duality of SURVEY §1.1). All JVM-side — the array
    extraction never leaves codegen."""
    o = load_table(spark, sf_dir, "orders", split=True)
    v = F.col("o_totalprice").try_cast("decimal(18,2)")
    od = F.col("o_orderdate").cast("date")
    vend = F.concat(F.lit("V"), (F.col("o_orderkey") % 50).cast("string"))
    lines = [
        F.concat(
            F.date_format(F.date_add(od, i), "MM/dd/yyyy"),
            F.lit(" | "),
            vend,
            F.lit(" | $"),
            (v + i).cast("string"),
        )
        for i in range(3)
    ]
    text = F.concat_ws("\n", F.lit("TRANSACTIONS"), *lines, F.lit("END"))
    docs = o.select(F.col("o_orderkey").alias("doc_id"), text.alias("text"))
    matches = F.regexp_extract_all(F.col("text"), F.lit(_TXN_LINE), F.lit(0))
    exploded = docs.select("doc_id", F.posexplode(matches).alias("txn_idx", "line"))
    parts = F.split(F.col("line"), r" \| ")
    return exploded.select(
        "doc_id",
        "txn_idx",
        parts.getItem(0).alias("posted_date"),
        parts.getItem(1).alias("vendor"),
        F.regexp_replace(parts.getItem(2), r"[$]", "")
        .try_cast("decimal(18,2)")
        .cast("double")
        .alias("amount"),
    ).orderBy("doc_id", "txn_idx")


@query(
    "feedback_error_clusters",
    oracle="""
    WITH j AS (SELECT o_orderkey % 6 AS mv FROM orders),
    c AS (
      SELECT CASE WHEN mv = 3 THEN 'both_null'
                  WHEN mv IN (1, 2, 5) THEN 'sign_format'
                  WHEN mv = 0 THEN 'punct_format'
                  ELSE 'exact' END AS error_class
      FROM j
    )
    SELECT error_class,
           COUNT(*) AS n_docs,
           round(CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM j), 6) AS share,
           CASE error_class
             WHEN 'sign_format' THEN 'normalize parens/trailing-minus/CR to leading minus'
             WHEN 'punct_format' THEN 'apply $/comma display formatting'
             WHEN 'both_null' THEN 'expected NULL - no fix'
             WHEN 'missing' THEN 'extend extraction patterns'
             WHEN 'false_positive' THEN 'tighten extraction patterns'
             WHEN 'value_mismatch' THEN 'escalate to manual review'
             ELSE 'none' END AS suggestion
    FROM c GROUP BY error_class ORDER BY error_class
    """,
)
def feedback_error_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feedback-agent loop (feebback agent_8_29.py:30-66: capture →
    compare → cluster → suggest) over the RAW extraction output,
    before normalization: each pred/GT money pair is classified into
    the reference's known-error taxonomy (discussion_8_5.py:1-53 —
    paren/sign notation, missing $/commas, expected-NULL) and each
    cluster carries the suggested normalizer fix. The oracle derives
    the same clusters independently from the doc-variant residues, so
    this checks the WHOLE chain render → extract → compare →
    classify. Narrow until one low-cardinality hash-agg."""
    docs = _docs_with_gt(spark, sf_dir)
    # Only the money field feeds the taxonomy: declare only its
    # pattern — a mapInPandas stage computes every declared output
    # column regardless of downstream pruning, so passing the full
    # 4-pattern set ran 3 unused vectorized regexes per batch (the
    # r1→r2 +0.45s regression came from sharing the 4-pattern
    # extractor here).
    scored = extract_fields(
        docs,
        {"raw_money": STATEMENT_PATTERNS["raw_money"]},
        passthrough=("gt_money",),
    )
    raw, gt = F.col("raw_money"), F.col("gt_money")
    digits = lambda c: F.regexp_replace(c, r"[^0-9.]", "")  # noqa: E731
    raw_null = N.money_or_null(raw).isNull()
    sign_marked = raw.rlike(r"\(") | raw.rlike(r"-\s*$") | raw.rlike(r"CR\s*$")
    cls = (
        F.when(raw_null & gt.isNull(), "both_null")
        .when(gt.isNull(), "false_positive")
        .when(raw_null, "missing")
        .when(raw == gt, "exact")
        .when((digits(raw) == digits(gt)) & sign_marked, "sign_format")
        .when(digits(raw) == digits(gt), "punct_format")
        .otherwise("value_mismatch")
    )
    suggestion = (
        F.when(F.col("error_class") == "sign_format",
               "normalize parens/trailing-minus/CR to leading minus")
        .when(F.col("error_class") == "punct_format", "apply $/comma display formatting")
        .when(F.col("error_class") == "both_null", "expected NULL - no fix")
        .when(F.col("error_class") == "missing", "extend extraction patterns")
        .when(F.col("error_class") == "false_positive", "tighten extraction patterns")
        .when(F.col("error_class") == "value_mismatch", "escalate to manual review")
        .otherwise("none")
    )
    from pyspark.sql.window import Window

    classified = scored.select(cls.alias("error_class"))
    counted = classified.groupBy("error_class").agg(F.count("*").alias("n_docs"))
    # share denominator via a window over the (≤7-row) agg output —
    # a driver-side count() would re-run the whole render+extract tree
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        counted.select(
            "error_class",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / total, 6).alias("share"),
        )
        .withColumn("suggestion", suggestion)
        .orderBy("error_class")
    )
