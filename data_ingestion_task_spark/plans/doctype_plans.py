"""Per-doc-type extraction pipelines (SURVEY §2.9 extraction schemas):
the W2 24-field end-to-end run, the invoice 9-field scaffold parse,
and the credit-card 8-field parse with its transactions array —
each driven by the fixed StructTypes in operators/schemas.py.

Documents are SYNTHESIZED deterministically from customer/orders (the
variant-residue technique of extract_plans.py), so the DuckDB oracle
derives expected outcomes from the residues independently instead of
re-running the extractor.

Scale notes (100 TB): every pipeline here is render → one
Arrow-batched extraction/parse stage → column-expression normalize →
one low-cardinality rollup shuffle. The transactions explode is a
narrow stage (array per doc → rows); its per-doc rollup shuffles on
doc_id only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import normalize as N
from ..operators.extract import extract_fields
from ..operators.metrics import accuracy_rollup
from ..operators.schemas import (
    CREDIT_CARD_FIELDS,
    INVOICE_FIELDS,
    W2_FIELDS,
    line_patterns,
    parse_model_json,
)
from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------------------------------
# W2 end-to-end: render 24 fields -> extract -> normalize -> accuracy
# ---------------------------------------------------------------------------

_BOX12_CODES = ["A", "C", "D", "DD", "EE", "W", "AA", "ZZ"]  # idx 7 = invalid
_MONEY_BOXES = [
    "BOX1_WAGES", "BOX2_FED_WITHHOLD", "BOX3_SS_WAGE", "BOX4_SS_WITHHOLDING",
    "BOX5_MEDICARE_WAGES", "BOX6_MEDICARE_WITHHOLDING",
    "BOX7_ALLOCATED_TIPS", "BOX8_ALLOCATED_TIPS",
]
_B12 = ["BOX12A", "BOX12B", "BOX12C", "BOX12D"]


def _money_raw_gt(v: Column, mv: Column) -> tuple[Column, Column]:
    """The §2.7 money-variant machinery (extract_plans._docs_with_gt):
    residue 3 renders unextractable 'N/A' (GT stays the clean value →
    counted wrong); parens / trailing-minus / CR render negatives.

    GT is the signed DECIMAL (not the display string): the accuracy
    compare then parses only the extracted side — halving each fused
    compare-expression tree, which matters 24× in one projection
    (oversized codegen falls back to interpreted eval)."""
    plain = v.cast("string")
    raw = (
        F.when(mv == 0, plain)
        .when(mv == 1, F.concat(F.lit("($"), plain, F.lit(")")))
        .when(mv == 2, F.concat(plain, F.lit("-")))
        .when(mv == 3, F.lit("N/A"))
        .when(mv == 4, F.concat(F.lit("$"), F.format_number(v, 2)))
        .otherwise(F.concat(plain, F.lit(" CR")))
    )
    gt = F.when(mv.isin(1, 2, 5), -v).otherwise(v)
    return raw, gt


def _w2_cols(k: Column, name: Column, addr_seg: Column) -> dict[str, tuple[Column, Column]]:
    """field → (raw rendered value, ground truth), all derived from the
    customer key ``k`` (plus name/segment columns). Shared by the
    renderer AND the post-extraction GT rebuild, so GT never rides
    through the Arrow stage (24 passthrough columns ≈ 2.4× the
    extraction stage's cost, measured at sf0.1)."""
    d4 = F.lpad((k % 10000).cast("string"), 4, "0")

    ssn_good = F.concat(F.lit("123-45-"), d4)
    ssn = F.when(k % 5 == 0, F.concat(F.lit("12345"), d4)).otherwise(ssn_good)
    ein_good = F.concat(F.lit("12-34567"), F.lpad((k % 100).cast("string"), 2, "0"))
    ein = F.when(k % 7 == 0, F.regexp_replace(ein_good, "-", "")).otherwise(ein_good)

    year_gt = (F.lit(2015) + (k % 9)).cast("string")
    yv = k % 11
    year_raw = (
        F.when(yv == 0, F.lit("TY-unknown"))
        # multi-year: earliest must win (w2_prompt_v1_6_12 'earliest year')
        .when(yv == 1, F.concat(year_gt, F.lit(" "), (F.lit(2016) + (k % 9)).cast("string")))
        .otherwise(year_gt)
    )

    addr = F.concat((k % 999 + 1).cast("string"), F.lit(" Oak Avenue, "), addr_seg)
    cols = {
        "EMPLOYEE_NAME": (name, name),
        "EMPLOYEE_ADDRESS": (addr, addr),
        "EMPLOYEE_SSN": (ssn, ssn_good),
        "EMPLOYER_NAME": (F.lit("Initech LLC"), F.lit("Initech LLC")),
        "EMPLOYER_ADDRESS": (F.lit("100 Main Street, Springfield"),) * 2,
        "EMPLOYER_FEDERAL_EIN": (ein, ein_good),
        "BOX14_OTHER": (F.lit("PARKING 120.00"), F.lit("PARKING 120.00")),
        "W2_YEAR": (year_raw, year_gt),
    }
    for i, box in enumerate(_MONEY_BOXES):
        v = ((k % 9000) + i * 13 + 100).cast("decimal(18,2)")
        raw, gt = _money_raw_gt(v, (k + i) % 6)
        cols[f"{box}"] = (raw, gt)
    for i, b in enumerate(_B12):
        code = F.element_at(
            F.array(*[F.lit(x) for x in _BOX12_CODES]), ((k + i) % 8 + 1).cast("int")
        )
        cols[f"{b}_CODE"] = (code, code)
        v = ((k % 500) + i * 7 + 50).cast("decimal(18,2)")
        raw, gt = _money_raw_gt(v, (k + 10 + i) % 6)
        cols[f"{b}_AMOUNT"] = (raw, gt)
    return cols


def _w2_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → one synthetic W2 per row: every one of the 24 fields
    rendered as an anchored 'FIELD: value' OCR line, with hash-residue
    corruption variants per field class (malformed SSN/EIN, N/A money,
    off-whitelist Box-12 code, corrupt year).

    split=True: 24 Python regex extracts per row dominate — parallelize
    the single-file local scan before the Arrow stage. Only doc_id and
    the two non-key-derivable source columns accompany the text; GT is
    rebuilt from doc_id after extraction (see _w2_cols)."""
    c = load_table(spark, sf_dir, "customer", split=True)
    cols = _w2_cols(F.col("c_custkey"), F.col("c_name"), F.col("c_mktsegment"))
    text = F.concat_ws(
        "\n",
        F.lit("FORM W-2 Wage and Tax Statement"),
        *[F.concat(F.lit(f"{f}: "), cols[f][0]) for f in W2_FIELDS],
    )
    return c.select(
        F.col("c_custkey").alias("doc_id"),
        F.col("c_name").alias("src_name"),
        F.col("c_mktsegment").alias("src_seg"),
        text.alias("text"),
    )


def _w2_normalized(extracted: DataFrame) -> dict[str, Column]:
    """Field-class normalizers applied to the extracted raw strings:
    trim for names/addresses, format-sanity regexes for SSN/EIN,
    money_decimal (the parse half of money_or_null) for amounts,
    Box-12 whitelist (new_prompt_7_2:73), earliest-year rule for
    W2_YEAR."""
    out: dict[str, Column] = {}
    for f in ["EMPLOYEE_NAME", "EMPLOYEE_ADDRESS", "EMPLOYER_NAME",
              "EMPLOYER_ADDRESS", "BOX14_OTHER"]:
        out[f] = F.trim(F.col(f))
    out["EMPLOYEE_SSN"] = F.nullif(
        F.regexp_extract(F.col("EMPLOYEE_SSN"), r"^(\d{3}-\d{2}-\d{4})$", 1), F.lit("")
    )
    out["EMPLOYER_FEDERAL_EIN"] = F.nullif(
        F.regexp_extract(F.col("EMPLOYER_FEDERAL_EIN"), r"^(\d{2}-\d{7})$", 1), F.lit("")
    )
    for box in _MONEY_BOXES:
        out[box] = N.money_decimal(F.col(box))
    for b in _B12:
        code = F.col(f"{b}_CODE")
        out[f"{b}_CODE"] = F.when(
            code.rlike("^[A-Z]$") | code.isin("AA", "BB", "DD", "EE", "FF", "GG", "HH"), code
        )
        out[f"{b}_AMOUNT"] = N.money_decimal(F.col(f"{b}_AMOUNT"))
    years = F.expr(r"regexp_extract_all(W2_YEAR, '(19|20)\\d{2}', 0)")
    out["W2_YEAR"] = F.when(F.size(years) > 0, F.array_min(years))
    return out


def _w2_ok_sql() -> str:
    """Per-field expected-correct residues, derived independently of
    the extractor (the oracle side of the variant machinery)."""
    rows = []
    always = ["EMPLOYEE_NAME", "EMPLOYEE_ADDRESS", "EMPLOYER_NAME",
              "EMPLOYER_ADDRESS", "BOX14_OTHER"]
    for f in always:
        rows.append(f"SELECT '{f}' AS field, 1 AS ok FROM customer")
    rows.append("SELECT 'EMPLOYEE_SSN', CASE WHEN c_custkey % 5 <> 0 THEN 1 ELSE 0 END FROM customer")
    rows.append("SELECT 'EMPLOYER_FEDERAL_EIN', CASE WHEN c_custkey % 7 <> 0 THEN 1 ELSE 0 END FROM customer")
    rows.append("SELECT 'W2_YEAR', CASE WHEN c_custkey % 11 <> 0 THEN 1 ELSE 0 END FROM customer")
    for i, box in enumerate(_MONEY_BOXES):
        rows.append(
            f"SELECT '{box}', CASE WHEN (c_custkey + {i}) % 6 <> 3 THEN 1 ELSE 0 END FROM customer"
        )
    for i, b in enumerate(_B12):
        rows.append(
            f"SELECT '{b}_CODE', CASE WHEN (c_custkey + {i}) % 8 <> 7 THEN 1 ELSE 0 END FROM customer"
        )
        rows.append(
            f"SELECT '{b}_AMOUNT', CASE WHEN (c_custkey + {10 + i}) % 6 <> 3 THEN 1 ELSE 0 END FROM customer"
        )
    return " UNION ALL ".join(rows)


@query(
    "w2_extraction_e2e",
    oracle=f"""
    WITH long AS ({_w2_ok_sql()})
    SELECT COALESCE(field, 'Overall') AS field,
           CAST(SUM(ok) AS BIGINT) AS n_correct,
           COUNT(*) AS support,
           round(CAST(SUM(ok) AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM long GROUP BY ROLLUP(field) ORDER BY field
    """,
)
def w2_extraction_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 24-field end-to-end (w2_prompt_v1_6_12:4-36 schema;
    postpro_star_9_3.py post_process composition): render W2 OCR text →
    mapInPandas extraction with the fixed W2 pattern set → field-class
    normalizers (SSN/EIN sanity, money_or_null, Box-12 whitelist,
    earliest-year) → GT comparison → per-field accuracy rollup with
    Overall. One Arrow stage, one rollup shuffle on a 24-value key."""
    docs = _w2_docs(spark, sf_dir)
    # Arrow stage carries only doc_id + 2 source columns + text; the 24
    # GT expressions are rebuilt from doc_id on the extracted frame.
    extracted = extract_fields(
        docs, line_patterns(W2_FIELDS), passthrough=("src_name", "src_seg")
    )
    normed = _w2_normalized(extracted)
    gt = _w2_cols(F.col("doc_id"), F.col("src_name"), F.col("src_seg"))
    flags = extracted.select(
        *[
            F.coalesce((normed[f] == gt[f][1]).cast("int"), F.lit(0)).alias(f"ok_{f}")
            for f in W2_FIELDS
        ]
    )
    stack_args = ", ".join(f"'{f}', ok_{f}" for f in W2_FIELDS)
    long = flags.select(
        F.expr(f"stack({len(W2_FIELDS)}, {stack_args}) AS (field, ok)")
    )
    return accuracy_rollup(long)


# ---------------------------------------------------------------------------
# Invoice: model-JSON parse with all-NULL scaffold on failure
# ---------------------------------------------------------------------------


@query(
    "invoice_scaffold_parse",
    oracle="""
    WITH raws AS (
      SELECT o_orderkey AS doc_id,
             ('0x' || substr(md5('inv:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 4 AS v,
             CAST(o_totalprice AS DECIMAL(18,2)) AS amt
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN v = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_scaffolded,
           CAST(SUM(CASE WHEN v <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
           CAST(CAST(SUM(CASE WHEN v <> 3 THEN amt ELSE CAST(0 AS DECIMAL(18,2)) END)
                     AS DECIMAL(28,2)) AS DOUBLE) AS total_due_sum
    FROM raws
    """,
)
def invoice_scaffold_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invoice 9-field model-output parsing (privateb_4_8.py:20-46):
    synthesize model JSON responses — clean / code-fenced / prose-
    wrapped / irreparably truncated by hash residue — then
    parse_model_json with the fixed InvoiceFields StructType; failures
    become all-NULL scaffolds counted as data. Decimal-exact sum of
    the parsed Total Due proves typed values survive the round trip."""
    o = load_table(spark, sf_dir, "orders", split=True)
    amt = F.col("o_totalprice").cast("decimal(18,2)")
    payload = F.concat(
        F.lit('{"Bill Date": "2024-01-15", "Due Date": "2024-02-15", '
              '"Bill to Name": "ACME Corp", "Bill to Address": "1 Way", '
              '"Vendor Name": "Initech", "Vendor Address": "2 Way", '
              '"Account Number": "x1234", "Total Due": "'),
        amt.cast("string"),
        F.lit('", "Invoice Number": "INV-'),
        F.col("o_orderkey").cast("string"),
        F.lit('"}'),
    )
    from ..functions.text import hash64

    v = hash64(F.concat(F.lit("inv:"), F.col("o_orderkey").cast("string"))) % 4
    raw = (
        F.when(v == 0, payload)
        .when(v == 1, F.concat(F.lit("```json\n"), payload, F.lit("\n```")))
        .when(v == 2, F.concat(F.lit("Here is the extraction:\n"), payload))
        # truncated mid-object: brace-repair cannot recover → scaffold
        .otherwise(F.substring(payload, 1, 40))
    )
    docs = o.select(F.col("o_orderkey").alias("doc_id"), raw.alias("raw"))
    parsed = parse_model_json(docs, INVOICE_FIELDS)
    due = F.col("parsed.`Total Due`").try_cast("decimal(18,2)")
    return parsed.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("parse_failed").cast("int")).cast("bigint").alias("n_scaffolded"),
        F.sum((~F.col("parse_failed")).cast("int")).cast("bigint").alias("n_parsed"),
        F.sum(F.coalesce(due, F.lit(0).cast("decimal(18,2)")))
        .cast("decimal(28,2)")
        .cast("double")
        .alias("total_due_sum"),
    )


# ---------------------------------------------------------------------------
# Credit-card: transactions ARRAY inside the JSON (private_bb_4_2:62)
# ---------------------------------------------------------------------------


@query(
    "credit_card_txn_parse",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS amt,
             CASE WHEN l_linenumber % 4 = 0 THEN -1 ELSE 1 END AS sign
      FROM lineitem WHERE l_orderkey % 20 = 1
    )
    SELECT l_orderkey AS doc_id,
           COUNT(*) AS n_txns,
           CAST(CAST(SUM(CASE WHEN sign = 1 THEN amt ELSE CAST(0 AS DECIMAL(18,2)) END)
                     AS DECIMAL(28,2)) AS DOUBLE) AS charges_sum,
           CAST(CAST(SUM(CASE WHEN sign = -1 THEN amt ELSE CAST(0 AS DECIMAL(18,2)) END)
                     AS DECIMAL(28,2)) AS DOUBLE) AS credits_sum
    FROM li GROUP BY l_orderkey ORDER BY doc_id
    """,
)
def credit_card_txn_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit-card 8-field schema with the transactions ARRAY
    (private_bb_4_2:30-63): per statement, render the model JSON with
    its nested transaction list (line items of the order; every 4th a
    credit), parse with the fixed array<struct> schema, EXPLODE the
    array to a child table, and roll charges/credits up per doc —
    array-in-JSON → typed child rows, the reference's 'include them
    all in a properly formatted array' contract.

    Scale: the JSON assembly is a groupBy(doc) collect_list (one
    shuffle); parse+explode are narrow; the rollup reuses the doc key."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 1)
    amt = F.col("l_extendedprice").cast("decimal(18,2)")
    signed = F.when(F.col("l_linenumber") % 4 == 0, -amt).otherwise(amt)
    txn_json = F.concat(
        F.lit('{"Transaction_date": "2024-01-'),
        F.lpad((F.col("l_linenumber") % 28 + 1).cast("string"), 2, "0"),
        F.lit('", "Vendor_name": "V'),
        F.col("l_partkey").cast("string"),
        F.lit('", "Amount": "'),
        signed.cast("string"),
        F.lit('"}'),
    )
    doc_json = (
        li.groupBy(F.col("l_orderkey").alias("doc_id"))
        .agg(
            F.concat(
                F.lit('{"Client_Name": "C", "Account_Number": "x9999", '
                      '"Total_charges": "0", "Total_Credits": "0", '
                      '"Bank_Name": "Initech Bank", "transactions": ['),
                F.concat_ws(
                    ", ",
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("l_linenumber").alias("ln"), txn_json.alias("j"))
                        )
                    ).getField("j"),
                ),
                F.lit("]}"),
            ).alias("raw")
        )
    )
    parsed = parse_model_json(doc_json, CREDIT_CARD_FIELDS)
    txns = parsed.select(
        "doc_id", F.explode(F.col("parsed.transactions")).alias("t")
    ).select(
        "doc_id",
        F.col("t.Amount").try_cast("decimal(18,2)").alias("amt"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        txns.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_txns"),
            F.sum(F.when(F.col("amt") >= 0, F.col("amt")).otherwise(zero))
            .cast("decimal(28,2)")
            .cast("double")
            .alias("charges_sum"),
            F.sum(F.when(F.col("amt") < 0, -F.col("amt")).otherwise(zero))
            .cast("decimal(28,2)")
            .cast("double")
            .alias("credits_sum"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# PBST bank statement: the reference's headline doc type (doc_8_14)
# ---------------------------------------------------------------------------

def _accuracy_rollup_wide(flags: DataFrame, fields: list[str]) -> DataFrame:
    """``accuracy_rollup`` for wide ``ok_<field>`` flag frames whose
    flag expressions are very large: aggregate FIRST (one sum per
    field + one count), then unpivot the one-row result. Output is
    identical to ``accuracy_rollup(stack(flags))`` on non-empty input,
    but the generated hash-agg never inlines all the normalizer-
    compare trees behind a stack+groupBy — which blows Janino's 64 KB
    method limit at ~10 such fields (observed on pbst_extraction_e2e:
    whole-stage codegen failed to compile and the fused stage fell
    back to interpreted eval). Module-local rather than in
    operators/metrics.py so adopting it does not uncertify every
    metrics-importing plan module (see plans/registry._dep_hash)."""
    import functools
    import operator as _op

    wide = flags.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(f"ok_{f}").cast("bigint").alias(f"s_{f}") for f in fields],
    )
    stack_args = ", ".join(f"'{f}', s_{f}" for f in fields)
    per_field = wide.select(
        F.expr(f"stack({len(fields)}, {stack_args}) AS (field, n_correct)"),
        F.col("_n").alias("support"),
    )
    overall = wide.select(
        F.lit("Overall").alias("field"),
        functools.reduce(_op.add, [F.col(f"s_{f}") for f in fields]).alias("n_correct"),
        (F.col("_n") * len(fields)).alias("support"),
    )
    return (
        per_field.unionByName(overall)
        .select(
            "field",
            F.col("n_correct").cast("bigint").alias("n_correct"),
            F.col("support").cast("bigint").alias("support"),
            F.round(F.col("n_correct").cast("double") / F.col("support"), 6).alias(
                "accuracy"
            ),
        )
        .orderBy("field")
    )


_PBST_TYPES_RAW = ["Personal Checking Account", "Business Credit Card", "Household Savings Plan"]
_PBST_TYPES_GT = ["CHECKING", "CREDIT_CARD", "SAVINGS"]


def _pbst_cols(k: Column, name: Column) -> dict[str, tuple[Column, Column]]:
    """PBST field → (raw rendered, ground truth); the 10-field schema
    of doc_8_14:66-131 with the §2.7 corruption-variant machinery.
    GT types follow the cheapest exact compare: decimals for plain
    money, display string for the sign-enforced credits, dates for
    dates."""
    d4 = F.lpad((k % 10000).cast("string"), 4, "0")
    acct_raw = F.when(k % 9 == 0, F.concat(F.lit("acct "), d4)).otherwise(
        F.concat(F.lit("ending in:"), d4)
    )

    start = F.date_add(F.lit("2024-01-01").cast("date"), (k % 365).cast("int"))
    end = F.date_add(start, 30)

    def date_variant(dcol: Column, dv: Column) -> Column:
        return (
            F.when(dv == 1, F.date_format(dcol, "MMM d, yyyy"))
            .when(dv == 2, F.date_format(dcol, "yyyy-MM-dd"))
            .when(dv == 3, F.lit("99/99/9999"))
            .otherwise(F.date_format(dcol, "MM/dd/yyyy"))
        )

    charges_v = ((k % 7000) + 200).cast("decimal(18,2)")
    charges_raw, charges_gt = _money_raw_gt(charges_v, (k + 1) % 6)
    due_v = ((k % 4000) + 75).cast("decimal(18,2)")
    due_raw, due_gt = _money_raw_gt(due_v, (k + 3) % 6)

    cred_v = ((k % 2500) + 40).cast("decimal(18,2)")
    cred_raw, _ = _money_raw_gt(cred_v, (k + 2) % 6)
    cred_gt = N.format_money(-cred_v)  # credits are ALWAYS negative (post_pro_9_8.py:75-110)

    tv = (k % 3 + 1).cast("int")
    type_raw = F.element_at(F.array(*[F.lit(x) for x in _PBST_TYPES_RAW]), tv)
    type_gt = F.element_at(F.array(*[F.lit(x) for x in _PBST_TYPES_GT]), tv)

    vv = k % 4
    vendor_raw = (
        F.when(vv == 0, F.lit("CapitalOne"))
        .when(vv == 1, F.lit("Capital One"))
        .when(vv == 2, name)
        .otherwise(F.lit(None).cast("string"))  # line missing
    )
    vendor_gt = F.when(vv.isin(0, 1), F.lit("Capital One")).otherwise(name)

    return {
        "client_name": (name, name),
        "account_number": (acct_raw, d4),
        "total_charges": (charges_raw, charges_gt),
        "total_credits": (cred_raw, cred_gt),
        "statement_start_date": (date_variant(start, k % 7), start),
        "statement_end_date": (date_variant(end, (k + 5) % 7), end),
        "total_due": (due_raw, due_gt),
        "vendor_name": (vendor_raw, vendor_gt),
        "account_type": (type_raw, type_gt),
        "bank_name": (F.lit("Initech Bank"), F.lit("Initech Bank")),
    }


def _pbst_normalized() -> dict[str, Column]:
    """The post_process_fields composition (postpro_star_9_3.py:71-119)
    per PBST field: acct last-4, money parse, credit sign enforcement,
    multi-format date sanity, vendor normalize, keyword account-type."""
    return {
        "client_name": F.trim(F.col("client_name")),
        "account_number": N.acct_last4(F.col("account_number")),
        "total_charges": N.money_decimal(F.col("total_charges")),
        "total_credits": N.ensure_negative_money(N.money_or_null(F.col("total_credits"))),
        "statement_start_date": N.parse_date_multi(F.col("statement_start_date")),
        "statement_end_date": N.parse_date_multi(F.col("statement_end_date")),
        "total_due": N.money_decimal(F.col("total_due")),
        "vendor_name": N.normalize_vendor(F.col("vendor_name")),
        "account_type": (
            F.when(F.col("account_type").rlike("(?i)credit card"), "CREDIT_CARD")
            .when(F.col("account_type").rlike("(?i)checking"), "CHECKING")
            .when(F.col("account_type").rlike("(?i)savings"), "SAVINGS")
        ),
        "bank_name": F.trim(F.col("bank_name")),
    }


_PBST_OK = {
    "client_name": "1",
    "account_number": "CASE WHEN c_custkey % 9 <> 0 THEN 1 ELSE 0 END",
    "total_charges": "CASE WHEN (c_custkey + 1) % 6 <> 3 THEN 1 ELSE 0 END",
    "total_credits": "CASE WHEN (c_custkey + 2) % 6 <> 3 THEN 1 ELSE 0 END",
    "statement_start_date": "CASE WHEN c_custkey % 7 <> 3 THEN 1 ELSE 0 END",
    "statement_end_date": "CASE WHEN (c_custkey + 5) % 7 <> 3 THEN 1 ELSE 0 END",
    "total_due": "CASE WHEN (c_custkey + 3) % 6 <> 3 THEN 1 ELSE 0 END",
    "vendor_name": "CASE WHEN c_custkey % 4 <> 3 THEN 1 ELSE 0 END",
    "account_type": "1",
    "bank_name": "1",
}


@query(
    "pbst_extraction_e2e",
    oracle=f"""
    WITH long AS ({" UNION ALL ".join(
        f"SELECT '{f}' AS field, {ok} AS ok FROM customer" for f, ok in _PBST_OK.items()
    )})
    SELECT COALESCE(field, 'Overall') AS field,
           CAST(SUM(ok) AS BIGINT) AS n_correct,
           COUNT(*) AS support,
           round(CAST(SUM(ok) AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM long GROUP BY ROLLUP(field) ORDER BY field
    """,
)
def pbst_extraction_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PBST bank-statement 10-field end-to-end — the reference's
    HEADLINE pipeline (doc_8_14:66-131 schema; 96.25% overall is
    BASELINE.md's top number): render → mapInPandas extract →
    post_process_fields composition (acct last-4, money parse, credit
    sign enforcement, 5-format date sanity, vendor normalize, keyword
    account-type) → per-field accuracy rollup with Overall.

    Render is a vectorized Arrow stage and the credit-sign compare
    runs in DECIMAL space (display equality ⇔ decimal equality since
    format_money is injective on DECIMAL(18,2)): the previous all-JVM
    variant put the 10 rendered when-chains and the 10 normalizer
    compares each into one generated method, which blew Janino's
    64 KB limit and silently fell back to interpreted eval for both
    stages (the same failure _f1008_render_docs solved for Form
    1008)."""
    from ..operators.schemas import PBST_FIELDS

    def render(batches):
        from datetime import date, timedelta

        import pandas as pd

        def fmt_date(d: date, dv: int) -> str:
            if dv == 1:
                return f"{d.strftime('%b')} {d.day}, {d.year}"
            if dv == 2:
                return d.strftime("%Y-%m-%d")
            if dv == 3:
                return "99/99/9999"
            return d.strftime("%m/%d/%Y")

        def money_raw(v: int, mv: int) -> str | None:
            plain = f"{v}.00"
            if mv == 0:
                return plain
            if mv == 1:
                return f"(${plain})"
            if mv == 2:
                return f"{plain}-"
            if mv == 3:
                return "N/A"
            if mv == 4:
                return f"${v:,}.00"
            return f"{plain} CR"

        for pdf in batches:
            out = {"doc_id": [], "src_name": [], "text": []}
            for k, name in zip(pdf["c_custkey"], pdf["c_name"]):
                k = int(k)
                d4 = f"{k % 10000:04d}"
                start = date(2024, 1, 1) + timedelta(days=k % 365)
                end = start + timedelta(days=30)
                vv = k % 4
                vals = {
                    "client_name": name,
                    "account_number": (
                        f"acct {d4}" if k % 9 == 0 else f"ending in:{d4}"
                    ),
                    "total_charges": money_raw((k % 7000) + 200, (k + 1) % 6),
                    "total_credits": money_raw((k % 2500) + 40, (k + 2) % 6),
                    "statement_start_date": fmt_date(start, k % 7),
                    "statement_end_date": fmt_date(end, (k + 5) % 7),
                    "total_due": money_raw((k % 4000) + 75, (k + 3) % 6),
                    "vendor_name": ["CapitalOne", "Capital One", name, None][vv],
                    "account_type": _PBST_TYPES_RAW[k % 3],
                    "bank_name": "Initech Bank",
                }
                lines = ["MONTHLY ACCOUNT STATEMENT"] + [
                    f"{f}: {vals[f]}" for f in PBST_FIELDS if vals[f] is not None
                ]
                out["doc_id"].append(k)
                out["src_name"].append(name)
                out["text"].append("\n".join(lines))
            yield pd.DataFrame(out)

    c = load_table(spark, sf_dir, "customer", split=True)
    docs = c.select("c_custkey", "c_name").mapInPandas(
        render, "doc_id long, src_name string, text string"
    )
    extracted = extract_fields(docs, line_patterns(PBST_FIELDS), passthrough=("src_name",))
    normed = _pbst_normalized()
    gt = _pbst_cols(F.col("doc_id"), F.col("src_name"))
    k = F.col("doc_id")
    # Credit-sign compare in decimal space (see docstring): null-safe
    # enforce(-abs) against the always-negative GT value.
    cred_amt = N.money_decimal(F.col("total_credits"))
    cred_ok = (
        F.when(cred_amt == 0, F.lit(0).cast("decimal(18,2)")).otherwise(-F.abs(cred_amt))
        == -((k % 2500) + 40).cast("decimal(18,2)")
    )
    compares = {
        f: (normed[f] == gt[f][1]) for f in PBST_FIELDS if f != "total_credits"
    }
    compares["total_credits"] = cred_ok
    flags = extracted.select(
        *[
            F.coalesce(compares[f].cast("int"), F.lit(0)).alias(f"ok_{f}")
            for f in PBST_FIELDS
        ]
    )
    return _accuracy_rollup_wide(flags, PBST_FIELDS)


# ---------------------------------------------------------------------------
# Dec-V2 private-banking statement: 6 fields with coupon priority
# ---------------------------------------------------------------------------

#: Deterministic "present date" for the bill_date sanity rule — a
#: moving current_date() would make the query's output (and its
#: oracle) time-dependent.
_DECV2_ASOF = "2025-12-31"
_DECV2_ASOF_DISPLAY = "12/31/2025"

def _decv2_cols(k: Column, name: Column) -> dict[str, tuple[Column, Column]]:
    """Dec-V2 field → (raw rendered, ground truth), stat_nov_add_6.py's
    6-field schema on the §2.7 corruption-variant machinery. The two
    coupon_* entries are render-only helper lines (GT None): their
    priority over the body fields is applied in _decv2_normalized."""
    d4 = F.lpad((k % 10000).cast("string"), 4, "0")
    asof = F.lit(_DECV2_ASOF).cast("date")

    bill_d = F.date_sub(asof, (k % 360 + 30).cast("int"))
    bv = k % 6
    bill_raw = (
        F.when(bv == 1, F.date_format(bill_d, "MMM d, yyyy"))
        # future-dated print: rule says bill_date can't be after as-of
        .when(bv == 2, F.date_format(F.date_add(asof, (k % 300 + 1).cast("int")), "MM/dd/yyyy"))
        .when(bv == 3, F.lit("99/99/9999"))
        .when(bv == 4, F.lit(None).cast("string"))  # line missing
        .when(bv == 5, F.date_format(bill_d, "yyyy-MM-dd"))
        .otherwise(F.date_format(bill_d, "MM/dd/yyyy"))
    )
    bill_gt = (
        F.when(bv == 1, F.date_format(bill_d, "MMM d, yyyy"))
        .when(bv == 5, F.date_format(bill_d, "yyyy-MM-dd"))
        # corrupted print: true date unknowable -> counted wrong
        .when(bv == 3, F.date_format(bill_d, "MM/dd/yyyy"))
        # future or missing: the rule's fallback IS the as-of date
        .when(bv.isin(2, 4), F.lit(_DECV2_ASOF_DISPLAY))
        .otherwise(F.date_format(bill_d, "MM/dd/yyyy"))
    )

    due_d = F.date_add(asof, (k % 40 + 5).cast("int"))
    dv = (k + 2) % 6
    due_raw = (
        F.when(dv == 1, F.date_format(due_d, "MMM d, yyyy"))
        .when(dv == 3, F.lit("99/99/9999"))
        .otherwise(F.date_format(due_d, "MM/dd/yyyy"))
    )
    due_gt = (
        F.when(dv == 1, F.date_format(due_d, "MMM d, yyyy"))
        .when(dv == 3, F.date_format(due_d, "MM/dd/yyyy"))
        .otherwise(F.date_format(due_d, "MM/dd/yyyy"))
    )

    streetno = (k % 999 + 1).cast("string")
    body_addr_clean = F.concat(streetno, F.lit(" Oak Street, Springfield, IL 62704"))
    coupon_addr = F.concat(F.lit("PO Box "), d4, F.lit(", Springfield, IL 62704"))
    cv = k % 3
    body_addr_raw = F.when(
        cv == 2, F.concat(streetno, F.lit("  Oak   Street , Springfield,IL 62704,"))
    ).otherwise(body_addr_clean)
    billing_gt = F.when(cv == 0, coupon_addr).otherwise(body_addr_clean)

    vv = k % 4
    vendor_raw = (
        F.when(vv == 0, F.lit("CapitalOne"))
        .when(vv == 1, F.lit("Capital One"))
        .when(vv == 2, name)
        .otherwise(F.lit(None).cast("string"))  # line missing
    )
    vendor_gt = F.when(vv.isin(0, 1), F.lit("Capital One")).otherwise(name)

    return_addr_clean = F.lit("500 Corporate Plaza, New York, NY 10001")
    remit_addr = F.concat(F.lit("PO Box 99"), d4, F.lit(", Wilmington, DE 19886"))
    rv = (k + 1) % 3
    return_addr_raw = F.when(
        rv == 2, F.lit("500  Corporate  Plaza , New York,NY 10001")
    ).otherwise(return_addr_clean)
    vendor_addr_gt = F.when(rv == 0, remit_addr).otherwise(return_addr_clean)

    pay_v = ((k % 9000) + 250).cast("decimal(18,2)")
    pay_raw, pay_dec = _money_raw_gt(pay_v, (k + 4) % 6)

    return {
        "bill_date": (bill_raw, bill_gt),
        "due_date": (due_raw, due_gt),
        "billing_recipient_address": (body_addr_raw, billing_gt),
        "vendor_name": (vendor_raw, vendor_gt),
        "vendor_address": (return_addr_raw, vendor_addr_gt),
        "payment_amount": (pay_raw, N.format_money(pay_dec)),
        "coupon_recipient_address": (F.when(cv == 0, coupon_addr), None),
        "coupon_remit_address": (F.when(rv == 0, remit_addr), None),
    }


def _decv2_normalized() -> dict[str, Column]:
    """stat_nov_add_6.py's field rules as column expressions: coupon
    priority via coalesce(coupon_*, body), bill_date bounded at the
    as-of date with as-of fallback ("use the current date"), due_date
    5-format sanity, canonical money display (keeps the $ and negative
    prefix, rule 6)."""
    asof = F.lit(_DECV2_ASOF).cast("date")
    bill_parsed = N.parse_date_multi(F.col("bill_date"))
    bill_ok = (
        bill_parsed.isNotNull()
        & (bill_parsed >= F.lit("1900-01-01").cast("date"))
        & (bill_parsed <= asof)
    )
    return {
        "bill_date": F.when(bill_ok, F.trim(F.col("bill_date"))).otherwise(
            F.lit(_DECV2_ASOF_DISPLAY)
        ),
        "due_date": N.date_sane(F.col("due_date"), asof),
        "billing_recipient_address": N.clean_address(
            F.coalesce(F.col("coupon_recipient_address"), F.col("billing_recipient_address"))
        ),
        "vendor_name": N.normalize_vendor(F.col("vendor_name")),
        "vendor_address": N.clean_address(
            F.coalesce(F.col("coupon_remit_address"), F.col("vendor_address"))
        ),
        "payment_amount": N.money_or_null(F.col("payment_amount")),
    }


_DECV2_OK = {
    "bill_date": "CASE WHEN c_custkey % 6 <> 3 THEN 1 ELSE 0 END",
    "due_date": "CASE WHEN (c_custkey + 2) % 6 <> 3 THEN 1 ELSE 0 END",
    "billing_recipient_address": "1",
    "vendor_name": "CASE WHEN c_custkey % 4 <> 3 THEN 1 ELSE 0 END",
    "vendor_address": "1",
    "payment_amount": "CASE WHEN (c_custkey + 4) % 6 <> 3 THEN 1 ELSE 0 END",
    "payment_exception": "1",
}


@query(
    "statement_decv2_extraction_e2e",
    oracle=f"""
    WITH long AS ({" UNION ALL ".join(
        f"SELECT '{f}' AS field, {ok} AS ok FROM customer" for f, ok in _DECV2_OK.items()
    )})
    SELECT COALESCE(field, 'Overall') AS field,
           CAST(SUM(ok) AS BIGINT) AS n_correct,
           COUNT(*) AS support,
           round(CAST(SUM(ok) AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM long GROUP BY ROLLUP(field) ORDER BY field
    """,
)
def statement_decv2_extraction_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dec-V2 private-banking statement 6-field end-to-end
    (stat_nov_add_6.py:1-25) — the PBST machinery specialized to the
    December-V2 schema variant: render (body + optional payment
    coupon) → mapInPandas extract → coupon-priority compose, bounded
    bill_date with as-of fallback, 5-format due_date sanity, address
    cleanup, canonical signed money → per-field accuracy rollup with
    Overall. The extra ``payment_exception`` row audits rule 6's
    "negative amount → exception handling" flag against the rendered
    sign variants."""
    from ..operators.schemas import STATEMENT_DECV2_FIELDS

    raw_fields = STATEMENT_DECV2_FIELDS + [
        "coupon_recipient_address", "coupon_remit_address",
    ]
    c = load_table(spark, sf_dir, "customer", split=True)
    cols = _decv2_cols(F.col("c_custkey"), F.col("c_name"))
    body = [
        F.lit("PRIVATE BANKING STATEMENT (DEC V2)"),
        *[
            F.when(cols[f][0].isNotNull(), F.concat(F.lit(f"{f}: "), cols[f][0]))
            for f in STATEMENT_DECV2_FIELDS
        ],
        F.lit("--- PAYMENT COUPON ---"),
        *[
            F.when(cols[f][0].isNotNull(), F.concat(F.lit(f"{f}: "), cols[f][0]))
            for f in ("coupon_recipient_address", "coupon_remit_address")
        ],
    ]
    docs = c.select(
        F.col("c_custkey").alias("doc_id"),
        F.col("c_name").alias("src_name"),
        F.concat_ws("\n", *body).alias("text"),
    )
    extracted = extract_fields(docs, line_patterns(raw_fields), passthrough=("src_name",))
    normed = _decv2_normalized()
    gt = _decv2_cols(F.col("doc_id"), F.col("src_name"))
    exception_realized = F.coalesce(
        N.money_decimal(F.col("payment_amount")) < 0, F.lit(False)
    )
    exception_expected = ((F.col("doc_id") + 4) % 6).isin(1, 2, 5)
    flags = extracted.select(
        *[
            F.coalesce((normed[f] == gt[f][1]).cast("int"), F.lit(0)).alias(f"ok_{f}")
            for f in STATEMENT_DECV2_FIELDS
        ],
        (exception_realized == exception_expected).cast("int").alias("ok_payment_exception"),
    )
    rollup_fields = STATEMENT_DECV2_FIELDS + ["payment_exception"]
    stack_args = ", ".join(f"'{f}', ok_{f}" for f in rollup_fields)
    long = flags.select(F.expr(f"stack({len(rollup_fields)}, {stack_args}) AS (field, ok)"))
    return accuracy_rollup(long)


# ---------------------------------------------------------------------------
# Form 1008 (Mortgage Underwriting Transmittal Summary): 51 fields
# ---------------------------------------------------------------------------

_F1008_MONEY = [
    "total_borrower_income", "sales_price", "rental_income_subject_property",
    "net_rental_income_other_property", "loan_amount", "first_mortgage_pi",
    "subordinate_liens_pi", "homeowner_insurance", "property_tax",
    "mortgage_insurance", "association_dues_hoa", "total_monthly_payment",
    "borrower_income_borrower1", "borrower_income_borrower2",
    "borrower_income_borrower3", "borrower_income_borrower4",
    "borrower_income_others", "other_monthly_payments",
    "funds_to_close_verified", "funds_to_close_required",
    "appraised_value", "subordinate_financing",
]
_F1008_RATES = [
    "note_rate", "ltv", "cltv", "hcltv",
    "qualifying_ratios_front_end_dti", "qualifying_ratios_back_end_dti",
]
#: Checkbox fields with their label sets (Form 1008's printed options;
#: rule 4 of doc_8_19_1008_prom.py: multiple selections join '; ').
_F1008_CHECKBOX = {
    "property_type": ["1 unit", "2- to 4-units", "Condominium", "PUD",
                      "Co-op", "Manufactured Housing"],
    "occupancy_type": ["Primary Residence", "Second Home", "Investment Property"],
    "loan_type": ["Conventional", "FHA", "VA", "USDA/RD"],
    "loan_purpose": ["Purchase", "Cash-Out Refinance",
                     "Limited Cash-Out Refinance", "Home Improvement"],
    "lien_position": ["First Mortgage", "Second Mortgage"],
    "escrow": ["Yes", "No"],
    "borrower_self_employed": ["Yes", "No"],
    "risk_assessment": ["Manual Underwriting", "AUS: DU", "AUS: LPA", "AUS: Other"],
    "appraisal_type": ["Full Appraisal", "Drive-By", "AVM", "No Appraisal"],
    "amortization_type": ["Fixed-Rate", "ARM", "Balloon", "Other"],
    "project_class_fhlmc": ["Streamlined Review", "Established Project",
                            "New Project", "Detached Project"],
    "project_class_fnma": ["Type E", "Type P", "Type Q", "Type R",
                           "Type S", "Type T"],
}


def _f1008_render_docs(supplier: "DataFrame") -> "DataFrame":
    """supplier → synthetic Form-1008 OCR documents via one vectorized
    Arrow stage. Rendering 51 fields as JVM column expressions breaks
    whole-stage codegen (the generated method exceeds Janino's 64 KB
    limit → per-task compile-fail + interpreted fallback, measured 26s
    for 100 rows), so FIXTURE SYNTHESIS — not the extraction operator
    under test — runs in Python. The residue rules here mirror
    _f1008_ok_sql exactly; the DuckDB oracle derives expectations from
    the residues independently, never from this renderer.

    Output: doc_id, src_name, text, plus gt_<field> for the 12
    checkbox fields (their GT is the rendered selection string itself;
    all other GT is re-derived from doc_id as small typed JVM
    expressions in the flags projection)."""
    import pandas as pd

    checkbox = list(_F1008_CHECKBOX.items())
    gt_cols = [f"gt_{f}" for f, _ in checkbox]

    from ..operators.schemas import FORM_1008_FIELDS

    def render(batches):
        from datetime import date, timedelta

        aus_opts = ["Approve/Eligible", "Refer", "Approve/Ineligible"]
        base = date(2024, 1, 1)

        def fmt_date(d: date, dv: int) -> str:
            if dv == 1:
                return f"{d.strftime('%b')} {d.day}, {d.year}"
            if dv == 2:
                return d.strftime("%Y-%m-%d")
            if dv == 3:
                return "99/99/9999"
            return d.strftime("%m/%d/%Y")

        def money_raw(v: int, mv: int) -> str:
            if mv == 1:
                return f"(${v}.00)"
            if mv == 2:
                return f"{v}.00-"
            if mv == 3:
                return "N/A"
            if mv == 4:
                return f"${v:,}.00"
            if mv == 5:
                return f"{v}.00 CR"
            return f"{v}.00"

        for pdf in batches:
            out = {"doc_id": [], "src_name": [], "text": []}
            for g in gt_cols:
                out[g] = []
            for k, name in zip(pdf["s_suppkey"], pdf["s_name"]):
                k = int(k)
                lines = ["UNIFORM UNDERWRITING AND TRANSMITTAL SUMMARY (Form 1008)"]
                vals: dict[str, str | None] = {}
                for i, f in enumerate(_F1008_MONEY):
                    vals[f] = money_raw((k % 8000) + i * 17 + 150, (k + i) % 6)
                for i, f in enumerate(_F1008_RATES):
                    cents = (k * 7 + i * 13) % 9000 + 100
                    rstr = f"{cents // 100}.{cents % 100:02d}0"
                    rv = (k + 100 + i) % 5
                    vals[f] = "N/A" if rv == 2 else (rstr if rv == 0 else rstr + "%")
                gts = {}
                for i, (f, opts) in enumerate(checkbox):
                    n = len(opts)
                    cv = (k + 200 + i) % 4
                    one = opts[(k + i) % n]
                    if cv == 0:
                        raw = one
                    elif cv == 1:
                        raw = one + "; " + opts[(k + i + 1) % n]
                    elif cv == 2:
                        raw = opts[(k + i + 2) % n]
                    else:
                        raw = None  # box left blank
                    vals[f] = raw
                    gts[f"gt_{f}"] = raw
                ts_d = base + timedelta(days=k % 365)
                vals["time_stamp"] = fmt_date(ts_d, (k + 1) % 7)
                vals["document_date"] = fmt_date(ts_d + timedelta(days=3), (k + 4) % 7)
                vals["representative_score"] = (
                    "n/a" if k % 13 == 0 else str(300 + k % 550)
                )
                vals["months_reserves"] = str(k % 25)
                vals["loan_term"] = "360 months"
                vals["loan_number"] = f"LN{k:08d}"
                vals["property_address"] = f"{k % 999 + 1} Elm Street, {name}"
                vals["aus_recommendation"] = aus_opts[k % 3]
                vals["appraisal_form_number"] = "FNMA-1004"
                vals["fnma_project_id"] = f"PJ{k % 10000:04d}"
                vals["project_name"] = f"Project {name}"
                for f in FORM_1008_FIELDS:
                    if vals[f] is not None:
                        lines.append(f"{f}: {vals[f]}")
                out["doc_id"].append(k)
                out["src_name"].append(name)
                out["text"].append("\n".join(lines))
                for g in gt_cols:
                    out[g].append(gts[g])
            yield pd.DataFrame(out)

    schema = "doc_id long, src_name string, text string, " + ", ".join(
        f"`{g}` string" for g in gt_cols
    )
    return supplier.select("s_suppkey", "s_name").mapInPandas(render, schema)


def _f1008_flags(extracted: "DataFrame") -> "DataFrame":
    """ok_<field> flags: normalize the extracted raw strings and
    compare against GT. Non-checkbox GT is re-derived from doc_id as
    SMALL typed expressions (decimal/date/string — never the rendered
    variant strings, which is what blew up codegen); checkbox GT rides
    the Arrow stage as gt_<field> passthrough columns."""
    k = F.col("doc_id")
    flags = []
    for i, f in enumerate(_F1008_MONEY):
        v = ((k % 8000) + i * 17 + 150).cast("decimal(18,2)")
        gt = F.when(((k + i) % 6).isin(1, 2, 5), -v).otherwise(v)
        flags.append((N.money_decimal(F.col(f)) == gt, f))
    for i, f in enumerate(_F1008_RATES):
        cents = (k * 7 + i * 13) % 9000 + 100
        gt = (cents.cast("decimal(9,3)") / 100).cast("decimal(9,3)")
        normed = F.regexp_replace(F.col(f), r"[%\s]", "").try_cast("decimal(9,3)")
        flags.append((normed == gt, f))
    for f in _F1008_CHECKBOX:
        flags.append((F.trim(F.col(f)) == F.col(f"gt_{f}"), f))
    ts_d = F.date_add(F.lit("2024-01-01").cast("date"), (k % 365).cast("int"))
    flags.append((N.parse_date_multi(F.col("time_stamp")) == ts_d, "time_stamp"))
    flags.append(
        (N.parse_date_multi(F.col("document_date")) == F.date_add(ts_d, 3), "document_date")
    )
    score_gt = (F.lit(300) + k % 550).cast("string")
    flags.append(
        (
            F.nullif(
                F.regexp_extract(F.col("representative_score"), r"^(\d{3})$", 1),
                F.lit(""),
            )
            == score_gt,
            "representative_score",
        )
    )
    always = {
        "months_reserves": (k % 25).cast("string"),
        "loan_term": F.lit("360 months"),
        "loan_number": F.concat(F.lit("LN"), F.lpad(k.cast("string"), 8, "0")),
        "property_address": F.concat(
            (k % 999 + 1).cast("string"), F.lit(" Elm Street, "), F.col("src_name")
        ),
        "aus_recommendation": F.element_at(
            F.array(
                F.lit("Approve/Eligible"), F.lit("Refer"), F.lit("Approve/Ineligible")
            ),
            (k % 3 + 1).cast("int"),
        ),
        "appraisal_form_number": F.lit("FNMA-1004"),
        "fnma_project_id": F.concat(F.lit("PJ"), F.lpad((k % 10000).cast("string"), 4, "0")),
        "project_name": F.concat(F.lit("Project "), F.col("src_name")),
    }
    for f, gt in always.items():
        flags.append((F.trim(F.col(f)) == gt, f))
    return extracted.select(
        *[F.coalesce(c.cast("int"), F.lit(0)).alias(f"ok_{f}") for c, f in flags]
    )


def _f1008_ok_sql() -> str:
    """Expected-correct residue per field, independently derived from
    s_suppkey (oracle side of the variant machinery)."""
    rows = []
    for i, f in enumerate(_F1008_MONEY):
        rows.append(
            f"SELECT '{f}' AS field, CASE WHEN (s_suppkey + {i}) % 6 <> 3 THEN 1 ELSE 0 END AS ok FROM supplier"
        )
    for i, f in enumerate(_F1008_RATES):
        rows.append(
            f"SELECT '{f}', CASE WHEN (s_suppkey + {100 + i}) % 5 <> 2 THEN 1 ELSE 0 END FROM supplier"
        )
    for i, f in enumerate(_F1008_CHECKBOX):
        rows.append(
            f"SELECT '{f}', CASE WHEN (s_suppkey + {200 + i}) % 4 <> 3 THEN 1 ELSE 0 END FROM supplier"
        )
    rows.append("SELECT 'time_stamp', CASE WHEN (s_suppkey + 1) % 7 <> 3 THEN 1 ELSE 0 END FROM supplier")
    rows.append("SELECT 'document_date', CASE WHEN (s_suppkey + 4) % 7 <> 3 THEN 1 ELSE 0 END FROM supplier")
    rows.append("SELECT 'representative_score', CASE WHEN s_suppkey % 13 <> 0 THEN 1 ELSE 0 END FROM supplier")
    for f in ["months_reserves", "loan_term", "loan_number", "property_address",
              "aus_recommendation", "appraisal_form_number", "fnma_project_id",
              "project_name"]:
        rows.append(f"SELECT '{f}', 1 FROM supplier")
    return " UNION ALL ".join(rows)


@query(
    "form1008_extraction_e2e",
    oracle=f"""
    WITH long AS ({_f1008_ok_sql()})
    SELECT COALESCE(field, 'Overall') AS field,
           CAST(SUM(ok) AS BIGINT) AS n_correct,
           COUNT(*) AS support,
           round(CAST(SUM(ok) AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM long GROUP BY ROLLUP(field) ORDER BY field
    """,
)
def form1008_extraction_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Form-1008 51-field end-to-end (doc_8_19_1008_prom.py:1-77: the
    Mortgage Underwriting Transmittal Summary schema — the last
    reference extraction schema without a wired pipeline in r2):
    render all 51 fields as anchored OCR lines with per-class
    corruption residues (N/A money and rates, blank checkboxes,
    corrupt dates, non-numeric credit score) → mapInPandas extraction
    → per-class normalizers → typed-GT comparison → per-field accuracy
    rollup with Overall. Two back-to-back narrow Arrow stages (render
    is Python on purpose — see _f1008_render_docs), one rollup shuffle
    on a 51-value key."""
    from ..operators.schemas import FORM_1008_FIELDS

    s = load_table(spark, sf_dir, "supplier", split=True)
    docs = _f1008_render_docs(s)
    gt_cols = tuple(f"gt_{f}" for f in _F1008_CHECKBOX)
    extracted = extract_fields(
        docs, line_patterns(FORM_1008_FIELDS), passthrough=("src_name", *gt_cols)
    )
    flags = _f1008_flags(extracted)
    stack_args = ", ".join(f"'{f}', ok_{f}" for f in FORM_1008_FIELDS)
    long = flags.select(
        F.expr(f"stack({len(FORM_1008_FIELDS)}, {stack_args}) AS (field, ok)")
    )
    return accuracy_rollup(long)


# ---------------------------------------------------------------------------
# Envelope To-address: 7-field parse (prompt.py:1-31)
# ---------------------------------------------------------------------------

_ENV_STATES = ["IL", "CA", "TX", "NY", "WA"]


@query(
    "envelope_to_address_parse",
    oracle="""
    WITH raws AS (
      SELECT c_custkey AS k,
             ('0x' || substr(md5('env:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 4 AS v
      FROM customer
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN v = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_scaffolded,
           CAST(SUM(CASE WHEN v <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
           CAST(COUNT(DISTINCT CASE WHEN v <> 3 THEN k % 5 END) AS BIGINT) AS n_states,
           CAST(SUM(CASE WHEN v <> 3 THEN 10000 + (k * 7) % 89999 ELSE 0 END) AS BIGINT) AS zip_sum,
           CAST(SUM(CASE WHEN v <> 3 AND k % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mail_codes
    FROM raws
    """,
)
def envelope_to_address_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope To-address 7-field extraction (prompt.py:1-31): model
    JSON responses — clean / code-fenced / prose-wrapped / truncated by
    hash residue, absent Mail Code and Business Group rendered as the
    literal "NULL" per the prompt contract — parsed with the fixed
    7-field StructType (invoice_scaffold_parse machinery); failures
    become all-NULL scaffolds. The aggregate proves typed values
    survive: ZIP sum as BIGINT, distinct two-letter states, and Mail
    Code "NULL"-literal canonicalized to SQL NULL at the nullif edge
    (the engine's NULL-the-string rule, SURVEY §2.7)."""
    from ..functions.text import hash64
    from ..operators.schemas import ENVELOPE_FIELDS

    c = load_table(spark, sf_dir, "customer", split=True)
    k = F.col("c_custkey")
    st = F.element_at(F.array(*[F.lit(s) for s in _ENV_STATES]), (k % 5 + 1).cast("int"))
    zipc = (F.lit(10000) + (k * 7) % 89999).cast("string")
    street = F.when(
        k % 6 == 0, F.concat(F.lit("PO Box "), F.lpad((k % 10000).cast("string"), 4, "0"))
    ).otherwise(F.concat((k % 999 + 1).cast("string"), F.lit(" Main St")))
    mail_code = F.when(k % 3 == 0, F.concat(F.lit("MC-"), (k % 100).cast("string"))).otherwise(
        F.lit("NULL")
    )
    biz = F.when(k % 4 == 0, F.lit("Treasury Ops")).otherwise(F.lit("NULL"))
    payload = F.concat(
        F.lit('{"Name": "'), F.col("c_name"),
        F.lit('", "Street Address or PO Box": "'), street,
        F.lit('", "City": "Springfield", "State": "'), st,
        F.lit('", "ZIP Code": "'), zipc,
        F.lit('", "Mail Code": "'), mail_code,
        F.lit('", "Business Group Name": "'), biz,
        F.lit('"}'),
    )
    v = hash64(F.concat(F.lit("env:"), k.cast("string"))) % 4
    raw = (
        F.when(v == 0, payload)
        .when(v == 1, F.concat(F.lit("```json\n"), payload, F.lit("\n```")))
        .when(v == 2, F.concat(F.lit("Extracted To address:\n"), payload))
        .otherwise(F.substring(payload, 1, 30))  # truncated → scaffold
    )
    docs = c.select(k.alias("doc_id"), raw.alias("raw"))
    parsed = parse_model_json(docs, ENVELOPE_FIELDS)
    ok = ~F.col("parse_failed")
    mail = F.nullif(F.col("parsed.`Mail Code`"), F.lit("NULL"))
    return parsed.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("parse_failed").cast("int")).cast("bigint").alias("n_scaffolded"),
        F.sum(ok.cast("int")).cast("bigint").alias("n_parsed"),
        F.countDistinct(F.col("parsed.State")).cast("bigint").alias("n_states"),
        F.sum(
            F.coalesce(F.col("parsed.`ZIP Code`").try_cast("bigint"), F.lit(0))
        ).cast("bigint").alias("zip_sum"),
        F.sum((mail.isNotNull() & ok).cast("int")).cast("bigint").alias("n_mail_codes"),
    )
