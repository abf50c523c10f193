"""Per-doc-type extraction schemas (SURVEY §2.9 "Extraction schemas"):
the reference's core extraction contract is a FIXED field set per
document type, an all-NULL scaffold on failure, and
every-value-is-a-string JSON output.

Doc types and citations:
- W2 — 24 fields (`code/python/w2_prompt_v1_6_12:4-36`)
- Form 1008 (Mortgage Underwriting Transmittal) — 51 fields
  (`code/python/doc_8_19_1008_prom.py:1-77`)
- Invoice — 9 fields (`code/python/privateb_4_8.py:35-45`)
- Credit-card statement — 8 fields incl. a transactions ARRAY
  (`code/python/private_bb_4_2:30-63`)
- Envelope To-address — 7 fields (`code/python/prompt.py:1-31`)
- PBST bank statement — 10 fields + 3-column transactions table
  (`code/python/doc_8_14:66-131`)

Engine mapping: each doc type exposes
- ``*_FIELDS``: ordered field list (the prompt's field set),
- ``struct_type(fields)``: the fixed ``StructType`` (all strings —
  the reference's "Return all values as a string" rule; the
  credit-card transactions field is ``array<struct>``),
- ``scaffold(fields)``: the all-NULL struct literal used when parsing
  fails (privateb_4_8.py:35-46 empty-result dict),
- ``parse_model_json(df, ...)``: ``from_json`` with the fixed schema +
  scaffold fallback — the eager-failure path is data, not an
  exception, so a bad model response can never kill a 100 TB job.
- ``line_patterns(fields)``: anchored per-field regexes for the
  deterministic OCR-line extractor (the model-free default).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# ---------------------------------------------------------------------------
# Field sets (verbatim from the reference prompts)
# ---------------------------------------------------------------------------

W2_FIELDS = [
    "EMPLOYEE_NAME", "EMPLOYEE_ADDRESS", "EMPLOYEE_SSN",
    "EMPLOYER_NAME", "EMPLOYER_ADDRESS", "EMPLOYER_FEDERAL_EIN",
    "BOX1_WAGES", "BOX2_FED_WITHHOLD", "BOX3_SS_WAGE", "BOX4_SS_WITHHOLDING",
    "BOX5_MEDICARE_WAGES", "BOX6_MEDICARE_WITHHOLDING",
    "BOX7_ALLOCATED_TIPS", "BOX8_ALLOCATED_TIPS",
    "BOX12A_CODE", "BOX12A_AMOUNT", "BOX12B_CODE", "BOX12B_AMOUNT",
    "BOX12C_CODE", "BOX12C_AMOUNT", "BOX12D_CODE", "BOX12D_AMOUNT",
    "BOX14_OTHER", "W2_YEAR",
]  # 24 (w2_prompt_v1_6_12:4-36)

FORM_1008_FIELDS = [
    "total_borrower_income", "time_stamp", "sales_price", "representative_score",
    "rental_income_subject_property", "qualifying_ratios_front_end_dti",
    "qualifying_ratios_back_end_dti", "property_type", "property_address",
    "occupancy_type", "note_rate", "months_reserves",
    "net_rental_income_other_property", "ltv", "loan_type", "loan_amount",
    "loan_term", "loan_purpose", "loan_number", "lien_position", "hcltv",
    "first_mortgage_pi", "subordinate_liens_pi", "homeowner_insurance",
    "property_tax", "mortgage_insurance", "association_dues_hoa",
    "total_monthly_payment", "escrow", "document_date", "cltv",
    "borrower_income_borrower2", "borrower_income_borrower1",
    "borrower_income_borrower3", "borrower_income_borrower4",
    "borrower_income_others", "borrower_self_employed",
    "other_monthly_payments", "funds_to_close_verified",
    "funds_to_close_required", "risk_assessment", "aus_recommendation",
    "appraised_value", "appraisal_type", "appraisal_form_number",
    "subordinate_financing", "amortization_type", "project_class_fhlmc",
    "project_class_fnma", "fnma_project_id", "project_name",
]  # 51 (doc_8_19_1008_prom.py:1-77)

INVOICE_FIELDS = [
    "Bill Date", "Due Date", "Bill to Name", "Bill to Address",
    "Vendor Name", "Vendor Address", "Account Number", "Total Due",
    "Invoice Number",
]  # 9 (privateb_4_8.py:35-45)

CREDIT_CARD_FIELDS = [
    "Client_Name", "Account_Number", "Total_charges", "Total_Credits",
    "transactions", "Bank_Name",
]  # 8 logical fields: 3 of them live per-row in the transactions array
#   (private_bb_4_2:30-63 — Transaction_date / Vendor_name / Amount)

CREDIT_CARD_TXN_FIELDS = ["Transaction_date", "Vendor_name", "Amount"]

ENVELOPE_FIELDS = [
    "Name", "Street Address or PO Box", "City", "State", "ZIP Code",
    "Mail Code", "Business Group Name",
]  # 7 (prompt.py:1-31 — To-address extraction; absent fields return "NULL")

PBST_FIELDS = [
    "client_name", "account_number", "total_charges", "total_credits",
    "statement_start_date", "statement_end_date", "total_due",
    "vendor_name", "account_type", "bank_name",
]  # 10 (doc_8_14:66-131); transactions table is the 3-column child

STATEMENT_DECV2_FIELDS = [
    "bill_date", "due_date", "billing_recipient_address",
    "vendor_name", "vendor_address", "payment_amount",
]  # 6 (stat_nov_add_6.py:1-25 — Dec-V2 private-banking statement:
#   coupon values take priority, bill_date never after the as-of date,
#   negative payment_amount flags the record for exception handling)


# ---------------------------------------------------------------------------
# StructTypes, scaffolds, JSON parsing
# ---------------------------------------------------------------------------


def struct_type(fields: list[str]) -> StructType:
    """Fixed all-string StructType for a doc type — the 'every value is
    a string' rule (w2_prompt_v1_6_12:34, private_bb_4_2:61). The
    credit-card ``transactions`` field becomes array<struct<string×3>>."""
    out = []
    for f in fields:
        if f == "transactions":
            out.append(
                StructField(
                    f,
                    ArrayType(
                        StructType(
                            [StructField(t, StringType()) for t in CREDIT_CARD_TXN_FIELDS]
                        )
                    ),
                )
            )
        else:
            out.append(StructField(f, StringType()))
    return StructType(out)


def scaffold(fields: list[str]) -> Column:
    """All-NULL struct literal with the doc type's exact schema — the
    empty-result scaffold (privateb_4_8.py:35-46)."""
    cols = []
    for f in fields:
        if f == "transactions":
            dt = struct_type([f])[0].dataType.simpleString()
            cols.append(F.lit(None).cast(dt).alias(f))
        else:
            cols.append(F.lit(None).cast("string").alias(f))
    return F.struct(*cols)


def parse_model_json(
    df: DataFrame,
    fields: list[str],
    raw_col: str = "raw",
    out_col: str = "parsed",
    repair: bool = True,
) -> DataFrame:
    """Model JSON → typed struct with the fixed doc-type schema.
    ``repair=True`` first applies the JVM-side brace-extraction repair
    (code fences / prose around the JSON — confirmation_service.py:
    36-43, full_test_run.py:33-41). Unparseable rows get the all-NULL
    scaffold plus ``parse_failed=true`` — failure is DATA, so
    downstream accuracy queries count scaffolds instead of dying."""
    raw = F.col(raw_col)
    if repair:
        raw = F.regexp_extract(raw, r"(?s)\{.*\}", 0)
    parsed = F.from_json(raw, struct_type(fields))
    return (
        df.withColumn("_p", parsed)
        .withColumn("parse_failed", F.col("_p").isNull())
        .withColumn(out_col, F.coalesce(F.col("_p"), scaffold(fields)))
        .drop("_p")
    )


def line_patterns(fields: list[str]) -> dict[str, re.Pattern]:
    """Anchored ``FIELD: value`` line regexes for the deterministic
    extractor (operators/extract.extract_fields) — the model-free
    default implementation of each doc type's extraction."""
    return {
        f: re.compile(rf"^{re.escape(f)}:\s*(.+?)\s*$", re.M)
        for f in fields
        if f != "transactions"
    }
