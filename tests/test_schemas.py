"""Per-doc-type extraction schema tests (SURVEY §2.9): fixed
StructTypes, all-NULL scaffolds, JSON parse + repair + scaffold
fallback for W2-24 / Form-1008-51 / invoice-9 / credit-card-8."""

from __future__ import annotations

from pyspark.sql.types import ArrayType, StringType, StructType

from data_ingestion_task_spark.operators.schemas import (
    CREDIT_CARD_FIELDS,
    CREDIT_CARD_TXN_FIELDS,
    FORM_1008_FIELDS,
    INVOICE_FIELDS,
    PBST_FIELDS,
    W2_FIELDS,
    line_patterns,
    parse_model_json,
    scaffold,
    struct_type,
)


def test_field_counts_match_reference_prompts():
    assert len(W2_FIELDS) == 24          # w2_prompt_v1_6_12:4-36
    assert len(FORM_1008_FIELDS) == 51   # doc_8_19_1008_prom.py:1-77
    assert len(INVOICE_FIELDS) == 9      # privateb_4_8.py:35-45
    assert len(PBST_FIELDS) == 10        # doc_8_14:66-131
    # credit-card: 5 scalar + transactions array carrying 3 per-txn fields = 8
    assert len(CREDIT_CARD_FIELDS) == 6 and len(CREDIT_CARD_TXN_FIELDS) == 3


def test_struct_types_fixed_and_stringly():
    for fields in (W2_FIELDS, FORM_1008_FIELDS, INVOICE_FIELDS, PBST_FIELDS):
        st = struct_type(fields)
        assert [f.name for f in st.fields] == fields
        assert all(isinstance(f.dataType, StringType) for f in st.fields)
    cc = struct_type(CREDIT_CARD_FIELDS)
    txn_type = dict((f.name, f.dataType) for f in cc.fields)["transactions"]
    assert isinstance(txn_type, ArrayType) and isinstance(txn_type.elementType, StructType)
    assert [f.name for f in txn_type.elementType.fields] == CREDIT_CARD_TXN_FIELDS


def test_scaffold_all_null(spark):
    df = spark.range(1).select(scaffold(INVOICE_FIELDS).alias("s"))
    row = df.collect()[0]["s"].asDict()
    assert set(row) == set(INVOICE_FIELDS)
    assert all(v is None for v in row.values())


def test_parse_model_json_repair_and_scaffold(spark):
    rows = [
        (1, '{"Bill Date": "1/1/24", "Total Due": "$5.00", "Invoice Number": "A1"}'),
        (2, 'Sure! ```json\n{"Invoice Number": "A2"}\n``` hope that helps'),
        (3, "complete garbage, no JSON here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, raw string")
    out = {r["doc_id"]: r for r in parse_model_json(df, INVOICE_FIELDS).collect()}
    assert out[1]["parsed"]["Invoice Number"] == "A1" and not out[1]["parse_failed"]
    assert out[2]["parsed"]["Invoice Number"] == "A2" and not out[2]["parse_failed"]
    assert out[3]["parse_failed"]
    assert all(v is None for v in out[3]["parsed"].asDict().values())  # scaffold


def test_line_patterns_extract_one_group():
    pats = line_patterns(W2_FIELDS)
    assert len(pats) == 24
    m = pats["BOX1_WAGES"].search("junk\nBOX1_WAGES: $1,234.56  \nmore")
    assert m and m.group(1) == "$1,234.56"
    # credit-card: transactions handled by the array schema, not a line regex
    assert "transactions" not in line_patterns(CREDIT_CARD_FIELDS)
