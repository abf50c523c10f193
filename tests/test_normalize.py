"""Unit tests for the normalization column library against the
reference's documented edge cases (post_pro_9_8.py, doc_promp_8_21.py,
new_prompt_7_2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_task_spark.functions import normalize as N


def _run(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r.out for r in df.select(col_fn(F.col("s")).alias("out")).collect()]


def test_money_or_null(spark):
    cases = {
        "1053.75": "$1,053.75",
        "($1,053.75)": "-$1,053.75",
        "$1053.7-": "-$1,053.70",
        "-$0.00": "$0.00",  # negative zero normalizes to $0.00
        "1,234,567.89": "$1,234,567.89",
        "12.5 CR": "-$12.50",
        "N/A": None,
        "": None,
        "1.2.3": None,
    }
    out = _run(spark, N.money_or_null, list(cases))
    assert out == list(cases.values())


def test_ensure_negative_money(spark):
    cases = {"$12.00": "-$12.00", "-$5.00": "-$5.00", "$0.00": "$0.00"}
    out = _run(spark, N.ensure_negative_money, list(cases))
    assert out == list(cases.values())


def test_date_sane(spark):
    fixed_today = F.lit("2026-01-01").cast("date")
    cases = {
        "3/5/2024": "3/5/2024",
        "03/05/24": "03/05/24",
        "Mar 5, 2024": "Mar 5, 2024",
        "March 5, 2024": "March 5, 2024",
        "2024-03-05": "2024-03-05",
        "13/45/2024": None,
        "1/1/1899": None,  # below lower bound
        "1/1/2028": None,  # > today+370d
        "not a date": None,
    }
    out = _run(spark, lambda c: N.date_sane(c, today=fixed_today), list(cases))
    assert out == list(cases.values())


def test_acct_last4(spark):
    cases = {
        "xxxxxxxx1234": "1234",
        "XXXX5678": "5678",
        "ending in:9012": "9012",
        "Ending in 3456": "3456",
        "123456789": None,
        "acct 1234": None,
    }
    out = _run(spark, N.acct_last4, list(cases))
    assert out == list(cases.values())


def test_vendor_and_address(spark):
    assert _run(spark, N.normalize_vendor, ["Capital One", "CAPITALONE", "capital  one", "Chase"]) == [
        "Capital One", "Capital One", "Capital One", "Chase"]
    assert _run(spark, N.clean_address, ["12  Main   St ,Apt 4,", "P.O. Box 12", "p o box 9"]) == [
        "12 Main St, Apt 4", "PO Box 12", "PO Box 9"]


def test_cleanse_and_null_canonical(spark):
    assert _run(spark, N.cleanse, ["$1,234['x']\"y\" "]) == ["1234XY"]
    assert _run(spark, N.null_canonical, [None, "", "no", "None", "keep"]) == [
        "NULL", "NULL", "NULL", "NULL", "keep"]


def test_reference_number(spark):
    cases = {
        "ref 20240115DP1234567 ok": "20240115DP1234567",
        "20241301DP1234567": None,  # month 13 invalid
        "2024011DP1234567": None,
    }
    out = _run(spark, N.reference_number_extract, list(cases))
    assert out == list(cases.values())


def test_combined_label_codec(spark):
    df = spark.createDataFrame([("W2", True)], ["label", "first_pg"])
    row = df.select(N.combined_label(F.col("label"), F.col("first_pg")).alias("c")).collect()[0]
    assert row.c == "W2:true"
    lab, fp = N.split_combined_label(F.lit("W2:true"))
    row2 = df.select(lab.alias("l"), fp.alias("f")).collect()[0]
    assert (row2.l, row2.f) == ("W2", "true")
