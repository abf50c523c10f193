"""Excel + JSON metrics sink tests (SURVEY §2.1 sinks)."""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

from data_ingestion_task_spark.sources.sinks import (
    read_excel,
    read_json_metrics,
    write_excel,
    write_json_dataset,
    write_json_metrics,
)

HAS_EXCEL = any(
    importlib.util.find_spec(e) is not None for e in ("openpyxl", "xlsxwriter")
)


# The round trip runs EVERYWHERE since r6: with openpyxl/xlsxwriter
# pandas handles it; without, the pure-stdlib OOXML codec
# (sources/xlsx_lite.py) does — the former env-gated skip is gone.
def test_excel_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id bigint, Name string, score double"
    )
    path = str(tmp_path / "rt.xlsx")
    assert write_excel(df, path) == 2
    back = read_excel(spark, path)
    assert back.columns == ["id", "name", "score"]  # hygiene pass lowers names
    got = sorted((r["id"], r["name"], r["score"]) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, "b", None)]


def test_xlsx_lite_reads_shared_strings_and_escapes(spark, tmp_path):
    """The stdlib codec must read files real engines write (shared
    strings) and survive XML-special characters; built here by hand so
    the test runs without an engine installed."""
    import zipfile

    from data_ingestion_task_spark.sources.xlsx_lite import read_xlsx, write_xlsx

    # escaping + type round trip through our own writer
    p1 = str(tmp_path / "esc.xlsx")
    write_xlsx(p1, ["Val", "N"], [["a<b&\"c'd>", 7], ["  spaced  ", -1.25]])
    header, rows = read_xlsx(p1)
    assert header == ["Val", "N"]
    assert rows == [["a<b&\"c'd>", 7], ["  spaced  ", -1.25]]

    # a hand-built workbook using the sharedStrings table (the layout
    # openpyxl/xlsxwriter emit), plus a blank cell gap
    p2 = str(tmp_path / "sst.xlsx")
    write_xlsx(p2, ["x"], [])  # scaffold parts, then overwrite the data parts
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    # appending a second sheet1.xml shadows the scaffold's (readers take
    # the last entry) — zipfile warns about the duplicate; expected here
    import warnings

    with warnings.catch_warnings(), zipfile.ZipFile(p2, "a") as z:
        warnings.simplefilter("ignore", UserWarning)
        z.writestr(
            "xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst xmlns="{ns}" count="2" uniqueCount="2">'
            "<si><t>hdr</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>",
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>w</t></is></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>3</v></c></row>'
            '<row r="3"><c r="B3" t="b"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        )
    header, rows = read_xlsx(p2)
    assert header == ["hdr", "w"]
    assert rows == [["rich", 3], [None, True]]


def test_read_excel_sheet_selection_errors(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "a bigint")
    path = str(tmp_path / "s.xlsx")
    write_excel(df, path, sheet_name="results")
    assert read_excel(spark, path, sheet_name="results").count() == 1
    if not HAS_EXCEL:  # stdlib codec: named errors for bad selectors
        with pytest.raises(ValueError, match="no sheet named"):
            read_excel(spark, path, sheet_name="nope")
        with pytest.raises(ValueError, match="out of range"):
            read_excel(spark, path, sheet_name=3)


def test_json_metrics_round_trip_dict(tmp_path):
    path = str(tmp_path / "m.json")
    from decimal import Decimal

    metrics = {"accuracy": 0.97, "n": 136, "total": Decimal("12.50"), "nan": float("nan")}
    write_json_metrics(metrics, path)
    back = read_json_metrics(path)
    assert back["accuracy"] == 0.97 and back["n"] == 136
    assert back["total"] == "12.50"  # exact decimal as string
    assert back["nan"] is None


def test_json_metrics_round_trip_dataframe(spark, tmp_path):
    df = spark.createDataFrame(
        [("lang", 10, 0.9), ("source", 20, 0.85)], "field string, support int, acc double"
    )
    path = str(tmp_path / "df.json")
    payload = write_json_metrics(df, path)
    back = read_json_metrics(path)
    assert back == payload
    assert back["columns"] == ["field", "support", "acc"]
    assert back["rows"][0] == {"field": "lang", "support": 10, "acc": 0.9}


def test_json_dataset_sink(spark, tmp_path):
    df = spark.range(100).withColumn("sq", F.col("id") * F.col("id"))
    out = str(tmp_path / "ds")
    write_json_dataset(df, out)
    back = spark.read.json(out)
    assert back.count() == 100
    assert back.agg(F.sum("sq")).collect()[0][0] == sum(i * i for i in range(100))


def test_csv_sink_round_trip(spark, tmp_path):
    # SURVEY §2.1 CSV sink (csv_single_3.py:59 to_csv) — distributed write
    df = spark.createDataFrame(
        [(1, "a,b", 1.5), (2, None, -2.25)], "id bigint, s string, v double"
    )
    out = str(tmp_path / "csv_out")
    df.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.option("header", True).schema(df.schema).csv(out)
    assert back.count() == 2
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_read_excel_blank_column_matches_pandas_dtype(spark, tmp_path):
    # ADVICE r6 #1: an all-None (blank) column used to make the
    # engine-less path raise in type inference; now it comes back as a
    # nullable double column — the same float64-of-NaN shape the
    # pandas path gives a blank column.
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id bigint, blank string"
    )
    path = str(tmp_path / "blank.xlsx")
    write_excel(df, path)
    back = read_excel(spark, path)
    assert dict(back.dtypes) == {"id": "bigint", "blank": "double"}
    assert [r["blank"] for r in back.collect()] == [None, None]


def test_read_excel_mixed_column_stringifies(spark, tmp_path):
    from data_ingestion_task_spark.sources.xlsx_lite import write_xlsx

    path = str(tmp_path / "mixed.xlsx")
    write_xlsx(path, ["k", "v"], [[1, "a"], [2, 3], [3, None]])
    if HAS_EXCEL:
        pytest.skip("engine-less inference path only")
    back = read_excel(spark, path)
    assert dict(back.dtypes) == {"k": "bigint", "v": "string"}
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (1, "a"), (2, "3"), (3, None),
    ]


def test_write_excel_normalizes_decimal_and_datetime(spark, tmp_path):
    # ADVICE r6 #2: both write paths emit the SAME cell types — Decimal
    # as float, timestamp as ISO string — so a file round-trips
    # identically whether or not an Excel engine is installed.
    df = spark.createDataFrame(
        [(1,)], "id bigint"
    ).select(
        "id",
        F.lit("7.25").cast("decimal(18,2)").alias("money"),
        F.to_timestamp(F.lit("2024-03-01 12:30:00")).alias("when"),
    )
    path = str(tmp_path / "typed.xlsx")
    write_excel(df, path)
    back = read_excel(spark, path)
    row = back.collect()[0]
    assert row["money"] == 7.25 and isinstance(row["money"], float)
    assert isinstance(row["when"], str) and row["when"].startswith("2024-03-01T12:30:00")
