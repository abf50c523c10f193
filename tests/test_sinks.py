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


def test_excel_gate_without_engine(spark, tmp_path):
    if HAS_EXCEL:
        pytest.skip("an Excel engine is installed here")
    df = spark.range(3)
    with pytest.raises(ImportError, match="Excel engine"):
        write_excel(df, str(tmp_path / "out.xlsx"))
    with pytest.raises(ImportError, match="Excel engine"):
        read_excel(spark, str(tmp_path / "out.xlsx"))


# ENV-GATED, not an incomplete test: a real .xlsx round trip is
# impossible without an engine (pandas to_excel AND read_excel both
# require openpyxl/xlsxwriter, neither baked into this container).
# The engine-absent half of the gate is test_excel_gate_without_engine
# above, which runs HERE; this half runs wherever an engine exists.
@pytest.mark.skipif(not HAS_EXCEL, reason="requires openpyxl or xlsxwriter")
def test_excel_round_trip_requires_openpyxl_or_xlsxwriter(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id bigint, Name string, score double"
    )
    path = str(tmp_path / "rt.xlsx")
    assert write_excel(df, path) == 2
    back = read_excel(spark, path)
    assert back.columns == ["id", "name", "score"]  # hygiene pass lowers names
    assert back.count() == 2


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
