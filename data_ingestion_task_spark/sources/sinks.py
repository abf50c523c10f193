"""Result-movement sinks/sources (SURVEY §2.1): Excel read/write and
the JSON metrics sink — how the reference team actually ships results
around (`code/python/post_pro_9_8.py:116` pd.read_excel,
`code/python/ext_3_4.py:35` to_excel,
`code/python/neww_rag_.py:257-258` json.dump(metrics)).

Design: Excel is a DRIVER-SIDE format for small result sets (metric
tables, validation reports — hundreds of rows), so the helpers go
through ``toPandas``/``createDataFrame`` deliberately; guard rails
refuse silently collecting big data. Excel engines (openpyxl /
xlsxwriter) are not in this container → both helpers are gated behind
import-try with a clear error; tests skip the round trip when no
engine exists and always cover the gate.

The JSON metrics sink has two shapes:
- ``write_json_metrics`` — one small metrics dict/DataFrame → a single
  human-readable JSON file on the driver (the reference's json.dump).
- ``write_json_dataset`` — distributed ``df.write.json`` for
  row-oriented outputs at scale.
"""

from __future__ import annotations

import importlib.util
import json
import math
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

EXCEL_ROW_LIMIT = 1_000_000  # guard: Excel is a small-result format


def _excel_engine() -> str | None:
    """Installed pandas Excel engine name, or None (→ stdlib codec)."""
    for eng in ("openpyxl", "xlsxwriter"):
        if importlib.util.find_spec(eng) is not None:
            return eng
    return None


def _norm_cell(v: Any) -> Any:
    """Canonical Excel cell value shared by BOTH write paths (ADVICE
    r6 #2: with an engine installed pandas used to write datetime /
    Decimal natively while the stdlib codec stringified them — same
    call, differently-typed files per runtime). Decimal → float,
    date/datetime → ISO string, everywhere."""
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def write_excel(df: DataFrame, path: str, sheet_name: str = "Sheet1") -> int:
    """``to_excel('extraction_validation_results.xlsx')``
    (ext_3_4.py:35): collect a SMALL result DataFrame to the driver and
    write one xlsx sheet. Returns the row count. Refuses more than
    ``EXCEL_ROW_LIMIT`` rows — big data belongs in parquet.

    Cell values are normalized (:func:`_norm_cell`) BEFORE dispatching
    to either writer, so the file's cell types are identical whether
    pandas+openpyxl/xlsxwriter or the pure-stdlib OOXML codec
    (:mod:`.xlsx_lite`) produced it: str/number/bool/None cells, with
    Decimal as float and date/datetime as ISO strings."""
    n = df.limit(EXCEL_ROW_LIMIT + 1).count()
    if n > EXCEL_ROW_LIMIT:
        raise ValueError(
            f"write_excel got >{EXCEL_ROW_LIMIT} rows; Excel is for small "
            "result sets — write parquet instead"
        )
    rows = [[_norm_cell(row[c]) for c in df.columns] for row in df.collect()]
    if _excel_engine() is not None:
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=df.columns)
        pdf.to_excel(path, sheet_name=sheet_name, index=False)
        return len(pdf)
    from .xlsx_lite import write_xlsx

    write_xlsx(path, df.columns, rows, sheet_name=sheet_name)
    return len(rows)


def read_excel(spark: SparkSession, path: str, sheet_name: str | int = 0) -> DataFrame:
    """``pd.read_excel("predictions.xlsx")`` (post_pro_9_8.py:116,
    remove_paranthesis.py:4) → Spark DataFrame via the driver. Column
    names get the reference's hygiene pass (strip + lower —
    remove_paranthesis.py:30). Engine-less runtimes fall back to the
    stdlib codec, which also reads shared-string files written by real
    engines."""
    if _excel_engine() is not None:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name)
        pdf.columns = [str(c).strip().lower() for c in pdf.columns]
        return spark.createDataFrame(pdf)
    from .xlsx_lite import read_xlsx

    header, rows = read_xlsx(path, sheet=sheet_name)
    cols = [str(c).strip().lower() for c in header]
    return spark.createDataFrame(rows, schema=_infer_schema(cols, rows))


def _infer_schema(cols: list[str], rows: list[list[Any]]):
    """Explicit driver-side schema for the engine-less read path
    (ADVICE r6 #1: name-only ``createDataFrame(rows, schema=cols)``
    raises on an all-None column — a blank Excel column — where the
    pandas path yields NaN float64). Per column: bool → boolean,
    all-int → long, numeric mix → double, anything else → string
    (stringified); all-None/blank → double, MATCHING pandas' float64
    NaN dtype for empty columns."""
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    fields = []
    for i, name in enumerate(cols):
        seen = {type(r[i]) for r in rows if r[i] is not None}
        if not seen:
            dt = DoubleType()  # blank column == pandas float64-of-NaN
        elif seen == {bool}:
            dt = BooleanType()
        elif seen == {int}:
            dt = LongType()
        elif seen <= {int, float}:
            dt = DoubleType()
            for r in rows:
                if r[i] is not None:
                    r[i] = float(r[i])
        else:
            dt = StringType()
            for r in rows:
                if r[i] is not None and not isinstance(r[i], str):
                    r[i] = str(r[i])
        fields.append(StructField(name, dt, nullable=True))
    return StructType(fields)


def _json_safe(v: Any) -> Any:
    """Make metric values JSON-serializable (Decimal, numpy scalars,
    dates, NaN → null)."""
    if v is None or isinstance(v, (str, bool, int)):
        return v
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if hasattr(v, "item"):  # numpy scalar
        return _json_safe(v.item())
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_safe(x) for k, x in v.items()}
    return str(v)  # Decimal and friends: exact string form


def write_json_metrics(metrics: DataFrame | dict, path: str) -> dict:
    """``json.dump(metrics, f)`` (neww_rag_.py:257-258): one small
    metrics result → a single pretty JSON file on the driver. A
    DataFrame becomes ``{"rows": [...]}`` preserving column order;
    a dict is dumped as-is. Returns what was written."""
    if isinstance(metrics, DataFrame):
        cols = metrics.columns
        payload: dict = {
            "columns": cols,
            "rows": [
                {c: _json_safe(row[c]) for c in cols} for row in metrics.collect()
            ],
        }
    else:
        payload = _json_safe(metrics)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=False)
        f.write("\n")
    os.replace(tmp, path)  # atomic publish — no torn reads for tailers
    return payload


def write_json_dataset(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed JSON-lines sink for row-oriented outputs at scale
    (each executor writes its partitions; no driver collect)."""
    df.write.mode(mode).json(path)


def read_json_metrics(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
