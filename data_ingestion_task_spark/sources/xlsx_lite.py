"""Minimal pure-stdlib .xlsx codec (ECMA-376 / OOXML SpreadsheetML).

The Excel sink/source is a driver-side convenience for SMALL result
sets (sinks.py); pandas needs openpyxl/xlsxwriter for it, and neither
ships in every runtime. An .xlsx file is just a zip of XML parts, so
this module implements the tiny subset the sinks need with zipfile +
xml.etree alone:

- write: one worksheet; str (inline string), int/float (number),
  bool, None (blank) cell types. Anything richer (dates, formulas,
  styles) is out of scope — use a real engine.
- read: header row + typed cells, understanding inline strings,
  shared strings (so files written by real engines read back),
  booleans, and numbers (int when integral). Sheet selection by
  index or name via workbook.xml.

Used by sinks.write_excel/read_excel as the fallback when no engine
is installed; with an engine present the pandas path runs instead
(it handles the richer types).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from typing import Any, Sequence

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _col_letters(idx: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)):
        # NaN/inf have no numeric cell representation → blank
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            return ""
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_esc(str(v))}</t></is></c>'


def write_xlsx(
    path: str,
    header: Sequence[str],
    rows: Sequence[Sequence[Any]],
    sheet_name: str = "Sheet1",
) -> None:
    """Write one worksheet with a header row. Cells: str/int/float/
    bool/None (anything else is stringified)."""
    body = []
    for r, vals in enumerate([list(header)] + [list(r) for r in rows]):
        cells = "".join(
            _cell_xml(f"{_col_letters(c)}{r + 1}", v) for c, v in enumerate(vals)
        )
        body.append(f'<row r="{r + 1}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{_esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _cell_col(ref: str) -> int:
    """A1-style ref → 0-based column index."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_value(c: ET.Element, shared: list[str]) -> Any:
    t = c.get("t", "n")
    if t == "inlineStr":
        parts = [el.text or "" for el in c.iter(f"{_NS}t")]
        return "".join(parts)
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    f = float(v.text)
    return int(f) if f.is_integer() and "e" not in v.text.lower() and "." not in v.text else f


def read_xlsx(path: str, sheet: str | int = 0) -> tuple[list[str], list[list[Any]]]:
    """Read one worksheet → (header, rows). Rows are padded/truncated
    to the header width; blank cells are None."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = wb.findall(f"{_NS}sheets/{_NS}sheet")
        if isinstance(sheet, int):
            if not 0 <= sheet < len(sheets):
                raise ValueError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
            target_el = sheets[sheet]
        else:
            matches = [s for s in sheets if s.get("name") == sheet]
            if not matches:
                raise ValueError(f"no sheet named {sheet!r}")
            target_el = matches[0]
        rid = target_el.get(f"{_NS_REL}id")
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        target = next(
            r.get("Target") for r in rels.findall(f"{rel_ns}Relationship")
            if r.get("Id") == rid
        )
        sheet_path = target if target.startswith("xl/") else f"xl/{target.lstrip('/')}"
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_NS}si"):
                shared.append("".join(el.text or "" for el in si.iter(f"{_NS}t")))
        ws = ET.fromstring(z.read(sheet_path))
        grid: list[list[Any]] = []
        for row in ws.iter(f"{_NS}row"):
            vals: dict[int, Any] = {}
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r")
                col = _cell_col(ref) if ref else len(vals)
                vals[col] = _cell_value(c, shared)
            width = max(vals) + 1 if vals else 0
            grid.append([vals.get(i) for i in range(width)])
    if not grid:
        return [], []
    header = [str(v) if v is not None else "" for v in grid[0]]
    width = len(header)
    rows = [(r + [None] * width)[:width] for r in grid[1:]]
    return header, rows
