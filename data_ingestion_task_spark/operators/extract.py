"""Pluggable extraction stage (SURVEY §2.9, §3.3): the reference's
LLM field extraction (full_test_run.py:1-47, privateb_4_8.py:1-66) is
a row→struct black box; our engine runs it as an Arrow-batched
``mapInPandas`` stage with a deterministic regex extractor as the
default implementation, so the whole extract→normalize→evaluate
pipeline is model-free and oracle-checkable.

A production deployment swaps ``regex_extractor`` for a model-calling
extractor with the same signature (batched, bounded concurrency per
partition — the Spark replacement for the reference's manual asyncio
batch loops, rag_2_26_1.py:22-151).

Scale notes (100 TB): extraction is a narrow map stage — no shuffle;
Arrow moves each batch to the Python worker once; pandas
``str.extract`` is vectorized per batch (not per row). Only the
columns the patterns need should be selected upstream so the scan
prunes everything else.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:
    import pandas as pd

# Extractor: text column name -> {out_col: compiled regex with ONE group}
Patterns = dict[str, "re.Pattern[str]"]

# Default statement-field patterns (reference prompt schemas:
# doc_8_14:66-131 PBST fields; anchored line format like OCR output).
STATEMENT_PATTERNS: Patterns = {
    "raw_vendor": re.compile(r"^Vendor:\s*(.+?)\s*$", re.M),
    "raw_account": re.compile(r"^Account Number:\s*(.+?)\s*$", re.M),
    "raw_date": re.compile(r"^Statement Date:\s*(.+?)\s*$", re.M),
    "raw_money": re.compile(r"^Total Due:\s*(.+?)\s*$", re.M),
}


def make_regex_extractor(
    patterns: Patterns,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> Callable[[Iterator["pd.DataFrame"]], Iterator["pd.DataFrame"]]:
    """Build a ``mapInPandas`` function extracting one group per
    pattern. Missing field → null (the reference's empty-scaffold
    behavior, privateb_4_8.py:35-46)."""
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: pdf[id_col]}
            for col in passthrough:
                out[col] = pdf[col]
            for col, pat in patterns.items():
                out[col] = pdf[text_col].str.extract(pat, expand=False)
            yield pd.DataFrame(out)

    return extract


def extract_fields(
    df: DataFrame,
    patterns: Patterns,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Run the regex extractor over ``df[id_col, text_col]`` and return
    ``(id_col, *passthrough, *pattern columns)``.

    ``passthrough`` forwards (ground-truth / metadata) columns through
    the Arrow stage so a single pass replaces render→extract→join-back
    — at scale this halves the upstream compute and removes a shuffle;
    when extraction runs far from ingest, join back on ``id_col``
    instead (explicit key, never positional — SURVEY §2.3)."""
    by_name = {f.name: f for f in df.schema.fields}
    schema_fields = [by_name[id_col]] + [by_name[c] for c in passthrough]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in schema_fields]
        + [f"{c} string" for c in patterns]
    )
    fn = make_regex_extractor(
        patterns, id_col=id_col, text_col=text_col, passthrough=passthrough
    )
    cols = [id_col, *passthrough, text_col]
    return df.select(*cols).mapInPandas(fn, schema=schema)
