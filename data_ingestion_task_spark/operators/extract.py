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
    # Backtick-quote every name: doc-type fields like 'Bill Date'
    # contain spaces, which unquoted DDL rejects.
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in schema_fields]
        + [f"`{c}` string" for c in patterns]
    )
    fn = make_regex_extractor(
        patterns, id_col=id_col, text_col=text_col, passthrough=passthrough
    )
    cols = [id_col, *passthrough, text_col]
    return df.select(*cols).mapInPandas(fn, schema=schema)


def make_model_stage(
    model_fn: Callable[[str], dict],
    out_fields: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_concurrent: int = 8,
    max_retries: int = 5,
    base_delay_s: float = 0.01,
) -> Callable[[Iterator["pd.DataFrame"]], Iterator["pd.DataFrame"]]:
    """Model-calling extraction stage: the Spark replacement for the
    reference's manual batch orchestration — asyncio.gather in batches
    with exponential-backoff retry and an empty scaffold on permanent
    failure (rag_2_26_1.py:22-49 retry classifier; neww_rag_.py:274-430
    batch driver; privateb_4_8.py:35-46 all-None scaffold).

    Per partition: a bounded thread pool (``max_concurrent``) replaces
    the asyncio semaphore; each row retries up to ``max_retries`` with
    delay ``base_delay_s · 2^attempt``. Cluster-wide concurrency is
    therefore ``max_concurrent × executor cores / task cpus`` — size it
    to the model service's rate limit. Emits ``n_attempts`` (1-based;
    == max_retries with null fields ⇒ permanent failure) so the
    error-rate run stats (ocr_agent_8_29.py:28-29) are one agg away.
    """
    import pandas as pd

    if max_retries < 1:
        raise ValueError(f"max_retries must be >= 1, got {max_retries}")
    if max_concurrent < 1:
        raise ValueError(f"max_concurrent must be >= 1, got {max_concurrent}")

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time
        from concurrent.futures import ThreadPoolExecutor

        def call(text: str) -> dict:
            delay = base_delay_s
            for attempt in range(1, max_retries + 1):
                try:
                    result = model_fn(text)
                    return {**{f: result.get(f) for f in out_fields}, "n_attempts": attempt}
                except Exception:
                    if attempt == max_retries:
                        # permanent failure → schema-guaranteed scaffold
                        return {**{f: None for f in out_fields}, "n_attempts": attempt}
                    time.sleep(delay)
                    delay *= 2

        with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
            for pdf in batches:
                results = list(pool.map(call, pdf[text_col]))
                out = pd.DataFrame({id_col: pdf[id_col].to_numpy()})
                for f in out_fields:
                    out[f] = [r[f] for r in results]
                out["n_attempts"] = [r["n_attempts"] for r in results]
                yield out

    return stage


def extract_with_model(
    df: DataFrame,
    model_fn: Callable[[str], dict],
    out_fields: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_concurrent: int = 8,
    max_retries: int = 5,
    base_delay_s: float = 0.01,
) -> DataFrame:
    """``df[id_col, text_col]`` → ``(id_col, *out_fields, n_attempts)``
    via :func:`make_model_stage`. All ``out_fields`` are strings (the
    reference's every-value-is-a-string rule, w2_prompt_v1_6_12:34)."""
    by_name = {f.name: f for f in df.schema.fields}
    schema = ", ".join(
        [f"{id_col} {by_name[id_col].dataType.simpleString()}"]
        + [f"{c} string" for c in out_fields]
        + ["n_attempts int"]
    )
    fn = make_model_stage(
        model_fn,
        out_fields,
        id_col=id_col,
        text_col=text_col,
        max_concurrent=max_concurrent,
        max_retries=max_retries,
        base_delay_s=base_delay_s,
    )
    return df.select(id_col, text_col).mapInPandas(fn, schema=schema)
