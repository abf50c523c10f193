"""Model-stage orchestration tests (SURVEY §2.9): bounded-concurrency
mapInPandas extraction with exponential-backoff retry and permanent-
failure scaffolds — the deterministic replacement for the reference's
asyncio batch drivers (rag_2_26_1.py:22-151)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_task_spark.operators.extract import extract_with_model
from data_ingestion_task_spark.sources.tables import load_table


def test_model_stage_retry_and_scaffold(spark, sf_dir):
    counts: dict = {}

    def _flaky_model(text: str) -> dict:
        """Deterministic flake: docs whose text starts 'key' fail
        twice then succeed; texts containing 'PERMAFAIL' never
        succeed. The retry loop re-calls within the same task, so the
        per-process counter is visible. Defined inline so cloudpickle
        ships it by value to executors."""
        if "PERMAFAIL" in text:
            raise RuntimeError("server error")
        if text.startswith("FLAKY"):
            counts[text] = counts.get(text, 0) + 1
            if counts[text] <= 2:
                raise RuntimeError("transient")
        return {"first_word": text.split()[0], "n_chars": str(len(text))}

    docs = load_table(spark, sf_dir, "documents").limit(60)
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 17 == 0, F.lit("PERMAFAIL x"))
        .when(F.col("doc_id") % 7 == 0, F.concat(F.lit("FLAKY "), F.col("text")))
        .otherwise(F.col("text")),
    )
    out = extract_with_model(
        docs,
        _flaky_model,
        ["first_word", "n_chars"],
        max_concurrent=4,
        max_retries=4,
        base_delay_s=0.001,
    ).cache()

    rows = {r.doc_id: r for r in out.collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    assert len(rows) == len(src)
    for doc_id, text in src.items():
        r = rows[doc_id]
        if "PERMAFAIL" in text:
            # permanent failure: all-None scaffold, retries exhausted
            assert r.first_word is None and r.n_chars is None
            assert r.n_attempts == 4
        else:
            assert r.first_word == text.split()[0]
            assert r.n_chars == str(len(text))
            # transient flake ('key...' texts) needed exactly 3 attempts
            assert r.n_attempts == (3 if text.startswith("FLAKY") else 1)
    assert any(t.startswith("FLAKY") for t in src.values())  # flaky path hit
