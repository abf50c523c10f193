"""Cross-implementation battery for the BM25 scorer: the registered
``bm25_retrieval`` query against an INDEPENDENT pure-Python BM25 on a
generated random corpus (one Spark job, repo property-test style).
The DuckDB oracle shares the engine-side SQL formulation; this
reference shares nothing but the spec, so a formulation error that
slipped into both engine twins would still be caught here."""

from __future__ import annotations

import random
import re
from decimal import ROUND_HALF_UP, Decimal
from math import log

from data_ingestion_task_spark.plans import registry
from data_ingestion_task_spark.plans.retrieval_plans import _B, _K1, _QUERY_TERMS

registry.load_all()

_VOCAB = [
    # the registered query terms...
    "fast", "hash", "join", "window", "agg", "stream", "customer", "order", "query",
    # ...plus filler the queries never ask for
    "table", "scan", "value", "row", "part", "line", "batch", "sort", "group",
    "Mixed-Case!", "punct,uated.",
]


def _tokens(text: str) -> list[str]:
    # Independent re-implementation of the tokenizer spec (casefold,
    # strip non-alphanumerics, collapse whitespace, split, drop empties).
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", text.strip().lower()))
    return [w for w in t.split(" ") if w]


def _round6(x: float) -> Decimal:
    # F.round / DuckDB round are HALF_UP; Python round() is banker's.
    return Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def _reference_bm25(docs: list[tuple[int, str]]) -> list[tuple[int, int, int, float]]:
    toks = {doc_id: _tokens(text) for doc_id, text in docs}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    by_query: dict[int, dict[int, Decimal]] = {}
    for qid, term in _QUERY_TERMS:
        if term not in df:
            continue
        idf = log((n_docs - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
        for doc_id, t in toks.items():
            tf = t.count(term)
            if not tf:
                continue
            sat = (tf * (_K1 + 1.0)) / (tf + _K1 * (1.0 - _B + _B * len(t) / avgdl))
            scores = by_query.setdefault(qid, {})
            scores[doc_id] = scores.get(doc_id, Decimal(0)) + _round6(idf * sat)
    out = []
    for qid in sorted(by_query):
        ranked = sorted(by_query[qid].items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        out.extend((qid, r + 1, doc_id, float(s)) for r, (doc_id, s) in enumerate(ranked))
    return out


def test_bm25_matches_independent_reference(spark, tmp_path):
    rng = random.Random(20260814)
    docs = []
    for i in range(150):
        n = rng.randint(1, 60) if i else 30  # doc 0 non-empty -> avgdl > 0
        docs.append((i, " ".join(rng.choice(_VOCAB) for _ in range(n))))
    spark.createDataFrame(
        [(i, t, "en", "gen", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(2).write.parquet(str(tmp_path / "documents.parquet"))

    rows = registry.queries_dict()["bm25_retrieval"](spark, str(tmp_path)).collect()
    got = [(r.query_id, r.rnk, r.doc_id, r.score) for r in rows]
    want = _reference_bm25(docs)
    assert [g[:3] for g in got] == [w[:3] for w in want]
    assert all(abs(g[3] - w[3]) < 1e-9 for g, w in zip(got, want))
