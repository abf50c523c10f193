"""Invariant tests for the corpus-selection queries (selection_plans):
properties beyond the DuckDB parity check — budget bound + maximality,
prefix-closure of the quality ordering, per-language cap exactness, and
domain-cap accounting conservation."""

from pyspark.sql import functions as F

from data_ingestion_task_spark.plans._text_shared import spark_norm_words
from data_ingestion_task_spark.plans.selection_plans import (
    _BUDGET_DEN,
    _BUDGET_NUM,
    _DOMAIN_CAP,
    _LANG_CAP,
    domain_frequency_cap,
    language_balanced_sample,
    token_budget_selection,
)
from data_ingestion_task_spark.sources.tables import load_table


def _corpus_tokens(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.size(spark_norm_words("text")).cast("bigint").alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )


def test_token_budget_bound_and_maximal(spark, sf_dir):
    rows = token_budget_selection(spark, sf_dir).collect()
    assert rows, "empty selection"
    total = _corpus_tokens(spark, sf_dir)
    picked = sum(r["n_tok"] for r in rows)
    # budget bound: 10 * picked <= 4 * total, exactly as specified
    assert _BUDGET_DEN * picked <= _BUDGET_NUM * total
    # maximality: the next doc in (score desc, doc_id) order would blow
    # the budget. Reconstruct the full ordering and find the first
    # excluded doc.
    selected = {r["doc_id"] for r in rows}
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(spark_norm_words("text")).cast("bigint").alias("n_tok"),
            F.size(
                F.array_intersect(
                    F.array_distinct(spark_norm_words("text")),
                    F.array(
                        *[F.lit(s) for s in ["the", "and", "of", "to", "a", "in", "is"]]
                    ),
                )
            )
            .cast("bigint")
            .alias("score"),
        )
        .collect()
    )
    ordering = sorted(d, key=lambda r: (-r["score"], r["doc_id"]))
    excluded = [r for r in ordering if r["doc_id"] not in selected]
    if excluded:
        nxt = excluded[0]
        assert _BUDGET_DEN * (picked + nxt["n_tok"]) > _BUDGET_NUM * total
        # prefix-closure: everything ordered before the first excluded
        # doc is selected; everything after it is excluded
        cut = ordering.index(nxt)
        assert all(r["doc_id"] in selected for r in ordering[:cut])
        assert all(r["doc_id"] not in selected for r in ordering[cut:])


def test_language_cap_exact(spark, sf_dir):
    out = language_balanced_sample(spark, sf_dir)
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    truth = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(truth)
    for lang, n in truth.items():
        assert got[lang] == min(n, _LANG_CAP)
    # ranks are dense 1..n within each language, and deterministic
    rows = out.collect()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["rk"])
    for rks in by_lang.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))
    again = {(r["doc_id"], r["lang"], r["rk"]) for r in language_balanced_sample(spark, sf_dir).collect()}
    assert again == {(r["doc_id"], r["lang"], r["rk"]) for r in rows}


def test_domain_cap_accounting_conserved(spark, sf_dir):
    rows = domain_frequency_cap(spark, sf_dir).collect()
    truth = {
        r["source"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r["source"] for r in rows} == set(truth)
    doc_sources = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    for r in rows:
        assert r["n_docs"] == truth[r["source"]]
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["n_kept"] == min(r["n_docs"], _DOMAIN_CAP)
        assert r["cap_hit"] == (r["n_docs"] > _DOMAIN_CAP)
        # the rank-1 survivor really belongs to this source
        assert doc_sources[r["first_kept_doc"]] == r["source"]


def test_curate_corpus_flags_match_registered_queries(spark, sf_dir):
    from data_ingestion_task_spark import api
    from data_ingestion_task_spark.plans.quality_plans import gopher_quality_filter

    docs = load_table(spark, sf_dir, "documents")
    out = api.curate_corpus(
        docs, lang_col="lang", lang_cap=_LANG_CAP,
        source_col="source", domain_cap=_DOMAIN_CAP,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == docs.count()

    # quality flags == the registered gopher query
    for g in gopher_quality_filter(spark, sf_dir).collect():
        assert rows[g["doc_id"]]["quality_keep"] == g["keep"]
        assert rows[g["doc_id"]]["alpha_ok"] == g["alpha_ok"]

    # lang survivorship == the registered balanced sample (same salt)
    lang_kept = {r["doc_id"] for r in language_balanced_sample(spark, sf_dir).collect()}
    assert {d for d, r in rows.items() if r["lang_kept"]} == lang_kept

    # per-source survivor count == the registered cap accounting
    per_source = {}
    for d, r in rows.items():
        per_source[r["source"]] = per_source.get(r["source"], 0) + int(r["source_kept"])
    for c in domain_frequency_cap(spark, sf_dir).collect():
        assert per_source[c["source"]] == c["n_kept"]

    # exact_dup: first occurrence of each fingerprint is never flagged
    from pyspark.sql import functions as F
    from data_ingestion_task_spark.functions.text import fingerprint_md5
    fps = docs.select("doc_id", fingerprint_md5(F.col("text")).alias("fp")).collect()
    first = {}
    for r in sorted(fps, key=lambda r: r["doc_id"]):
        first.setdefault(r["fp"], r["doc_id"])
    for r in fps:
        assert rows[r["doc_id"]]["exact_dup"] == (first[r["fp"]] != r["doc_id"])

    # keep is exactly the conjunction
    for d, r in rows.items():
        assert r["keep"] == (
            r["quality_keep"] and not r["exact_dup"] and r["lang_kept"] and r["source_kept"]
        )


def test_token_budget_bucket_width_invisible(spark, sf_dir):
    """The bucket decomposition must be algebraically invisible: any
    width reproduces the same global prefix sum, so the 100 TB knob
    (widen the bucket so the bucket-grain frame stays executor-sized)
    never changes results (ADVICE r7 #5)."""
    from data_ingestion_task_spark.plans.selection_plans import (
        token_budget_selection,
    )

    base = token_budget_selection(spark, sf_dir).collect()
    wide = token_budget_selection(spark, sf_dir, bucket=64).collect()
    narrow = token_budget_selection(spark, sf_dir, bucket=7).collect()
    assert base == wide == narrow and base


def test_curate_corpus_ppx_band_and_dsir_floor(spark, sf_dir):
    """The facade composes the full select-then-train loop: the
    certified char_trigram_perplexity / dsir_importance_weights
    outputs feed the ppx band and dsir floor, flags match the source
    frames, absent/unscorable docs are NOT kept, and keep is always a
    non-NULL boolean (VERDICT r7 #6 / ADVICE r7 #3)."""
    import pytest
    from pyspark.sql import functions as F

    from data_ingestion_task_spark import api
    from data_ingestion_task_spark.plans.lm_plans import char_trigram_perplexity
    from data_ingestion_task_spark.plans.quality_plans import (
        dsir_importance_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    ppx = char_trigram_perplexity(spark, sf_dir)
    dsir = dsir_importance_weights(spark, sf_dir)
    # band/floor chosen from the data so both flags are non-trivial
    lo, hi = 5.30, 5.42
    floor = -0.0142
    out = api.curate_corpus(
        docs,
        ppx_scores=ppx,
        ppx_band=(lo, hi),
        dsir_scores=dsir,
        dsir_floor=floor,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    scored = {r["doc_id"]: r["avg_nll"] for r in ppx.collect()}
    weights = {r["doc_id"]: r["dsir_logweight"] for r in dsir.collect()}
    api.release(ppx)  # release LAST: the contract is terminal
    assert len(rows) == docs.count()
    n_ppx = n_dsir = 0
    for d, r in rows.items():
        assert r["keep"] is not None
        want_ppx = d in scored and lo <= scored[d] <= hi
        want_dsir = d in weights and weights[d] >= floor
        assert r["ppx_kept"] == want_ppx
        assert r["dsir_kept"] == want_dsir
        assert r["keep"] == (
            r["quality_keep"] and not r["exact_dup"]
            and r["ppx_kept"] and r["dsir_kept"]
        )
        n_ppx += int(want_ppx)
        n_dsir += int(want_dsir)
    assert 0 < n_ppx < len(rows)
    assert 0 < n_dsir < len(rows)

    # score frame without its threshold is an error; a floor without a
    # score frame now takes the raw-docs path, which needs the target
    # predicate (r9); a target predicate conflicts with a score frame
    with pytest.raises(ValueError, match="ppx_scores and ppx_band"):
        api.curate_corpus(docs, ppx_scores=ppx)
    with pytest.raises(ValueError, match="requires dsir_target"):
        api.curate_corpus(docs, dsir_floor=0.0)
    with pytest.raises(ValueError, match="conflicts with a"):
        api.curate_corpus(
            docs,
            dsir_scores=dsir,
            dsir_floor=0.0,
            dsir_target=F.col("lang") == "en",
        )
    # a dangling target predicate (no floor, no score frame) must not
    # silently skip the DSIR stage (code-review r9)
    with pytest.raises(ValueError, match="without dsir_floor"):
        api.curate_corpus(docs, dsir_target=F.col("lang") == "en")


def test_curate_corpus_raw_docs_scoring(spark, sf_dir):
    """The r9 raw-docs path: a band/floor WITHOUT a precomputed score
    frame makes curate_corpus score the docs itself through the same
    certified library functions — flags must match the score-frame
    path row for row, and the internally-persisted trigram grain must
    ride out on _cached_deps for api.release."""
    from pyspark.sql import functions as F

    from data_ingestion_task_spark import api
    from data_ingestion_task_spark.plans.lm_plans import char_trigram_perplexity
    from data_ingestion_task_spark.plans.quality_plans import (
        dsir_importance_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    lo, hi = 5.30, 5.42
    floor = -0.0142
    raw = api.curate_corpus(
        docs,
        ppx_band=(lo, hi),
        dsir_floor=floor,
        dsir_target=F.col("lang") == "en",
    )
    assert raw._cached_deps  # the trigram grain, for api.release
    got = {r["doc_id"]: (r["ppx_kept"], r["dsir_kept"], r["keep"])
           for r in raw.collect()}
    ppx = char_trigram_perplexity(spark, sf_dir)
    dsir = dsir_importance_weights(spark, sf_dir)
    fed = api.curate_corpus(
        docs,
        ppx_scores=ppx,
        ppx_band=(lo, hi),
        dsir_scores=dsir,
        dsir_floor=floor,
    )
    want = {r["doc_id"]: (r["ppx_kept"], r["dsir_kept"], r["keep"])
            for r in fed.collect()}
    api.release(raw)
    api.release(ppx)
    assert got == want
    assert any(k for _, _, k in got.values())
    assert not all(p for p, _, _ in got.values())


def test_curate_corpus_null_text_keep_is_boolean(spark):
    """NULL text must coalesce to quality_keep=False, never a NULL
    keep (ADVICE r7 #3)."""
    from data_ingestion_task_spark import api

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs on"),
         (2, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in api.curate_corpus(docs).collect()}
    assert rows[2]["quality_keep"] is False
    assert rows[2]["keep"] is False
    assert all(r["keep"] is not None for r in rows.values())
