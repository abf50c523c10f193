"""The r9 corpus-scorer library (functions/corpus_scores.py): the
DataFrame-shaped trigram_nll / dsir_logweights behind the certified
char_trigram_perplexity / dsir_importance_weights queries. Value
parity with the oracle is the registered queries' job (they are thin
wrappers); these tests cover what only the library adds — custom
column names, the carry contract, and directional sanity."""

from pyspark.sql import functions as F

from data_ingestion_task_spark.functions.corpus_scores import (
    dsir_logweights,
    trigram_nll,
)


def test_trigram_nll_custom_columns_and_support(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "zzzzqqqqxxxx completely unlike anything else here"),
            (4, "ab"),  # shorter than one trigram: no model support
        ],
        "id bigint, body string",
    )
    out = trigram_nll(docs, text_col="body", id_col="id")
    assert out.columns == ["id", "n_tri", "avg_nll"]
    rows = {r["id"]: r for r in out.collect()}
    for dep in out._cached_deps:
        dep.unpersist()
    assert set(rows) == {1, 2, 3}  # doc 4 excluded, not scored 0
    # identical text, identical score; the outlier is higher-nll
    assert rows[1]["avg_nll"] == rows[2]["avg_nll"]
    assert rows[3]["avg_nll"] > rows[1]["avg_nll"]
    assert rows[1]["n_tri"] == len("the quick brown fox jumps over the lazy dog") - 2


def test_dsir_logweights_custom_columns_and_direction(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en"),
            (2, "alpha beta gamma delta epsilon", "en"),
            (3, "alpha beta gamma delta", "fr"),  # looks like the target
            (4, "umlaut zeppelin quark boson", "de"),  # does not
            (5, "alpha beta", None),  # NULL lang: out-of-target, still scored
        ],
        "id bigint, body string, l string",
    )
    out = dsir_logweights(
        docs,
        target_pred=F.col("l") == "en",
        text_col="body",
        id_col="id",
        carry_cols=("l",),
    )
    assert out.columns == ["id", "l", "n_words", "dsir_logweight"]
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[3]["l"] == "fr" and rows[5]["l"] is None
    assert rows[4]["n_words"] == 4
    # target-looking text outscores out-of-domain text
    assert rows[3]["dsir_logweight"] > rows[4]["dsir_logweight"]
    # no carry: only id + metrics
    slim = dsir_logweights(
        docs, target_pred=F.col("l") == "en", text_col="body", id_col="id"
    )
    assert slim.columns == ["id", "n_words", "dsir_logweight"]


def test_dsir_rate_from_buckets_stamps_modulus(spark):
    """ADVICE r11 #4: the PUBLIC rate-table builder must stamp its own
    n_buckets column (not just the full trainer), so any rate table
    reaching streaming/curate.py's modulus-deriving scorer carries its
    modulus."""
    from data_ingestion_task_spark.functions.corpus_scores import (
        _word_buckets,
        dsir_rate_from_buckets,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", True), (2, "delta epsilon", False)],
        "doc_id long, text string, is_t boolean",
    )
    w = _word_buckets(docs, F.col("is_t"), "text", "doc_id", 64)
    rate = dsir_rate_from_buckets(w, 64)
    assert "n_buckets" in rate.columns
    vals = {r["n_buckets"] for r in rate.select("n_buckets").collect()}
    assert vals == {64}
