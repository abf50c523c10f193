"""Bucketed co-located join tests (SCALE.md §8): the join of two
tables bucketed on the same key with the same bucket count must plan
WITHOUT a shuffle exchange — the property that makes repeated
doc_id/user_id joins free at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_task_spark.sources.bucketing import (
    plan_has_shuffle,
    read_table,
    write_bucketed,
)
from data_ingestion_task_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    preds = docs.select(
        "doc_id", F.concat(F.lit("p_"), F.col("lang")).alias("pred_label")
    )
    write_bucketed(docs, "b_docs", "doc_id", n_buckets=8, sort_col="doc_id")
    write_bucketed(preds, "b_preds", "doc_id", n_buckets=8, sort_col="doc_id")
    yield "b_docs", "b_preds"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_preds")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    t1, t2 = bucketed_pair
    a, b = read_table(spark, t1), read_table(spark, t2)
    joined = a.join(b, "doc_id").select("doc_id", "lang", "pred_label")
    # correctness: same rows as the unbucketed join
    assert joined.count() == a.count()
    # the scale property: co-located buckets -> zero exchanges
    assert not plan_has_shuffle(joined)


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    preds = docs.select("doc_id", F.lit("x").alias("p"))
    joined = docs.join(preds, "doc_id")
    # sanity: without bucketing (and above broadcast size) a sort-merge
    # join shuffles; with AQE+broadcast small inputs may avoid it, so
    # force sort-merge to make the contrast meaningful.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined2 = docs.join(preds, "doc_id")
        assert plan_has_shuffle(joined2)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_pair):
    t1, _ = bucketed_pair
    a = read_table(spark, t1)
    agg = a.groupBy("doc_id").agg(F.sum("n_chars").alias("c"))
    assert not plan_has_shuffle(agg)


def test_write_bucketed_rejects_qualified_names(spark, sf_dir):
    from data_ingestion_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    with pytest.raises(ValueError, match="unqualified"):
        write_bucketed(docs, "somedb.tbl", "doc_id", n_buckets=4)


def test_bucketed_doc_join_frames_pinned_to_sf_dir(spark):
    """Constructing the query for a SECOND sf_dir must not redirect an
    earlier, not-yet-executed frame to the second dataset's rows
    (ADVICE r5 #1): table names are derived per sf_dir."""
    from data_ingestion_task_spark.plans.bucketed_plans import bucketed_doc_join

    small = "/root/testdata/sf0.001"
    big = "/root/testdata/sf0.01"
    def words(frame):
        return frame.agg(F.sum("total_chunk_words")).collect()[0][0]

    f_small = bucketed_doc_join(spark, small)
    f_big = bucketed_doc_join(spark, big)  # constructed BEFORE f_small runs
    w_small = words(f_small)
    w_big = words(f_big)
    # both testdata dirs hold 500 docs with DIFFERENT text, so the
    # chunk-word total discriminates which dataset a frame read
    assert w_small == words(bucketed_doc_join(spark, small))
    assert w_big == words(bucketed_doc_join(spark, big))
    assert w_small != w_big
