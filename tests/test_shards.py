"""Training-shard writer contract (sources/shards.py): one ordered
file per shard, conservation, stable membership across epochs with a
fresh within-shard order."""

import glob
import os

from pyspark.sql import functions as F

from data_ingestion_task_spark.sources.shards import (
    read_shard,
    shard_keys,
    write_training_shards,
)
from data_ingestion_task_spark.sources.tables import load_table


def _doc_sample(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_shards_conserve_and_order(spark, sf_dir, tmp_path):
    out = str(tmp_path / "shards_e0")
    docs = _doc_sample(spark, sf_dir)
    write_training_shards(docs, out, n_shards=8, epoch=0)

    shard_dirs = sorted(glob.glob(os.path.join(out, "shard_id=*")))
    assert 0 < len(shard_dirs) <= 8
    # exactly one data file per shard — the single-task-per-shard claim
    for d in shard_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: {files}"

    total = 0
    for d in shard_dirs:
        k = int(d.rsplit("=", 1)[1])
        rows = read_shard(spark, out, k).select("order_key").collect()
        keys = [r["order_key"] for r in rows]
        assert keys == sorted(keys), f"shard {k} not in training order"
        total += len(keys)
    assert total == docs.count()


def test_manifest_reports_the_keys_the_writer_materializes(spark, sf_dir):
    """corpus_shard_manifest and the epoch-0 writer share salts
    (sources/shards.py), so the manifest's per-shard key ranges must
    equal what shard_keys produces at the manifest's shard count."""
    from pyspark.sql import functions as F2

    from data_ingestion_task_spark.plans.corpus_plans import (
        N_SHARDS as MAN_SHARDS,
        corpus_shard_manifest,
    )

    docs = _doc_sample(spark, sf_dir)
    expected = {
        r["shard_id"]: (r["mn"], r["mx"])
        for r in shard_keys(docs, n_shards=MAN_SHARDS, epoch=0)
        .groupBy("shard_id")
        .agg(F2.min("order_key").alias("mn"), F2.max("order_key").alias("mx"))
        .collect()
    }
    man = {
        r["shard_id"]: (r["min_order_key"], r["max_order_key"])
        for r in corpus_shard_manifest(spark, sf_dir).collect()
    }
    assert man == expected


def test_epoch_reshuffle_keeps_membership_changes_order(spark, sf_dir):
    docs = _doc_sample(spark, sf_dir).limit(200)
    e0 = shard_keys(docs, n_shards=8, epoch=0).select("doc_id", "shard_id", "order_key")
    e1 = shard_keys(docs, n_shards=8, epoch=1).select("doc_id", "shard_id", "order_key")
    j = e0.alias("a").join(e1.alias("b"), "doc_id")
    # membership is epoch-independent
    assert j.filter(F.col("a.shard_id") != F.col("b.shard_id")).count() == 0
    # but the within-shard order is a fresh permutation
    changed = j.filter(F.col("a.order_key") != F.col("b.order_key")).count()
    assert changed > 190  # hash equality across salts is ~impossible
