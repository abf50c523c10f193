"""Maintained fingerprint store for delta-ingest dedup
(plans/dedup_store_plans.py): the store-backed verdicts must match the
derive-per-run query bit-for-bit, the store must carry canonicals
across consecutive deltas (first-ingested wins forever), and admitting
a judged batch must touch only new fingerprints."""

from __future__ import annotations

from data_ingestion_task_spark.plans.dedup_plans import incremental_ingest_dedup
from data_ingestion_task_spark.plans.dedup_store_plans import (
    admit_new_fingerprints,
    delta_dedup_verdicts,
    fingerprint_store,
    incremental_store_dedup,
)


def _fp(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, fingerprint string")


def _verdicts(df):
    return {
        r["doc_id"]: (r["verdict"], r["canonical_doc_id"]) for r in df.collect()
    }


def test_two_consecutive_deltas_first_ingested_wins(spark, tmp_path):
    """VERDICT r9 #3 acceptance: two consecutive deltas through a real
    persisted store — delta 2 is judged against the table delta 1
    maintained, never a re-derivation, and canonicals point at the
    first-ingested doc even when delta 2 carries a smaller doc_id."""
    store = fingerprint_store(spark, str(tmp_path / "fp"), n_buckets=4)
    v1 = delta_dedup_verdicts(_fp(spark, [(5, "h1"), (6, "h2"), (7, "h1")]), store)
    assert _verdicts(v1) == {
        5: ("new", 5),
        6: ("new", 6),
        7: ("dup_in_batch", 5),
    }
    audit = admit_new_fingerprints(v1, store)
    assert audit["rows_upserted"] == 2  # h1, h2 — never the dup row
    # delta 2: h2 dup-of-corpus; h3 new then dup-in-batch; doc 1 has a
    # SMALLER id than h1's stored canonical 5 — store still wins
    v2 = delta_dedup_verdicts(
        _fp(spark, [(10, "h2"), (11, "h3"), (12, "h3"), (1, "h1")]), store
    )
    assert _verdicts(v2) == {
        10: ("dup_of_corpus", 6),
        11: ("new", 11),
        12: ("dup_in_batch", 11),
        1: ("dup_of_corpus", 5),
    }
    admit2 = admit_new_fingerprints(v2, store)
    assert admit2["rows_upserted"] == 1  # only h3
    got = {
        (r["fingerprint"], r["corpus_doc_id"]) for r in store.read().collect()
    }
    assert got == {("h1", 5), ("h2", 6), ("h3", 11)}


def test_empty_store_judges_batch_locally(spark, tmp_path):
    store = fingerprint_store(spark, str(tmp_path / "fp0"), n_buckets=2)
    v = delta_dedup_verdicts(_fp(spark, [(3, "x"), (4, "x")]), store)
    assert _verdicts(v) == {3: ("new", 3), 4: ("dup_in_batch", 3)}


def test_store_backed_query_matches_derive_per_run(spark, sf_dir):
    """The registered query's delta-2 rows must equal the certified
    derive-per-run ``incremental_ingest_dedup`` output exactly —
    store-backed ≡ recompute-the-corpus, the parity the production
    swap rests on."""
    got = [
        (r["doc_id"], r["verdict"], r["canonical_doc_id"])
        for r in incremental_store_dedup(spark, sf_dir)
        .filter("doc_id % 3 = 0")
        .collect()
    ]
    want = [
        (r["doc_id"], r["verdict"], r["canonical_doc_id"])
        for r in incremental_ingest_dedup(spark, sf_dir).collect()
    ]
    assert got == want and len(want) > 0


def test_judge_scan_prunes_to_hit_buckets(spark, tmp_path):
    """VERDICT r10 #1 acceptance: a 1-bucket batch's judge reads ONLY
    that bucket directory of the store (inputFiles() witness), and the
    verdicts are what the full-store judge would have produced."""
    from pyspark.sql import functions as F

    store = fingerprint_store(spark, str(tmp_path / "fpp"), n_buckets=8)
    seed = _fp(spark, [(i, f"s{i}") for i in range(64)])
    admit_new_fingerprints(delta_dedup_verdicts(seed, store), store)
    # craft a batch whose fingerprints (one seeded dup + fresh strings)
    # all hash to ONE bucket, using the store's own bucket expression
    cand = spark.createDataFrame(
        [(f"s{i}",) for i in range(64)] + [(f"c{i}",) for i in range(300)],
        ["fingerprint"],
    )
    rows = cand.withColumn(
        "b", store._bucket_expr(F.col("fingerprint").cast("string"))
    ).collect()
    target = next(r["b"] for r in rows if r["fingerprint"].startswith("s"))
    seeded = next(
        r["fingerprint"]
        for r in rows
        if r["b"] == target and r["fingerprint"].startswith("s")
    )
    fresh = [
        r["fingerprint"]
        for r in rows
        if r["b"] == target and r["fingerprint"].startswith("c")
    ][:3]
    batch = _fp(
        spark,
        [(1000, seeded)] + [(1001 + i, fp) for i, fp in enumerate(fresh)],
    )
    verdicts = delta_dedup_verdicts(batch, store)
    store_files = [f for f in verdicts.inputFiles() if "/fpp/" in f]
    assert store_files, "judge plan must read the store"
    assert all(f"/bucket={target}/" in f for f in store_files)
    got = _verdicts(verdicts)
    canonical = int(seeded[1:])  # seed doc_id i carries fingerprint f"s{i}"
    assert got[1000] == ("dup_of_corpus", canonical)
    assert all(got[1001 + i] == ("new", 1001 + i) for i in range(len(fresh)))
