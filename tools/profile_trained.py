"""Phase-level wall profile of the trained IVF-PQ lifecycle
(ivfpq_trained_topk / ivfpq_scaled_topk) — guide §1: decide whether the
time goes to the coarse trainer, the PQ trainer, or the search before
touching anything.

    python tools/profile_trained.py [--scaled] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaled", action="store_true")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_ingestion_task_spark.operators.ivfpq import knn_join_ivfpq
    from data_ingestion_task_spark.operators.knn import train_ivf_codebook
    from data_ingestion_task_spark.operators.pq_train import (
        collect_codebooks,
        scaled_sample_cap,
        train_pq_codebooks_df,
    )
    from data_ingestion_task_spark.plans._vector_shared import DIM, _split
    from data_ingestion_task_spark.plans.ivfpq_trained_plans import (
        _D_SUB,
        _M,
        _N_CODES,
        _N_PROBE,
        _OVERSCAN,
        _ROUNDS,
        _SAMPLE,
        _SEED_MOD,
    )
    from data_ingestion_task_spark.functions.text import hash64
    from data_ingestion_task_spark.session import get_spark

    spark = get_spark("profile-trained")
    marks: list[tuple[str, float]] = []
    t0 = time.time()

    def mark(label: str) -> None:
        marks.append((label, round(time.time() - t0, 3)))
        print(f"{marks[-1][1]:8.3f}s  {label}", flush=True)

    # warmup (same as bench.py)
    q, x = _split(spark, args.sf_dir)
    x = x.select("neighbor_id", "embedding")
    x.count()

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    ncpu = spark.sparkContext.defaultParallelism
    spark.range(ncpu * 8).repartition(ncpu * 2).mapInPandas(_warm, "id long").count()
    mark("warmup done")

    # Two iterations: iteration 1 pays JIT/codegen warmup (a first
    # execution of this query costs ~3-4x steady state); iteration 2
    # is the phase split that matches the bench's min-of-N numbers.
    for it in (1, 2):
        t0 = time.time()
        marks.clear()

        if args.scaled:
            from data_ingestion_task_spark.operators.ivf_train import (
                train_ivf_codebook_blas,
            )

            cap = scaled_sample_cap(x.count(), seed_mod=_SEED_MOD, floor=_SAMPLE)
            trainer = train_ivf_codebook_blas
            mark(f"cap derivation (cap={cap})")
        else:
            cap = _SAMPLE
            trainer = train_ivf_codebook

        h = hash64(F.concat(F.lit("ivfpqsmp:"), F.col("neighbor_id").cast("string")))
        smp = x.orderBy(h.asc(), F.col("neighbor_id").asc()).limit(cap).persist()
        smp.count()
        mark("sample persisted")

        # mirror _trained_lifecycle's sample-scoped shuffle width
        from data_ingestion_task_spark.plans.ivfpq_trained_plans import (
            _sample_shuffle_partitions,
        )

        _sp_key = "spark.sql.shuffle.partitions"
        _sp_old = spark.conf.get(_sp_key)
        spark.conf.set(_sp_key, str(_sample_shuffle_partitions(cap, DIM)))
        try:
            cb = trainer(smp, seed_mod=_SEED_MOD, rounds=_ROUNDS).persist()
            nlist = cb.count()
            mark(f"coarse trainer materialized (nlist={nlist})")

            books = collect_codebooks(
                train_pq_codebooks_df(smp, dim=DIM, m=_M, n_codes=_N_CODES, rounds=_ROUNDS),
                _M,
                _N_CODES,
                _D_SUB,
            )
            mark("pq trainer collected")
        finally:
            spark.conf.set(_sp_key, _sp_old)

        res = knn_join_ivfpq(
            x,
            q.select("query_id", "embedding"),
            k=3,
            n_probe=_N_PROBE,
            overscan=_OVERSCAN,
            codebook=cb,
            codebooks=books,
            broadcast_queries=True,
        )
        out = res.select(
            "query_id",
            F.col("rank").alias("rnk"),
            "neighbor_id",
            F.round("sim", 9).alias("sim"),
        ).orderBy("query_id", "rnk")
        mark("search plan built (build actions done)")

        # bench.py sums raw xxhash64 (ANSI long overflow is possible in
        # principle but has never fired across r01-r12 bench runs); the
        # profiler mods the hash down so repeated profiling runs can't
        # die on an unlucky partial-sum ordering — same full
        # materialization, different checksum.
        out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(*[F.col(c) for c in out.columns]) % F.lit(1_000_000_007)
            ).alias("chk"),
        ).collect()
        mark("search materialized")
        print({"iteration": it, "phases": marks})
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
