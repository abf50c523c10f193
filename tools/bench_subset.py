"""Targeted A/B bench: time a named subset of registered queries with
optional extra Spark conf, using bench.py's exact materialization
(xxhash64-checksum aggregate) and min-of-N discipline.

    python tools/bench_subset.py [--repeats 2] [--conf k=v ...] NAME [NAME ...]

Prints one JSON line {"queries": {name: sec}, "total": sec, "conf": {...}}.
Runs in its own process so conf changes apply to a fresh session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    extra = dict(kv.split("=", 1) for kv in args.conf)

    from pyspark.sql import functions as F

    from data_ingestion_task_spark.plans import registry
    from data_ingestion_task_spark.session import get_spark

    spark = get_spark("bench-subset", extra_conf=extra)
    qs = registry.queries_dict()
    missing = [n for n in args.names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    def materialize(df) -> None:
        df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
        ).collect()

    # Same warmup as bench.py: JVM + parquet footers + python workers.
    materialize(qs["pricing_summary"](spark, args.sf_dir))

    def _warm_workers(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    ncpu = spark.sparkContext.defaultParallelism
    spark.range(ncpu * 8).repartition(ncpu * 2).mapInPandas(
        _warm_workers, "id long"
    ).count()

    samples: dict[str, list[float]] = {}
    for _ in range(args.repeats):
        for name in args.names:
            t0 = time.time()
            materialize(qs[name](spark, args.sf_dir))
            dt = round(time.time() - t0, 3)
            spark.catalog.clearCache()
            samples.setdefault(name, []).append(dt)
    times = {n: min(s) for n, s in samples.items()}
    out = {
        "conf": extra,
        "repeats": args.repeats,
        "queries": times,
        "all_samples": samples,
        "total": round(sum(times.values()), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
