"""Headline benchmark: run the registered queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Each query is FULLY materialized: a JVM-side xxhash64 checksum over
every output column forces Spark to compute the entire result (a bare
count() would let Catalyst prune the expensive computed columns and
under-measure), while returning only one scalar to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_ingestion_task_spark.plans import registry
    from data_ingestion_task_spark.session import get_spark

    spark = get_spark("bench")
    qs = registry.queries_dict()

    from pyspark.sql import functions as F

    def materialize(df) -> int:
        """Force full computation of every column; one scalar back."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
        ).collect()[0]
        return row["n"]

    # Warm the JVM + parquet footers + Python worker pool once so
    # per-query numbers measure the plan, not session startup (the
    # first mapInPandas stage otherwise pays ~10s forking 32 workers
    # that each import pandas/numpy).
    t_warm = time.time()
    materialize(qs["pricing_summary"](spark, sf_dir))

    def _warm_workers(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    ncpu = spark.sparkContext.defaultParallelism
    spark.range(ncpu * 8).repartition(ncpu * 2).mapInPandas(
        _warm_workers, "id long"
    ).count()
    warmup = time.time() - t_warm

    # Two passes, per-query minimum: isolated profiling shows every
    # query stable, but this VM occasionally stalls 10-40s at random
    # points; min-of-2 keeps one stall from misattributing cost to
    # whichever query it landed on.
    times: dict[str, float] = {}
    for _pass in range(2):
        for name, fn in sorted(qs.items()):
            t0 = time.time()
            n = materialize(fn(spark, sf_dir))
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
            _ = n
            # Queries are self-contained; drop any cache a query
            # persisted for intra-query reuse so later measurements
            # don't absorb eviction/GC from accumulated state.
            spark.catalog.clearCache()

    total = round(sum(times.values()), 3)
    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)
    print(
        json.dumps(
            {
                "metric": "total_query_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "n_queries": len(times),
                "warmup_sec": round(warmup, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
