"""Headline benchmark: run the registered queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Each query is fully materialized (count + light checksum collect) so
the measured time includes the whole plan, not lazy construction.
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

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not session startup.
    t_warm = time.time()
    qs["pricing_summary"](spark, sf_dir).count()
    warmup = time.time() - t_warm

    times: dict[str, float] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        _ = n

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
