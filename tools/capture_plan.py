"""Capture .explain("formatted") for named registered queries into
plans/r12/<query>_<tag>.txt (the optimization-round evidence files).

    python tools/capture_plan.py --tag before NAME [NAME ...]

Note: queries that execute internal actions (audits, lifecycle
trainers) run those actions during plan construction; the captured
plan covers the returned DataFrame (the final search/aggregate stage).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-dir", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from data_ingestion_task_spark.plans import registry
    from data_ingestion_task_spark.session import get_spark

    spark = get_spark("capture-plan")
    qs = registry.queries_dict()
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
