"""Bucketed-table layout for shuffle-free co-located joins (SURVEY §7
step 10 scale hardening; SCALE.md §1/§8).

At 100 TB the recurring joins are on stable keys (pages⋈docs and
preds⋈GT on ``doc_id``/``fn``, events⋈users on ``user_id``). Writing
both sides bucketed by that key with the same bucket count lets every
such join (and groupBy on the key) run with ZERO exchanges — the
shuffle is paid once at write time, then amortized over every
downstream query. This is Spark's native bucketing (`bucketBy` +
`saveAsTable`), so Catalyst plans the join shuffle-free automatically;
nothing custom runs at read time.

Local note: the driver testdata is plain parquet files; bucketing
needs a metastore-backed table, so these helpers target the session
warehouse dir. Tests prove the plan property (no ShuffleExchange in
the joined plan) rather than a timing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Joins/aggregations on ``bucket_col`` between tables written
    with the SAME ``n_buckets`` are planned without exchanges; the
    in-bucket sort additionally removes the join's sort step.

    Overwrites are idempotent ACROSS sessions: a warehouse directory
    left by a previous session is invisible to this session's
    in-memory catalog, and ``saveAsTable`` refuses to adopt the
    location (LOCATION_ALREADY_EXISTS) — so stale state is dropped
    from both catalog and filesystem first. That cleanup derives the
    location as ``<warehouse>/<name>`` — correct only for UNQUALIFIED
    names (``db.tbl`` lives at ``<warehouse>/<db>.db/<tbl>``), so
    qualified or non-identifier names are rejected up front rather
    than recursively deleting a wrong path (ADVICE r5 #2)."""
    if mode == "overwrite":
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
            raise ValueError(
                f"write_bucketed overwrite supports only unqualified "
                f"identifier table names, got {table!r}: the stale-location "
                f"cleanup resolves <warehouse>/<name>, which is wrong for "
                f"db-qualified names and unsafe for arbitrary strings"
            )
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir")
        jvm = spark._jvm
        # Path(parent, child) keeps the delete target pinned under the
        # warehouse dir; the identifier check above rules out
        # separators/'..' in the child.
        p = jvm.org.apache.hadoop.fs.Path(
            jvm.org.apache.hadoop.fs.Path(wh), table.lower()
        )
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(p):
            fs.delete(p, True)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True when the physical plan contains a shuffle exchange —
    the property bucketed joins must NOT have."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan
