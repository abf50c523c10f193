"""Small-file compaction for parquet sink outputs (the operational
tail of SURVEY §2.10's streaming design): every micro-batch of the
idempotent ``batch_id=N``-keyed document sink (streaming/ingest.py)
writes its own directory of small files; at production cadence that
is thousands of files/day whose per-file open/footer cost eventually
dominates scans. This module rewrites a sink directory into
size-targeted files with an atomic swap, preserving contents exactly.

Scale notes: the rewrite is one Spark job (scan → repartition →
write) sized by the directory's actual bytes; the swap is two
filesystem renames through the Hadoop FileSystem API, so it works on
HDFS/S3A-with-consistent-rename the same as on local disk. Readers
racing the swap see either the old or the new directory, never a
mix. Compaction is idempotent — re-running on a compacted directory
is a no-op rewrite into the same target count.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return jvm, fs, hpath


def dir_stats(spark: SparkSession, path: str) -> dict:
    """Recursive (n_files, total_bytes) for a sink directory —
    the signal that decides whether compaction is worth a rewrite."""
    jvm, fs, hpath = _hadoop_fs(spark, path)
    n_files = 0
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden
        n_files += 1
        total += st.getLen()
    return {"n_files": n_files, "total_bytes": total}


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite ``path`` (a parquet directory, including partitioned
    ``batch_id=N`` sink layouts) into ``ceil(bytes/target)`` files and
    atomically swap it in. Returns an audit dict; a no-op (already few
    enough files) returns ``{"compacted": False, ...}``.

    The partition provenance column (e.g. ``batch_id``) survives as a
    normal column in the compacted data — compaction consolidates the
    LAYOUT, never drops data."""
    stats = dir_stats(spark, path)
    n_target = max(1, math.ceil(stats["total_bytes"] / target_file_bytes))
    if stats["n_files"] < max(min_files_to_compact, n_target + 1):
        return {"compacted": False, "n_target": n_target, **stats}

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    # Clear leftovers of a previously crashed compaction: a stale tmp
    # is garbage (rewrite it), a stale old is a completed swap whose
    # cleanup died (the live dir is already the compacted one).
    jvm0, fs0, _ = _hadoop_fs(spark, path)
    P0 = jvm0.org.apache.hadoop.fs.Path
    for stale in (tmp, old):
        if fs0.exists(P0(stale)):
            fs0.delete(P0(stale), True)
    # repartition (full shuffle) rather than coalesce: coalesce would
    # fuse upstream scan tasks and can skew file sizes badly when the
    # input layout is skewed — the point of this job IS even sizing.
    df.repartition(n_target).write.mode("overwrite").parquet(tmp)

    jvm, fs, _ = _hadoop_fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    for a, b in ((path, old), (tmp, path)):
        if not fs.rename(P(a), P(b)):
            raise IOError(f"compaction swap failed renaming {a} -> {b}")
    fs.delete(P(old), True)
    after = dir_stats(spark, path)
    return {
        "compacted": True,
        "n_target": n_target,
        "files_before": stats["n_files"],
        "bytes_before": stats["total_bytes"],
        "files_after": after["n_files"],
        "bytes_after": after["total_bytes"],
    }
