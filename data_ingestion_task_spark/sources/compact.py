"""Small-file compaction for parquet sink outputs (the operational
tail of SURVEY §2.10's streaming design): every micro-batch of the
idempotent ``batch_id=N``-keyed document sink (streaming/ingest.py)
writes its own directory of small files; at production cadence that
is thousands of files/day whose per-file open/footer cost eventually
dominates scans. This module rewrites a sink directory into
size-targeted files with a two-rename swap, preserving contents AND
partition layout exactly.

Layout preservation (ADVICE r3, medium): a ``batch_id=N``-partitioned
sink is rewritten WITH ``partitionBy(batch_id)`` — compaction merges
the small files *within* each batch directory (one file per batch
after), never flattens them. That keeps the sink's overwrite-replay
idempotency intact: a checkpoint replay of batch K overwrites
``batch_id=K/`` exactly as before, and new batches append new
partition dirs into a layout Spark's partition discovery still
accepts. A directory that already mixes flat files with partition
dirs is rejected loudly (that state is unreadable by Spark anyway).

Swap semantics, honestly stated: the swap is two renames
(``path → path.__compact_old__``, then ``tmp → path``), so a reader
that lists the path between them sees a transiently MISSING directory
(retry-safe), never a half-written mix of old and new files. A crash
in that window is repaired automatically by the next
``compact_parquet_dir`` call (the ``.__compact_old__`` dir is renamed
back). Renames are atomic on HDFS/local-fs; on S3A a rename is a
non-atomic copy — front S3 sinks with a manifest/table format instead
of relying on this swap.

Scale notes: the rewrite is one Spark job (scan → hash-repartition on
the partition key → write) sized by the directory's actual bytes.
Compaction is idempotent — re-running on a compacted directory is a
no-op.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return jvm, fs, hpath


def _is_data_file(name: str) -> bool:
    return not (name.startswith("_") or name.startswith("."))


def dir_stats(spark: SparkSession, path: str) -> dict:
    """Recursive (n_files, total_bytes) for a sink directory —
    the signal that decides whether compaction is worth a rewrite."""
    jvm, fs, hpath = _hadoop_fs(spark, path)
    n_files = 0
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        if not _is_data_file(st.getPath().getName()):
            continue  # _SUCCESS, checksums, hidden
        n_files += 1
        total += st.getLen()
    return {"n_files": n_files, "total_bytes": total}


def _layout(spark: SparkSession, path: str) -> tuple[list[str], int]:
    """(partition_cols, n_leaf_dirs) of a parquet directory, derived
    from the physical layout: partition columns are the ``col=value``
    segments on every data file's path; n_leaf_dirs counts distinct
    directories holding data files (the best file count a
    layout-preserving compaction can reach is one per leaf).

    Raises ValueError on a mixed flat-file + partition-dir layout —
    Spark's partition discovery rejects that state too, so failing
    here with a recovery hint beats failing inside the scan."""
    jvm, fs, hpath = _hadoop_fs(spark, path)
    root = fs.getFileStatus(hpath).getPath().toString()
    parents: set[str] = set()
    col_shapes: set[tuple[str, ...]] = set()
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        if not _is_data_file(p.getName()):
            continue
        parent = p.getParent()
        parents.add(parent.toString())
        segs: list[str] = []
        q = parent
        while q is not None and q.toString() != root:
            seg = q.getName()
            if "=" in seg:
                segs.append(seg.split("=", 1)[0])
            q = q.getParent()
        col_shapes.add(tuple(reversed(segs)))
    if len(col_shapes) > 1:
        raise ValueError(
            f"mixed partition layouts under {path}: {sorted(col_shapes)} — "
            "a flat file and a col=value dir cannot coexist (Spark partition "
            "discovery rejects it); finish or recover the sink before compacting"
        )
    cols = list(col_shapes.pop()) if col_shapes else []
    return cols, len(parents)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite ``path`` (a parquet directory, including partitioned
    ``batch_id=N`` sink layouts) into fewer, size-targeted files and
    swap it in (see module docstring for the exact swap/replay
    semantics). Returns an audit dict; a no-op (already few enough
    files) returns ``{"compacted": False, ...}``.

    Partitioned layouts are preserved: files merge within each
    partition directory (one file per leaf after), so the sink's
    batch-replay overwrite contract survives compaction."""
    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    jvm0, fs0, _ = _hadoop_fs(spark, path)
    P0 = jvm0.org.apache.hadoop.fs.Path
    # Repair a crash between the two swap renames (live path missing,
    # original parked at .__compact_old__): restore the original —
    # the half-finished tmp is deleted just below and rebuilt.
    if not fs0.exists(P0(path)) and fs0.exists(P0(old)):
        if not fs0.rename(P0(old), P0(path)):
            raise IOError(f"crash recovery failed renaming {old} -> {path}")
    # Clear leftovers of a previously crashed compaction: a stale tmp
    # is garbage (rewrite it), a stale old is a completed swap whose
    # cleanup died (the live dir is already the compacted one).
    for stale in (tmp, old):
        if fs0.exists(P0(stale)):
            fs0.delete(P0(stale), True)

    stats = dir_stats(spark, path)
    part_cols, n_leaf = _layout(spark, path)
    n_target = max(1, math.ceil(stats["total_bytes"] / target_file_bytes))
    # A layout-preserving rewrite can't go below one file per leaf
    # partition dir, so that's the no-op floor for partitioned sinks.
    floor_files = n_leaf if part_cols else n_target
    if stats["n_files"] < max(min_files_to_compact, floor_files + 1):
        return {
            "compacted": False,
            "n_target": n_target,
            "partition_cols": part_cols,
            **stats,
        }

    df = spark.read.parquet(path)
    if part_cols:
        # Hash-repartition on the partition key: every key lands whole
        # in one task, so each leaf dir gets exactly one output file
        # (n_target tasks bound the write parallelism, not file count).
        (
            df.repartition(n_target, *[F.col(c) for c in part_cols])
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(tmp)
        )
    else:
        # repartition (full shuffle) rather than coalesce: coalesce
        # would fuse upstream scan tasks and can skew file sizes badly
        # when the input layout is skewed — the point of this job IS
        # even sizing.
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
        "partition_cols": part_cols,
        "files_before": stats["n_files"],
        "bytes_before": stats["total_bytes"],
        "files_after": after["n_files"],
        "bytes_after": after["total_bytes"],
    }
