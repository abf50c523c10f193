"""Training-shard writer: the executable form of the
``corpus_shard_manifest`` query's ordering contract (plans/
corpus_plans.py). A training run wants the whole corpus in a
reproducible pseudo-random global order, re-shuffled per epoch —
WITHOUT ever paying a global sort.

The order is (shard_id, order_key), both deterministic hashes of the
document id, so the writer is one hash projection + one ``n_shards``-ary
exchange + a partition-local sort:

- ``partitionBy(shard_id)`` → one directory per shard,
- ``repartition(n_shards, shard_id)`` before the write → exactly one
  task (hence one file) per shard,
- ``sortWithinPartitions(shard_id, order_key)`` → every shard file is
  internally ordered.

A reader streams shard dirs in shard_id order and rows arrive in the
global training order. Epoch re-shuffles salt ONLY ``order_key``
(``epoch`` parameter), so shard MEMBERSHIP — and therefore any
per-shard caching/placement — is stable across epochs; only the
within-shard order changes. At 100 TB the one exchange here replaces
the full-corpus ordering sort a naive ``orderBy(rand())`` would plan
(a single-partition catastrophe), and the per-shard files are
independently resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64

N_SHARDS_DEFAULT = 64

#: Salt schemes shared with plans/corpus_plans.corpus_shard_manifest —
#: the manifest's reported key ranges must match what this writer
#: materializes, so both build keys through these helpers / the same
#: literal strings in the manifest's SQL oracle.
SHARD_SALT = "shard:"


def order_salt(epoch: int) -> str:
    return f"order:e{epoch}:"


def shard_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = N_SHARDS_DEFAULT,
    epoch: int = 0,
) -> DataFrame:
    """Add deterministic ``shard_id`` and ``order_key`` columns.

    ``shard_id`` is epoch-independent (stable membership);
    ``order_key`` is salted with the epoch so every epoch is a fresh
    global permutation at zero data movement."""
    sid = F.col(id_col).cast("string")
    return df.withColumn(
        "shard_id", hash64(F.concat(F.lit(SHARD_SALT), sid)) % n_shards
    ).withColumn(
        "order_key", hash64(F.concat(F.lit(order_salt(epoch)), sid))
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    n_shards: int = N_SHARDS_DEFAULT,
    epoch: int = 0,
) -> None:
    """Write ``df`` as ``out_dir/shard_id=K/`` parquet, one internally
    ordered file per shard (see module docstring for the contract)."""
    keyed = shard_keys(df, id_col, n_shards, epoch)
    (
        keyed.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "order_key")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )


def read_shard(spark: SparkSession, out_dir: str, shard_id: int) -> DataFrame:
    """One shard, rows in training order (single file per shard by
    construction, so file row order IS the order; a defensive sort
    would also be partition-local and cheap)."""
    return spark.read.parquet(f"{out_dir}/shard_id={shard_id}")
