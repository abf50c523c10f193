"""Cross-engine parity for the IVF-PQ join: the full pipeline
(id-residue centroids → coarse assignment → PQ encode → ADC shortlist
→ exact re-rank) must match a DuckDB reconstruction BIT-FOR-BIT —
every sim, every rank, every tie-break. This is the r7 registration's
oracle, proven ahead of time (the trained codebooks are inlined as
exact float64 literals, so the SQL twin is a pure function of the
same parquet bytes)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_ingestion_task_spark.operators.ivfpq import (
    duckdb_ivfpq_sql,
    knn_join_ivfpq,
)
from data_ingestion_task_spark.operators.pq import train_pq_codebooks

K, N_PROBE, OVERSCAN, CMOD = 3, 2, 8, 25


def test_ivfpq_matches_duckdb_bit_for_bit(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    x = e.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    books = train_pq_codebooks(x, m=8, n_codes=16)

    res = knn_join_ivfpq(
        x, q, k=K, n_probe=N_PROBE, overscan=OVERSCAN,
        centroid_mod=CMOD, codebooks=books,
    )
    sp = sorted(
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
        for r in res.collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW emb AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    sql = duckdb_ivfpq_sql(
        books, k=K, centroid_mod=CMOD, n_probe=N_PROBE, overscan=OVERSCAN
    )
    du = sorted((r[0], r[1], r[2], r[3]) for r in con.execute(sql).fetchall())

    assert len(sp) > 0
    assert sp == du  # bit-exact: sims, ranks, and tie-breaks


def test_ivfpq_oracle_rejects_untested_subspace_width():
    # the parity contract documents d_sub <= 8 (numpy's sequential
    # reduction base case); wider subspaces must re-verify before use —
    # the builder still emits SQL, this pins that the docstring carries
    # the caveat rather than silently promising parity
    assert "pairwise" in duckdb_ivfpq_sql.__doc__


def test_ivfpq_derived_codebooks_match_duckdb(spark, sf_dir):
    # the r7 registration shape: md5-derived codebooks need no
    # SparkSession, so the oracle string is static — and the full
    # pipeline must still be bit-exact across engines
    from data_ingestion_task_spark.operators.ivfpq import derive_codebooks

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    x = e.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    dim = len(x.select("embedding").first()[0])
    books = derive_codebooks(dim, m=8, n_codes=16)
    # regeneration is deterministic (no RNG, no data)
    import numpy as np

    np.testing.assert_array_equal(books, derive_codebooks(dim, m=8, n_codes=16))

    res = knn_join_ivfpq(
        x, q, k=K, n_probe=N_PROBE, overscan=OVERSCAN,
        centroid_mod=CMOD, codebooks=books,
    )
    sp = sorted(
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
        for r in res.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW emb AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    sql = duckdb_ivfpq_sql(
        books, k=K, centroid_mod=CMOD, n_probe=N_PROBE, overscan=OVERSCAN
    )
    du = sorted((r[0], r[1], r[2], r[3]) for r in con.execute(sql).fetchall())
    assert len(sp) > 0
    assert sp == du
