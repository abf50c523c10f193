"""Product quantization (PQ) for the broadcast-kNN path — the memory
lever that raises :func:`~.knn.knn_join_exact`'s index ceiling ~32×:
instead of broadcasting N × dim float64 vectors, the index is encoded
as N × m uint8 codes against m per-subspace codebooks (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 — the
same scheme behind FAISS ``IndexIVFPQ``; the reference never got past
the flat index, ``Faiss_2_10.py:70-79``).

Division of labor, Spark-first:
- ``train_pq_codebooks`` — k-means per subspace on a deterministic
  SAMPLE of the index, driver-side numpy (PQ training is sample-based
  by construction; the sample is gated).
- ``pq_encode`` — distributed Arrow stage: each vector → m nearest
  subspace-centroid codes. Linear in N, no shuffle.
- ``knn_join_pq`` — collect the CODES (m bytes/vector instead of
  8·dim), broadcast them with the codebooks, and scan queries through
  an Arrow stage that builds each query's m×n_codes dot-product table
  and scores all index codes via numpy table lookup (ADC —
  asymmetric distance computation). Top ``k·overscan`` candidates per
  query then get an exact JVM-side re-rank, so final scores are true
  cosines on an approximate candidate set; recall is tuned by
  ``overscan`` (and honestly reported by the same audit pattern as
  LSH/IVF).

The size gate rides the code collect exactly like
``candidate_pairs_vectorized``'s: ``BroadcastIndexTooLarge`` past
``max_index_rows`` (default 32× the float ceiling — the point of PQ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot
from .knn import DEFAULT_MAX_INDEX_ROWS, BroadcastIndexTooLarge, normalize_embeddings

PQ_MAX_INDEX_ROWS = DEFAULT_MAX_INDEX_ROWS * 32


def train_pq_codebooks(
    index_df: DataFrame,
    index_id: str = "neighbor_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    rounds: int = 3,
    sample_mod: int = 1,
    max_sample_rows: int = 100_000,
):
    """Per-subspace k-means codebooks from a deterministic index
    sample (``index_id % sample_mod == 0``, CAPPED at
    ``max_sample_rows`` — the cap truncates, it never raises: PQ
    training is sample-based by construction and 100k vectors
    saturate 16-256 centroids per subspace): returns a numpy array of
    shape ``(m, n_codes, dim//m)``. Init is the first ``n_codes``
    sample vectors in id order (deterministic); Lloyd updates keep an
    empty cluster's previous centroid. Vectors are L2-normalized
    first, so ADC approximates cosine."""
    import numpy as np

    if n_codes > 256:
        raise ValueError(
            f"n_codes={n_codes} > 256 cannot be stored as uint8 codes"
        )
    sample = (
        normalize_embeddings(index_df, vec_col)
        .filter(F.col(index_id) % sample_mod == 0)
        .orderBy(index_id)
        .limit(max_sample_rows)
        .select(index_id, vec_col)
        .collect()
    )
    if not sample:
        # An empty matrix has no second shape axis, so the unpack
        # below would raise an unrelated-looking error; name the
        # actual problem instead.
        raise ValueError(f"sample of 0 rows < n_codes={n_codes}")
    mat = np.array([list(r[1]) for r in sample], dtype=np.float64)
    n, dim = mat.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    if n < n_codes:
        raise ValueError(f"sample of {n} rows < n_codes={n_codes}")
    d_sub = dim // m
    books = np.empty((m, n_codes, d_sub), dtype=np.float64)
    for j in range(m):
        sub = mat[:, j * d_sub : (j + 1) * d_sub]
        cent = sub[:n_codes].copy()
        for _ in range(rounds):
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
            d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if members.size:
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "neighbor_id",
    vec_col: str = "embedding",
    carry_cols: tuple[str, ...] = (),
    prenormalized: bool = False,
) -> DataFrame:
    """Distributed PQ encoding: ``(id, codes array<int>[, carry...])``
    with ``codes[j]`` = nearest centroid of subspace ``j`` (L2, ties to
    the lowest code — numpy argmin). One narrow Arrow stage, linear in
    N. ``carry_cols`` ride through unchanged (e.g. a coarse-cell id),
    saving the caller an N-row self-join to reattach them;
    ``prenormalized=True`` skips the L2 normalize for callers whose
    vectors are already unit (saves a full-corpus transform pass)."""
    import numpy as np

    ndf = df if prenormalized else normalize_embeddings(df, vec_col)
    ndf = ndf.select(id_col, vec_col, *carry_cols)
    m, n_codes, d_sub = codebooks.shape
    bc = df.sparkSession.sparkContext.broadcast(np.ascontiguousarray(codebooks))

    def enc(batches):
        import numpy as np
        import pandas as pd

        books = bc.value
        csq = (books * books).sum(axis=2)  # (m, n_codes)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(pdf), books.shape[0]), dtype=np.int64)
            for j in range(books.shape[0]):
                sub = vm[:, j * d_sub : (j + 1) * d_sub]
                d2 = csq[j][None, :] - 2.0 * (sub @ books[j].T)
                codes[:, j] = d2.argmin(axis=1)
            out = {id_col: pdf[id_col], "codes": list(codes)}
            for c in carry_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    carry_schema = "".join(
        f", {c} {ndf.schema[c].dataType.simpleString()}" for c in carry_cols
    )
    return ndf.mapInPandas(enc, f"{id_col} long, codes array<long>{carry_schema}")


def knn_join_pq(
    index_df: DataFrame,
    query_df: DataFrame,
    k: int,
    m: int = 8,
    n_codes: int = 16,
    overscan: int = 8,
    query_id: str = "query_id",
    index_id: str = "neighbor_id",
    vec_col: str = "embedding",
    max_index_rows: int = PQ_MAX_INDEX_ROWS,
    codebooks=None,
) -> DataFrame:
    """Approximate top-k via a PQ-compressed broadcast index with
    exact re-rank: train (or take) codebooks, encode the index
    distributed, collect/broadcast only the CODES, ADC-score each
    query batch against all codes, keep ``k·overscan`` candidates,
    then re-rank those exactly JVM-side. Output schema matches
    :func:`~.knn.knn_join_exact`: (query_id, neighbor_id, sim, rank),
    with true cosine sims — only WHICH candidates surface is
    approximate; recall tunes via ``overscan``/``n_codes``."""
    import numpy as np
    from pyspark.sql.window import Window

    from .knn import require_integral_ids

    require_integral_ids("knn_join_pq", (index_df, index_id), (query_df, query_id))
    if codebooks is None:
        codebooks = train_pq_codebooks(
            index_df, index_id, vec_col, m=m, n_codes=n_codes
        )
    m, n_codes, d_sub = codebooks.shape

    # Gate rides the collect (limit cap+1, same-job overflow check),
    # and the collect itself ships per-batch PACKED blobs — raw int64
    # ids + uint8 codes bytes, a handful of rows total — so driver
    # memory tracks the compact numpy arrays (~9 bytes/vector at m=8),
    # not millions of Row objects.
    def pack(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            pids = pdf[index_id].to_numpy(dtype=np.int64)
            pcodes = np.array(list(pdf["codes"]), dtype=np.uint8)
            yield pd.DataFrame(
                {
                    "ids": [pids.tobytes()],
                    "codes": [pcodes.tobytes()],
                    "n": [len(pdf)],
                }
            )

    blobs = (
        pq_encode(index_df, codebooks, index_id, vec_col)
        .limit(max_index_rows + 1)
        .mapInPandas(pack, "ids binary, codes binary, n long")
        .collect()
    )
    total = sum(r["n"] for r in blobs)
    if total > max_index_rows:
        raise BroadcastIndexTooLarge(total, max_index_rows)
    if total == 0:
        # Caller-supplied codebooks + an empty index would reach ADC's
        # argpartition on a zero-row code matrix (cryptic executor-side
        # numpy error). An empty index legitimately has zero
        # neighbors: return the empty result with the standard
        # (query_id, neighbor_id, sim, rank) schema.
        spark = query_df.sparkSession
        return spark.createDataFrame(
            [], f"{query_id} long, {index_id} long, sim double, rank bigint"
        )
    ids = np.frombuffer(b"".join(r["ids"] for r in blobs), dtype=np.int64)
    codes = np.frombuffer(b"".join(r["codes"] for r in blobs), dtype=np.uint8).reshape(
        -1, m
    )
    spark = query_df.sparkSession
    bc = spark.sparkContext.broadcast((ids, codes, np.ascontiguousarray(codebooks)))

    qn = normalize_embeddings(query_df, vec_col).select(query_id, vec_col)
    n_cand = max(k * overscan, k)

    def adc(batches):
        import numpy as np
        import pandas as pd

        bids, bcodes, books = bc.value
        mm, nc, ds = books.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = np.array(list(pdf[vec_col]), dtype=np.float64)
            qids = pdf[query_id].to_numpy()
            # per-query dot tables: (Q, m, n_codes)
            tables = np.einsum(
                "qjd,jcd->qjc", qm.reshape(len(pdf), mm, ds), books
            )
            out_q, out_n = [], []
            for i in range(len(pdf)):
                sims = np.zeros(bcodes.shape[0])
                for j in range(mm):
                    sims += tables[i, j][bcodes[:, j]]
                take = min(n_cand, sims.size)
                top = np.argpartition(-sims, take - 1)[:take]
                out_q.append(np.full(take, qids[i], dtype=np.int64))
                out_n.append(bids[top])
            yield pd.DataFrame(
                {
                    query_id: np.concatenate(out_q),
                    index_id: np.concatenate(out_n),
                }
            )

    cand = qn.mapInPandas(adc, f"{query_id} long, {index_id} long")
    xn = normalize_embeddings(index_df, vec_col).select(
        index_id, F.col(vec_col).alias("_xv")
    )
    qv = qn.select(query_id, F.col(vec_col).alias("_qv"))
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(index_id))
    return (
        cand.join(qv, query_id)
        .join(xn, index_id)
        .select(query_id, index_id, dot(F.col("_qv"), F.col("_xv")).alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
