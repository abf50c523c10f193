"""IVF-PQ approximate kNN — the composition that completes the ANN
ladder (exact → PQ → LSH → IVF → **IVF-PQ**), and the canonical
billion-vector layout (FAISS ``IndexIVFPQ``; the reference's flat
``IndexFlatIP`` sits at the ladder's exact end,
`code/python/Faiss_2_10.py:70-146`).

Why it exists when :mod:`knn` already has IVF and :mod:`pq` has PQ:

- ``knn_join_ivf``'s cell equi-join ships the FULL dim-double vector
  for every index row through the shuffle — at 100 TB the inverted
  lists ARE the corpus.
- ``knn_join_pq`` broadcasts the whole code matrix to every executor —
  capped at ~32M rows by driver/executor memory.

IVF-PQ keeps the big side distributed AND narrow: the shuffled
inverted-list representation is ``(centroid_id, id, m codes)`` — for
a 64-dim float64 corpus at ``m=8`` that is ~8× fewer bytes per row
than IVF's raw vectors (cast the codes to a binary sink column for
another 8× at rest) — while only the centroid codebook and the PQ
codebooks (both tiny) are broadcast. Per query, only ``n_probe``
cells' codes are ADC-scored, and an optional exact re-rank restores
true-cosine precision for the surfaced top-k.

Semantics: PQ codes encode the L2-NORMALIZED vectors directly (the
``by_residual=False`` flavor of FAISS IVFPQ) — one global codebook
instead of per-cell residual codebooks keeps training sample-sized
and the encode stage a single narrow Arrow pass.

Everything is deterministic: centroid choice and assignment tie-break
by id, PQ training is seeded by id order, ADC scores are fixed-order
float64 reductions, and both rank windows break ties by neighbor id.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import dot
from .knn import (
    _collect_centroids,
    _nearest_centroid,
    _probe_cells,
    normalize_embeddings,
    require_integral_ids,
)
from .pq import pq_encode, train_pq_codebooks


def derive_codebooks(dim: int, m: int = 8, n_codes: int = 16, salt: str = "ivfpq"):
    """md5-derived deterministic PQ codebooks — no training, no
    SparkSession: component ``i`` of code ``c`` in subspace ``j`` is
    ``±1/√dim`` by the parity of ``md5("{salt}:{j}:{c}:{i}")`` (the
    same trick as :func:`..knn.hyperplane`). Entry norms then sit at
    ``√(d_sub/dim)`` — the scale of an L2-normalized vector's
    subvectors — so ADC scores are meaningful without data-dependent
    training. Recall is below trained codebooks (the exact re-rank
    still surfaces true cosines); the point is a codebook any engine —
    and a STATIC ``oracle_sql()`` string — can regenerate bit-
    identically at import time, which is what lets the IVF-PQ pipeline
    register under the driver's correctness gate.

    Within a subspace the draw is WITHOUT replacement: a code whose
    sign pattern collides with an earlier code in the same subspace is
    deterministically re-drawn with an attempt counter appended to its
    md5 key (ADVICE r6 #5 — 16 unguarded draws from ``2^d_sub``
    patterns collide in some subspace with high probability at
    ``d_sub=8``, silently wasting codebook capacity). Non-colliding
    codes keep the attempt-0 values, so the fix only perturbs the
    entries that were duplicates."""
    import hashlib
    import math

    import numpy as np

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    d_sub = dim // m
    if n_codes > 2 ** d_sub:
        raise ValueError(
            f"n_codes={n_codes} distinct sign patterns impossible in a "
            f"{d_sub}-dim subspace (only {2 ** d_sub} exist)"
        )
    s = 1.0 / math.sqrt(dim)
    out = np.empty((m, n_codes, d_sub), dtype=np.float64)
    for j in range(m):
        seen: set[tuple[int, ...]] = set()
        for c in range(n_codes):
            attempt = 0
            while True:
                sfx = "" if attempt == 0 else f":r{attempt}"
                bits = tuple(
                    int(
                        hashlib.md5(
                            f"{salt}:{j}:{c}:{i}{sfx}".encode()
                        ).hexdigest()[:15],
                        16,
                    )
                    % 2
                    for i in range(d_sub)
                )
                if bits not in seen:
                    break
                attempt += 1
            seen.add(bits)
            out[j, c] = [s if b == 0 else -s for b in bits]
    return out


def duckdb_ivfpq_sql(
    codebooks,
    k: int,
    centroid_mod: int | str = 25,
    n_probe: int = 2,
    overscan: int = 8,
    emb_table: str = "emb",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: str = "vec_id % 5 = 0",
    extra_ctes: str = "",
    books_sql: str | None = None,
    cent_sql: str | None = None,
    pq_shape: tuple[int, int] | None = None,
) -> str:
    """DuckDB twin of :func:`knn_join_ivfpq` (same id-residue centroid
    set, coarse assignment, PQ encode, ADC shortlist, exact re-rank —
    every tie-break mirrored), with the trained ``codebooks`` inlined
    as exact float64 literals. Verified BIT-EXACT against the Spark
    operator at sf0.001 and sf0.01 (``tests/test_ivfpq_oracle.py``):
    numpy's encode (``csq − 2·sub@books.T``) and einsum ADC reduce
    sequentially at these subspace widths (d_sub ≤ 8 sits inside
    numpy's unrolled reduction base case), matching DuckDB's
    ``list_dot_product`` fold — re-verify the parity test before
    raising d_sub past ~64, where numpy switches to pairwise
    summation. Returns rows ``(qid, nid, sim, rank)``.

    ``centroid_mod="isqrt"`` emits a ``cmod`` CTE computing
    ``GREATEST(25, n // isqrt(n))`` over the index side (the exact
    integer-sqrt idiom shared with ``ann_ivf_topk``'s oracle), so the
    static string stays correct while nlist ≈ √N tracks the data —
    the registration shape.

    TRAINED-artifact twins (``ivfpq_trained_topk``): ``extra_ctes``
    is spliced into the WITH chain right after ``qn`` (it may
    reference ``xn``/``qn``; DuckDB resolves forward CTE references,
    so order within the chain is free), ``books_sql`` replaces the
    inlined VALUES codebooks with a SELECT yielding ``(j, code, cv)``
    (pass ``pq_shape=(m, d_sub)`` since there is no numpy array to
    read the shape from), and ``cent_sql`` replaces the id-residue
    centroid set with a SELECT yielding ``(cid, cv)``."""
    import numpy as np

    if books_sql is None:
        books = np.ascontiguousarray(codebooks, dtype=np.float64)
        m, nc, ds = books.shape
        vals = ",".join(
            f"({j},{c},[{','.join(repr(float(v)) for v in books[j][c])}])"
            for j in range(m)
            for c in range(nc)
        )
        books_cte = f"books(j, code, cv) AS (VALUES {vals})"
    else:
        if pq_shape is None:
            raise ValueError("books_sql requires pq_shape=(m, d_sub)")
        m, ds = pq_shape
        books_cte = f"books AS ({books_sql})"
    extra = f"\n{extra_ctes}," if extra_ctes.strip() else ""
    if centroid_mod == "isqrt":
        cmod_cte = """
cmod AS (SELECT GREATEST(25, n // (s0 + CASE WHEN (s0+1)*(s0+1) <= n THEN 1
                                             WHEN s0*s0 > n THEN -1
                                             ELSE 0 END)) AS m
         FROM (SELECT COUNT(*) AS n,
                      CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s0
               FROM xn)),"""
        mod_expr = "(SELECT m FROM cmod)"
    else:
        cmod_cte = ""
        mod_expr = str(int(centroid_mod))
    cent_body = (
        cent_sql
        if cent_sql is not None
        else f"SELECT id cid, v cv FROM xn WHERE id % {mod_expr} = 1"
    )
    return f"""
WITH {books_cte},
raw AS (SELECT {id_col} id, {query_pred} AS is_q,
               list_transform({vec_col}, v -> CAST(v AS DOUBLE)) v
        FROM {emb_table}),
n AS (SELECT id, is_q,
             CASE WHEN list_dot_product(v,v)=0 THEN v
                  ELSE list_transform(v, e -> e/sqrt(list_dot_product(v,v))) END v
      FROM raw),
xn AS (SELECT id, v FROM n WHERE NOT is_q),
qn AS (SELECT id, v FROM n WHERE is_q),{extra}{cmod_cte}
cent AS ({cent_body}),
asn AS (SELECT id, cid FROM (
    SELECT x.id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY x.id
                              ORDER BY list_dot_product(x.v,c.cv) DESC, c.cid ASC) rn
    FROM xn x CROSS JOIN cent c) WHERE rn=1),
subs AS (SELECT id, j, v[j*{ds}+1 : j*{ds}+{ds}] sub
         FROM xn CROSS JOIN (SELECT unnest(generate_series(0,{m - 1})) j)),
scored AS (SELECT s.id, s.j, b.code,
                  list_dot_product(b.cv,b.cv) - 2*list_dot_product(s.sub,b.cv) AS d2
           FROM subs s JOIN books b USING (j)),
codes AS (SELECT id, j, code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id, j ORDER BY d2 ASC, code ASC) rn
    FROM scored) WHERE rn=1),
probes AS (SELECT qid, cid FROM (
    SELECT q.id qid, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.id
                              ORDER BY list_dot_product(q.v,c.cv) DESC, c.cid ASC) rn
    FROM qn q CROSS JOIN cent c) WHERE rn <= {n_probe}),
cand AS (SELECT p.qid, a.id nid FROM probes p JOIN asn a ON a.cid = p.cid),
adc AS (SELECT c.qid, c.nid,
               SUM(list_dot_product(q.v[k.j*{ds}+1 : k.j*{ds}+{ds}], b.cv)) adc_sim
        FROM cand c JOIN codes k ON k.id = c.nid
        JOIN books b ON b.j = k.j AND b.code = k.code
        JOIN qn q ON q.id = c.qid
        GROUP BY c.qid, c.nid),
short AS (SELECT qid, nid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_sim DESC, nid ASC) rn
    FROM adc) WHERE rn <= {k * overscan}),
rer AS (SELECT s.qid, s.nid, list_dot_product(q.v, x.v) sim
        FROM short s JOIN qn q ON q.id = s.qid JOIN xn x ON x.id = s.nid)
SELECT qid, nid, sim, rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) rank
    FROM rer) WHERE rank <= {k}
"""


class IvfPqIndex(NamedTuple):
    """A built IVF-PQ index: everything :func:`knn_join_ivfpq` derives
    from the index side, reusable across searches/sweeps on a frozen
    corpus (build once, vary ``n_probe``/``overscan``/``k`` freely —
    those only shape the probe/ADC/rerank stages). Persist ``lists``
    (and ``xn`` if reranking exactly) around a sweep so the build runs
    once, and unpersist when done (the repo caching contract)."""

    cent: DataFrame  #: (centroid_id, _cv) normalized coarse centroids
    cent_mat: tuple  #: _collect_centroids materialization (ids, mat)
    lists: DataFrame  #: (index_id, centroid_id, codes array<smallint>)
    books: "object"  #: numpy (m, n_codes, d_sub) float64 PQ codebooks
    xn: DataFrame  #: (index_id, _xv) normalized raw index (exact rerank side)
    index_id: str
    vec_col: str


def build_ivfpq_index(
    index_df: DataFrame,
    centroid_mod: int = 25,
    m: int = 8,
    n_codes: int = 16,
    index_id: str = "neighbor_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
    codebooks=None,
) -> IvfPqIndex:
    """Stages 1-2 of :func:`knn_join_ivfpq` (centroids + fused
    assignment/PQ-encode), split out so a frozen corpus builds its
    inverted lists ONCE and every subsequent search or knob sweep
    reuses them — the ``IndexIVFPQ.train()+add()`` step. Identical
    expressions to the inline build (bit-identical results)."""
    import numpy as np

    require_integral_ids("build_ivfpq_index", (index_df, index_id))
    x = normalize_embeddings(index_df, vec_col).select(
        index_id, F.col(vec_col).alias("_xv")
    )
    if codebook is not None:
        cent = normalize_embeddings(codebook, vec_col).select(
            "centroid_id", F.col(vec_col).alias("_cv")
        )
    else:
        cent = x.filter(F.col(index_id) % centroid_mod == 1).select(
            F.col(index_id).alias("centroid_id"), F.col("_xv").alias("_cv")
        )
    # An empty centroid set makes every downstream join empty — zero
    # neighbors for every query with no signal anything is wrong (e.g.
    # all-even ids can have no id ≡ 1 mod centroid_mod). The collect is
    # the build's one centroid materialization, shared by assignment
    # and probe selection.
    cent_mat = _collect_centroids(cent)
    if cent_mat[0].size == 0:
        raise ValueError(
            "build_ivfpq_index: empty centroid set — no index id satisfies "
            f"id % {centroid_mod} == 1 (or the supplied codebook is empty); "
            "pass a trained codebook or a centroid_mod that hits the id space"
        )
    if codebooks is None:
        codebooks = train_pq_codebooks(index_df, index_id, vec_col, m=m, n_codes=n_codes)
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    # Build: assignment + encoding fused into one narrow pass over the
    # index; smallint codes (n_codes ≤ 256 by the pq trainer's uint8 gate).
    assigned = _nearest_centroid(x, cent, index_id, cent_mat=cent_mat)
    lists = pq_encode(
        assigned, books, id_col=index_id, vec_col="_xv",
        carry_cols=("centroid_id",), prenormalized=True,
    ).select(index_id, "centroid_id", F.col("codes").cast("array<smallint>").alias("codes"))
    return IvfPqIndex(cent, cent_mat, lists, books, x, index_id, vec_col)


def knn_join_ivfpq(
    index_df: DataFrame | None,
    query_df: DataFrame,
    k: int,
    centroid_mod: int = 25,
    n_probe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    overscan: int = 8,
    rerank: str = "exact",
    broadcast_rerank: bool = True,
    broadcast_queries: bool = False,
    query_id: str = "query_id",
    index_id: str = "neighbor_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
    codebooks=None,
    index: IvfPqIndex | None = None,
) -> DataFrame:
    """Approximate cosine top-k with IVF coarse pruning + PQ-coded
    inverted lists. Output ``(query_id, neighbor_id, sim, rank)`` —
    the same contract as ``knn_join_exact``/``knn_join_pq``.

    Stages (and what moves where):

    1. **Centroids** — trained ``codebook`` (``(centroid_id, vec)``,
       e.g. ``train_ivf_codebook``) or the deterministic id-residue
       subset ``index_id % centroid_mod == 1``. Broadcast.
    2. **Build** — every index vector is assigned to its argmax-cosine
       centroid (broadcast join + map-side-combined aggregate, one
       compact exchange) and PQ-encoded in the SAME narrow Arrow pass
       (``pq_encode(carry_cols=("centroid_id",))`` — no N-row
       self-join to reattach the cell). The persisted-form lists are
       ``(centroid_id, id, m smallint codes)``.
    3. **Probe** — each query picks its ``n_probe`` nearest centroids
       (broadcast, one exchange on query_id).
    4. **ADC** — probes ⋈ lists on ``centroid_id`` (the only shuffle
       that scales with N, and it carries codes, not vectors), then a
       vectorized Arrow stage scores each candidate as
       ``Σ_j q_sub_j · books[j][code_j]`` via a numpy gather — no
       per-query table build, O(batch × dim).
    5. **Top-k** — keep ``k·overscan`` per query by ADC score;
       ``rerank="exact"`` (default) re-scores the survivors with the
       exact JVM-side sequential dot against the raw index vectors (one
       hash join; with ``broadcast_rerank=True``, the default, the
       id-pair shortlist is broadcast so the raw corpus is NOT
       reshuffled — right while the query side stays
       dimension-table-sized; at millions of simultaneous queries pass
       ``broadcast_rerank=False`` to shuffle-join instead) so surfaced
       sims are true cosines; only candidate CHOICE stays approximate,
       tuned by ``(n_probe, overscan, n_codes)``. ``rerank="adc"``
       skips the second pass entirely — sims are then ADC
       approximations and the raw vectors are never touched after the
       build.

    Training needs ≥ ``n_codes`` index rows (``train_pq_codebooks``
    raises a named error below that); pass precomputed ``codebooks``
    (numpy ``(m, n_codes, dim//m)``) to skip training, e.g. when
    searching many deltas against one frozen index — or build the whole
    index once with :func:`build_ivfpq_index` and pass it as ``index=``
    (``index_df`` may then be None) so repeated searches/knob sweeps
    never re-run the build; ``centroid_mod``/``m``/``n_codes``/
    ``codebook(s)``/``index_id`` are then taken from the build, not
    these arguments. ``vec_col`` is the exception: it still names the
    QUERY frame's vector column (the two frames may legitimately name
    their embeddings differently), so a build with a non-default
    vec_col composes with any query-side name — pass the query frame's
    own column (ADVICE r7 #1).
    """
    if rerank not in ("exact", "adc"):
        raise ValueError(f"rerank must be 'exact' or 'adc', got {rerank!r}")
    require_integral_ids("knn_join_ivfpq", (query_df, query_id))
    spark = query_df.sparkSession

    if index is None:
        index = build_ivfpq_index(
            index_df, centroid_mod=centroid_mod, m=m, n_codes=n_codes,
            index_id=index_id, vec_col=vec_col,
            codebook=codebook, codebooks=codebooks,
        )
    cent, cent_mat, lists, books, x, index_id = (
        index.cent, index.cent_mat, index.lists, index.books, index.xn,
        index.index_id,
    )
    q = normalize_embeddings(query_df, vec_col).select(
        query_id, F.col(vec_col).alias("_qv")
    )
    mm, nc, d_sub = books.shape

    probes = _probe_cells(q, cent, query_id, n_probe, cent_mat=cent_mat)

    bc = spark.sparkContext.broadcast(books)

    if broadcast_queries:
        # The candidate stream is Q × n_probe × cell_size rows; with the
        # per-row layout below, every one drags the dim-double query
        # vector through the join output and the Arrow boundary —
        # measured as the dominant term of the registered query at 30×
        # (SCALE.md §0b, ann_ivfpq_topk). When the query side is
        # dimension-table-sized (the retrieve/classify regime), one
        # query-matrix broadcast removes the wide column entirely: the
        # candidate rows carry (qid, nid, m smallint codes) ONLY, and
        # the ADC stage gathers each row's query sub-vectors from the
        # broadcast by binary search. Scoring is the identical per-row
        # reshape + einsum — bit-identical ADC values. With millions of
        # simultaneous queries keep the default (per-row layout), same
        # judgment call as ``broadcast_rerank``.
        import numpy as np

        qtbl = q.toArrow()
        qids = qtbl.column(0).to_numpy()
        order = np.argsort(qids)
        qids_sorted = np.ascontiguousarray(qids[order])
        # Build the query matrix from the Arrow list buffers directly:
        # to_pylist() materializes a Python list-of-lists costing ~4-5×
        # the raw float bytes transiently on the driver, which would
        # make the 64 MiB broadcast gate under-count the true peak
        # footprint (ADVICE r8 #3). flatten() returns the child values
        # array (offset-aware); rows are fixed-width dim, so the
        # reshape is exact.
        qvals = qtbl.column(1).combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        qmat = np.ascontiguousarray(
            np.asarray(qvals, dtype=np.float64)
            .reshape(len(qids), mm * d_sub)[order]
        )
        bq = spark.sparkContext.broadcast((qids_sorted, qmat))
        cand = probes.select(query_id, "centroid_id").join(lists, "centroid_id")
        # Derive the id types from the candidate frame so this layout's
        # output matches the per-row layout exactly: query_id is long
        # either way (widened by _probe_cells), but index_id keeps the
        # caller's int/short type instead of being silently widened to
        # bigint on one path only (ADVICE r7 #2).
        _ct = dict(cand.dtypes)
        adc_schema = (
            f"{query_id} {_ct[query_id]}, {index_id} {_ct[index_id]}, "
            "_adc double"
        )

        def adc_gen(batches):
            import numpy as np
            import pandas as pd

            bqids, bqmat = bq.value
            b = bc.value
            m_, _, d_ = b.shape
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cm = np.array(list(pdf["codes"]), dtype=np.int64)  # (B, m)
                qi = np.searchsorted(bqids, pdf[query_id].to_numpy())
                qm = bqmat[qi].reshape(len(cm), m_, d_)
                sel = b[np.arange(m_)[None, :], cm]  # (B, m, d_sub) gather
                yield pd.DataFrame(
                    {
                        query_id: pdf[query_id],
                        index_id: pdf[index_id],
                        "_adc": np.einsum("bmd,bmd->b", sel, qm),
                    }
                )

        scored = cand.select(query_id, index_id, "codes").mapInPandas(
            adc_gen, adc_schema
        )
    else:
        cand = probes.join(lists, "centroid_id")

        @F.pandas_udf("double")
        def adc_sim(codes, qv):
            import numpy as np
            import pandas as pd

            b = bc.value
            m_, _, d_ = b.shape
            if len(codes) == 0:
                return pd.Series([], dtype="float64")
            cm = np.array(list(codes), dtype=np.int64)  # (B, m)
            qm = np.array(list(qv), dtype=np.float64).reshape(len(cm), m_, d_)
            sel = b[np.arange(m_)[None, :], cm]  # (B, m, d_sub) gather
            return pd.Series(np.einsum("bmd,bmd->b", sel, qm))

        scored = cand.select(query_id, index_id, adc_sim("codes", "_qv").alias("_adc"))

    wo = Window.partitionBy(query_id).orderBy(F.desc("_adc"), F.asc(index_id))
    shortlist = (
        scored
        .withColumn("_r", F.row_number().over(wo))
        .filter(F.col("_r") <= k * overscan)
    )

    wf = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(index_id))
    if rerank == "adc":
        return (
            shortlist.select(query_id, index_id, F.col("_adc").alias("sim"))
            .withColumn("rank", F.row_number().over(wf).cast("bigint"))
            .filter(F.col("rank") <= k)
        )
    # The shortlist is Q_distinct × k × overscan id-pairs. Broadcasting
    # it lets the raw corpus stream through the re-rank unshuffled —
    # right whenever the query side is dimension-table-sized (the
    # common retrieve/classify regime). With millions of simultaneous
    # queries that broadcast is itself the scale killer: pass
    # ``broadcast_rerank=False`` to take the shuffle join instead
    # (repartitions the raw index once on id — still one pass).
    ids_only = shortlist.select(query_id, index_id)
    if broadcast_rerank:
        ids_only = F.broadcast(ids_only)
    rescored = (
        x.join(ids_only, index_id)
        .join(q, query_id)
        .select(query_id, index_id, dot(F.col("_qv"), F.col("_xv")).alias("sim"))
    )
    return (
        rescored.withColumn("rank", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
