"""Store-backed NEAR-dup registry (VERDICT r10 missing #3): the
unbounded-horizon member for near-duplicates, completing the triptych
the exact-fingerprint store started (``dedup_store_plans.py``). The
streaming MinHash band gate (``streaming/dedup.py:225``) keeps its
claims in horizon-bounded state-store rows, so a near-duplicate
re-posted after the horizon is re-admitted forever; here the band
claims live in a maintained ``KeyedParquetStore`` on DISK, so a
near-dup is rejected against everything ever admitted.

Store contract: key = ``band_key`` (the certified 4-bands-of-2 LSH
key, ``dedup_plans.band_key_array``), value = ``(canonical_doc_id,
hs)`` — the FIRST-ingested doc that claimed the band, carrying its
int64 hashed-shingle array so candidate verification needs no corpus
re-read. Judge: band-collision candidates against the store (bucket-
pruned via ``read_for``), verified by EXACT Jaccard on the shingle
arrays — collision alone never convicts (the certified
``dedup_minhash_lsh`` rule). Admit: only ``verdict = 'new'`` docs'
band rows, reduced to the min-doc_id owner per band, anti-joined
against keys the store already holds — an existing band's canonical
is NEVER overwritten, so first-ingested-wins is an invariant and a
replayed batch re-judges as ``dup_of_corpus`` and merges nothing.

Verdict semantics (priority order, all deterministic):
- ``dup_of_corpus``: some band of the doc collides with a stored row
  whose canonical's Jaccard vs the doc ≥ threshold; canonical = the
  MIN such stored canonical_doc_id.
- ``dup_in_batch``: a verified band-colliding batch neighbor with a
  smaller doc_id exists; canonical = the MIN such neighbor. (Chains
  are NOT contracted: if B near-matches A and C near-matches B only,
  C's canonical is B — the batch-local analogue of the exact store's
  first-in-batch rule; full transitive closure is
  ``dedup_cluster_canonical``'s job, not an ingest gate's.)
- ``new``: admitted; its unclaimed band keys now point at it.

LSH approximation honesty: a 'new' doc that band-collided with an
earlier claimant but FAILED verification does not get that band key
(first claimant keeps it), so later near-dups of the loser are only
caught via the loser's OTHER bands — the standard single-probe LSH
recall trade, identical to the horizon gate's semantics.

100 TB shape: store rows = 4 bands × one (16B key + long + shingle
array) per ADMITTED doc — the shingle payload is duplicated across a
doc's 4 band rows (trades ~4× registry bytes for a one-join judge;
the normalized alternative — band→canonical plus a doc→hs side table
— is a second join per batch and is the right call only when shingle
arrays dominate storage). Judge = bucket-pruned join shuffling only
the batch; admit = MERGE rewriting only hit buckets. Nothing ever
re-reads corpus text.

Reference grounding: the reference persists its FAISS index across
sessions and probes arriving vectors against it rather than
rebuilding (`/root/reference/code/python/Faiss_2_10.py:70-114`); this
module is that standing-index discipline for MinHash band claims.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import words
from ..sources.compact import _hadoop_fs
from ..sources.tables import load_table
from ..sources.upsert import KeyedParquetStore
from .dedup_plans import (
    N_BANDS,
    N_MINHASH,
    _corpus,
    _d_hash64,
    _D_CORPUS,
    _D_SHINGLES,
    _D_WS,
    _minhash_sigs,
    band_key_array,
    hashed_shingles,
)
from .registry import query

_ND_THRESHOLD = 0.5
_N_BUCKETS = 8


def neardup_band_store(
    spark: SparkSession, root: str, n_buckets: int = 64
) -> KeyedParquetStore:
    """The maintained band-claim table: one row per claimed LSH band,
    ``(band_key, canonical_doc_id, hs)``."""
    return KeyedParquetStore(spark, root, key="band_key", n_buckets=n_buckets)


def _jaccard(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(
        F.array_union(a, b)
    )


def band_rows(batch_docs: DataFrame) -> DataFrame:
    """(doc_id, hs) → exploded ``(doc_id, hs, band_key)``: the SAME
    shingle→minhash→band signature as the certified
    ``dedup_minhash_lsh`` (shared ``_minhash_sigs`` /
    ``band_key_array``, so batch, stream, and this registry cannot
    drift on what "near-identical" means)."""
    sigs = _minhash_sigs(batch_docs, keep_cols=("doc_id", "hs"))
    return sigs.select(
        "doc_id", "hs", F.explode(band_key_array()).alias("band_key")
    ).filter(F.col("band_key").isNotNull())


def delta_neardup_verdicts(
    batch_docs: DataFrame,
    store: KeyedParquetStore,
    threshold: float = _ND_THRESHOLD,
    bands: DataFrame | None = None,
) -> DataFrame:
    """Judge a batch of ``(doc_id, hs)`` docs against the maintained
    band registry: returns ``(doc_id, verdict, canonical_doc_id)``
    under the module-docstring semantics.

    Contract: ``batch_docs`` carries UNIQUE doc_ids (the same
    one-row-per-key contract the exact store's judge states) — the
    pair self-join filters ``a.doc_id > b.doc_id``, so two rows
    sharing a doc_id (inbox file duplication) would each read 'new'
    and both land in a caller's verdict log (ADVICE r11 #3).
    ``dropDuplicates(['doc_id'])`` upstream if a source can repeat. The store side is
    bucket-pruned to the batch's band keys (``read_for`` — the same
    hit-bucket discipline as the exact judge), and verification
    compares int64 shingle arrays already in hand on both sides — no
    corpus read, no all-pairs scan.

    Like the exact judge, the returned frame's lineage READS the
    store: judge, materialize (or :func:`admit_new_band_rows`, which
    forces the verdicts first), never re-collect after a later merge.

    ``bands``: optionally the PERSISTED output of
    :func:`band_rows(batch_docs)` — the judge references the band
    grain four times (the pruning probe's action, the corpus join,
    both sides of the pair self-join) and the 8-salted-md5 minhash
    map is the expensive stage; callers that also admit should
    compute it once, persist, and pass it here and to
    :func:`admit_new_band_rows`."""
    if bands is None:
        bands = band_rows(batch_docs)
    try:
        s = store.read_for(bands.select("band_key")).select(
            "band_key",
            "canonical_doc_id",
            F.col("hs").alias("_c_hs"),
        )
        corpus_hits = (
            bands.join(s, "band_key")
            .filter(_jaccard(F.col("hs"), F.col("_c_hs")) >= threshold)
            .groupBy("doc_id")
            .agg(F.min("canonical_doc_id").alias("_corpus_canonical"))
        )
    except FileNotFoundError:
        corpus_hits = batch_docs.select("doc_id").limit(0).withColumn(
            "_corpus_canonical", F.lit(None).cast("long")
        )
    # within-batch candidates: band collision, smaller-id neighbor,
    # then EXACT Jaccard — ids first, arrays joined back at pair grain
    # (the certified dedup_minhash_lsh candidate shape)
    bk = bands.select("doc_id", "band_key")
    cand = (
        bk.alias("a")
        .join(bk.alias("b"), "band_key")
        .filter(F.col("a.doc_id") > F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("_da"), F.col("b.doc_id").alias("_db"))
        .distinct()
    )
    hs_of = lambda n: batch_docs.select(  # noqa: E731
        F.col("doc_id").alias(n), F.col("hs").alias(f"_hs{n}")
    )
    batch_hits = (
        cand.join(hs_of("_da"), "_da")
        .join(hs_of("_db"), "_db")
        .filter(_jaccard(F.col("_hs_da"), F.col("_hs_db")) >= threshold)
        .groupBy(F.col("_da").alias("doc_id"))
        .agg(F.min("_db").alias("_batch_canonical"))
    )
    return (
        batch_docs.select("doc_id")
        .join(corpus_hits, "doc_id", "left")
        .join(batch_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_corpus_canonical").isNotNull(), F.lit("dup_of_corpus"))
            .when(F.col("_batch_canonical").isNotNull(), F.lit("dup_in_batch"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            F.coalesce(
                "_corpus_canonical", "_batch_canonical", "doc_id"
            ).alias("canonical_doc_id"),
        )
    )


def admit_new_band_rows(
    verdicts: DataFrame,
    batch_docs: DataFrame,
    store: KeyedParquetStore,
    bands: DataFrame | None = None,
) -> dict:
    """MERGE a judged batch's genuinely-new docs' band claims into the
    registry: ``verdict = 'new'`` docs only, reduced to the MIN-doc_id
    owner per band key, then anti-joined against keys the store
    already holds (a failed-verify collision must not steal an
    existing band — first claimant keeps it forever). The anti-join's
    store read is bucket-pruned like the judge's. Returns the store's
    merge audit dict. ``bands``: the same persisted band grain the
    judge took (see :func:`delta_neardup_verdicts`)."""
    new_docs = verdicts.filter(F.col("verdict") == "new").select("doc_id")
    if bands is None:
        bands = band_rows(batch_docs.join(new_docs, "doc_id"))
        nb = bands
    else:
        nb = bands.join(new_docs, "doc_id")
    reduced = (
        nb.groupBy("band_key")
        .agg(F.min_by(F.struct("doc_id", "hs"), F.col("doc_id")).alias("_w"))
        .select(
            "band_key",
            F.col("_w.doc_id").alias("canonical_doc_id"),
            F.col("_w.hs").alias("hs"),
        )
    )
    try:
        existing = store.read_for(reduced.select("band_key")).select("band_key")
        reduced = reduced.join(existing, "band_key", "left_anti")
    except FileNotFoundError:
        pass
    return store.merge(reduced)


_D_JAC = (
    "CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)"
    " / len(list_distinct(x.hs || y.hs))"
)
_D_SIG_MINS = ", ".join(
    "MIN(" + _d_hash64(f"'{i}:' || CAST(h AS VARCHAR)") + f") AS sig{i}"
    for i in range(N_MINHASH)
)
_D_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, 'b{b}:' || CAST(sig{2*b} AS VARCHAR) || ':' || "
    f"CAST(sig{2*b+1} AS VARCHAR) AS band_key FROM sigs"
    for b in range(N_BANDS)
)


@query(
    "incremental_store_neardup",
    oracle=f"""
    WITH corpus AS (
      {_D_CORPUS}
      UNION ALL
      SELECT doc_id + 300000 AS doc_id,
             array_to_string({_D_WS}[6 : len({_D_WS})], ' ') AS text
      FROM documents
      WHERE doc_id >= 102 AND doc_id < 198 AND doc_id % 3 = 0
    ),
    hsl AS (
      SELECT doc_id,
             list_distinct(list_transform({_D_SHINGLES},
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS hs
      FROM corpus
    ),
    sh AS (SELECT doc_id, unnest(hs) AS h FROM hsl),
    sigs AS (SELECT doc_id, {_D_SIG_MINS} FROM sh GROUP BY doc_id),
    bands AS ({_D_BANDS}),
    d1 AS (SELECT doc_id FROM corpus WHERE doc_id % 3 <> 0),
    d2 AS (SELECT doc_id FROM corpus WHERE doc_id % 3 = 0),
    d1b AS (SELECT b.* FROM bands b JOIN d1 USING (doc_id)),
    d2b AS (SELECT b.* FROM bands b JOIN d2 USING (doc_id)),
    p1 AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM d1b a JOIN d1b b USING (band_key) WHERE a.doc_id > b.doc_id),
    vp1 AS (SELECT p.da, p.db FROM p1 p
            JOIN hsl x ON x.doc_id = p.da JOIN hsl y ON y.doc_id = p.db
            WHERE {_D_JAC} >= {_ND_THRESHOLD}),
    m1 AS (SELECT da AS doc_id, MIN(db) AS mn FROM vp1 GROUP BY da),
    v1 AS (SELECT d.doc_id,
                  CASE WHEN m.mn IS NOT NULL THEN 'dup_in_batch'
                       ELSE 'new' END AS verdict,
                  COALESCE(m.mn, d.doc_id) AS canonical_doc_id
           FROM d1 d LEFT JOIN m1 m USING (doc_id)),
    store1 AS (SELECT band_key, MIN(b.doc_id) AS canonical_doc_id
               FROM d1b b JOIN v1 v USING (doc_id)
               WHERE v.verdict = 'new' GROUP BY band_key),
    c2 AS (SELECT DISTINCT b.doc_id, s.canonical_doc_id
           FROM d2b b JOIN store1 s USING (band_key)),
    cv2 AS (SELECT c.doc_id, MIN(c.canonical_doc_id) AS cc
            FROM c2 c
            JOIN hsl x ON x.doc_id = c.doc_id
            JOIN hsl y ON y.doc_id = c.canonical_doc_id
            WHERE {_D_JAC} >= {_ND_THRESHOLD} GROUP BY c.doc_id),
    p2 AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM d2b a JOIN d2b b USING (band_key) WHERE a.doc_id > b.doc_id),
    vp2 AS (SELECT p.da, p.db FROM p2 p
            JOIN hsl x ON x.doc_id = p.da JOIN hsl y ON y.doc_id = p.db
            WHERE {_D_JAC} >= {_ND_THRESHOLD}),
    m2 AS (SELECT da AS doc_id, MIN(db) AS mn FROM vp2 GROUP BY da),
    v2 AS (SELECT d.doc_id,
                  CASE WHEN c.cc IS NOT NULL THEN 'dup_of_corpus'
                       WHEN m.mn IS NOT NULL THEN 'dup_in_batch'
                       ELSE 'new' END AS verdict,
                  COALESCE(c.cc, m.mn, d.doc_id) AS canonical_doc_id
           FROM d2 d LEFT JOIN cv2 c USING (doc_id)
                     LEFT JOIN m2 m USING (doc_id))
    SELECT doc_id, verdict, canonical_doc_id
    FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    ORDER BY doc_id
    """,
)
def incremental_store_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two consecutive ingest deltas through a REAL maintained band
    registry: delta 1 (``doc_id % 3 != 0``) is judged store-empty
    (within-batch near-pairs only) and its new docs' band claims
    MERGE in; delta 2 (``doc_id % 3 == 0``) is judged against the
    MAINTAINED table. The planted-duplicate layout makes every verdict
    class and the first-ingested invariant load-bearing:

    - near plants ``k+100000`` (k<100, k≡0 mod 3) land in delta 1
      and the ORIGINAL doc k arrives later in delta 2 → doc k itself
      reads ``dup_of_corpus`` with the PLANT as canonical (first-
      ingested wins, not min doc_id);
    - exact plants ``k+200000`` (k<30, k≡2) pair with their original
      inside delta 1 → ``dup_in_batch``;
    - fresh same-batch plants ``k+300000`` (k in [102,198), k≡0 —
      docs with no delta-1 twin) pair with their original inside
      delta 2 → ``dup_in_batch`` against a non-empty store.

    Store root handling follows ``incremental_store_dedup``: rebuilt
    fresh per call under the warehouse dir, md5(sf_dir)-tagged."""
    c = _corpus(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = words(F.col("text"))
    batch_plants = docs.filter(
        (F.col("doc_id") >= 102)
        & (F.col("doc_id") < 198)
        & (F.col("doc_id") % 3 == 0)
    ).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat_ws(" ", F.slice(ws, 6, F.size(ws) - 5)).alias("text"),
    )
    hsl = (
        c.unionByName(batch_plants)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", hashed_shingles(F.col("text"), 3).alias("hs"))
        .persist()
    )
    hsl.count()  # materialize before the judge fans out over it
    d1 = hsl.filter(F.col("doc_id") % 3 != 0)
    d2 = hsl.filter(F.col("doc_id") % 3 == 0)

    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    tag = hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:8]
    root = f"{wh}/nd_store_{tag}"
    assert root.endswith(f"/nd_store_{tag}")  # delete guarded to own dir
    jvm, fs, hpath = _hadoop_fs(spark, root)
    if fs.exists(hpath):
        fs.delete(hpath, True)
    store = neardup_band_store(spark, root, n_buckets=_N_BUCKETS)

    b1 = band_rows(d1).persist()  # the 8-salted-md5 minhash map runs
    b2 = band_rows(d2).persist()  # once per delta, not once per use
    v1 = delta_neardup_verdicts(d1, store, bands=b1)
    admit_new_band_rows(v1, d1, store, bands=b1)
    v2 = delta_neardup_verdicts(d2, store, bands=b2)
    cols = ["doc_id", "verdict", "canonical_doc_id"]
    out = v1.select(*cols).unionByName(v2.select(*cols)).orderBy("doc_id")
    out._cached_deps = [hsl, b1, b2]
    return out
