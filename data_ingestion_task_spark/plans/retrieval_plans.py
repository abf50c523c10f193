"""Sparse lexical retrieval (BM25) over the ``documents`` table.

The reference retrieves context for its RAG pipelines with dense
vectors only (``code/python/rag_3_3.py:263-271`` ``retrieve()`` feeds
vector-store top-k into the prompt; ~14 sibling ``rag_*`` scripts
repeat the pattern); production retrieval
stacks pair that with a sparse BM25 arm and fuse the two. This module
is the sparse arm (``bm25_retrieval``) and the fusion
(``hybrid_rrf_retrieval``), expressed as pure DataFrame algebra — the
dense arm is ``plans/vector_plans.py`` /
``refine_plans.rag_context_assembly``.

Scale shape (100 TB corpus): tokenization and per-doc term frequency
are one explode + one (doc_id, term) hash-agg — the same shuffle
budget as the wordcount in ``text_plans.term_doc_frequency``. The
document-frequency table and corpus stats are vocab-bounded and the
query-term table batch-bounded, all broadcast; scoring touches only
postings of query terms (the broadcast join prunes everything else
map-side), and the final top-k windows are partitioned per query.
Nothing all-pairs, and the only driver-side state is the broadcast
of those bounded tables.

Cross-engine float parity uses the repo idiom: per-term scores are
rounded to 6 dp and summed as DECIMAL (order-independent), then cast
back to DOUBLE at the output edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._text_shared import D_NORM_WORDS, spark_norm_words
from ._vector_shared import _D_SPLIT
from .registry import query

# BM25 constants (the Robertson/Sparck-Jones defaults).
_K1 = 1.2
_B = 0.75

#: The registered demo query set: three multi-term keyword queries over
#: the synthetic corpus vocabulary. (query_id, term) pairs.
_QUERY_TERMS: list[tuple[int, str]] = [
    (1, "fast"),
    (1, "hash"),
    (1, "join"),
    (2, "window"),
    (2, "agg"),
    (2, "stream"),
    (3, "customer"),
    (3, "order"),
    (3, "query"),
]

# Same casefold/strip/split normalization as term_doc_frequency — the
# proven cross-engine tokenizer, hoisted to the _text_shared leaf
# module (r5 queue item 4) so the retrieval and text families share
# ONE definition. (text_plans._D_WORDS remains a DIFFERENT,
# whitespace-only tokenizer.)
_D_RETRIEVAL_WORDS = D_NORM_WORDS
_spark_tokens = spark_norm_words


_D_QUERY_VALUES = ", ".join(f"({qid}, '{t}')" for qid, t in _QUERY_TERMS)


@query(
    "bm25_retrieval",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_D_RETRIEVAL_WORDS} AS ws FROM documents
    ), tok AS (
      SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM words
    ), tf AS (
      SELECT doc_id, term, dl, COUNT(*) AS tf FROM tok GROUP BY doc_id, term, dl
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(len(ws)) AS DOUBLE) / COUNT(*) AS avgdl
      FROM words
    ), q AS (
      SELECT * FROM (VALUES {_D_QUERY_VALUES}) AS t(query_id, term)
    ), scored AS (
      SELECT q.query_id, tf.doc_id,
             CAST(round(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * ({_K1} + 1.0))
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * tf.dl / stats.avgdl)),
             6) AS DECIMAL(14,6)) AS s
      FROM tf JOIN q USING (term) JOIN df USING (term) CROSS JOIN stats
    ), agg AS (
      SELECT query_id, doc_id, CAST(SUM(s) AS DOUBLE) AS score
      FROM scored GROUP BY query_id, doc_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rnk
      FROM agg
    )
    SELECT query_id, rnk, doc_id, score
    FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk
    """,
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-3 documents for each of three keyword queries — the
    sparse-retrieval twin of ``rag_context_assembly``'s dense top-k
    (reference: rag_3_3.py:263-271's dense-only retrieve step).

    Plan: one tokenization pass reduces each doc to a persisted
    (doc_id, dl, query-term tokens) narrow frame (the regex scan is
    the linear cost and would otherwise run once per branch; dl before
    the explode means doc length costs no shuffle) → (doc_id, term)
    hash-agg over query-term postings only → broadcast the query
    terms, the df table, and the 1-row corpus stats → per-(query, doc)
    DECIMAL sum of 6-dp-rounded per-term scores (order-independent,
    the repo's float-parity idiom) → per-query top-3 window."""
    d = load_table(spark, sf_dir, "documents")
    ws = _spark_tokens()
    # One tokenization pass over the corpus: the regex normalization is
    # the linear cost term (measured ~2.7s of the ~13s sf1 total, and
    # it ran TWICE — once for corpus stats, once for tf). Reduce each
    # doc to (dl, query-term tokens only) in the same narrow
    # projection and persist that frame — a long plus a few tokens per
    # doc, ~1000x smaller than the text — so the stats and tf branches
    # both read the cache. Query-term filtering BEFORE the explode and
    # the (doc_id, term) shuffle also keeps postings of non-query
    # terms out of the exchange entirely.
    qterm_list = sorted({t for _, t in _QUERY_TERMS})
    nw = d.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("dl"),
        F.filter(ws, lambda w: w.isin(qterm_list)).alias("qtoks"),
    ).persist()
    tf = (
        nw.select("doc_id", "dl", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = nw.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    q = spark.createDataFrame(_QUERY_TERMS, "query_id int, term string")

    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
    )
    sat = (F.col("tf") * F.lit(_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(_K1) * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(df_t), "term")
        .join(F.broadcast(stats), F.lit(True))
        .select(
            "query_id",
            "doc_id",
            F.round(idf * sat, 6).cast("decimal(14,6)").alias("s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    result = (
        scored.groupBy("query_id", "doc_id")
        .agg(F.sum("s").cast("double").alias("score"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )
    result._cached_deps = [nw]  # library callers: unpersist when done
    return result


# RRF constant (Cormack/Clarke/Buettcher's k=60 default).
_RRF_K = 60
_RARE_TERMS_PER_QUERY = 5


@query(
    "hybrid_rrf_retrieval",
    oracle=_D_SPLIT
    + f"""
    , lw AS (
      SELECT doc_id, doc_id % 5 = 0 AS is_q, {_D_RETRIEVAL_WORDS} AS ws FROM documents
    ), ltf AS (
      SELECT doc_id, term, dl, COUNT(*) AS tf FROM (
        SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM lw WHERE NOT is_q
      ) GROUP BY doc_id, term, dl
    ), ldf AS (
      SELECT term, COUNT(*) AS df FROM ltf GROUP BY term
    ), lstats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(len(ws)) AS DOUBLE) / COUNT(*) AS avgdl
      FROM lw WHERE NOT is_q
    ), qsel AS (
      SELECT query_id, term, df FROM (
        SELECT qt.query_id, qt.term, ldf.df,
               ROW_NUMBER() OVER (PARTITION BY qt.query_id
                                  ORDER BY ldf.df ASC, qt.term ASC) AS trn
        FROM (SELECT doc_id AS query_id, unnest(list_distinct(ws)) AS term
              FROM lw WHERE is_q AND doc_id % 25 = 0) qt
        JOIN ldf USING (term)
      ) WHERE trn <= {_RARE_TERMS_PER_QUERY}
    ), lsc AS (
      SELECT qsel.query_id, ltf.doc_id,
             CAST(round(
               ln((lstats.n_docs - qsel.df + 0.5) / (qsel.df + 0.5) + 1.0)
               * (ltf.tf * ({_K1} + 1.0))
               / (ltf.tf + {_K1} * (1.0 - {_B} + {_B} * ltf.dl / lstats.avgdl)),
             6) AS DECIMAL(14,6)) AS s
      FROM ltf JOIN qsel USING (term) CROSS JOIN lstats
    ), lr AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS lrnk
      FROM (SELECT query_id, doc_id, CAST(SUM(s) AS DOUBLE) AS score
            FROM lsc GROUP BY query_id, doc_id)
    ), fused AS (
      SELECT query_id, doc_id,
             COALESCE(1.0 / ({_RRF_K} + d.drnk), 0.0)
             + COALESCE(1.0 / ({_RRF_K} + l.lrnk), 0.0) AS rrf
      FROM (SELECT query_id, neighbor_id AS doc_id, rnk AS drnk
            FROM r WHERE rnk <= 3 AND query_id % 25 = 0) d
      FULL JOIN (SELECT query_id, doc_id, lrnk FROM lr WHERE lrnk <= 3) l
      USING (query_id, doc_id)
    ), franked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id) AS rnk
      FROM fused
    )
    SELECT query_id, rnk, doc_id, round(rrf, 9) AS rrf_score
    FROM franked WHERE rnk <= 3 ORDER BY query_id, rnk
    """,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid query-by-example retrieval: for every query document
    (doc_id % 5 == 0, the same split the dense plans use), fuse a
    dense arm (cosine top-3 over the per-doc embeddings — exactly
    ``knn_cosine_topk``'s semantics, pinned exact for oracle parity;
    at production index sizes route through the size-banded
    ``operators.knn.knn_topk`` facade instead) with a lexical arm
    (BM25 top-3 where the query is the query doc's 5 RAREST
    index-corpus terms) via reciprocal-rank fusion (1/(k+rank),
    k=60) — the standard production pairing the reference's
    dense-only RAG scripts lack.

    The registered demo scores a 1-in-5 sample of the query split
    (doc_id % 25 == 0, the ``ann_recall_audit`` sampling precedent):
    the synthetic corpus's ~30-word vocabulary makes every term common
    (df ≈ N/2 — the worst case for lexical retrieval, as the
    near-isotropic vectors are for LSH), so unsampled candidates are
    ~all-pairs × terms.

    Query reduction (keep only the lowest-df terms, ties by term) is
    what bounds the lexical arm's CANDIDATES at scale: the postings
    join touches ≤5 terms per query and candidate volume is
    df-bounded, the same reason WAND-style engines prune by idf. The
    broadcast query-term table is (n_queries × 5) rows — bounded by
    the QUERY BATCH, not the corpus: retrieval serves bounded batches
    by construction, and broadcasting it is what keeps the
    corpus-sized postings table from shuffling on `term` (measured
    3.8× slower at 10× data without the hint — AQE's late conversion
    still pays the postings shuffle write). For an unbounded offline
    query sweep, batch the queries. One tokenization pass feeds
    tf/df/stats/query-term branches from a persisted frame reduced to
    TERM-COUNT grain — (doc_id, is_q, dl, term, tf), never raw token
    arrays, so the cache is vocabulary-occurrence-sized rather than
    token-volume-sized (and never-read rows — unsampled query docs —
    are dropped before it); both arms end in per-query partitioned
    top-k windows, and the fusion is a keyed full-outer join of two
    ≤3-row-per-query frames."""
    from ..operators.knn import knn_join_exact
    from ._vector_shared import _split

    # Dense arm over the aligned embeddings table.
    qv, xv = _split(spark, sf_dir)
    qv = qv.filter(F.col("query_id") % 25 == 0)
    dense = (
        knn_join_exact(
            xv.select("neighbor_id", "embedding"), qv.select("query_id", "embedding"), k=3
        )
        .select("query_id", F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("drnk"))
    )

    # Lexical arm: one tokenization pass shared by all four branches,
    # reduced to TERM-COUNT grain before the persist (VERDICT r5 watch
    # item): the cached frame carries one (doc_id, term, tf) row per
    # distinct doc-term — term-count-sized — instead of every index
    # doc's full token array (token-volume-sized, a guaranteed spill
    # at 100 TB). explode_outer keeps an empty doc as one NULL-term
    # row so corpus stats still count it.
    d = load_table(spark, sf_dir, "documents")
    ws = _spark_tokens()
    # The token array MUST be materialized in its own projection below
    # the explode: putting size(ws)/explode(ws) with the raw tokenizer
    # expression in ONE select puts the Project ABOVE the Generate, so
    # the regex tokenizer re-evaluates per exploded TOKEN row instead
    # of per doc — measured 142s vs 6s for this frame at sf1.
    base = d.filter((F.col("doc_id") % 5 != 0) | (F.col("doc_id") % 25 == 0)).select(
        "doc_id", (F.col("doc_id") % 5 == 0).alias("is_q"), ws.alias("ws")
    )
    lw = (
        base.select(
            "doc_id",
            "is_q",
            F.size("ws").cast("bigint").alias("dl"),
            F.explode_outer("ws").alias("term"),
        )
        .groupBy("doc_id", "is_q", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    tf = lw.filter(~F.col("is_q") & F.col("term").isNotNull()).select(
        "doc_id", "term", "dl", "tf"
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = (
        lw.filter(~F.col("is_q"))
        .groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        )
    )
    wt = Window.partitionBy("query_id").orderBy(F.asc("df"), F.asc("term"))
    # the persisted grain is already distinct per (doc, term), so the
    # query docs' rows ARE their distinct-term lists
    qsel = (
        lw.filter(F.col("is_q") & F.col("term").isNotNull())
        .select(F.col("doc_id").alias("query_id"), "term")
        .join(F.broadcast(df_t), "term")
        .withColumn("trn", F.row_number().over(wt))
        .filter(F.col("trn") <= _RARE_TERMS_PER_QUERY)
        .select("query_id", "term", "df")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
    )
    sat = (F.col("tf") * F.lit(_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(_K1) * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / F.col("avgdl"))
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        tf.join(F.broadcast(qsel), "term")
        .join(F.broadcast(stats), F.lit(True))
        .select("query_id", "doc_id", F.round(idf * sat, 6).cast("decimal(14,6)").alias("s"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").cast("double").alias("score"))
        .withColumn("lrnk", F.row_number().over(wl).cast("bigint"))
        .filter(F.col("lrnk") <= 3)
        .select("query_id", "doc_id", "lrnk")
    )

    rrf = F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("drnk")), F.lit(0.0)) + F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("lrnk")), F.lit(0.0)
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    result = (
        dense.join(lex, ["query_id", "doc_id"], "full")
        .select("query_id", "doc_id", rrf.alias("rrf"))
        .withColumn("rnk", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "rnk", "doc_id", F.round("rrf", 9).alias("rrf_score"))
        .orderBy("query_id", "rnk")
    )
    result._cached_deps = [lw]  # library callers: unpersist when done
    return result
