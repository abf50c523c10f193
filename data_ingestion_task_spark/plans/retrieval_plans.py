"""Sparse lexical retrieval (BM25) over the ``documents`` table.

The reference retrieves context for its RAG pipelines with dense
vectors only (``code/python/rag_implementation.py`` and its ~14
variants feed FAISS top-k into the prompt); production retrieval
stacks pair that with a sparse BM25 arm and fuse the two. This module
is the sparse arm, expressed as pure DataFrame algebra — the dense
arm is ``plans/vector_plans.py`` / ``refine_plans.rag_context_assembly``.

Scale shape (100 TB corpus): tokenization and per-doc term frequency
are one explode + one (doc_id, term) hash-agg — the same shuffle
budget as the wordcount in ``text_plans.term_doc_frequency``. The
query set, document-frequency table, and corpus stats are all tiny
(vocab-bounded) and broadcast; scoring touches only postings of query
terms (the broadcast join prunes everything else map-side), and the
final top-k windows are partitioned per query. Nothing all-pairs,
nothing driver-side.

Cross-engine float parity uses the repo idiom: per-term scores are
rounded to 6 dp and summed as DECIMAL (order-independent), then cast
back to DOUBLE at the output edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
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
# proven cross-engine tokenizer.
_D_WORDS = (
    "list_filter(str_split(regexp_replace(regexp_replace(lower(trim(text)), "
    "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'), ' '), w -> w <> '')"
)

_D_QUERY_VALUES = ", ".join(f"({qid}, '{t}')" for qid, t in _QUERY_TERMS)


@query(
    "bm25_retrieval",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_D_WORDS} AS ws FROM documents
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
    (reference: rag_implementation.py's FAISS retrieve step).

    Plan: one tokenization pass reduces each doc to a persisted
    (doc_id, dl, query-term tokens) narrow frame (the regex scan is
    the linear cost and would otherwise run once per branch; dl before
    the explode means doc length costs no shuffle) → (doc_id, term)
    hash-agg over query-term postings only → broadcast the query
    terms, the df table, and the 1-row corpus stats → per-(query, doc)
    DECIMAL sum of 6-dp-rounded per-term scores (order-independent,
    the repo's float-parity idiom) → per-query top-3 window."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"[^a-z0-9\s]", ""), r"\s+", " "
    )
    ws = F.filter(F.split(norm, " "), lambda w: w != "")
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
