"""End-to-end text-classification pipeline from RAW TEXT (SURVEY §3.1,
the kNN split-classification lifecycle): documents.text → chunk →
encode → kNN join → per-document label vote.

This is the full reference pipeline shape (`code/python/Faiss_2_10.py:
346-561`: read → chunk → SentenceTransformer.encode → FAISS search →
metadata vote → metrics) with the encoder stage PLUGGABLE
(operators/encode.py). With the deterministic hashing encoder the
whole pipeline — including the embedding values — is reproduced
bit-for-bit by the DuckDB oracle, so the correctness gate covers the
pipeline end-to-end, not just the post-embedding half.

Scale notes (100 TB): chunk+encode is one narrow map stage (no
shuffle); the kNN join broadcasts the index side (switch to
knn_join_lsh beyond broadcast size); the vote is a two-level
aggregation on (doc, label) — one shuffle keyed by query doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import explode_chunks, hash64
from ..operators.encode import duckdb_hashing_encoder_sql, hashing_encoder_udf
from ..operators.knn import knn_join_exact
from ..sources.tables import load_table
from .registry import query

ENC_DIM = 16
CHUNK_SIZE = 64
CHUNK_OVERLAP = 16
_STEP = CHUNK_SIZE - CHUNK_OVERLAP


def _d_hash64(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# Chunking twin (same shape the chunk_explode oracle uses) + encoder
# twin from operators/encode.py, then the exact cosine top-3 + vote.
_TKC_ORACLE = f"""
    WITH w AS (
      SELECT doc_id, lang, str_split_regex(trim(text), '\\s+') AS ws FROM documents
    ), starts AS (
      SELECT doc_id, lang, ws,
             unnest(generate_series(0, greatest(len(ws) - 1, 0), {_STEP})) AS st
      FROM w
    ), chunks AS (
      SELECT doc_id, lang,
             doc_id * 256 + st // {_STEP} AS cid,
             array_to_string(ws[st+1 : st+{CHUNK_SIZE}], ' ') AS ctext
      FROM starts
    ),
    {duckdb_hashing_encoder_sql('chunks', 'cid', 'ctext', ENC_DIM)},
    normed AS (
      SELECT cid,
             CASE WHEN list_dot_product(v, v) = 0 THEN v
                  ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v))) END AS v
      FROM enc_vecs
    ),
    q AS (
      SELECT c.cid, c.doc_id, c.lang AS true_label, n.v
      FROM chunks c JOIN normed n USING (cid)
      WHERE {_d_hash64("'tkc:' || CAST(c.doc_id AS VARCHAR)")} % 4 = 0
    ),
    x AS (
      SELECT c.cid, c.lang AS neighbor_label, n.v
      FROM chunks c JOIN normed n USING (cid)
      WHERE {_d_hash64("'tkc:' || CAST(c.doc_id AS VARCHAR)")} % 4 <> 0
    ),
    pairs AS (
      SELECT q.cid AS qcid, q.doc_id, q.true_label, x.cid AS xcid, x.neighbor_label,
             list_dot_product(q.v, x.v) AS sim
      FROM q CROSS JOIN x
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qcid ORDER BY sim DESC, xcid) AS rnk
      FROM pairs
    ),
    votes AS (
      SELECT doc_id, true_label, neighbor_label AS label, COUNT(*) AS n_votes
      FROM ranked WHERE rnk <= 3
      GROUP BY doc_id, true_label, neighbor_label
    ),
    winner AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY n_votes DESC, label) AS vr
      FROM votes
    )
    SELECT doc_id, true_label, label AS pred_label, n_votes,
           (label = true_label) AS correct
    FROM winner WHERE vr = 1 ORDER BY doc_id
"""


@query("text_knn_classify", oracle=_TKC_ORACLE)
def text_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAW TEXT → chunk (64/16 overlap) → hashing-encoder pandas_udf →
    exact cosine top-3 per chunk → per-document majority vote over all
    chunk neighbors (ties → label asc). The end-to-end Faiss_2_10
    lifecycle with zero model dependencies; swap the encoder via
    operators/encode.encode_text for production.

    Query/index doc split by hash residue (25% queries) mirrors the
    reference's train/test split; votes are integer counts so the
    result is exactly hash-checkable."""
    d = load_table(spark, sf_dir, "documents", split=True).select("doc_id", "lang", "text")
    chunks = explode_chunks(
        d, text_col="text", id_cols=["doc_id", "lang"],
        chunk_size=CHUNK_SIZE, overlap=CHUNK_OVERLAP,
    )
    enc = hashing_encoder_udf(ENC_DIM)
    # Encode ONCE and materialize: the kNN join branches from this
    # frame four ways (index collect, query candidate stage, exact
    # re-score joins) — uncached, each branch re-runs the chunk+encode
    # pandas_udf subtree. split=True parallelizes the single-file scan
    # under the Python stage.
    emb = chunks.select(
        "doc_id",
        "lang",
        (F.col("doc_id") * 256 + F.col("chunk_idx")).alias("cid"),
        enc(F.col("chunk_text")).alias("embedding"),
    ).persist()
    emb.count()
    is_query = hash64(F.concat(F.lit("tkc:"), F.col("doc_id").cast("string"))) % 4 == 0
    qc = emb.filter(is_query).select(
        F.col("cid").alias("query_id"), "doc_id", F.col("lang").alias("true_label"), "embedding"
    )
    xc = emb.filter(~is_query).select(
        F.col("cid").alias("neighbor_id"), F.col("lang").alias("neighbor_label"), "embedding"
    )
    top3 = knn_join_exact(
        xc.select("neighbor_id", "embedding"), qc.select("query_id", "embedding"), k=3
    )
    votes = (
        top3.join(qc.select("query_id", "doc_id", "true_label"), "query_id")
        .join(xc.select("neighbor_id", "neighbor_label"), "neighbor_id")
        .groupBy("doc_id", "true_label", F.col("neighbor_label").alias("label"))
        .agg(F.count("*").alias("n_votes"))
    )
    wv = Window.partitionBy("doc_id").orderBy(F.desc("n_votes"), F.asc("label"))
    result = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "doc_id",
            "true_label",
            F.col("label").alias("pred_label"),
            "n_votes",
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
        .orderBy("doc_id")
    )
    result._cached_deps = [emb]  # library callers: unpersist when done
    return result


@query(
    "text_knn_classify_accuracy",
    oracle=_TKC_ORACLE.replace(
        """    SELECT doc_id, true_label, label AS pred_label, n_votes,
           (label = true_label) AS correct
    FROM winner WHERE vr = 1 ORDER BY doc_id""",
        """    SELECT true_label,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN label = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(CAST(SUM(CASE WHEN label = true_label THEN 1 ELSE 0 END) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS accuracy
    FROM winner WHERE vr = 1
    GROUP BY true_label ORDER BY true_label""",
    ),
)
def text_knn_classify_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class accuracy of the end-to-end text kNN classifier — the
    reference's doc-accuracy report (Neww_Fai.py:1058-1110) computed on
    the from-raw-text pipeline rather than precomputed embeddings."""
    preds = text_knn_classify(spark, sf_dir)
    correct = (F.col("pred_label") == F.col("true_label")).cast("bigint")
    return (
        preds.groupBy("true_label")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(correct).alias("n_correct"),
            (F.sum(correct).cast("double") / F.count("*")).alias("accuracy"),
        )
        .orderBy("true_label")
    )
