"""Answer-refinement / field-refinement plans — the SURVEY §2.7
string-post-processing rows that were not yet standalone queries
(keyword classify, answer-tail split, Box-14 pairing, Box-12
whitelist), the §2.9 RAG context-assembly shape, the §2.4 stratified
sample, and an as-of event enrichment (the one time-series join the
events table motivates).

Scale notes (100 TB):
- keyword_classify / answer_tail_split / w2_box_refinement are pure
  narrow map stages — regexp + higher-order array functions, all
  JVM-side inside whole-stage codegen, zero shuffle.
- rag_context_assembly reuses the broadcast brute-force kNN join
  (operators/knn.py) — the index side is broadcast, so the only
  shuffle is the final groupBy(query_id), whose input is k rows per
  query (k=3), i.e. shuffle volume is O(queries·k·snippet), never
  O(corpus).
- stratified_sample is one shuffle on the stratum key; the md5
  order key makes it deterministic AND uniformly spread (a hash is an
  unbiased sampler), unlike rand(seed) which differs per engine.
- events_asof_enrich does the as-of with a single window over one
  shuffle on user_id — no range join, no cross product; this is the
  union-marker as-of pattern that survives 100× scale (state per
  user is one running value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query
from ._vector_shared import _D_SPLIT, _split
from ..operators.knn import knn_join_exact

# ---------------------------------------------------------------------------
# Keyword classification cascade (neww_rag_.py:115-136, rag_3_4.py:570-587)
# ---------------------------------------------------------------------------


@query(
    "keyword_classify",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN regexp_matches(lower(text), '\bstream\b')  THEN 'Streaming'
                WHEN regexp_matches(lower(text), '\bvector\b')  THEN 'Vector'
                WHEN regexp_matches(lower(text), '\bjoin\b')    THEN 'Relational'
                ELSE 'Other' END AS pred_label,
           (lower(text) LIKE '%merge%') AS mentions_merge
    FROM documents ORDER BY doc_id
    """,
)
def keyword_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-presence label cascade (neww_rag_.py:115-136: Bank
    Statement/Paystub/W2/Other keyword routing) + boolean-from-text
    (neww_rag_.py:138-150: ``"true" in content.lower()``) — first
    match wins, pure rlike/contains, narrow map stage."""
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    return d.select(
        "doc_id",
        F.when(low.rlike(r"\bstream\b"), "Streaming")
        .when(low.rlike(r"\bvector\b"), "Vector")
        .when(low.rlike(r"\bjoin\b"), "Relational")
        .otherwise("Other")
        .alias("pred_label"),
        low.contains("merge").alias("mentions_merge"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Answer-tail split (neww_rag_.py:129-133, rag_3_3.py:382-410)
# ---------------------------------------------------------------------------


@query(
    "answer_tail_split",
    oracle="""
    WITH resp AS (
      SELECT doc_id,
             'Reasoning: ' || md5(text) || ' Answer: ' ||
             (CASE WHEN doc_id % 2 = 0 THEN 'True' ELSE 'False' END) AS response
      FROM documents
    )
    SELECT doc_id,
           trim(split_part(response, 'Answer:', 2)) AS answer,
           (lower(split_part(response, 'Answer:', 2)) LIKE '%true%') AS is_true
    FROM resp ORDER BY doc_id
    """,
)
def answer_tail_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``content.split("Answer:")[1]`` tail extraction from a model
    response (neww_rag_.py:129-133) + truth-flag parse
    (neww_rag_.py:138-150). The response is synthesized
    deterministically (md5 body can never contain the delimiter) so
    the split semantics are exactly testable."""
    d = load_table(spark, sf_dir, "documents")
    response = F.concat(
        F.lit("Reasoning: "),
        F.md5(F.col("text")),
        F.lit(" Answer: "),
        F.when(F.col("doc_id") % 2 == 0, "True").otherwise("False"),
    )
    tail = F.substring_index(response, "Answer:", -1)
    return d.select(
        "doc_id",
        F.trim(tail).alias("answer"),
        F.lower(tail).contains("true").alias("is_true"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# W2 Box-12 whitelist + Box-14 desc/amount pairing (new_prompt_7_2:64-113)
# ---------------------------------------------------------------------------

_BOX12_DOMAIN = ["A", "B", "C", "D", "DD", "EE", "FF", "GG", "HH", "J9", "AB", "ZZ"]
_BOX12_ALLOWED = ["AA", "BB", "DD", "EE", "FF", "GG", "HH"]
_AMT_RE = r"^\$\d+\.\d{2}$"


def _box14_items(doc_id: Column, n_chars: Column) -> Column:
    """Deterministic Box-14 raw list: desc/amount interleave, with an
    unpaired desc injected for every third doc."""
    amt1 = F.concat(F.lit("$"), (n_chars % 900).cast("string"), F.lit(".25"))
    amt2 = F.concat(F.lit("$"), (doc_id % 400).cast("string"), F.lit(".50"))
    return F.when(
        doc_id % 3 == 0,
        F.array(F.lit("DUES"), amt1, F.lit("MED"), F.lit("PLAN"), amt2),
    ).otherwise(F.array(F.lit("DUES"), amt1, F.lit("MED"), amt2))


@query(
    "w2_box_refinement",
    oracle=rf"""
    WITH raw AS (
      SELECT doc_id,
             (['A','B','C','D','DD','EE','FF','GG','HH','J9','AB','ZZ'])[(doc_id % 12) + 1] AS code,
             CASE WHEN doc_id % 3 = 0
                  THEN ['DUES', '$' || CAST(length(text) % 900 AS VARCHAR) || '.25',
                        'MED', 'PLAN', '$' || CAST(doc_id % 400 AS VARCHAR) || '.50']
                  ELSE ['DUES', '$' || CAST(length(text) % 900 AS VARCHAR) || '.25',
                        'MED', '$' || CAST(doc_id % 400 AS VARCHAR) || '.50'] END AS items
      FROM documents
    ), paired AS (
      SELECT doc_id, code,
             list_filter(
               list_transform(generate_series(1, len(items)), i ->
                 CASE WHEN NOT regexp_matches(items[i], '{_AMT_RE}')
                           AND i < len(items)
                           AND regexp_matches(items[i + 1], '{_AMT_RE}')
                      THEN items[i] || ' ' || items[i + 1]
                      WHEN NOT regexp_matches(items[i], '{_AMT_RE}')
                      THEN items[i]
                      ELSE NULL END),
               v -> v IS NOT NULL) AS pairs
      FROM raw
    )
    SELECT doc_id,
           CASE WHEN regexp_matches(code, '^[A-Z]$')
                     OR code IN ('AA','BB','DD','EE','FF','GG','HH')
                THEN code ELSE 'NULL' END AS box12_code,
           array_to_string(pairs, '; ') AS box14_pairs
    FROM paired ORDER BY doc_id
    """,
)
def w2_box_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """refine_fields (new_prompt_7_2:64-113): Box-12 code whitelist
    (single A-Z or {AA,BB,DD,EE,FF,GG,HH}, else the literal 'NULL' at
    the presentation edge) and Box-14 desc→amount pairing
    (new_prompt_7_2:81-97) as pure higher-order array expressions —
    no UDF, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    code = F.element_at(
        F.array(*[F.lit(c) for c in _BOX12_DOMAIN]), (F.col("doc_id") % 12 + 1).cast("int")
    )
    items = _box14_items(F.col("doc_id"), F.length("text"))

    def pair_at(i: Column) -> Column:
        cur = F.element_at(items, i.cast("int"))
        nxt = F.element_at(items, (i + 1).cast("int"))
        return (
            F.when(~cur.rlike(_AMT_RE) & (i < F.size(items)) & nxt.rlike(_AMT_RE),
                   F.concat(cur, F.lit(" "), nxt))
            .when(~cur.rlike(_AMT_RE), cur)
        )

    pairs = F.filter(
        F.transform(F.sequence(F.lit(1), F.size(items)), pair_at), lambda v: v.isNotNull()
    )
    return d.select(
        "doc_id",
        F.when(code.rlike("^[A-Z]$") | code.isin(_BOX12_ALLOWED), code)
        .otherwise("NULL")
        .alias("box12_code"),
        F.array_join(pairs, "; ").alias("box14_pairs"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# RAG context assembly (rag_3_4.py:388-399, rag_3_3.py:263-284)
# ---------------------------------------------------------------------------


@query(
    "rag_context_assembly",
    oracle=_D_SPLIT
    + """
    , hits AS (
      SELECT r.query_id, r.query_label, r.rnk,
             array_to_string((str_split_regex(trim(d.text), '\\s+'))[1:12], ' ') AS snippet
      FROM r JOIN documents d ON r.neighbor_id = d.doc_id
      WHERE r.rnk <= 3
    )
    SELECT query_id, query_label,
           COUNT(*) AS k,
           string_agg(snippet, chr(10) ORDER BY rnk) AS context
    FROM hits GROUP BY query_id, query_label ORDER BY query_id
    """,
)
def rag_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG retrieve stage (rag_3_4.py:388-399): top-k chunks per query
    joined '\\n' into one prompt context (rag_3_3.py:263-284 keeps
    rank order). kNN join (broadcast index) → equi-join snippet text →
    rank-ordered collect_list → concat_ws. Shuffle volume is k rows
    per query, never the corpus."""
    q, x = _split(spark, sf_dir)
    hits = knn_join_exact(x, q, k=3)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("neighbor_id"),
        F.concat_ws(" ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 12)).alias("snippet"),
    )
    labels = q.select("query_id", "query_label")
    return (
        hits.join(docs, "neighbor_id")
        .join(F.broadcast(labels), "query_id")
        .groupBy("query_id", "query_label")
        .agg(
            F.count("*").alias("k"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col("rank"), F.col("snippet")))),
                    lambda s: s.getField("snippet"),
                ),
                "\n",
            ).alias("context"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sample (§2.4: sampleBy / stratified split)
# ---------------------------------------------------------------------------


@query(
    "stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source, rn FROM ranked WHERE rn <= 5
    ORDER BY lang, source, rn
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling on a composite key
    (fai_combined_3_12.py:269-273 ``stratify=[doc_label_idx,
    is_first_page]``): ≤5 docs per (lang, source) stratum. The order
    key is md5(doc_id) — an unbiased, engine-independent 'random'
    order, unlike rand(seed) whose stream differs between pandas,
    Spark and DuckDB (SURVEY §7 sampling-parity risk)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .orderBy("lang", "source", "rn")
    )


# ---------------------------------------------------------------------------
# As-of enrichment over events (the scale-path as-of join)
# ---------------------------------------------------------------------------


@query(
    "events_asof_enrich",
    oracle="""
    WITH ordered AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             last_value(CASE WHEN event_type = 'click'
                             THEN CAST(floor(epoch(ts)) AS BIGINT) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_s
      FROM events
    )
    SELECT event_id, user_id, ts_s AS purchase_ts, last_click_s,
           ts_s - last_click_s AS gap_seconds
    FROM ordered WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def events_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as a single window (no range join, no
    cross product): each purchase picks the user's most recent
    strictly-earlier click. One shuffle on user_id; per-user state is
    one running value, so the plan survives 100× scale — this is the
    union-marker as-of pattern the reference's pred↔GT alignment
    generalizes to (SURVEY §2.3)."""
    e = load_table(spark, sf_dir, "events")
    ts_s = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enriched = e.select(
        "event_id",
        "user_id",
        "event_type",
        ts_s.alias("ts_s"),
        F.last(F.when(F.col("event_type") == "click", ts_s), ignorenulls=True)
        .over(w)
        .alias("last_click_s"),
    )
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts_s").alias("purchase_ts"),
            "last_click_s",
            (F.col("ts_s") - F.col("last_click_s")).alias("gap_seconds"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Pages → single document assembly (§2.1: single_file_dff.py:43-53)
# ---------------------------------------------------------------------------


@query(
    "pages_to_doc_assembly",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, str_split_regex(trim(text), '\s+') AS ws FROM documents
    ), s AS (
      SELECT doc_id, ws,
             unnest(generate_series(0, greatest(len(ws) - 1, 0), 32)) AS st
      FROM w
    ), pages AS (
      SELECT doc_id, st // 32 AS pg, array_to_string(ws[st+1 : st+32], ' ') AS pg_text
      FROM s
    )
    SELECT doc_id,
           COUNT(*) AS n_pages,
           md5(string_agg(pg_text, chr(10) ORDER BY pg)) AS doc_md5
    FROM pages GROUP BY doc_id ORDER BY doc_id
    """,
)
def pages_to_doc_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages → one document text (single_file_dff.py:43-53,
    ib_2_27.py:40-48: read per-page rows, join with '\\n'): page-split
    the corpus (32-word pages), then reassemble per doc via
    rank-ordered collect_list + array_join — collect_list alone is
    order-nondeterministic under shuffle, so the sort_array(struct)
    pattern is the parity-safe ordered aggregation. One shuffle on
    doc_id; emits an md5 so the result row stays narrow at any scale."""
    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents")
    pages = T.explode_chunks(d, text_col="text", id_cols=["doc_id"], chunk_size=32, overlap=0)
    assembled = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("chunk_idx"), F.col("chunk_text")))),
            lambda s: s.getField("chunk_text"),
        ),
        "\n",
    )
    return (
        pages.groupBy("doc_id")
        .agg(F.count("*").alias("n_pages"), F.md5(assembled).alias("doc_md5"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Wide extraction pivot with "last" semantics (§1.1 wide form,
# post_pro_9_8.py:118-124 pivot_table aggfunc='last')
# ---------------------------------------------------------------------------


@query(
    "extraction_pivot_wide",
    oracle="""
    WITH long AS (
      SELECT doc_id, u.field AS field, u.value AS value, u.ord AS ord
      FROM documents,
           unnest(list_filter([
             {'field': 'money',  'value': '$' || CAST(length(text) % 500 AS VARCHAR) || '.00', 'ord': 1},
             CASE WHEN doc_id % 2 = 0
                  THEN {'field': 'money', 'value': '$' || CAST(length(text) % 500 AS VARCHAR) || '.99', 'ord': 2}
                  ELSE NULL END,
             {'field': 'date',   'value': 'd' || CAST(doc_id % 28 + 1 AS VARCHAR), 'ord': 1},
             {'field': 'vendor', 'value': source, 'ord': 1}
           ], s -> s IS NOT NULL)) AS r(u)
    )
    SELECT doc_id,
           arg_max(value, ord) FILTER (WHERE field = 'money')  AS money,
           arg_max(value, ord) FILTER (WHERE field = 'date')   AS "date",
           arg_max(value, ord) FILTER (WHERE field = 'vendor') AS vendor
    FROM long GROUP BY doc_id ORDER BY doc_id
    """,
)
def extraction_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide extraction pivot with pandas aggfunc='last' semantics
    (post_pro_9_8.py:118-124): multiple revisions per (doc, field),
    the wide cell takes the LAST by an explicit ord — max_by makes the
    'last' well-defined (SURVEY §7: pandas 'last' is order-dependent;
    ours pins the ordering so the oracle can match). Fixed pivot
    domain → no extra distinct-values job, single shuffle."""
    d = load_table(spark, sf_dir, "documents")
    money1 = F.concat(F.lit("$"), (F.length("text") % 500).cast("string"), F.lit(".00"))
    money2 = F.concat(F.lit("$"), (F.length("text") % 500).cast("string"), F.lit(".99"))
    entry = lambda f, v, o: F.struct(  # noqa: E731
        F.lit(f).alias("field"), v.alias("value"), F.lit(o).alias("ord")
    )
    entries = F.filter(
        F.array(
            entry("money", money1, 1),
            F.when(F.col("doc_id") % 2 == 0, entry("money", money2, 2)),
            entry("date", F.concat(F.lit("d"), (F.col("doc_id") % 28 + 1).cast("string")), 1),
            entry("vendor", F.col("source"), 1),
        ),
        lambda s: s.isNotNull(),
    )
    long = d.select("doc_id", F.inline(entries))
    return (
        long.groupBy("doc_id")
        .pivot("field", ["money", "date", "vendor"])
        .agg(F.max_by("value", "ord"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Prompt assembly (§2.9: rag_3_4.py:403-457, prompts:1-51)
# ---------------------------------------------------------------------------


@query(
    "prompt_assembly",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, trim(text) AS t, str_split_regex(trim(text), '\s+') AS ws
      FROM documents
    ), trunc AS (
      SELECT doc_id,
             CASE WHEN len(ws) <= 30 THEN t
                  ELSE array_to_string(ws[1:15], ' ') || ' ' ||
                       array_to_string(ws[len(ws)-14 : len(ws)], ' ') END AS body
      FROM w
    )
    SELECT doc_id,
           CAST(length(p) AS BIGINT) AS prompt_chars,
           md5(p) AS prompt_md5
    FROM (
      SELECT doc_id,
             'You are a document classifier.' || chr(10) || 'Document:' || chr(10)
             || body || chr(10)
             || 'Question: What is the document type?' || chr(10) || 'Answer:' AS p
      FROM trunc)
    ORDER BY doc_id
    """,
)
def prompt_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt-template assembly for the classification task
    (rag_3_4.py:403-457; template corpus prompts:1-51): truncate the
    document (the reference's manual compute-pruning stage) and splice
    it into the fixed template — pure concat, narrow stage, feeding
    the pluggable mapInPandas model stage (operators/extract.py). The
    emitted row is (length, md5) so the result stays narrow at scale."""
    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents")
    p = F.concat(
        F.lit("You are a document classifier.\nDocument:\n"),
        T.truncate_words(F.col("text"), 15, 15),
        F.lit("\nQuestion: What is the document type?\nAnswer:"),
    )
    return d.select(
        "doc_id",
        F.length(p).cast("bigint").alias("prompt_chars"),
        F.md5(p).alias("prompt_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Query expansion (RAG_1.py:56-75)
# ---------------------------------------------------------------------------

_SYNONYMS = {
    "big": "large", "small": "tiny", "fast": "quick",
    "slow": "sluggish", "join": "merge", "window": "frame",
}

_D_SYN_CASE = "CASE lower(w) " + " ".join(
    f"WHEN '{k}' THEN ' {v}'" for k, v in _SYNONYMS.items()
) + " ELSE '' END"


@query(
    "query_expansion",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, str_split_regex(trim(text), '\\s+')[1:8] AS qw FROM documents
    )
    SELECT doc_id,
           array_to_string(qw, ' ') AS query_text,
           array_to_string(list_transform(qw, w -> w || {_D_SYN_CASE}), ' ') AS expanded,
           CAST(len(list_filter(qw, w -> lower(w) IN ({", ".join(f"'{k}'" for k in _SYNONYMS)})))
                AS BIGINT) AS n_added
    FROM q ORDER BY doc_id
    """,
)
def query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query expansion (RAG_1.py:56-75): append each query word's
    first synonym. The engine default is an explicit synonym map as a
    pure-JVM CASE chain inside ``transform`` (no Python, no model);
    the gated WordNet UDF (operators/encode.wordnet_expander_udf) is
    the production drop-in. Queries here are the first 8 words of each
    document."""
    from ..functions.text import expand_query_terms, words

    d = load_table(spark, sf_dir, "documents")
    qw = F.slice(words(F.col("text")), 1, 8)
    query_text = F.concat_ws(" ", qw)
    added = F.size(
        F.filter(qw, lambda w: F.lower(w).isin(*[k.lower() for k in _SYNONYMS]))
    ).cast("bigint")
    return d.select(
        "doc_id",
        query_text.alias("query_text"),
        expand_query_terms(query_text, _SYNONYMS).alias("expanded"),
        added.alias("n_added"),
    ).orderBy("doc_id")
