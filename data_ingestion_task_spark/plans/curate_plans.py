"""The corpus-curation FACADE under the oracle gate: one registered
query that runs ``api.curate_corpus`` end-to-end on raw documents —
Gopher rule flags, exact-dup detection, and the r9 raw-docs scoring
path (trigram-perplexity band + DSIR floor computed internally via
``functions/corpus_scores.py``) — against a DuckDB twin that rebuilds
every flag from first principles. The component queries
(``gopher_quality_filter``, ``dedup_exact``,
``char_trigram_perplexity``, ``dsir_importance_weights``) certify the
pieces; this certifies their COMPOSITION and the facade's flag/keep
semantics (independent stages, NULL-safe booleans, absent-score docs
not kept).

Reference grounding: the reference's curation loop applies its quality
rules, dedup check, and score thresholds in one pass per corpus sweep
(the validation_confirmation_feedback.py staging idiom); the facade is
that sweep as a single declarative plan.

Scale notes (100 TB): the facade composes the certified components
without adding exchanges of its own — Gopher flags are pure column
exprs (zero shuffle), exact-dup is one hash window on the md5
fingerprint, both score models are broadcast-bounded (≤ 37³-row
trigram table, 256-row DSIR table), and the flag joins are id-grain
equi-joins. Per-stage scale rows live with the component queries.

Parity armor: band/floor flags compare the SAME 6-dp-rounded DECIMAL
sums the certified scorer queries pin, so the only new cross-engine
surface is boolean logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..api import curate_corpus
from ..sources.tables import load_table
from .quality_plans import _D_NORM_TEXT, _D_RAW_WS, _GOPHER_STOPWORDS, _d_hash64
from ..functions.corpus_scores import DSIR_BUCKETS
from .registry import query

# Band/floor chosen from the corpus quartiles at the gate SFs so every
# flag is non-trivial (both true and false rows) at sf0.001 and sf0.01.
_PPX_LO, _PPX_HI = 5.34, 5.39
_DSIR_FLOOR = -0.014

_ORACLE = f"""
    WITH corpus AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, lang, text FROM documents
      WHERE doc_id < 30
    ),
    m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             len(array_to_string(ws, '')) AS n_word_chars,
             len(list_intersect(list_distinct(list_transform(ws, w -> lower(w))),
                                {_GOPHER_STOPWORDS!r})) AS n_stop,
             len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
             len(txt) - len(replace(txt, '#', ''))
               + (len(txt) - len(replace(txt, '...', ''))) // 3 AS n_sym
      FROM (SELECT doc_id, {_D_RAW_WS} AS ws, trim(text) AS txt FROM corpus)
    ),
    g AS (
      SELECT doc_id, n_words,
             n_words >= 20 AND n_words <= 100000 AS word_count_ok,
             3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words
               AS mean_word_len_ok,
             10 * n_sym <= n_words AS symbol_ok,
             n_stop >= 2 AS stopwords_ok,
             5 * n_alpha >= 4 * n_words AS alpha_ok
      FROM m
    ),
    fp AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY md5({_D_NORM_TEXT})
                                ORDER BY doc_id) > 1 AS exact_dup
      FROM corpus
    ),
    t AS (
      SELECT doc_id, {_D_NORM_TEXT} AS txt FROM corpus
      WHERE len({_D_NORM_TEXT}) >= 3
    ),
    tri AS (
      SELECT doc_id, substr(txt, i, 3) AS tri
      FROM (SELECT doc_id, txt,
                   unnest(generate_series(1, len(txt) - 2)) AS i
            FROM t)
    ),
    c AS (SELECT tri, COUNT(*) AS cnt FROM tri GROUP BY tri),
    tot AS (SELECT SUM(cnt) AS n FROM c),
    rate AS (
      SELECT c.tri,
             CAST(round(-ln(CAST(c.cnt AS DOUBLE) / CAST(tot.n AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS nll
      FROM c CROSS JOIN tot
    ),
    ppx AS (
      SELECT tri.doc_id,
             CAST(round(CAST(SUM(rate.nll) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS avg_nll
      FROM tri JOIN rate USING (tri) GROUP BY tri.doc_id
    ),
    w AS (
      SELECT doc_id, lang, {_d_hash64("word")} % {DSIR_BUCKETS} AS bucket
      FROM (SELECT doc_id, lang, unnest(str_split({_D_NORM_TEXT}, ' ')) AS word
            FROM corpus)
    ),
    r AS (SELECT bucket, COUNT(*) AS cr FROM w GROUP BY bucket),
    tt AS (SELECT bucket, COUNT(*) AS ct FROM w WHERE lang = 'en' GROUP BY bucket),
    wtot AS (SELECT COUNT(*) AS R,
                    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS T
             FROM w),
    drate AS (
      SELECT r.bucket,
             CAST(round(ln(
               CAST((COALESCE(tt.ct, 0) + 1) * (wtot.R + {DSIR_BUCKETS}) AS DOUBLE)
               / CAST((r.cr + 1) * (wtot.T + {DSIR_BUCKETS}) AS DOUBLE)
             ), 6) AS DECIMAL(18,6)) AS lr
      FROM r LEFT JOIN tt USING (bucket) CROSS JOIN wtot
    ),
    dsir AS (
      SELECT w.doc_id,
             CAST(round(CAST(SUM(drate.lr) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS lw
      FROM w JOIN drate USING (bucket) GROUP BY w.doc_id
    )
    SELECT d.doc_id, g.n_words,
           g.word_count_ok, g.mean_word_len_ok, g.symbol_ok,
           g.stopwords_ok, g.alpha_ok,
           COALESCE(g.word_count_ok AND g.mean_word_len_ok AND g.symbol_ok
                    AND g.stopwords_ok AND g.alpha_ok, FALSE) AS quality_keep,
           fp.exact_dup,
           COALESCE(ppx.avg_nll BETWEEN {_PPX_LO} AND {_PPX_HI}, FALSE)
             AS ppx_kept,
           COALESCE(dsir.lw >= {_DSIR_FLOOR}, FALSE) AS dsir_kept,
           COALESCE(g.word_count_ok AND g.mean_word_len_ok AND g.symbol_ok
                    AND g.stopwords_ok AND g.alpha_ok, FALSE)
             AND NOT fp.exact_dup
             AND COALESCE(ppx.avg_nll BETWEEN {_PPX_LO} AND {_PPX_HI}, FALSE)
             AND COALESCE(dsir.lw >= {_DSIR_FLOOR}, FALSE) AS keep
    FROM corpus d
    JOIN g USING (doc_id)
    JOIN fp USING (doc_id)
    LEFT JOIN ppx USING (doc_id)
    LEFT JOIN dsir USING (doc_id)
    ORDER BY doc_id
"""


@query("curated_corpus_audit", oracle=_ORACLE)
def curated_corpus_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``api.curate_corpus`` end-to-end with the r9 raw-docs scoring
    path: no precomputed score frames — the facade computes the
    trigram-perplexity band and the DSIR floor itself (target =
    ``lang = 'en'``), composes them with the Gopher rules and
    exact-dup detection, and emits one auditable row per doc. The
    corpus is documents plus planted exact copies at ``+200000`` (the
    ``dedup_plans._corpus`` convention) so the ``exact_dup`` flag has
    true rows to certify. The DuckDB twin rebuilds every flag from the
    certified component expressions, so the gate pins the composition
    (flag independence, NULL-safe keep, unscorable-docs-not-kept), not
    just the parts. Caller contract: the facade's internally persisted
    trigram grain rides out on ``_cached_deps`` (release via
    ``api.release``)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    planted = d.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "lang", "text"
    )
    scored = curate_corpus(
        d.unionByName(planted),
        ppx_band=(_PPX_LO, _PPX_HI),
        dsir_floor=_DSIR_FLOOR,
        dsir_target=F.col("lang") == "en",
    )
    out = scored.orderBy("doc_id")
    out._cached_deps = getattr(scored, "_cached_deps", [])
    return out
