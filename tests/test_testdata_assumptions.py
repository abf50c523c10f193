"""Testdata-contract assertions: the driver regenerates
/root/testdata between rounds and has already changed physical types
across regenerations (events.ts: nanos-bigint → µs-no-tz). These
tests fail LOUDLY at round start if an assumption the engine relies
on drifts, instead of surfacing as a cryptic mid-query error."""

from pyspark.sql import functions as F

from data_ingestion_task_spark.sources.tables import TABLES, load_table


def test_all_tables_load(spark, sf_dir):
    for t in TABLES:
        assert load_table(spark, sf_dir, t).limit(1).count() >= 0, t


def test_events_ts_normalizes_to_ltz(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    assert dict(e.dtypes)["ts"] == "timestamp", (
        "events.ts must land on TIMESTAMP_LTZ whatever the parquet "
        "physical type — extend load_table's normalization"
    )
    # sane epoch range (catches an epoch-seconds/nanos mixup instantly)
    years = e.select(F.year("ts").alias("y")).agg(F.min("y"), F.max("y")).collect()[0]
    assert 2000 <= years[0] <= years[1] <= 2100


def test_key_columns_present(spark, sf_dir):
    expectations = {
        "documents": {"doc_id", "text", "lang", "source"},
        "embeddings": {"vec_id", "label", "embedding"},
        "customer": {"c_custkey", "c_name", "c_mktsegment"},
        "supplier": {"s_suppkey", "s_name"},
        "orders": {"o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"},
        "lineitem": {"l_orderkey", "l_linenumber", "l_extendedprice", "l_partkey"},
        "events": {"event_id", "ts", "user_id", "event_type", "props"},
    }
    for t, cols in expectations.items():
        have = set(load_table(spark, sf_dir, t).columns)
        missing = cols - have
        assert not missing, f"{t} lost columns the engine renders from: {missing}"


def test_documents_text_never_blank(spark, sf_dir):
    """Pretrain-plan oracles word-count with DuckDB str_split_regex,
    which yields 1 for ''-after-trim where Spark's word_len yields 0.
    The oracles carry a blank-guard CASE, but this pins the stronger
    contract so a testdata regeneration that starts emitting blank/NULL
    text fails loudly at round start (ADVICE r3)."""
    n = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNull() | (F.trim("text") == ""))
        .count()
    )
    assert n == 0, f"{n} documents rows have NULL/blank text"


def test_embedding_dim_stable(spark, sf_dir):
    dim = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.size("embedding").alias("d"))
        .agg(F.min("d"), F.max("d"))
        .collect()[0]
    )
    assert dim[0] == dim[1] == 64, (
        "vector plans hard-code DIM=64 (hyperplane literals in oracles) — "
        "update plans/vector_plans.DIM and regenerate if this drifts"
    )
