"""Salted-join tests (SCALE.md §4): row-identical to the plain join,
and the join key actually carries the salt (so the hot key's rows
spread across n_salts shuffle partitions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_task_spark.operators.skew import salted_join


@pytest.fixture()
def skewed_pair(spark):
    # one hot key (90%), several cold keys
    big = spark.range(2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, "HOT").otherwise(
            F.concat(F.lit("cold_"), (F.col("id") % 7).cast("string"))
        ).alias("label"),
        (F.col("id") * 3).alias("payload"),
    )
    small = spark.createDataFrame(
        [("HOT", 1)] + [(f"cold_{i}", 100 + i) for i in range(7)], "label string, dim int"
    )
    return big, small


def test_salted_join_matches_plain_join(spark, skewed_pair):
    big, small = skewed_pair
    plain = big.join(small, "label")
    salted = salted_join(big, small, "label", big_row_key="row_id", n_salts=8)
    assert salted.count() == plain.count()
    cols = ["label", "row_id", "payload", "dim"]
    assert salted.select(cols).exceptAll(plain.select(cols)).count() == 0
    assert plain.select(cols).exceptAll(salted.select(cols)).count() == 0


def test_salt_spreads_hot_key(spark, skewed_pair):
    big, _ = skewed_pair
    salt = F.pmod(F.xxhash64(F.col("row_id")), F.lit(8))
    n_groups = (
        big.filter(F.col("label") == "HOT")
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_groups == 8  # the hot key fans out to every salt bucket


def test_outer_join_and_validation(spark, skewed_pair):
    big, small = skewed_pair
    small2 = small.filter(F.col("label") != "HOT")
    plain = big.join(small2, "label", "left")
    salted = salted_join(big, small2, "label", big_row_key="row_id", n_salts=4, how="left")
    assert salted.count() == plain.count()
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(big, small, "label", big_row_key="row_id", n_salts=0)


def test_salted_join_rejects_outer():
    import pytest as _pytest

    from data_ingestion_task_spark.operators.skew import salted_join

    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(None, None, "k", big_row_key="r", how="full")
