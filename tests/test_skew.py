"""Salted-join correctness on a planted hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 70% of fact rows share key 1 (the AQE-resistant shape: one hot key)
    fact = spark.range(10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 7, 1).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(100).select(
        F.col("id").cast("int").alias("k"), F.concat(F.lit("d"), "id").alias("name")
    )
    return fact, dim


def test_salted_join_equals_plain_join(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").select("row_id", "k", "v", "name")
    salted = salted_join(fact, dim, "k", salt=8).select("row_id", "k", "v", "name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_preserves_fact_rows(skewed):
    fact, dim = skewed
    # restrict dim so some fact keys have no match
    small_dim = dim.filter(F.col("k") < 50)
    out = salted_join(fact, small_dim, "k", salt=8, how="left")
    assert out.count() == fact.count()
    assert out.filter(F.col("name").isNull()).count() > 0


def test_salted_join_spreads_hot_key(skewed):
    """The hot key must occupy `salt` distinct join-key groups."""
    fact, dim = skewed
    f_salted = fact.withColumn("__salt", F.floor(F.rand(42) * 8).cast("int"))
    n_groups = (
        f_salted.filter(F.col("k") == 1).select("__salt").distinct().count()
    )
    assert n_groups == 8


def test_unsupported_how_raises(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="right")
