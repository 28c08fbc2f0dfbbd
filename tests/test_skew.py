"""Skew-tool equivalence tests: salted plans return exactly what the
naive plans return, on data with one dominating hot key."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.operators.skew import (
    salted_join,
    two_phase_count_distinct,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 5000 rows for the hot key, a handful for everything else
    big = spark.range(5000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    ).unionByName(
        spark.range(50).select(
            F.concat(F.lit("cold"), (F.col("id") % 10)).alias("k"), F.col("id").alias("v")
        )
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold0", "C0"), ("cold5", "C5"), ("missing", "M")],
        ["k", "meta"],
    )
    return big, small


def test_salted_join_matches_plain_inner(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").groupBy("k", "meta").count()
    salted = salted_join(big, small, "k", n_salts=8).groupBy("k", "meta").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k", "left").groupBy("k", "meta").count()
    salted = salted_join(big, small, "k", n_salts=8, how="left").groupBy("k", "meta").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_count_distinct(spark, skewed):
    big, _ = skewed
    df = big.withColumn("v", F.col("v") % 100)  # duplicates per key
    naive = {
        r.k: r.n for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    two = {r.k: r.n_distinct for r in two_phase_count_distinct(df, "k", "v").collect()}
    assert naive == two
