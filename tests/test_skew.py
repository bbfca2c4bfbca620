"""Salted join / two-stage aggregation: identical results to the plain
plan on a deliberately skewed dataset, with the salt visible in the
shuffle keys."""

import pytest
from pyspark.sql import functions as F

from datavault4dbt_spark.functions.skew import salted_join, salted_aggregate


@pytest.fixture(scope="module")
def skewed(spark):
    """One hot key carrying 90% of the rows + a long tail."""
    left = spark.range(0, 10000).selectExpr(
        "CASE WHEN id < 9000 THEN 'hot' ELSE concat('k', id % 97) END AS k",
        "id AS v")
    right = (spark.range(0, 98)
             .selectExpr("concat('k', id) AS k", "id AS rv")
             .union(spark.sql("SELECT 'hot' AS k, -1 AS rv")))
    return left.persist(), right.persist()


def test_salted_inner_join_equals_plain(spark, skewed):
    left, right = skewed
    got = salted_join(left, right, ["k"], n_salts=8)
    want = left.join(right, on="k")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # the physical join really keys on (k, salt)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__dv_salt" in plan


def test_salted_left_join_keeps_unmatched(spark, skewed):
    left, _right = skewed
    right = spark.sql("SELECT 'hot' AS k, -1 AS rv")  # tail keys unmatched
    got = salted_join(left, right, ["k"], n_salts=4, how="left")
    want = left.join(right, on="k", how="left")
    assert got.count() == want.count() == left.count()
    assert got.filter("rv IS NULL").count() == \
        want.filter("rv IS NULL").count() > 0


def test_salted_join_rejects_replication_unsafe_how(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, ["k"], how="full")


def test_salted_aggregate_equals_plain(spark, skewed):
    left, _right = skewed
    got = salted_aggregate(
        left, ["k"],
        {"n": ("v", "count"), "total": ("v", "sum"),
         "lo": ("v", "min"), "hi": ("v", "max")}, n_salts=8)
    want = left.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("total"),
        F.min("v").alias("lo"), F.max("v").alias("hi"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_salted_aggregate_rejects_non_algebraic(spark, skewed):
    left, _right = skewed
    with pytest.raises(ValueError, match="algebraic"):
        salted_aggregate(left, ["k"], {"a": ("v", "avg")})
