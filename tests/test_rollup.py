"""Grouping-sets census (operators/rollup.py): hand-checked subtotal
arithmetic, NULL-group vs rolled-up disambiguation via GROUPING flags,
and config validation. The sf-scale oracle parity rides in
test_oracle_parity via the declared fixtures."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.operators.rollup import (
    GroupingSetsConfig, build_grouping_sets)


def _reg(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def test_rollup_subtotals_hand_checked(spark):
    reg = _reg(spark, [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)],
               "k1 string, k2 string, v double")
    cfg = GroupingSetsConfig("r", "t", ("k1", "k2"), mode="rollup",
                             sum_cents=(("s", "v"),))
    got = {(r["k1"], r["k2"], r["g_k1"], r["g_k2"]): (r["n_rows"], r["s"])
           for r in build_grouping_sets(spark, reg, cfg).collect()}
    assert got == {
        ("a", "x", 0, 0): (1, 100), ("a", "y", 0, 0): (1, 200),
        ("b", "x", 0, 0): (1, 400),
        ("a", None, 0, 1): (2, 300), ("b", None, 0, 1): (1, 400),
        (None, None, 1, 1): (3, 700),
    }


def test_cube_includes_column_marginals(spark):
    reg = _reg(spark, [("a", "x", 1.0), ("b", "x", 2.0)],
               "k1 string, k2 string, v double")
    cfg = GroupingSetsConfig("c", "t", ("k1", "k2"), mode="cube",
                             sum_cents=(("s", "v"),))
    got = {(r["k1"], r["k2"], r["g_k1"], r["g_k2"]): (r["n_rows"], r["s"])
           for r in build_grouping_sets(spark, reg, cfg).collect()}
    # the k2-only marginal (absent from rollup) is the cube's addition
    assert got[(None, "x", 1, 0)] == (2, 300)
    assert got[(None, None, 1, 1)] == (2, 300)
    assert len(got) == 2 + 2 + 1 + 1  # cells + k1 rows + k2 row + total


def test_grouping_flag_disambiguates_genuine_null_group(spark):
    reg = _reg(spark, [(None, 1.0), ("a", 2.0)], "k1 string, v double")
    cfg = GroupingSetsConfig("n", "t", ("k1",), mode="rollup",
                             sum_cents=(("s", "v"),))
    rows = {(r["k1"], r["g_k1"]): (r["n_rows"], r["s"])
            for r in build_grouping_sets(spark, reg, cfg).collect()}
    # the genuine-NULL group and the grand total share k1=NULL but
    # differ on the GROUPING flag
    assert rows[(None, 0)] == (1, 100)
    assert rows[(None, 1)] == (2, 300)


def test_config_validation():
    with pytest.raises(ValueError, match="rollup|cube"):
        GroupingSetsConfig("x", "t", ("a",), mode="rollupx")
    with pytest.raises(ValueError, match="non-empty"):
        GroupingSetsConfig("x", "t", ())
    with pytest.raises(ValueError, match="capped"):
        GroupingSetsConfig("x", "t", tuple("abcdef"), mode="cube")
    # rollup is linear fan-out: 6 dims allowed
    GroupingSetsConfig("x", "t", tuple("abcdef"), mode="rollup")
    with pytest.raises(ValueError, match="duplicate group"):
        GroupingSetsConfig("x", "t", ("a", "a"))
    with pytest.raises(ValueError, match="collides"):
        GroupingSetsConfig("x", "t", ("a",),
                           sum_cents=(("g_a", "v"),))
    with pytest.raises(ValueError, match="collides"):
        GroupingSetsConfig("x", "t", ("a",),
                           sum_cents=(("s", "v"), ("s", "w")))
