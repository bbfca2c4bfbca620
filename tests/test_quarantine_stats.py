"""Schema-contract quarantine (operators/quarantine.py) and exact
second-moment census (llm/profile.py): hand-checked semantics. sf-scale
oracle parity rides in test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.profile import (SufficientStatsConfig,
                                             build_sufficient_stats)
from datavault4dbt_spark.operators.quarantine import (QuarantineConfig,
                                                      split_lanes)


def _reg(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def _cfg(**kw):
    base = dict(
        name="q", source="t",
        rules=(("positive", "v > 0"), ("small", "v < 100")),
        id_cols=("id",), payload_cols=("v",))
    base.update(kw)
    return QuarantineConfig(**base)


def test_lanes_partition_source_and_reasons_are_ordered(spark):
    rows = [(1, 5), (2, -1), (3, 500), (4, -200)]
    reg = _reg(spark, rows, "id bigint, v bigint")
    valid, quar = split_lanes(spark, reg, _cfg())
    assert {r["id"] for r in valid.collect()} == {1}
    got = {r["id"]: r["failed_rules"] for r in quar.collect()}
    # -200 fails only 'positive'; 500 only 'small'; declaration order
    assert got == {2: "positive", 3: "small", 4: "positive"}


def test_null_predicate_quarantines(spark):
    rows = [(1, None), (2, 5)]
    reg = _reg(spark, rows, "id bigint, v bigint")
    _valid, quar = split_lanes(spark, reg, _cfg())
    got = {r["id"]: r["failed_rules"] for r in quar.collect()}
    # NULL v makes BOTH predicates NULL -> both rules fail
    assert got == {1: "positive,small"}


def test_quarantine_validation():
    with pytest.raises(ValueError, match="non-empty"):
        _cfg(rules=())
    with pytest.raises(ValueError, match="non-empty"):
        _cfg(id_cols=())
    with pytest.raises(ValueError, match="lowercase token"):
        _cfg(rules=(("Bad Rule", "v > 0"),))


def test_sufficient_stats_hand_checked(spark):
    rows = [("a", 1, 10), ("a", 2, 20), ("b", 3, 30)]
    reg = _reg(spark, rows, "g string, x bigint, y bigint")
    cfg = SufficientStatsConfig("s", "t", group_col="g",
                                x_expr="x", y_expr="y")
    got = {r["g"]: (r["n"], r["sum_x"], r["sum_y"], r["sum_xx"],
                    r["sum_yy"], r["sum_xy"])
           for r in build_sufficient_stats(spark, reg, cfg).collect()}
    assert got == {"a": (2, 3, 30, 5, 500, 50),
                   "b": (1, 3, 30, 9, 900, 90)}


def test_sufficient_stats_recover_variance_and_correlation(spark):
    import math
    rows = [("g", x, 3 * x + 1) for x in range(1, 11)]   # exact line
    reg = _reg(spark, rows, "g string, x bigint, y bigint")
    cfg = SufficientStatsConfig("s", "t", group_col="g",
                                x_expr="x", y_expr="y")
    r = build_sufficient_stats(spark, reg, cfg).collect()[0]
    n = r["n"]
    cov = n * r["sum_xy"] - r["sum_x"] * r["sum_y"]
    vx = n * r["sum_xx"] - r["sum_x"] ** 2
    vy = n * r["sum_yy"] - r["sum_y"] ** 2
    assert cov * cov == vx * vy            # |corr| == 1, exactly
    assert math.isclose(cov / math.sqrt(vx * vy), 1.0)
