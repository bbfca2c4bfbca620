"""Heavy-hitter key-skew card (llm/profile.py) and event transition
matrix (operators/events.py): hand-checked arithmetic, NULL folding,
tie-breaks and config validation. The sf-scale oracle parity rides in
test_oracle_parity via the declared fixtures."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.profile import (HeavyHittersConfig,
                                             build_heavy_hitters)
from datavault4dbt_spark.operators.events import (TransitionMatrixConfig,
                                                  build_transition_matrix)


def _reg(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def test_heavy_hitters_counts_nulls_and_truncates_at_k(spark):
    reg = _reg(spark, [("a",), ("a",), ("a",), (None,), (None,), ("b",),
                       ("c",), ("d",)], "k string")
    cfg = HeavyHittersConfig("h", "t", ("k",), k=3)
    rows = {r["rnk"]: (r["value"], r["cnt"], r["share_ppm"])
            for r in build_heavy_hitters(spark, reg, cfg).collect()}
    # NULLs fold to the sentinel and rank like any value; b/c/d ties
    # break on value asc and the card truncates at k=3
    assert rows == {1: ("a", 3, 375_000), 2: ("<NULL>", 2, 250_000),
                    3: ("b", 1, 125_000)}


def test_heavy_hitters_integer_cast_is_portable(spark):
    reg = _reg(spark, [(7,), (7,), (9,)], "k bigint")
    cfg = HeavyHittersConfig("h", "t", ("k",), k=2)
    got = [(r["value"], r["cnt"])
           for r in build_heavy_hitters(spark, reg, cfg)
           .orderBy("rnk").collect()]
    assert got == [("7", 2), ("9", 1)]


def test_heavy_hitters_validation():
    with pytest.raises(ValueError, match="non-empty"):
        HeavyHittersConfig("x", "t", ())
    with pytest.raises(ValueError, match="k must be"):
        HeavyHittersConfig("x", "t", ("a",), k=0)
    with pytest.raises(ValueError, match="duplicate columns"):
        HeavyHittersConfig("x", "t", ("a", "a"))


def test_transition_matrix_hand_checked(spark):
    rows = [
        (1, 100, 1, "view"), (1, 200, 2, "click"), (1, 300, 3, "buy"),
        (2, 100, 4, "view"), (2, 150, 5, "view"),
    ]
    reg = _reg(spark, rows, "user_id bigint, ts bigint, "
                            "event_id bigint, event_type string")
    cfg = TransitionMatrixConfig("m", "t")
    got = {(r["from_event"], r["to_event"]):
           (r["n_transitions"], r["from_total"], r["p_ppm"])
           for r in build_transition_matrix(spark, reg, cfg).collect()}
    assert got == {
        ("view", "click"): (1, 3, 333_333),
        ("view", "view"): (1, 3, 333_333),
        ("view", "<END>"): (1, 3, 333_333),
        ("click", "buy"): (1, 1, 1_000_000),
        ("buy", "<END>"): (1, 1, 1_000_000),
    }


def test_transition_matrix_duplicate_ts_breaks_on_id(spark):
    rows = [(1, 100, 2, "b"), (1, 100, 1, "a"), (1, 100, 3, "c")]
    reg = _reg(spark, rows, "user_id bigint, ts bigint, "
                            "event_id bigint, event_type string")
    cfg = TransitionMatrixConfig("m", "t")
    got = {(r["from_event"], r["to_event"])
           for r in build_transition_matrix(spark, reg, cfg).collect()}
    # id order a(1) -> b(2) -> c(3) regardless of input row order
    assert got == {("a", "b"), ("b", "c"), ("c", "<END>")}
