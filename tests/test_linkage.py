"""Blocked fuzzy record linkage (operators/linkage.py): hand-checked
pair generation, block-cap exclusion, distance threshold, NULL text.
The sf-scale oracle parity rides in test_oracle_parity via the
declared fixture (part_name_linkage)."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.operators.linkage import (BlockedLinkageConfig,
                                                   build_blocked_linkage)


def _reg(spark, rows):
    df = spark.createDataFrame(rows, "id bigint, name string, blk string")
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def _cfg(**kw):
    base = dict(source="t", id_col="id", text_col="name",
                block_cols=("blk",), max_distance=2, max_block_size=100)
    base.update(kw)
    return BlockedLinkageConfig("lk", **base)


def _pairs(spark, reg, cfg):
    return {(r["id_a"], r["id_b"]): r["dist"]
            for r in build_blocked_linkage(spark, reg, cfg).collect()}


def test_pairs_only_within_block_and_ordered(spark):
    reg = _reg(spark, [(1, "widget", "a"), (2, "widgit", "a"),
                       (3, "widget", "b")])   # same name, other block
    got = _pairs(spark, reg, _cfg())
    assert got == {(1, 2): 1}


def test_distance_threshold_and_exact_match(spark):
    reg = _reg(spark, [(1, "bolt", "a"), (2, "bolt", "a"),
                       (3, "boat", "a"), (4, "gearbox", "a")])
    got = _pairs(spark, reg, _cfg(max_distance=1))
    assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}


def test_oversized_block_is_dropped_whole(spark):
    rows = [(i, "same", "hot") for i in range(5)] + \
           [(10, "cold", "c"), (11, "cold", "c")]
    reg = _reg(spark, rows)
    got = _pairs(spark, reg, _cfg(max_block_size=4))
    assert got == {(10, 11): 0}          # the 5-record block never pairs


def test_null_text_never_matches(spark):
    reg = _reg(spark, [(1, None, "a"), (2, "x", "a"), (3, "x", "a")])
    got = _pairs(spark, reg, _cfg())
    assert got == {(2, 3): 0}


def test_validation():
    with pytest.raises(ValueError, match="block_cols"):
        _cfg(block_cols=())
    with pytest.raises(ValueError, match="max_block_size"):
        _cfg(max_block_size=1)
    with pytest.raises(ValueError, match="max_distance"):
        _cfg(max_distance=-1)
