"""Market-basket co-occurrence (operators/basket.py): hand-checked
pair counts, apriori prune, basket cap, duplicate-line collapsing.
The sf-scale oracle parity rides in test_oracle_parity via the
declared fixture (part_cooccurrence)."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.operators.basket import (CooccurrenceConfig,
                                                  build_cooccurrence)


def _reg(spark, rows):
    df = spark.createDataFrame(rows, "b bigint, i bigint")
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def _cfg(**kw):
    base = dict(source="t", basket_col="b", item_col="i",
                min_item_support=1, min_pair_support=1,
                max_basket_size=100)
    base.update(kw)
    return CooccurrenceConfig("co", **base)


def _rows(spark, reg, cfg):
    return {(r["item_a"], r["item_b"]):
            (r["n_a"], r["n_b"], r["n_pair"], r["n_baskets_total"])
            for r in build_cooccurrence(spark, reg, cfg).collect()}


def test_pair_counts_and_supports(spark):
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10)]
    got = _rows(spark, _reg(spark, rows), _cfg())
    assert got == {(10, 20): (3, 2, 2, 3)}


def test_duplicate_lines_collapse_to_distinct_level(spark):
    rows = [(1, 10), (1, 10), (1, 20)]      # item 10 twice in basket 1
    got = _rows(spark, _reg(spark, rows), _cfg())
    assert got == {(10, 20): (1, 1, 1, 1)}


def test_apriori_prune_drops_rare_items(spark):
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (1, 99)]
    got = _rows(spark, _reg(spark, rows), _cfg(min_item_support=2))
    assert got == {(10, 20): (2, 2, 2, 2)}   # 99 never pairs


def test_pair_support_threshold(spark):
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)]
    got = _rows(spark, _reg(spark, rows), _cfg(min_pair_support=2))
    assert got == {(10, 20): (3, 2, 2, 3)}   # (10,30) seen once -> out


def test_oversized_basket_dropped_but_counts_stay_raw(spark):
    rows = [(1, 10), (1, 20), (1, 30),       # basket 1 too big
            (2, 10), (2, 20)]
    got = _rows(spark, _reg(spark, rows), _cfg(max_basket_size=2))
    # supports and the basket total stay raw; only pairs lose basket 1
    assert got == {(10, 20): (2, 2, 1, 2)}


def test_validation():
    with pytest.raises(ValueError, match="min_item_support"):
        _cfg(min_item_support=0)
    with pytest.raises(ValueError, match="max_basket_size"):
        _cfg(max_basket_size=1)
