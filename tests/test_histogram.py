"""Fixed-width integer histogram (llm/profile.py): hand-checked bin
arithmetic, NULL exclusion, degenerate inputs. The sf-scale oracle
parity rides in test_oracle_parity via the declared fixture."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.profile import (HistogramConfig,
                                             build_histogram)


def _reg(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def test_bins_are_exact_integer_ranges(spark):
    # lo=0 hi=9, 5 bins -> width = 9 div 5 + 1 = 2
    reg = _reg(spark, range(10))
    cfg = HistogramConfig("h", "t", "v", n_bins=5)
    rows = {r["bin"]: (r["bin_lo"], r["bin_hi"], r["cnt"], r["share_ppm"])
            for r in build_histogram(spark, reg, cfg).collect()}
    assert rows == {b: (2 * b, 2 * b + 1, 2, 200_000) for b in range(5)}


def test_nulls_excluded_and_max_lands_in_last_bin(spark):
    reg = _reg(spark, [0, 100, None])
    cfg = HistogramConfig("h", "t", "v", n_bins=4)   # width 26
    rows = {r["bin"]: r["cnt"]
            for r in build_histogram(spark, reg, cfg).collect()}
    assert rows == {0: 1, 3: 1}          # 100 div 26 = 3 < n_bins
    total = sum(rows.values())
    assert total == 2                    # NULL excluded


def test_constant_column_single_bin(spark):
    reg = _reg(spark, [7, 7, 7])
    cfg = HistogramConfig("h", "t", "v", n_bins=10)  # width 1
    rows = build_histogram(spark, reg, cfg).collect()
    assert len(rows) == 1
    assert (rows[0]["bin"], rows[0]["bin_lo"], rows[0]["bin_hi"],
            rows[0]["cnt"], rows[0]["share_ppm"]) == (0, 7, 7, 3, 1_000_000)


def test_all_null_returns_empty_with_schema(spark):
    reg = _reg(spark, [None, None])
    cfg = HistogramConfig("h", "t", "v", n_bins=3)
    df = build_histogram(spark, reg, cfg)
    assert df.count() == 0
    assert df.columns == ["bin", "bin_lo", "bin_hi", "cnt", "share_ppm"]


def test_validation():
    with pytest.raises(ValueError, match="n_bins"):
        HistogramConfig("h", "t", "v", n_bins=0)
