"""Per-stratum percentile trim gate (llm/selection.py): hand-checked
type-1 order-statistic bounds and gate polarity. sf-scale oracle parity
rides in test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.selection import (QuantileGateConfig,
                                               build_quantile_gate)


def _reg(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, "
                                     "n_chars bigint")
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def test_bounds_are_type1_order_statistics(spark):
    rows = [(i, "en", v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8,
                                                9, 10])]
    reg = _reg(spark, rows)
    cfg = QuantileGateConfig("g", "t", p_lo=10, p_hi=90)
    got = build_quantile_gate(spark, reg, cfg).collect()
    lo = {r["q_lo"] for r in got}
    hi = {r["q_hi"] for r in got}
    # n=10: p10 -> first v with cum*100 >= 10*10 -> v=1;
    #       p90 -> first v with cum*100 >= 90*10 -> v=9
    assert lo == {1} and hi == {9}
    outliers = {r["doc_id"] for r in got if r["is_outlier"]}
    assert outliers == {9}                      # only v=10 trims


def test_bounds_are_per_stratum(spark):
    rows = ([(i, "en", 10) for i in range(5)]
            + [(100 + i, "de", 1000 + i) for i in range(5)])
    reg = _reg(spark, rows)
    cfg = QuantileGateConfig("g", "t", p_lo=20, p_hi=80)
    got = {r["doc_id"]: (r["q_lo"], r["q_hi"]) for r in
           build_quantile_gate(spark, reg, cfg).collect()}
    assert got[0] == (10, 10)                    # constant stratum
    assert got[100] == (1000, 1003)              # independent bounds


def test_validation():
    with pytest.raises(ValueError, match="p_lo < p_hi"):
        QuantileGateConfig("g", "t", p_lo=90, p_hi=10)
    with pytest.raises(ValueError, match="p_lo < p_hi"):
        QuantileGateConfig("g", "t", p_lo=5, p_hi=101)
