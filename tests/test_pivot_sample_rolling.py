"""Pivot crosstab (operators/pivot.py), exactly-n-per-stratum sample
(llm/sampling.py) and rolling block (operators/events.py): hand-checked
semantics and validation. sf-scale oracle parity rides in
test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.sampling import (ExactSampleConfig,
                                              build_exact_sample)
from datavault4dbt_spark.operators.events import (RollingAggConfig,
                                                  build_rolling_agg)
from datavault4dbt_spark.operators.pivot import PivotConfig, build_pivot


def _reg(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def test_pivot_counts_sums_and_zero_cells(spark):
    rows = [("s1", "en", 1.0), ("s1", "en", 2.0), ("s1", "de", 4.0),
            ("s2", "de", 8.0)]
    reg = _reg(spark, rows, "src string, lang string, v double")
    cfg = PivotConfig("p", "t", group_col="src", pivot_col="lang",
                      values=("en", "de", "fr"), sum_expr="v")
    got = {r["src"]: (r["n_en"], r["sum_en_cents"], r["n_de"],
                      r["sum_de_cents"], r["n_fr"], r["sum_fr_cents"])
           for r in build_pivot(spark, reg, cfg).collect()}
    # fr never occurs -> 0/0 cells, not NULL; s2 has no en -> 0/0
    assert got == {"s1": (2, 300, 1, 400, 0, 0),
                   "s2": (0, 0, 1, 800, 0, 0)}


def test_pivot_count_only_mode(spark):
    rows = [("s1", "en", 0.0)]
    reg = _reg(spark, rows, "src string, lang string, v double")
    cfg = PivotConfig("p", "t", group_col="src", pivot_col="lang",
                      values=("en", "de"))
    row = build_pivot(spark, reg, cfg).collect()[0]
    assert (row["n_en"], row["n_de"]) == (1, 0)
    assert "sum_en_cents" not in build_pivot(spark, reg, cfg).columns


def test_pivot_validation():
    with pytest.raises(ValueError, match="non-empty"):
        PivotConfig("p", "t", "a", "b", values=())
    with pytest.raises(ValueError, match="lowercase token"):
        PivotConfig("p", "t", "a", "b", values=("ok", "BAD-NAME"))
    with pytest.raises(ValueError, match="duplicate pivot"):
        PivotConfig("p", "t", "a", "b", values=("x", "x"))
    with pytest.raises(ValueError, match="must differ"):
        PivotConfig("p", "t", "a", "a", values=("x",))


def test_exact_sample_is_deterministic_and_exact(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(40)]
    reg = _reg(spark, rows, "doc_id bigint, lang string")
    cfg = ExactSampleConfig("s", "t", n_per_stratum=5)
    a = {(r["doc_id"], r["lang"], r["sample_rank"])
         for r in build_exact_sample(spark, reg, cfg).collect()}
    b = {(r["doc_id"], r["lang"], r["sample_rank"])
         for r in build_exact_sample(spark, reg, cfg).collect()}
    assert a == b                                  # rerun-stable
    by_lang = {}
    for _id, lang, rnk in a:
        by_lang.setdefault(lang, []).append(rnk)
    assert {k: sorted(v) for k, v in by_lang.items()} == {
        "en": [1, 2, 3, 4, 5], "de": [1, 2, 3, 4, 5]}


def test_exact_sample_salt_changes_draw(spark):
    rows = [(i, "en") for i in range(200)]
    reg = _reg(spark, rows, "doc_id bigint, lang string")
    a = {r["doc_id"] for r in build_exact_sample(
        spark, reg, ExactSampleConfig("s", "t", n_per_stratum=20,
                                      salt="a")).collect()}
    b = {r["doc_id"] for r in build_exact_sample(
        spark, reg, ExactSampleConfig("s", "t", n_per_stratum=20,
                                      salt="b")).collect()}
    assert a != b


def test_exact_sample_small_stratum_kept_whole(spark):
    rows = [(1, "en"), (2, "en"), (3, "de")]
    reg = _reg(spark, rows, "doc_id bigint, lang string")
    cfg = ExactSampleConfig("s", "t", n_per_stratum=10)
    got = build_exact_sample(spark, reg, cfg).count()
    assert got == 3    # strata smaller than n survive entirely


def test_rolling_block_hand_checked(spark):
    rows = [(1, t, t, float(t)) for t in range(1, 5)]   # values 1..4
    reg = _reg(spark, rows, "user_id bigint, ts bigint, "
                            "event_id bigint, value double")
    cfg = RollingAggConfig("r", "t", ts_col="ts", n_rows=3)
    got = {r["ts"]: (r["roll_n"], r["roll_sum_cents"],
                     r["roll_min_cents"], r["roll_max_cents"])
           for r in build_rolling_agg(spark, reg, cfg).collect()}
    assert got == {
        1: (1, 100, 100, 100),
        2: (2, 300, 100, 200),
        3: (3, 600, 100, 300),
        4: (3, 900, 200, 400),   # frame slides: 2+3+4
    }


def test_rolling_validation():
    with pytest.raises(ValueError, match="n_rows"):
        RollingAggConfig("r", "t", n_rows=0)
