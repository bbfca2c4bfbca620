"""Gopher rule-table filter (llm/gopher.py): per-rule boolean verdicts
at integer-exact thresholds. Directed semantics on crafted rows, the
config guards, and a plan pin (pure scan-stage projection — zero
exchanges). The driver fixture (gopher_rules, bundle member) is
row-level verified against the DuckDB mirror by test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.gopher import GopherRulesConfig, build_gopher_rules

G = DEFAULT


def _reg(df):
    reg = Registry()
    reg.register("docs", lambda s, d=df: d, "docs")
    return reg


def _run(spark, rows, **kw):
    cfg = GopherRulesConfig("t", source="docs", **kw)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in
            build_gopher_rules(spark, _reg(df), cfg, G).collect()}


def test_word_count_bounds(spark):
    got = _run(spark, [(0, "a b c"), (1, "a b c d e")],
               min_words=4, max_words=4, min_stopwords=0)
    assert not got[0].pass_word_count and not got[1].pass_word_count
    got = _run(spark, [(0, "aaa bbb ccc ddd")], min_words=4, max_words=4,
               min_stopwords=0)
    assert got[0].pass_word_count and got[0].keep


def test_mean_word_length_fixed_point(spark):
    # "ab cde" -> 5 chars / 2 words -> 250 e2 (integer division)
    got = _run(spark, [(0, "ab cde")], min_words=1, min_stopwords=0)
    assert got[0].mean_wlen_e2 == 250
    assert got[0].pass_mean_word_len is False   # default floor is 300
    got = _run(spark, [(0, "ab cde")], min_words=1, min_stopwords=0,
               min_mean_wlen_e2=250)
    assert got[0].pass_mean_word_len is True


def test_symbol_and_alpha_rules(spark):
    # 1 symbol word of 10 -> 10% -> passes at the <=10% default;
    # 2 of 10 -> 20% -> fails. '...' and '#' both count.
    ok = "w1 w2 w3 w4 w5 w6 w7 w8 w9 end..."
    bad = "w1 w2 w3 w4 w5 w6 w7 w8 x# end..."
    got = _run(spark, [(0, ok), (1, bad)], min_words=1, min_stopwords=0)
    assert got[0].pass_symbol_ratio and not got[1].pass_symbol_ratio
    # digits-only words break the >=80% alphabetic rule
    got = _run(spark, [(0, "a1 b2 33 44 55")], min_words=1,
               min_stopwords=0)
    assert got[0].n_alpha_words == 2 and not got[0].pass_alpha_words


def test_stopword_rule_and_keep_conjunction(spark):
    got = _run(spark, [(0, "the cat sat on the mat"),
                       (1, "cat sat mat")], min_words=1)
    assert got[0].n_stop >= 2 and got[0].pass_stopwords
    assert not got[1].pass_stopwords
    assert not got[1].keep     # one failed rule fails the conjunction


def test_empty_doc_measures(spark):
    got = _run(spark, [(0, "")], min_words=0, min_stopwords=0)
    assert got[0].n_words == 0 and got[0].mean_wlen_e2 == 0
    assert got[0].pass_word_count    # 0 within [0, max]


def test_config_guards():
    with pytest.raises(ValueError):
        GopherRulesConfig("t", min_words=10, max_words=5)
    with pytest.raises(ValueError):
        GopherRulesConfig("t", min_mean_wlen_e2=900, max_mean_wlen_e2=100)
    with pytest.raises(ValueError):
        GopherRulesConfig("t", symbol_ratio_pct=101)
    with pytest.raises(ValueError):
        GopherRulesConfig("t", id_col="doc id")


def test_plan_is_scan_stage_only(spark):
    cfg = GopherRulesConfig("t", source="docs")
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = (build_gopher_rules(spark, _reg(df), cfg, G)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
