"""DSIR-style importance score (llm/dsir.py): hand-computed posterior
arithmetic, the uninformative-prior edge (unseen features score
SCALE/2), min_count pruning, target-predicate routing, and the
threshold flag. The driver fixture (dsir_score, bundle member) is
row-level verified against the DuckDB mirror by test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.dsir import DsirConfig, build_dsir_score
from datavault4dbt_spark.llm.lm import SCALE

G = DEFAULT


def _run(spark, rows, **kw):
    kw.setdefault("target_predicate", "src = 'tgt'")
    cfg = DsirConfig("t", source="docs", **kw)
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    reg = Registry()
    reg.register("docs", lambda s, d=df: d, "docs")
    return {r.doc_id: r for r in
            build_dsir_score(spark, reg, cfg, G).collect()}


def test_hand_computed_posteriors(spark):
    # target: "a b" -> (a,b) c_t=1 ; raw: "a b" twice -> c_r for (a,b)=2
    got = _run(spark, [(0, "tgt", "a b"), (1, "raw", "a b"),
                       (2, "raw", "a b")])
    # every doc is the single bigram (a,b): q = (1+1)*S // (1+2+2)
    q = (2 * SCALE) // 5
    for d in (0, 1, 2):
        assert got[d].score_ppm == q


def test_unseen_features_score_half(spark):
    # doc 2's bigram (x,y) appears nowhere else: q = S // 2 exactly...
    # but it IS in the census (census covers all docs). A truly
    # model-pruned feature needs min_count: see next test. Here (x,y)
    # has c_t=0, c_r=1 -> q = S // 3.
    got = _run(spark, [(0, "tgt", "a b"), (2, "raw", "x y")])
    assert got[2].score_ppm == SCALE // 3


def test_min_count_prunes_to_uninformative(spark):
    # min_count=2 drops both single-occurrence bigrams from the model:
    # every occurrence coalesces to (0+1)*S // (0+0+2) = S/2
    got = _run(spark, [(0, "tgt", "a b"), (2, "raw", "x y")],
               min_count=2)
    assert got[0].score_ppm == SCALE // 2
    assert got[2].score_ppm == SCALE // 2


def test_target_likeness_orders_docs(spark):
    rows = [(0, "tgt", "alpha beta gamma"),
            (1, "raw", "alpha beta gamma"),   # pure target phrasing
            (2, "raw", "delta epsilon zeta"),
            (3, "raw", "delta epsilon zeta")]  # pure raw phrasing
    got = _run(spark, rows)
    assert got[1].score_ppm > got[3].score_ppm
    # threshold at the midpoint splits them
    got = _run(spark, rows, threshold_ppm=SCALE // 2)
    assert got[1].selected and not got[3].selected


def test_short_docs_null_score_and_flag(spark):
    got = _run(spark, [(0, "tgt", "a b"), (1, "raw", "single"),
                       (2, "raw", None)])
    assert got[1].n_bigrams == 0 and got[1].score_ppm is None
    assert got[1].selected is None
    assert got[2].score_ppm is None


def test_config_guards():
    with pytest.raises(ValueError):
        DsirConfig("t", min_count=0)
    with pytest.raises(ValueError):
        DsirConfig("t", threshold_ppm=SCALE + 1)
    with pytest.raises(ValueError):
        DsirConfig("t", id_col="bad name")
