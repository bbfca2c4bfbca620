"""k-anonymity suppression (llm/privacy.py): hand-checked anonymity
sets, joint suppression, NULL-as-a-value grouping. The sf-scale oracle
parity rides in test_oracle_parity via the declared fixture
(docs_k_anonymity)."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.privacy import (KAnonymityConfig,
                                             build_k_anonymity)


def _reg(spark, rows):
    df = spark.createDataFrame(rows, "id bigint, a string, b string")
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def _cfg(**kw):
    base = dict(source="t", id_col="id", quasi_cols=("a", "b"), k=2)
    base.update(kw)
    return KAnonymityConfig("ka", **base)


def _rows(spark, reg, cfg):
    return {r["id"]: (r["a"], r["b"], r["group_n"], r["is_suppressed"])
            for r in build_k_anonymity(spark, reg, cfg).collect()}


def test_under_k_groups_suppress_all_qi_cells(spark):
    rows = [(1, "x", "p"), (2, "x", "p"), (3, "y", "q")]
    got = _rows(spark, _reg(spark, rows), _cfg(k=2))
    assert got[1] == ("x", "p", 2, False)
    assert got[2] == ("x", "p", 2, False)
    assert got[3] == (None, None, 1, True)   # joint suppression


def test_null_qi_is_a_value_and_groups_together(spark):
    rows = [(1, None, "p"), (2, None, "p"), (3, "x", "p")]
    got = _rows(spark, _reg(spark, rows), _cfg(k=2))
    assert got[1] == (None, "p", 2, False)
    assert got[2] == (None, "p", 2, False)
    assert got[3] == (None, None, 1, True)


def test_k_boundary_is_strict(spark):
    rows = [(i, "x", "p") for i in range(3)]
    got = _rows(spark, _reg(spark, rows), _cfg(k=3))
    assert all(v == ("x", "p", 3, False) for v in got.values())
    got = _rows(spark, _reg(spark, rows), _cfg(k=4))
    assert all(v == (None, None, 3, True) for v in got.values())


def test_validation():
    with pytest.raises(ValueError, match="quasi_cols"):
        _cfg(quasi_cols=())
    with pytest.raises(ValueError, match="k must be"):
        _cfg(k=1)
