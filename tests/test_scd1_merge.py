"""SCD1 latest-wins merge (operators/merge.py): hand-checked upsert
semantics through the store loop, tie-breaks, NULL-version guard and
validation. The sf-scale replay-vs-one-shot parity rides in
test_oracle_parity via the declared fixture."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.operators.merge import (Scd1MergeConfig,
                                                 build_scd1_merge)


def _reg(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def _cfg(**kw):
    base = dict(name="m", source="t", key_cols=("k",),
                version_expr="v", tie_cols=("seq",),
                payload_cols=("p",))
    base.update(kw)
    return Scd1MergeConfig(**base)


def test_later_version_replaces_and_new_keys_insert(spark):
    rows = [
        ("a", 0, 1, "a-v0"), ("b", 0, 1, "b-v0"),   # initial load
        ("a", 1, 1, "a-v1"),                         # update a
        ("c", 2, 1, "c-v2"), ("a", 2, 1, "a-v2"),    # insert c, update a
    ]
    reg = _reg(spark, rows, "k string, v int, seq int, p string")
    got = {r["k"]: (r["version_seq"], r["p"])
           for r in build_scd1_merge(spark, reg, _cfg()).collect()}
    assert got == {"a": (2, "a-v2"), "b": (0, "b-v0"), "c": (2, "c-v2")}


def test_within_batch_tie_breaks_on_tie_cols_desc(spark):
    rows = [("a", 0, 1, "low"), ("a", 0, 9, "high"), ("a", 0, 5, "mid")]
    reg = _reg(spark, rows, "k string, v int, seq int, p string")
    got = build_scd1_merge(spark, reg, _cfg()).collect()
    assert len(got) == 1
    assert (got[0]["p"], got[0]["seq"]) == ("high", 9)


def test_single_version_is_plain_load(spark):
    rows = [("a", 0, 1, "x"), ("b", 0, 1, "y")]
    reg = _reg(spark, rows, "k string, v int, seq int, p string")
    got = {r["k"]: r["p"]
           for r in build_scd1_merge(spark, reg, _cfg()).collect()}
    assert got == {"a": "x", "b": "y"}


def test_null_version_raises(spark):
    reg = _reg(spark, [("a", None, 1, "x")],
               "k string, v int, seq int, p string")
    with pytest.raises(ValueError, match="NULL"):
        build_scd1_merge(spark, reg, _cfg())


def test_validation():
    with pytest.raises(ValueError, match="non-empty"):
        _cfg(key_cols=())
    with pytest.raises(ValueError, match="non-empty"):
        _cfg(tie_cols=())
    with pytest.raises(ValueError):
        _cfg(payload_cols=("bad-name",))


def test_cdc_delete_removes_key_and_later_version_reinserts(spark):
    rows = [
        ("a", 0, 1, "a-v0", False), ("b", 0, 1, "b-v0", False),
        ("a", 1, 1, "tomb", True),                 # delete a at v1
        ("b", 1, 1, "tomb", True),                 # delete b at v1
        ("a", 2, 1, "a-v2", False),                # re-insert a at v2
    ]
    reg = _reg(spark, rows, "k string, v int, seq int, p string, "
                            "del boolean")
    cfg = _cfg(delete_expr="del")
    got = {r["k"]: (r["version_seq"], r["p"])
           for r in build_scd1_merge(spark, reg, cfg).collect()}
    # b stays deleted; a came back with its v2 state
    assert got == {"a": (2, "a-v2")}


def test_cdc_within_batch_tombstone_wins_by_tie(spark):
    # same key+version: the HIGHER tie row decides (tombstone wins
    # here), exactly as if the rows had arrived ordered
    rows = [("a", 0, 1, "live", False), ("a", 0, 2, "tomb", True)]
    reg = _reg(spark, rows, "k string, v int, seq int, p string, "
                            "del boolean")
    got = build_scd1_merge(spark, reg, _cfg(delete_expr="del")).collect()
    assert got == []


def test_cdc_null_marker_means_not_deleted(spark):
    rows = [("a", 0, 1, "x", None)]
    reg = _reg(spark, rows, "k string, v int, seq int, p string, "
                            "del boolean")
    got = {r["k"]: r["p"]
           for r in build_scd1_merge(spark, reg,
                                     _cfg(delete_expr="del")).collect()}
    assert got == {"a": "x"}
