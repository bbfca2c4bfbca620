"""Effectivity-satellite incremental semantics (the reference's hardest
operator, eff_sat_v0.sql 2x2 modes): status activation, deactivation of
disappeared keys, and idempotent replay — driven with hand-made
micro-batches where the expected statuses are enumerable by hand."""

import datetime

import pytest
from pyspark.sql import functions as F

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.operators.eff_sat import EffSatConfig, build_eff_sat_v0
from datavault4dbt_spark.plans.incremental import ParquetStore

G = DEFAULT
T1 = datetime.datetime(2024, 1, 1)
T2 = datetime.datetime(2024, 1, 2)
T3 = datetime.datetime(2024, 1, 3)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(hk, t, "src") for hk, t in rows],
        "hk_l string, ldts timestamp, rsrc string")


def _cfg(single: bool) -> EffSatConfig:
    return EffSatConfig("eff", "stage", "hk_l", source_is_single_batch=single)


def _load(spark, store, batch, single):
    reg = Registry()
    reg.spark_loaders["stage"] = lambda _s: batch
    target = store.read("eff") if store.exists("eff") else None
    new = build_eff_sat_v0(spark, reg, _cfg(single), G, target=target)
    store.append("eff", new)
    return new


def _state(store):
    """latest status per key"""
    df = store.read("eff")
    rows = sorted(df.collect(), key=lambda r: (r.hk_l, r.ldts))
    latest = {}
    for r in rows:
        latest[r.hk_l] = r.is_active
    return latest


def test_single_batch_activate_then_deactivate(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path))
    # batch 1: A and B exist
    _load(spark, store, _batch(spark, [("A", T1), ("B", T1)]), single=True)
    assert _state(store) == {"A": True, "B": True}

    # batch 2: B disappears, C appears -> B deactivated at T2
    _load(spark, store, _batch(spark, [("A", T2), ("C", T2)]), single=True)
    assert _state(store) == {"A": True, "B": False, "C": True}
    b_rows = [r for r in store.read("eff").collect() if r.hk_l == "B"]
    assert {(r.ldts, r.is_active) for r in b_rows} == {(T1, True), (T2, False)}

    # batch 3: B returns -> reactivated; A stays active with NO new row
    n_a_before = store.read("eff").filter("hk_l = 'A'").count()
    _load(spark, store, _batch(spark, [("A", T3), ("B", T3)]), single=True)
    assert _state(store) == {"A": True, "B": True, "C": False}
    assert store.read("eff").filter("hk_l = 'A'").count() == n_a_before


def test_replay_is_idempotent(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path))
    _load(spark, store, _batch(spark, [("A", T1), ("B", T1)]), single=True)
    _load(spark, store, _batch(spark, [("A", T2)]), single=True)
    before = sorted(map(str, store.read("eff").collect()))
    new = _load(spark, store, _batch(spark, [("A", T2)]), single=True)
    assert new.count() == 0
    assert sorted(map(str, store.read("eff").collect())) == before


def test_multi_batch_full_history(spark, tmp_path):
    """Multi-batch initial load builds the full 0/1 history with
    status-change dedup: A present at T1+T3 (gap at T2), B at T2 only."""
    store = ParquetStore(spark, str(tmp_path))
    batch = _batch(spark, [("A", T1), ("B", T2), ("A", T3)])
    _load(spark, store, batch, single=False)
    got = {(r.hk_l, r.ldts, r.is_active)
           for r in store.read("eff").collect()}
    assert got == {
        ("A", T1, True), ("A", T2, False), ("A", T3, True),
        # B's spine covers every load date >= its first appearance, so
        # its absence from the T3 batch is a deactivation
        ("B", T2, True), ("B", T3, False),
    }
