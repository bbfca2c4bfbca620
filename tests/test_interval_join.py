"""Interval-join behavior (operators/rangejoin.py): exactly-once
matching across bins, overlapping intervals, keyed and left modes,
half-open/empty-interval semantics, and the no-nested-loop plan shape.
The driver fixture (events_in_snapshot_day) is row-level verified
against DuckDB's inequality join by test_oracle_parity."""

import datetime

import pytest

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.operators.rangejoin import (
    IntervalJoinConfig, build_interval_join)

G = DEFAULT
TS = datetime.datetime.fromisoformat


def _reg(**frames):
    reg = Registry()
    for name, df in frames.items():
        reg.register(name, lambda s, d=df: d, name)
    return reg


def _cfg(**kw):
    base = dict(points_entity="p", intervals_entity="i",
                ts_col="ts", start_col="ivs", end_col="ive",
                point_cols=("pid", "ts"), interval_cols=("iid",),
                bin_seconds=3600)
    base.update(kw)
    return IntervalJoinConfig("t", **base)


def test_overlapping_intervals_match_exactly_once_each(spark):
    pts = spark.createDataFrame(
        [(1, TS("2024-01-01 05:30:00"))], "pid long, ts timestamp")
    # both intervals cover 05:30; the long one spans many bins
    ivs = spark.createDataFrame(
        [(10, TS("2024-01-01 05:00:00"), TS("2024-01-01 06:00:00")),
         (11, TS("2024-01-01 00:00:00"), TS("2024-01-02 00:00:00")),
         (12, TS("2024-01-01 06:00:00"), TS("2024-01-01 07:00:00"))],
        "iid long, ivs timestamp, ive timestamp")
    out = sorted(r.iid for r in build_interval_join(
        spark, _reg(p=pts, i=ivs), _cfg(), G).collect())
    assert out == [10, 11]  # once each, 12 does not contain 05:30


def test_half_open_and_empty_intervals(spark):
    pts = spark.createDataFrame(
        [(1, TS("2024-01-01 06:00:00"))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        # ends exactly at the point (excluded), starts exactly at the
        # point (included), and a zero-length interval at the point
        [(10, TS("2024-01-01 05:00:00"), TS("2024-01-01 06:00:00")),
         (11, TS("2024-01-01 06:00:00"), TS("2024-01-01 07:00:00")),
         (12, TS("2024-01-01 06:00:00"), TS("2024-01-01 06:00:00"))],
        "iid long, ivs timestamp, ive timestamp")
    out = sorted(r.iid for r in build_interval_join(
        spark, _reg(p=pts, i=ivs), _cfg(), G).collect())
    assert out == [11]


def test_keyed_mode_restricts_to_same_key(spark):
    pts = spark.createDataFrame(
        [(1, 7, TS("2024-01-01 05:30:00"))],
        "pid long, k long, ts timestamp")
    ivs = spark.createDataFrame(
        [(10, 7, TS("2024-01-01 05:00:00"), TS("2024-01-01 06:00:00")),
         (11, 9, TS("2024-01-01 05:00:00"), TS("2024-01-01 06:00:00"))],
        "iid long, k long, ivs timestamp, ive timestamp")
    out = [r.iid for r in build_interval_join(
        spark, _reg(p=pts, i=ivs), _cfg(key_col="k"), G).collect()]
    assert out == [10]


def test_key_col_may_appear_in_output_columns(spark):
    """key_col listed in point_cols (or interval_cols) means BOTH join
    sides carry the name; the qualified projection must resolve it
    (a bare-string select raised AMBIGUOUS_REFERENCE — round-7
    advice, medium)."""
    pts = spark.createDataFrame(
        [(1, 7, TS("2024-01-01 05:30:00")),
         (2, 9, TS("2024-01-01 05:30:00"))],
        "pid long, k long, ts timestamp")
    ivs = spark.createDataFrame(
        [(10, 7, TS("2024-01-01 05:00:00"), TS("2024-01-01 06:00:00"))],
        "iid long, k long, ivs timestamp, ive timestamp")
    out = [(r.pid, r.k, r.iid) for r in build_interval_join(
        spark, _reg(p=pts, i=ivs),
        _cfg(key_col="k", point_cols=("pid", "k", "ts")), G).collect()]
    assert out == [(1, 7, 10)]
    # key in the INTERVAL side's output instead
    out2 = [(r.pid, r.k, r.iid) for r in build_interval_join(
        spark, _reg(p=pts, i=ivs),
        _cfg(key_col="k", interval_cols=("iid", "k")), G).collect()]
    assert out2 == [(1, 7, 10)]


def test_self_join_points_and_intervals_from_same_entity(spark):
    """Both sides loading the SAME entity must still resolve the
    qualified references (plan-aliased sides, not bare frames)."""
    evs = spark.createDataFrame(
        [(1, TS("2024-01-01 05:30:00"),
          TS("2024-01-01 05:00:00"), TS("2024-01-01 06:00:00"))],
        "pid long, ts timestamp, ivs timestamp, ive timestamp")
    out = build_interval_join(
        spark, _reg(p=evs, i=evs),
        _cfg(interval_cols=("ivs", "ive")), G).collect()
    assert [(r.pid,) for r in out] == [(1,)]


def test_left_join_keeps_unmatched_points(spark):
    pts = spark.createDataFrame(
        [(1, TS("2024-01-01 05:30:00")), (2, TS("2024-03-01 00:00:00"))],
        "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(10, TS("2024-01-01 05:00:00"), TS("2024-01-01 06:00:00"))],
        "iid long, ivs timestamp, ive timestamp")
    out = {r.pid: r.iid for r in build_interval_join(
        spark, _reg(p=pts, i=ivs), _cfg(how="left"), G).collect()}
    assert out == {1: 10, 2: None}


def test_plan_has_no_nested_loop_join(spark):
    pts = spark.createDataFrame(
        [(1, TS("2024-01-01 05:30:00"))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(10, TS("2024-01-01 05:00:00"), TS("2024-01-01 06:00:00"))],
        "iid long, ivs timestamp, ive timestamp")
    df = build_interval_join(spark, _reg(p=pts, i=ivs), _cfg(), G)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_config_validation():
    with pytest.raises(ValueError):
        _cfg(bin_seconds=0)
    with pytest.raises(ValueError):
        _cfg(how="full")
    with pytest.raises(ValueError):
        _cfg(interval_cols=("pid",))  # collides with point_cols
    with pytest.raises(ValueError):
        _cfg(end_col="", interval_seconds=0)
