"""As-of join behavior (operators/asof.py): inclusive vs strict tie
handling, NULL on no-match, pass-through columns, and the one-shuffle
plan shape. The driver-gate fixture (events_asof_click) is verified
row-level against DuckDB's native ASOF JOIN by test_oracle_parity."""

import datetime

import pytest

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.operators.asof import (
    AsofJoinConfig, build_asof_join)

G = DEFAULT
TS = datetime.datetime.fromisoformat


def _reg(**frames):
    reg = Registry()
    for name, df in frames.items():
        reg.register(name, lambda s, d=df: d, name)
    return reg


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 7, TS("2024-01-01 10:00:00"), "view", 1.0),
         (2, 7, TS("2024-01-01 12:00:00"), "click", 2.0),
         (3, 7, TS("2024-01-01 15:00:00"), "view", 3.0),
         (4, 9, TS("2024-01-01 09:00:00"), "view", 4.0)],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double")
    return left


def test_inclusive_matches_same_timestamp_strict_does_not(spark):
    left = _frames(spark)
    base = dict(left_entity="e", right_entity="e",
                right_filter="event_type = 'click'",
                left_cols=("event_id", "user_id", "ts"))
    reg = _reg(e=left)
    incl = {r.event_id: r.asof_ts
            for r in build_asof_join(
                spark, reg, AsofJoinConfig("a", **base), G).collect()}
    strict = {r.event_id: r.asof_ts
              for r in build_asof_join(
                  spark, reg,
                  AsofJoinConfig("a", strict=True, **base), G).collect()}
    click = TS("2024-01-01 12:00:00")
    # event 2 IS the click: inclusive matches itself, strict does not
    assert incl[2] == click and strict[2] is None
    # before any click -> NULL in both modes; after -> the click
    assert incl[1] is None and strict[1] is None
    assert incl[3] == click and strict[3] == click
    # user 9 never clicks
    assert incl[4] is None and strict[4] is None


def test_latest_of_several_right_rows_wins(spark):
    left = spark.createDataFrame(
        [(1, 5, TS("2024-01-03 00:00:00"), "view", 0.0)],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double")
    right = spark.createDataFrame(
        [(10, 5, TS("2024-01-01 00:00:00"), "click", 1.0),
         (11, 5, TS("2024-01-02 00:00:00"), "click", 2.0),
         (12, 5, TS("2024-01-04 00:00:00"), "click", 3.0)],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double")
    reg = _reg(l=left, r=right)
    out = build_asof_join(
        spark, reg,
        AsofJoinConfig("a", left_entity="l", right_entity="r",
                       right_filter="event_type = 'click'",
                       left_cols=("event_id", "user_id", "ts")),
        G).collect()
    assert len(out) == 1 and out[0].asof_value == 2.0  # not 1.0, not 3.0


def test_all_left_columns_pass_through_by_default(spark):
    left = _frames(spark)
    reg = _reg(e=left)
    out = build_asof_join(
        spark, reg, AsofJoinConfig("a", left_entity="e",
                                   right_entity="e"), G)
    assert set(out.columns) == {"event_id", "user_id", "ts",
                                "event_type", "value",
                                "asof_ts", "asof_value"}
    assert out.count() == left.count()


def test_plan_is_single_shuffle_window_not_join(spark):
    left = _frames(spark)
    reg = _reg(e=left)
    df = build_asof_join(
        spark, reg, AsofJoinConfig("a", left_entity="e",
                                   right_entity="e"), G)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for join in ("SortMergeJoin", "BroadcastHashJoin",
                 "ShuffledHashJoin", "CartesianProduct",
                 "BroadcastNestedLoopJoin"):
        assert join not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_null_key_or_ts_right_rows_never_match(spark):
    """SQL comparison semantics: NULL = / >= is never true, so a right
    row with NULL key or NULL ts must not act as anyone's state (the
    union-window would otherwise sort it first and leak it)."""
    left = spark.createDataFrame(
        [(1, 5, TS("2024-01-02 00:00:00"), "view", 0.0),
         (2, None, TS("2024-01-02 00:00:00"), "view", 0.0)],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double")
    right = spark.createDataFrame(
        [(10, None, TS("2024-01-01 00:00:00"), "click", 1.0),
         (11, 5, None, "click", 2.0)],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double")
    reg = _reg(l=left, r=right)
    out = {r.event_id: r.asof_value for r in build_asof_join(
        spark, reg,
        AsofJoinConfig("a", left_entity="l", right_entity="r",
                       right_filter="event_type = 'click'",
                       left_cols=("event_id", "user_id", "ts")),
        G).collect()}
    assert out == {1: None, 2: None}


def test_null_value_on_latest_right_row_stays_null(spark):
    """The latest right row wins ATOMICALLY: a NULL value column on
    that row must come through as NULL (with its timestamp), not be
    backfilled from an older right row — per-column last(ignorenulls)
    would column-mix (round-7 advice, high)."""
    left = spark.createDataFrame(
        [(1, 5, TS("2024-01-03 00:00:00"), "view", 0.0)],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double")
    right = spark.createDataFrame(
        [(10, 5, TS("2024-01-01 00:00:00"), "click", 7.0),
         (11, 5, TS("2024-01-02 00:00:00"), "click", None)],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double")
    reg = _reg(l=left, r=right)
    out = build_asof_join(
        spark, reg,
        AsofJoinConfig("a", left_entity="l", right_entity="r",
                       right_filter="event_type = 'click'",
                       left_cols=("event_id", "user_id", "ts")),
        G).collect()
    assert len(out) == 1
    assert out[0].asof_ts == TS("2024-01-02 00:00:00")
    assert out[0].asof_value is None   # NOT 7.0 from the older row


def test_config_validation():
    with pytest.raises(ValueError):
        AsofJoinConfig("a", key_col="bad-name")
    with pytest.raises(ValueError):
        AsofJoinConfig("a", value_cols=("ts",))
    with pytest.raises(ValueError):
        AsofJoinConfig("a", key_col="user_id", value_cols=("user_id",))


def test_tolerance_nulls_stale_matches_never_falls_back(spark):
    """tolerance_nanos (merge_asof rule): the latest eligible match is
    either within tolerance or there is NO match — event 3's only
    earlier click is 3h stale, so under a 2h tolerance every asof_*
    column nulls out (no fallback), while the fresh matches keep their
    full row atomically."""
    left = _frames(spark)
    reg = _reg(e=left)
    cfg = AsofJoinConfig("a", left_entity="e", right_entity="e",
                         right_filter="event_type = 'click'",
                         left_cols=("event_id", "user_id", "ts"),
                         tolerance_nanos=2 * 3600 * 10**9)
    got = {r.event_id: (r.asof_ts, r.asof_value)
           for r in build_asof_join(spark, reg, cfg, G).collect()}
    click = TS("2024-01-01 12:00:00")
    assert got[2] == (click, 2.0)              # 0s stale: kept
    assert got[3] == (None, None)              # 3h stale: fully nulled
    assert got[1] == (None, None)              # no earlier click at all
    assert got[4] == (None, None)              # other user: no click
    # unbounded keeps the stale match
    wide = AsofJoinConfig("a2", left_entity="e", right_entity="e",
                          right_filter="event_type = 'click'",
                          left_cols=("event_id", "user_id", "ts"))
    got2 = {r.event_id: r.asof_ts
            for r in build_asof_join(spark, reg, wide, G).collect()}
    assert got2[3] == click


def test_tolerance_rejects_negative(spark):
    with pytest.raises(ValueError, match="tolerance"):
        AsofJoinConfig("bad", tolerance_nanos=-1)
