"""Event-analytics operator behavior (operators/events.py): session
boundary placement, alignment between the driver-gated batch operator
and the streaming twin's batch form, and hopping-window containment.
The driver-gate fixtures are row-level verified by test_oracle_parity."""

import datetime

import pytest

from pyspark.sql import functions as F

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.operators.events import (
    HoppingAggConfig, SessionizeConfig, build_hopping_agg,
    build_sessionize)

G = DEFAULT
TS = datetime.datetime.fromisoformat


def _reg(**frames):
    reg = Registry()
    for name, df in frames.items():
        reg.register(name, lambda s, d=df: d, name)
    return reg


def _events(spark):
    rows = [
        # user 1: two events 10 min apart, then a 2-hour gap
        (1, TS("2024-01-01 10:00:00"), 1.00),
        (1, TS("2024-01-01 10:10:00"), 2.00),
        (1, TS("2024-01-01 12:30:00"), 4.00),
        # user 2: single event
        (2, TS("2024-01-01 09:00:00"), 8.00),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double")


def test_sessionize_boundaries_and_exact_cents(spark):
    reg = _reg(events=_events(spark))
    out = {(r.user_id, r.session_seq): r for r in build_sessionize(
        spark, reg, SessionizeConfig("s", gap_seconds=1800), G).collect()}
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert (s11.n_events, s11.sum_value_cents) == (2, 300)
    assert s11.session_start == TS("2024-01-01 10:00:00")
    assert s11.session_end == TS("2024-01-01 10:10:00")
    assert out[(1, 2)].n_events == 1
    assert out[(2, 1)].sum_value_cents == 800


def test_sessionize_matches_streaming_batch_twin(spark):
    """The driver-gated operator and streaming's sessionize_batch must
    place identical boundaries (they share mark_sessions)."""
    from datavault4dbt_spark.streaming.stateful import sessionize_batch

    ev = _events(spark).withColumn("event_type", F.lit("click"))
    got = {(r.user_id, r.session_start, r.session_end, r.n_events)
           for r in build_sessionize(
               spark, _reg(events=ev),
               SessionizeConfig("s", gap_seconds=1800), G).collect()}
    want = {(r.user_id, r.session_start, r.session_end, r.n_events)
            for r in sessionize_batch(ev, gap_seconds=1800).collect()}
    assert got == want


def test_hopping_windows_epoch_aligned_containment(spark):
    ev = spark.createDataFrame(
        [(TS("2024-01-01 10:07:00"), "click", 1.50)],
        "ts timestamp, event_type string, value double")
    reg = _reg(events=ev)
    out = build_hopping_agg(
        spark, reg,
        HoppingAggConfig("h", width_seconds=3600, hop_seconds=900),
        G).collect()
    # exactly width/hop = 4 windows contain the event, each epoch-
    # aligned to 15 min and covering 10:07
    starts = sorted(r.window_start for r in out)
    assert starts == [TS("2024-01-01 09:15:00"), TS("2024-01-01 09:30:00"),
                      TS("2024-01-01 09:45:00"), TS("2024-01-01 10:00:00")]
    assert all(r.window_end == r.window_start
               + datetime.timedelta(seconds=3600) for r in out)
    assert all((r.n_events, r.sum_value_cents) == (1, 150) for r in out)


def test_config_validation():
    with pytest.raises(ValueError):
        SessionizeConfig("s", gap_seconds=0)
    with pytest.raises(ValueError):
        HoppingAggConfig("h", width_seconds=3600, hop_seconds=700)
    with pytest.raises(ValueError):
        SessionizeConfig("s", user_col="bad-name")


def test_funnel_first_touch_strict_ordering(spark):
    """Funnel semantics: first occurrence per step, strictly AFTER the
    previous step's first completion — an out-of-order purchase before
    the first click does not count, a same-timestamp next step does
    not count (strict >), and depth reports the reached prefix."""
    import datetime
    from datavault4dbt_spark.context import DEFAULT, Registry
    from datavault4dbt_spark.operators.events import (FunnelConfig,
                                                      build_funnel)

    TS = datetime.datetime.fromisoformat
    rows = [
        # user 1: clean view -> click -> purchase
        (1, TS("2024-01-01 10:00:00"), "view"),
        (1, TS("2024-01-01 11:00:00"), "click"),
        (1, TS("2024-01-01 12:00:00"), "purchase"),
        # user 2: purchase BEFORE first click -> depth 2 only
        (2, TS("2024-01-01 10:00:00"), "view"),
        (2, TS("2024-01-01 10:30:00"), "purchase"),
        (2, TS("2024-01-01 11:00:00"), "click"),
        # user 3: click at the SAME ts as first view -> strict > fails
        (3, TS("2024-01-01 10:00:00"), "view"),
        (3, TS("2024-01-01 10:00:00"), "click"),
        # user 4: never views -> depth 0 despite later steps
        (4, TS("2024-01-01 10:00:00"), "click"),
        (4, TS("2024-01-01 11:00:00"), "purchase"),
        # user 5: repeated steps -> FIRST completion wins
        (5, TS("2024-01-01 09:00:00"), "view"),
        (5, TS("2024-01-01 09:30:00"), "view"),
        (5, TS("2024-01-01 10:00:00"), "click"),
        (5, TS("2024-01-01 10:30:00"), "click"),
        (5, TS("2024-01-01 11:00:00"), "purchase"),
    ]
    reg = Registry()
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    reg.register("ev", lambda s, d=df: d, "ev")
    cfg = FunnelConfig("f", source="ev")
    got = {r.user_id: (r.step1_ts, r.step2_ts, r.step3_ts, r.depth)
           for r in build_funnel(spark, reg, cfg, DEFAULT).collect()}
    assert got[1] == (TS("2024-01-01 10:00:00"),
                      TS("2024-01-01 11:00:00"),
                      TS("2024-01-01 12:00:00"), 3)
    assert got[2] == (TS("2024-01-01 10:00:00"),
                      TS("2024-01-01 11:00:00"), None, 2)
    assert got[3] == (TS("2024-01-01 10:00:00"), None, None, 1)
    assert got[4] == (None, None, None, 0)
    assert got[5] == (TS("2024-01-01 09:00:00"),
                      TS("2024-01-01 10:00:00"),
                      TS("2024-01-01 11:00:00"), 3)
    # one shuffle: a single exchange feeds all step windows + collapse
    plan = build_funnel(spark, reg, cfg, DEFAULT) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cohort_retention_matches_python_reference(spark):
    """Cohort matrix vs a Python replay: epoch-day bucketing, cohort =
    first active day, one count per (cohort, offset), multi-event days
    deduped."""
    import datetime
    from datavault4dbt_spark.context import DEFAULT, Registry
    from datavault4dbt_spark.operators.events import (
        CohortRetentionConfig, build_cohort_retention)

    TS = datetime.datetime.fromisoformat
    rows = [
        (1, TS("2024-01-01 10:00:00")), (1, TS("2024-01-01 23:00:00")),
        (1, TS("2024-01-03 09:00:00")),
        (2, TS("2024-01-01 08:00:00")), (2, TS("2024-01-02 08:00:00")),
        (3, TS("2024-01-02 12:00:00")), (3, TS("2024-01-04 12:00:00")),
    ]
    reg = Registry()
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    reg.register("ev", lambda s, d=df: d, "ev")
    got = {(r.cohort_day, r.offset_day): r.n_users
           for r in build_cohort_retention(
               spark, reg, CohortRetentionConfig("cr", source="ev"),
               DEFAULT).collect()}
    active = {(u, ts.date().toordinal() - datetime.date(1970, 1, 1)
               .toordinal()) for u, ts in rows}
    cohort = {}
    for u, d in active:
        cohort[u] = min(cohort.get(u, d), d)
    want = {}
    for u, d in active:
        key = (cohort[u], d - cohort[u])
        want[key] = want.get(key, 0) + 1
    assert got == want
    # sanity on the shape: day-0 cells cover every cohort
    assert all((c, 0) in got for c, _o in got)


def test_table_diff_three_statuses_and_equal_rows_omitted(spark):
    """Diff semantics: left-only, right-only, changed — and rows equal
    in both versions do NOT appear. NULL payloads use an injective
    sentinel (a NULL column differs from the empty string and from a
    chr(1) literal)."""
    import pytest as _pytest
    from datavault4dbt_spark.context import DEFAULT, Registry
    from datavault4dbt_spark.operators.diff import (TableDiffConfig,
                                                    build_table_diff)

    left = [(1, "a", 10), (2, "b", 20), (3, "c", 30), (5, None, 50)]
    right = [(1, "a", 10), (2, "b", 99), (4, "d", 40), (5, "", 50)]
    reg = Registry()
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id LONG, lang STRING, n LONG")
    reg.register("l", lambda s, d=mk(left): d, "l")
    reg.register("r", lambda s, d=mk(right): d, "r")
    cfg = TableDiffConfig("d", left_entity="l", right_entity="r",
                          key_cols=("doc_id",),
                          payload_cols=("lang", "n"))
    got = {r.doc_id: r.status
           for r in build_table_diff(spark, reg, cfg, DEFAULT).collect()}
    # doc 1 equal -> omitted; 2 changed; 3 removed; 4 added;
    # 5 NULL-vs-empty payload -> changed (injective sentinel)
    assert got == {2: "changed", 3: "left_only", 4: "right_only",
                   5: "changed"}
    with _pytest.raises(ValueError, match="key_cols and payload"):
        TableDiffConfig("bad", left_entity="l", right_entity="r",
                        key_cols=("doc_id",),
                        payload_cols=("doc_id", "n"))


def test_table_diff_null_never_collides_with_real_values(spark):
    """Injectivity of the NULL sentinel: NULL vs a literal '\\x01'
    value is a CHANGED row, not an omitted equal row."""
    from datavault4dbt_spark.context import DEFAULT, Registry
    from datavault4dbt_spark.operators.diff import (TableDiffConfig,
                                                    build_table_diff)

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id LONG, lang STRING")
    reg = Registry()
    reg.register("l", lambda s, d=mk([(1, None), (2, "\x01")]): d, "l")
    reg.register("r", lambda s, d=mk([(1, "\x01"), (2, "\x01")]): d, "r")
    cfg = TableDiffConfig("d", left_entity="l", right_entity="r",
                          key_cols=("doc_id",), payload_cols=("lang",))
    got = {r.doc_id: r.status
           for r in build_table_diff(spark, reg, cfg, DEFAULT).collect()}
    assert got == {1: "changed"}   # doc 2 equal -> omitted


# ------------------------------------------------------------ OHLC bars --

def test_ohlc_open_close_tie_break_and_extremes(spark):
    from datavault4dbt_spark.operators.events import (OhlcBarsConfig,
                                                      build_ohlc_bars)
    rows = [
        # one hourly bar, duplicate timestamp at the open: id breaks it
        (1, TS("2024-01-01 10:00:00"), "a", 5.00),
        (2, TS("2024-01-01 10:00:00"), "a", 1.00),
        (3, TS("2024-01-01 10:30:00"), "a", 9.00),
        (4, TS("2024-01-01 10:59:00"), "a", 2.00),
        # next bar, same type
        (5, TS("2024-01-01 11:01:00"), "a", 7.00),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, "
              "value double")
    reg = _reg(events=df)
    out = {(r.event_type, r.bar): r for r in build_ohlc_bars(
        spark, reg, OhlcBarsConfig("o", bar_seconds=3600), G).collect()}
    b0 = out[("a", 473362)]            # 2024-01-01 10:00 UTC epoch-hour
    assert (b0.open_cents, b0.close_cents) == (500, 200)
    assert (b0.low_cents, b0.high_cents) == (100, 900)
    assert (b0.n_events, b0.sum_cents) == (4, 1700)
    assert b0.bar_start == TS("2024-01-01 10:00:00")
    assert out[("a", 473363)].open_cents == 700


# ---------------------------------------------------------- attribution --

def test_last_touch_credits_most_recent_prior_touch(spark):
    from datavault4dbt_spark.operators.events import (AttributionConfig,
                                                      build_attribution)
    rows = [
        (1, 1, TS("2024-01-01 10:00:00"), "view"),
        (1, 2, TS("2024-01-01 10:05:00"), "click"),
        (1, 3, TS("2024-01-01 10:06:00"), "purchase"),
        # second purchase: still credits the click (purchases are not
        # touches), 2 min later
        (1, 4, TS("2024-01-01 10:07:00"), "purchase"),
        # user 2 converts with no prior touch -> NULL bucket
        (2, 5, TS("2024-01-01 09:00:00"), "purchase"),
        (2, 6, TS("2024-01-01 09:30:00"), "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string")
    reg = _reg(events=df)
    out = {r.event_id: r for r in build_attribution(
        spark, reg, AttributionConfig("a"), G).collect()}
    assert set(out) == {3, 4, 5}
    assert (out[3].touch_type, out[3].lag_us) == ("click", 60_000_000)
    assert (out[4].touch_type, out[4].lag_us) == ("click", 120_000_000)
    assert out[5].touch_type is None and out[5].lag_us is None


# ------------------------------------------------------ conversion paths --

def test_conversion_paths_order_truncation_and_empty(spark):
    from datavault4dbt_spark.operators.events import (
        ConversionPathConfig, build_conversion_paths)
    rows = [(1, k, TS(f"2024-01-01 10:0{k}:00"), t) for k, t in
            enumerate(["view", "click", "view", "click", "view",
                       "click", "view"], start=1)]
    rows.append((1, 8, TS("2024-01-01 10:08:00"), "purchase"))
    rows.append((2, 9, TS("2024-01-01 09:00:00"), "purchase"))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string")
    reg = _reg(events=df)
    out = {r.event_id: (r.n_touches, r.path)
           for r in build_conversion_paths(
               spark, reg,
               ConversionPathConfig("p", max_touches=3)).collect()}
    # 7 touches (view click view click view click view), truncated to
    # the LAST 3 in stream order
    assert out[8] == (7, "view>click>view")
    assert out[9] == (0, "")


def test_conversion_paths_exact_last_n(spark):
    from datavault4dbt_spark.operators.events import (
        ConversionPathConfig, build_conversion_paths)
    rows = [(1, 1, TS("2024-01-01 10:01:00"), "a"),
            (1, 2, TS("2024-01-01 10:02:00"), "b"),
            (1, 3, TS("2024-01-01 10:03:00"), "c"),
            (1, 4, TS("2024-01-01 10:04:00"), "purchase")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string")
    reg = _reg(events=df)
    out = {r.event_id: (r.n_touches, r.path)
           for r in build_conversion_paths(
               spark, reg,
               ConversionPathConfig("p", max_touches=2)).collect()}
    assert out[4] == (3, "b>c")


def test_conversion_paths_power_user_bounded(spark):
    """r9 verdict #3: a 10^4-touch power user with interleaved
    conversions must produce exact last-n paths — and the plan must
    carry no unbounded collect_list frame (the bounded rewrite's
    whole point)."""
    from datavault4dbt_spark.operators.events import (
        ConversionPathConfig, build_conversion_paths)
    base = TS("2024-01-01 00:00:00")
    import datetime
    rows = []
    # 10_000 events: every 1000th is a conversion, rest cycle a/b/c
    for k in range(1, 10_001):
        et = "purchase" if k % 1000 == 0 else "abc"[k % 3]
        rows.append((1, k, base + datetime.timedelta(seconds=k), et))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string")
    reg = _reg(events=df)
    out_df = build_conversion_paths(
        spark, reg, ConversionPathConfig("p", max_touches=4))
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    # the only collect_list sits in the bounded post-join aggregate
    # (<= max_touches structs per group), never inside a window frame
    for line in plan.lower().splitlines():
        if "windowspecdefinition" in line:
            assert "collect_list" not in line, line
    out = {r.event_id: (r.n_touches, r.path) for r in out_df.collect()}
    assert len(out) == 10
    # conversion at k: prior touches = k-1 minus prior conversions
    for j, k in enumerate(range(1000, 10_001, 1000)):
        expect_n = (k - 1) - j
        got_n, got_path = out[k]
        assert got_n == expect_n
        # last 4 touch types before k in stream order, skipping the
        # conversion rows themselves
        touch_types = ["abc"[m % 3] for m in range(1, k)
                       if m % 1000 != 0]
        assert got_path == ">".join(touch_types[-4:])


# --------------------------------------------------------- active users --

def test_active_users_rolling_window_exact(spark):
    from datavault4dbt_spark.operators.events import (ActiveUsersConfig,
                                                      build_active_users)
    rows = [
        (1, TS("2024-01-01 10:00:00")), (2, TS("2024-01-01 11:00:00")),
        (1, TS("2024-01-02 10:00:00")),
        (3, TS("2024-01-05 10:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    reg = _reg(events=df)
    out = {r["day"]: (r["dau"], r["rolling_au"])
           for r in build_active_users(
               spark, reg,
               ActiveUsersConfig("au", window_days=3)).collect()}
    d = 19723                            # 2024-01-01 epoch-day
    # day 1: users {1,2}; day 2: {1}, trailing {1,2}; day 5: {3},
    # trailing 3-day window [3..5] holds only user 3
    assert out[d] == (2, 2)
    assert out[d + 1] == (1, 2)
    assert out[d + 4] == (1, 1)
    assert set(out) == {d, d + 1, d + 4}  # inactive days absent
