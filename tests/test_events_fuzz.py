"""Property-based checks for the round-8 event/profile operators:
random event streams through the funnel must equal a sequential Python
replay of the first-touch rule, random cohorts must equal the Python
cohort matrix, and random grouped values must reproduce type-1 order
statistics. Batched like test_sampling_fuzz (few examples, one Spark
job each)."""

import datetime
import math

from hypothesis import given, settings, strategies as st

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.operators.events import (
    FunnelConfig, build_funnel, CohortRetentionConfig,
    build_cohort_retention)
from datavault4dbt_spark.llm.profile import (GroupedQuantilesConfig,
                                             build_grouped_quantiles)
import pytest

pytestmark = pytest.mark.slow

_EPOCH = datetime.datetime(2024, 1, 1)

# (user 0..5, minute offset 0..5000, type index 0..4)
_events = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5),
              st.integers(min_value=0, max_value=5000),
              st.integers(min_value=0, max_value=4)),
    min_size=1, max_size=60)

_TYPES = ("view", "click", "purchase", "signup", "error")
_STEPS = ("view", "click", "purchase")


def _ev_reg(spark, rows):
    reg = Registry()
    data = [(u, _EPOCH + datetime.timedelta(minutes=m), _TYPES[t])
            for u, m, t in rows]
    df = spark.createDataFrame(
        data, "user_id LONG, ts TIMESTAMP, event_type STRING")
    reg.register("ev", lambda s, d=df: d, "ev")
    return reg


def _py_funnel(rows):
    """First-touch replay: step_i = min ts of its type strictly after
    step_{i-1} (computed stepwise over the full history)."""
    want = {}
    for u in {r[0] for r in rows}:
        evs = sorted((m, _TYPES[t]) for uu, m, t in rows if uu == u)
        steps = []
        prev = None
        for s in _STEPS:
            cand = [m for m, ty in evs if ty == s
                    and (prev is None or m > prev)]
            cur = min(cand) if cand else None
            steps.append(cur)
            if cur is None:
                break
            prev = cur
        steps += [None] * (len(_STEPS) - len(steps))
        want[u] = (tuple(steps), sum(1 for s in steps if s is not None))
    return want


@settings(max_examples=8, deadline=None)
@given(rows=_events)
def test_fuzz_funnel_equals_python_first_touch(spark, rows):
    got = {}
    cfg = FunnelConfig("f", source="ev")
    for r in build_funnel(spark, _ev_reg(spark, rows), cfg,
                          DEFAULT).collect():
        mins = tuple(
            None if v is None else
            int((v - _EPOCH).total_seconds() // 60)
            for v in (r.step1_ts, r.step2_ts, r.step3_ts))
        got[r.user_id] = (mins, r.depth)
    assert got == _py_funnel(rows)


@settings(max_examples=8, deadline=None)
@given(rows=_events)
def test_fuzz_cohort_equals_python_matrix(spark, rows):
    cfg = CohortRetentionConfig("c", source="ev")
    got = {(r.cohort_day, r.offset_day): r.n_users
           for r in build_cohort_retention(
               spark, _ev_reg(spark, rows), cfg, DEFAULT).collect()}
    base = (_EPOCH - datetime.datetime(1970, 1, 1)).days
    active = {(u, base + (m // 1440)) for u, m, _t in rows}
    cohort = {}
    for u, d in active:
        cohort[u] = min(cohort.get(u, d), d)
    want: dict = {}
    for u, d in active:
        k = (cohort[u], d - cohort[u])
        want[k] = want.get(k, 0) + 1
    assert got == want


_vals = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),      # group
              st.one_of(st.none(),
                        st.integers(min_value=-50, max_value=50))),
    min_size=1, max_size=50)


@settings(max_examples=8, deadline=None)
@given(rows=_vals)
def test_fuzz_grouped_quantiles_equal_type1_order_stats(spark, rows):
    reg = Registry()
    data = [(i, f"g{g}", v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "doc_id LONG, source STRING, n_chars BIGINT")
    reg.spark_loaders["documents"] = lambda _s: df
    cfg = GroupedQuantilesConfig("q")
    got = {r.source: (r.n_rows, r.v_min, r.q25, r.q50, r.q75, r.v_max)
           for r in build_grouped_quantiles(spark, reg, cfg,
                                            DEFAULT).collect()}
    groups: dict = {}
    for g, v in rows:
        groups.setdefault(f"g{g}", []).append(v)
    want = {}
    for g, vs in groups.items():
        s = sorted(v for v in vs if v is not None)
        if not s:
            want[g] = (0, None, None, None, None, None)
            continue
        n = len(s)
        q = lambda k: s[math.ceil(k * n / 4) - 1]  # noqa: E731
        want[g] = (n, s[0], q(1), q(2), q(3), s[-1])
    # groups whose every value is NULL produce no histogram row at all
    want = {g: w for g, w in want.items() if w[0] > 0}
    assert got == want
