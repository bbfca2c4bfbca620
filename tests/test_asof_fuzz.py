"""Property test: the as-of union-window plan equals a naive per-row
reference on random inputs — ties at equal timestamps, duplicate left
timestamps, keys with no right rows, and both strict modes included.
(The driver gate already certifies one fixture against DuckDB's native
ASOF JOIN; this sweeps the input space.)"""

import datetime

from hypothesis import given, settings, strategies as st

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.operators.asof import (
    AsofJoinConfig, build_asof_join)
import pytest

pytestmark = pytest.mark.slow

G = DEFAULT
BASE = datetime.datetime(2024, 1, 1)

# small discrete domains force collisions: few keys, few timestamps
keys = st.integers(min_value=0, max_value=3)
ticks = st.integers(min_value=0, max_value=9)

left_rows = st.lists(st.tuples(keys, ticks), min_size=1, max_size=12)
# right side: unique (key, ts) per the operator contract; the boolean
# nulls that row's VALUE column (the round-7 advice case: the latest
# right row may carry NULL and must win atomically, not column-mix)
right_rows = st.lists(st.tuples(keys, ticks, st.booleans()),
                      min_size=0, max_size=12,
                      unique_by=lambda r: (r[0], r[1]))


def _naive(left, right, strict):
    out = []
    for k, t in left:
        cands = [(rt, rv) for (rk, rt, rv) in right
                 if rk == k and (rt < t if strict else rt <= t)]
        out.append((k, t,
                    max(cands, key=lambda c: c[0])[1] if cands else None))
    return sorted(out, key=lambda r: (r[0], r[1], str(r[2])))


@settings(max_examples=12, deadline=None)
@given(left=left_rows, right=right_rows, strict=st.booleans())
def test_asof_equals_naive_reference(spark, left, right, strict):
    lrows = [(i, k, BASE + datetime.timedelta(minutes=t))
             for i, (k, t) in enumerate(left)]
    rrows = [(k, BASE + datetime.timedelta(minutes=t),
              None if nv else float(100 + i))
             for i, (k, t, nv) in enumerate(right)]
    ldf = spark.createDataFrame(
        lrows, "rid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        rrows, "k long, ts timestamp, v double") if rrows else \
        spark.createDataFrame([], "k long, ts timestamp, v double")
    reg = Registry()
    reg.register("l", lambda s, d=ldf: d, "l")
    reg.register("r", lambda s, d=rdf: d, "r")
    cfg = AsofJoinConfig("a", left_entity="l", right_entity="r",
                         key_col="k", ts_col="ts", right_filter="",
                         value_cols=("v",), left_cols=("rid", "k", "ts"),
                         strict=strict)
    got = sorted(((r.k, int((r.ts - BASE).total_seconds() // 60),
                   r.asof_v)
                  for r in build_asof_join(spark, reg, cfg, G).collect()),
                 key=lambda r: (r[0], r[1], str(r[2])))
    want = _naive([(k, t) for k, t in left],
                  [(k, t, None if nv else float(100 + i))
                   for i, (k, t, nv) in enumerate(right)], strict)
    assert got == want
