"""JSON field extraction (operators/jsonx.py) and LOCF gap fill
(operators/events.py): hand-checked semantics and validation. The
sf-scale oracle parity rides in test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.operators.jsonx import (JsonExtractConfig,
                                                 build_json_extract)
from datavault4dbt_spark.operators.events import LocfConfig, build_locf


def _reg(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def test_json_extract_typed_missing_and_malformed(spark):
    rows = [(1, '{"a": 5, "s": "x", "nested": {"b": true}}'),
            (2, '{"a": "not-a-number"}'),
            (3, "not json at all"),
            (4, None)]
    reg = _reg(spark, rows, "id bigint, j string")
    cfg = JsonExtractConfig(
        "x", "t", "j",
        fields=(("a", "$.a", "bigint"), ("s", "$.s", "string"),
                ("b", "$.nested.b", "boolean")),
        keep_cols=("id",))
    got = {r["id"]: (r["a"], r["s"], r["b"])
           for r in build_json_extract(spark, reg, cfg).collect()}
    assert got[1] == (5, "x", True)
    assert got[2] == (None, None, None)   # wrong type -> TRY_CAST NULL
    assert got[3] == (None, None, None)   # malformed JSON -> NULL
    assert got[4] == (None, None, None)   # NULL document -> NULL


def test_json_extract_validation():
    with pytest.raises(ValueError, match="non-empty"):
        JsonExtractConfig("x", "t", "j", fields=())
    with pytest.raises(ValueError, match="portable"):
        JsonExtractConfig("x", "t", "j", fields=(("a", "$.a", "map"),))
    with pytest.raises(ValueError, match="quote-free"):
        JsonExtractConfig("x", "t", "j", fields=(("a", "$['a']", "int"),))
    with pytest.raises(ValueError, match="quote-free"):
        JsonExtractConfig("x", "t", "j", fields=(("a", "a.b", "int"),))
    with pytest.raises(ValueError, match="duplicate output"):
        JsonExtractConfig("x", "t", "j", fields=(("id", "$.a", "int"),),
                          keep_cols=("id",))
    with pytest.raises(ValueError, match="duplicate output"):
        JsonExtractConfig("x", "t", "j", fields=(("a", "$.a", "int"),
                                                 ("a", "$.b", "int")))


def test_locf_carries_forward_and_leading_nulls_stay(spark):
    rows = [
        (1, 100, 1, None),    # leading NULL: nothing to carry
        (1, 200, 2, 5.0),
        (1, 300, 3, None),    # filled from ts=200
        (1, 400, 4, None),    # still 5.0 (carry across gaps)
        (1, 500, 5, 7.0),
        (2, 100, 6, None),    # other key: its own leading NULL
    ]
    reg = _reg(spark, rows, "user_id bigint, ts bigint, "
                            "event_id bigint, value double")
    cfg = LocfConfig("l", "t", ts_col="ts", value_expr="value")
    got = {r["event_id"]: (r["value_filled"], r["is_filled"])
           for r in build_locf(spark, reg, cfg).collect()}
    assert got == {1: (None, False), 2: (5.0, False), 3: (5.0, True),
                   4: (5.0, True), 5: (7.0, False), 6: (None, False)}


def test_locf_duplicate_ts_orders_on_id(spark):
    rows = [(1, 100, 2, None), (1, 100, 1, 3.0)]
    reg = _reg(spark, rows, "user_id bigint, ts bigint, "
                            "event_id bigint, value double")
    cfg = LocfConfig("l", "t", ts_col="ts", value_expr="value")
    got = {r["event_id"]: r["value_filled"]
           for r in build_locf(spark, reg, cfg).collect()}
    # id=2 sorts after id=1 at the same ts, so it takes id=1's value
    assert got == {1: 3.0, 2: 3.0}
