"""Non-parquet source round-trips (sources/readers.py): json-lines and
csv staging read back losslessly for the declared column contract; the
sf-scale oracle parity rides in test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.sources.readers import (SourceRoundtripConfig,
                                                 build_source_roundtrip)


def _reg(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_hostile_strings_round_trip(spark, fmt):
    rows = [
        (1, 'plain'),
        (2, '{"k": 1, "s": "a,b"}'),          # embedded JSON + comma
        (3, 'quote " and \\ backslash'),
        (4, "newline\\n literal and 'single'"),
        (5, ''),                               # empty string
    ]
    reg = _reg(spark, rows, "id bigint, s string")
    cfg = SourceRoundtripConfig(f"rt_{fmt}", "t", format=fmt,
                                cols=("id", "s"))
    got = {r["id"]: r["s"]
           for r in build_source_roundtrip(spark, reg, cfg).collect()}
    want = dict(rows)
    # csv cannot distinguish empty string from NULL without extra
    # options — both engines' oracle compare would also see that, so
    # the contract only covers non-empty strings for csv
    if fmt == "csv":
        want[5] = None
    assert got == want


def test_orc_round_trips_all_types(spark):
    rows = [(1, "a", 1.5), (2, "", -2.25), (3, None, None)]
    reg = _reg(spark, rows, "id bigint, s string, v double")
    cfg = SourceRoundtripConfig("rt_orc", "t", format="orc",
                                cols=("id", "s", "v"))
    got = {r["id"]: (r["s"], r["v"])
           for r in build_source_roundtrip(spark, reg, cfg).collect()}
    # binary columnar: empty string, NULL and doubles all survive
    assert got == {1: ("a", 1.5), 2: ("", -2.25), 3: (None, None)}


def test_validation():
    with pytest.raises(ValueError, match="json|csv"):
        SourceRoundtripConfig("x", "t", format="parquet")
    with pytest.raises(ValueError, match="non-empty"):
        SourceRoundtripConfig("x", "t", cols=())
