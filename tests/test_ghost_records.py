"""Ghost-record values across the full datatype matrix (reference:
ghost_record_per_datatype.sql databricks branch, SURVEY §1.2):
timestamp, date, string, integer family, double, decimal, boolean,
binary, and the typed-NULL fallback — plus oracle agreement."""

import datetime
from decimal import Decimal

from conftest import compare_spark_duck

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.functions.hashing import HashSpec
from datavault4dbt_spark.operators.stage import StageConfig, build_stage, stage_oracle
from datavault4dbt_spark.plans.sqlbuild import SqlBuilder

G = DEFAULT

SCHEMA = (("k", "BIGINT"), ("s", "STRING"), ("ts", "TIMESTAMP"),
          ("d", "DATE"), ("f", "DOUBLE"), ("dec", "DECIMAL(10,2)"),
          ("b", "BOOLEAN"))


def _cfg():
    return StageConfig(
        name="stage_typed", source_model="typed",
        ldts="TIMESTAMP '2024-01-01 00:00:00'", rsrc="!typed/src",
        source_schema=SCHEMA,
        hashed_columns=(HashSpec("hk", ("k",)),))


def test_ghost_values_per_datatype(spark):
    df = spark.createDataFrame(
        [(1, "x", datetime.datetime(2024, 1, 5), datetime.date(2024, 1, 5),
          1.5, Decimal('10.25'), True)],
        "k bigint, s string, ts timestamp, d date, f double, "
        "dec decimal(10,2), b boolean")
    reg = Registry()
    reg.spark_loaders["typed"] = lambda _s: df
    out = build_stage(spark, reg, _cfg(), G)
    rows = {r.rsrc: r for r in out.collect() if r.rsrc in ("SYSTEM", "ERROR")}
    unk, err = rows["SYSTEM"], rows["ERROR"]

    assert str(unk.ldts) == G.beginning_of_all_times
    assert str(err.ldts) == G.end_of_all_times
    assert (unk.s, err.s) == ("(unknown)", "(error)")
    assert (unk.k, err.k) == (-1, -2)
    assert (float(unk.f), float(err.f)) == (-1.0, -2.0)
    assert (str(unk.dec), str(err.dec)) == ("-1.00", "-2.00")
    assert (unk.b, err.b) is not None and unk.b is False and err.b is False
    assert (str(unk.d) == G.beginning_of_all_times_date
            and str(err.d) == G.end_of_all_times_date)
    assert unk.hk == G.unknown_key and err.hk == G.error_key


def test_typed_stage_matches_oracle(spark, tmp_path):
    import duckdb
    df = spark.createDataFrame(
        [(1, "x", datetime.datetime(2024, 1, 5), datetime.date(2024, 1, 5),
          1.5, Decimal('10.25'), False)],
        "k bigint, s string, ts timestamp, d date, f double, "
        "dec decimal(10,2), b boolean")
    path = str(tmp_path / "typed.parquet")
    df.coalesce(1).write.parquet(path)

    reg = Registry()
    reg.spark_loaders["typed"] = lambda _s: spark.read.parquet(path)
    reg.duckdb_relations["typed"] = f"read_parquet('{path}/*.parquet')"
    out = build_stage(spark, reg, _cfg(), G)

    b = SqlBuilder()
    final = stage_oracle(b, reg, _cfg(), G)
    sql = b.render(f"SELECT * FROM {final}")
    con = duckdb.connect()
    r = con.execute(sql)
    d_cols = [c[0] for c in r.description]
    d_rows = r.fetchall()
    s_rows = [tuple(row) for row in out.collect()]
    assert sorted(out.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows) == 3
    idx = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    sidx = sorted(range(len(out.columns)), key=lambda i: out.columns[i])
    got = sorted(tuple(str(r[i]) for i in sidx) for r in s_rows)
    want = sorted(tuple(str(r[i]) for i in idx) for r in d_rows)
    assert got == want
