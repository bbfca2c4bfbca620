"""Property-based hash parity: arbitrary printable strings through the
full standardisation pipeline must hash identically in Spark and DuckDB.
Batched: hypothesis generates the corpus up front, one Spark job checks
all examples (per-example Spark jobs would be minutes, not seconds)."""

import duckdb
from hypothesis import given, settings, strategies as st

from datavault4dbt_spark.context import DEFAULT
from datavault4dbt_spark.functions.hashing import (
    HashSpec, hash_expr_sql, SPARK, DUCKDB)
import pytest

pytestmark = pytest.mark.slow

# printable unicode incl. the pipeline's structural tokens; surrogates
# excluded (not representable in UTF-8 parquet/arrow transfer)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    max_size=40)
_token_heavy = st.sampled_from(
    ['"', '""', "^^", "||", "\\", "\\\\", "^^||^^", 'a"b\\c||d^^e',
     " \t\n\r\x0b\x0c ", "dv4dbt-null-replacement"])
_corpus = st.lists(st.one_of(_text, _token_heavy, st.none()),
                   min_size=1, max_size=60)


@settings(max_examples=12, deadline=None)
@given(values=_corpus)
def test_fuzz_hash_parity(spark, values):
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, v string")
    df.createOrReplaceTempView("fuzz")
    spec_k = HashSpec("h", ("v",))
    spec_d = HashSpec("h", ("v", "v"), is_hashdiff=True)
    got = {
        (r.i, r.hk, r.hd)
        for r in spark.sql(
            f"SELECT i, {hash_expr_sql(spec_k, DEFAULT, SPARK, alias=False)} AS hk, "
            f"{hash_expr_sql(spec_d, DEFAULT, SPARK, alias=False)} AS hd FROM fuzz"
        ).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz (i INT, v VARCHAR)")
    con.executemany("INSERT INTO fuzz VALUES (?, ?)", rows)
    want = {
        tuple(r) for r in con.execute(
            f"SELECT i, {hash_expr_sql(spec_k, DEFAULT, DUCKDB, alias=False)} AS hk, "
            f"{hash_expr_sql(spec_d, DEFAULT, DUCKDB, alias=False)} AS hd FROM fuzz"
        ).fetchall()}
    assert got == want
