"""Hash byte-parity on adversarial inputs (SURVEY §7 hard-parts list):
quotes, concat strings, null placeholders, backslashes, whitespace-only,
NULLs, control characters — the Spark expression and the DuckDB
expression generated from one HashSpec must agree byte-for-byte."""

import pytest

from conftest import duck_con

from datavault4dbt_spark.context import DEFAULT, GlobalConfig
from datavault4dbt_spark.functions.hashing import (
    HashSpec, hash_expr_sql, SPARK, DUCKDB)

ADVERSARIAL = [
    ("plain", "value"),
    ("quotes", 'he said "hi"'),
    ("concat_token", "a||b||c"),
    ("null_placeholder", "^^"),
    ("null_placeholder_embedded", "x^^y"),
    ("backslash", r"c:\temp\file"),
    ("double_backslash", r"a\\b"),
    ("backslash_quote", r'mix\"ed'),
    ("whitespace_only", "   "),
    ("empty", ""),
    ("newline_tab", "a\nb\tc"),
    ("carriage", "a\rb"),
    ("vertical_tab", "a\x0bb"),
    ("formfeed", "a\x0cb"),
    ("sql_null", None),
    ("unicode", "päx–ü"),
    ("replacement_collision", "dv4dbt-quote-replacement"),
    ("trim_sensitive", "  padded  "),
    # DuckDB's bare TRIM strips Unicode whitespace, Spark only ASCII
    # space — the oracle dialect pins TRIM(x, ' ') to match Spark
    ("nbsp_edges", "\xa0x\xa0"),
    ("ideographic_space", "　y　"),
]


@pytest.fixture(scope="module")
def frames(spark):
    rows = [(k, v) for k, v in ADVERSARIAL]
    df = spark.createDataFrame(rows, "k string, v string")
    df.createOrReplaceTempView("adversarial")
    return df


def _duck_values():
    parts = []
    for k, v in ADVERSARIAL:
        if v is None:
            parts.append(f"('{k}', NULL)")
        else:
            lit = v.replace("'", "''")
            parts.append(f"('{k}', '{lit}')")
    return f"(SELECT * FROM (VALUES {', '.join(parts)}) AS t(k, v))"


@pytest.mark.parametrize("g", [
    DEFAULT,
    GlobalConfig(hash="SHA256"),
    GlobalConfig(hashkey_input_case_sensitive=True),
    GlobalConfig(use_trim=False, hashdiff_use_trim=False),
], ids=["md5", "sha256", "case_sensitive", "no_trim"])
@pytest.mark.parametrize("spec", [
    HashSpec("h", ("v",)),
    HashSpec("h", ("v", "v")),
    HashSpec("h", ("v", "k"), is_hashdiff=True),
    HashSpec("h", ("v", "!const")),
], ids=["single", "pair", "hashdiff", "with_literal"])
def test_hash_parity(spark, frames, spec, g):
    import duckdb
    s = spark.sql(
        f"SELECT k, {hash_expr_sql(spec, g, SPARK)} FROM adversarial"
    ).collect()
    got = {r.k: r.h for r in s}
    con = duckdb.connect()
    d = con.execute(
        f"SELECT k, {hash_expr_sql(spec, g, DUCKDB)} FROM {_duck_values()}"
    ).fetchall()
    want = {k: h for k, h in d}
    assert got == want


def test_all_null_yields_zero_key(spark):
    spark.createDataFrame([(None, None)], "a string, b string") \
        .createOrReplaceTempView("allnull")
    spec = HashSpec("h", ("a", "b"))
    r = spark.sql(
        f"SELECT {hash_expr_sql(spec, DEFAULT, SPARK)} FROM allnull").first()
    assert r.h == DEFAULT.unknown_key


def test_reference_default_sentinels_hash_parity(spark):
    """The reference's default ghost sentinels (dbt_project.yml:58-67 —
    0001-01-01/8888-12-31 family) stay valid hash INPUTS even though our
    GlobalConfig defaults moved into the pandas-ns-safe window: a user
    configuring the reference literals must get dialect-identical hashes."""
    import duckdb
    ref = GlobalConfig(
        beginning_of_all_times="0001-01-01 00:00:01",
        end_of_all_times="8888-12-31 23:59:59",
        beginning_of_all_times_date="0001-01-01",
        end_of_all_times_date="8888-12-31")
    spec = HashSpec("h", (f"!{ref.beginning_of_all_times}",
                          f"!{ref.end_of_all_times}",
                          f"!{ref.beginning_of_all_times_date}",
                          f"!{ref.end_of_all_times_date}"))
    got = spark.sql(
        f"SELECT {hash_expr_sql(spec, ref, SPARK)}").first().h
    want = duckdb.connect().execute(
        f"SELECT {hash_expr_sql(spec, ref, DUCKDB)}").fetchone()[0]
    assert got == want
    # sentinel literals also parse as TIMESTAMP in both engines (checked
    # in-engine: collecting year-1 datetimes trips CPython fromtimestamp)
    s = spark.sql(
        f"SELECT date_format(CAST('{ref.beginning_of_all_times}' AS TIMESTAMP), "
        f"'yyyy-MM-dd HH:mm:ss') a, "
        f"date_format(CAST('{ref.end_of_all_times}' AS TIMESTAMP), "
        f"'yyyy-MM-dd HH:mm:ss') b").first()
    assert s.a == ref.beginning_of_all_times and s.b == ref.end_of_all_times


def test_ascii_case_fold_parity_non_ascii(spark):
    """Case-insensitive hashkeys use an ASCII-only TRANSLATE fold:
    'ß' (Java UPPER='SS', DuckDB UPPER='ẞ') must hash identically."""
    import duckdb
    spec = HashSpec("h", ("v",))
    vals = ["ß", "Straße", "üMlAuT", "MiXeD ascii", "ǅ", "ﬁ"]
    rows = [(v,) for v in vals]
    spark.createDataFrame(rows, "v string").createOrReplaceTempView("folds")
    got = {r.v: r.h for r in spark.sql(
        f"SELECT v, {hash_expr_sql(spec, DEFAULT, SPARK)} FROM folds").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE folds (v VARCHAR)")
    con.executemany("INSERT INTO folds VALUES (?)", rows)
    want = {v: h for v, h in con.execute(
        f"SELECT v, {hash_expr_sql(spec, DEFAULT, DUCKDB)} FROM folds").fetchall()}
    assert got == want
    # and plain-ASCII case variants still collide (the fold works)
    a = spark.sql(
        f"SELECT {hash_expr_sql(HashSpec('h', ('!abc',)), DEFAULT, SPARK)}").first().h
    b = spark.sql(
        f"SELECT {hash_expr_sql(HashSpec('h', ('!ABC',)), DEFAULT, SPARK)}").first().h
    assert a == b


def test_upper_case_fold_reference_compat(spark):
    """hash_case_fold='upper' reproduces the reference's UPPER fold on
    the Spark side (hash.sql:494-500): JVM UPPER('ß')='SS', so 'straße'
    must collide with 'STRASSE' and 'strasse' — the documented
    byte-compat contract with reference-built databricks vaults. The
    DuckDB oracle is EXPECTED to diverge on such keys (DuckDB
    UPPER('ß')='ẞ'); cross-engine parity is only claimed for the
    default 'ascii' fold (test above)."""
    up = GlobalConfig(hash_case_fold="upper")

    def h(lit):
        spec = HashSpec("h", (f"!{lit}",))
        return spark.sql(f"SELECT {hash_expr_sql(spec, up, SPARK)}").first().h

    assert h("straße") == h("STRASSE") == h("strasse")
    assert h("münchen") == h("MÜNCHEN")          # Unicode fold applies
    assert h("abc") == h("ABC")                  # ASCII still folds
    # default 'ascii' fold keeps 'ß' as-is: no 'SS' collision
    def ha(lit):
        spec = HashSpec("h", (f"!{lit}",))
        return spark.sql(
            f"SELECT {hash_expr_sql(spec, DEFAULT, SPARK)}").first().h
    assert ha("straße") != ha("STRASSE")


def test_reference_parity_constant(spark):
    """GlobalConfig(**REFERENCE_PARITY) is the documented one-step
    migration config: reference ghost sentinels (dbt_project.yml:58-67)
    + UPPER fold (hash.sql:494-500), everything else default."""
    from datavault4dbt_spark.context import REFERENCE_PARITY
    g = GlobalConfig(**REFERENCE_PARITY)
    assert g.beginning_of_all_times == "0001-01-01 00:00:01"
    assert g.end_of_all_times == "8888-12-31 23:59:59"
    assert g.beginning_of_all_times_date == "0001-01-01"
    assert g.end_of_all_times_date == "8888-12-31"
    assert g.hash_case_fold == "upper"
    # non-parity fields stay at shipped defaults and remain overridable
    assert g.hash == "MD5"
    assert GlobalConfig(**{**REFERENCE_PARITY, "hash": "SHA256"}).hash == "SHA256"
    # the reference sentinels parse as Spark timestamps (outside the
    # pandas/Python-datetime window by design, so extract the year
    # JVM-side instead of collecting the raw value)
    row = spark.sql(
        f"SELECT year(TIMESTAMP '{g.beginning_of_all_times}') a, "
        f"year(TIMESTAMP '{g.end_of_all_times}') b").first()
    assert row.a == 1 and row.b == 8888


def test_hash_case_fold_validated():
    """Typos ('UPPER', 'unicode') must not silently fall through to the
    ASCII fold — GlobalConfig rejects them at construction time."""
    with pytest.raises(ValueError, match="hash_case_fold"):
        GlobalConfig(hash_case_fold="UPPER")
    with pytest.raises(ValueError, match="hash_case_fold"):
        GlobalConfig(hash_case_fold="unicode")
    with pytest.raises(ValueError, match="hash algorithm"):
        GlobalConfig(hash="CRC32")


def test_rtrim_folds_trim_chars_with_case_insensitive_hashdiff(spark):
    """hashdiff_use_rtrim + case-INsensitive hashdiff + lowercase
    placeholder: the row string is case-folded before RTRIM, so the trim
    character set must fold too — trailing folded placeholders must be
    stripped, making (x, NULL) hash like (x). Parity with DuckDB pins
    the cross-dialect RTRIM argument order as well."""
    import duckdb
    g = GlobalConfig(hashdiff_input_case_sensitive=False,
                     hashdiff_use_rtrim=True,
                     null_placeholder_string="null")
    spec = HashSpec("h", ("a", "b"), is_hashdiff=True)
    spark.createDataFrame([("x", None)], "a string, b string") \
        .createOrReplaceTempView("rt_pair")
    pair = spark.sql(
        f"SELECT {hash_expr_sql(spec, g, SPARK)} FROM rt_pair").first().h
    single = spark.sql(
        f"SELECT {hash_expr_sql(HashSpec('h', ('a',), is_hashdiff=True), g, SPARK)} "
        f"FROM rt_pair").first().h
    assert pair == single  # trailing folded placeholder was stripped
    con = duckdb.connect()
    d = con.execute(
        f"SELECT {hash_expr_sql(spec, g, DUCKDB)} "
        f"FROM (SELECT 'x' AS a, NULL AS b)").fetchone()[0]
    assert pair == d


def test_binary_hash_datatype_bytes_match_string_digest(spark):
    """BINARY hash layout (fabric/sqlserver dialects, reference
    hash.sql:396,678): the emitted bytes must be exactly the unhexed
    STRING digest — for real values, the all-NULL zero key, and the
    ghost sentinels — and Spark/DuckDB must agree byte-for-byte
    (unhex is the same function in both)."""
    import duckdb

    from datavault4dbt_spark.functions.ghost import ghost_hash_sql

    gs = DEFAULT
    gb = GlobalConfig(hash_datatype="BINARY")
    spec = HashSpec("hk", ("a", "b"))
    df = spark.createDataFrame(
        [("x", "y"), (None, None)], "a string, b string")
    df.createOrReplaceTempView("t_bin")
    rows = spark.sql(
        f"SELECT {hash_expr_sql(spec, gs, SPARK, alias=False)} AS s, "
        f"{hash_expr_sql(spec, gb, SPARK, alias=False)} AS b "
        f"FROM t_bin").collect()
    for r in rows:
        assert bytes(r.b) == bytes.fromhex(r.s)
    # all-NULL row hashed to the zero key, so its bytes are 16 zeros
    null_row = [r for r in rows if bytes(r.b) == b"\x00" * 16]
    assert len(null_row) == 1
    # ghost sentinel: raw zero-key bytes, not the hex TEXT's utf8
    ghost = spark.sql(
        f"SELECT {ghost_hash_sql('unknown', gb)} AS g").collect()[0]
    assert bytes(ghost.g) == b"\x00" * 16
    # DuckDB produces identical bytes from the same config
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 'x' AS a, 'y' AS b "
                "UNION ALL SELECT NULL, NULL")
    duck = con.execute(
        f"SELECT {hash_expr_sql(spec, gs, DUCKDB, alias=False)} AS s, "
        f"{hash_expr_sql(spec, gb, DUCKDB, alias=False)} AS b "
        f"FROM t").fetchall()
    assert sorted(bytes(b) for _s, b in duck) == \
        sorted(bytes(r.b) for r in rows)
    for s, b in duck:
        assert bytes(b) == bytes.fromhex(s)


def test_hash_datatype_validated():
    with pytest.raises(ValueError, match="hash_datatype"):
        GlobalConfig(hash_datatype="UUID")
