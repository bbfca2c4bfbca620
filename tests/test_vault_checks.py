"""Soft-constraint check behavior (operators/checks.py): each kind's
violation arithmetic on frames with known defects, NULL handling per
dbt generic-test semantics, and config validation. The driver fixture
(vault_checks) is row-level verified by test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.operators.checks import (
    Check, VaultChecksConfig, build_vault_checks)

G = DEFAULT


def _reg(**frames):
    reg = Registry()
    for name, df in frames.items():
        reg.register(name, lambda s, d=df: d, name)
    return reg


def _run(spark, reg, *checks):
    out = build_vault_checks(
        spark, reg, VaultChecksConfig("t", tuple(checks)), G).collect()
    return {(r.entity, r.check_kind, r.check_cols): r.n_violations
            for r in out}


def test_not_null_counts_rows_with_any_null(spark):
    t = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, None), (None, None)],
        "k long, v string")
    got = _run(spark, _reg(t=t), Check("t", "not_null", ("k", "v")))
    assert got == {("t", "not_null", "k,v"): 3}


def test_unique_counts_surplus_rows_including_null_groups(spark):
    t = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,), (None,)], "k long")
    got = _run(spark, _reg(t=t), Check("t", "unique", ("k",)))
    # three 1s -> 2 surplus; two NULLs -> 1 surplus (NULL tuples are
    # one group, dbt's unique would skip them — our stricter fold
    # counts them, matching the oracle's identical sentinel encoding)
    assert got == {("t", "unique", "k"): 3}


def test_unique_combination_on_composite_grain(spark):
    t = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "a")], "k long, d string")
    got = _run(spark, _reg(t=t),
               Check("t", "unique_combination", ("k", "d")))
    assert got == {("t", "unique_combination", "k,d"): 1}


def test_tuple_encoding_is_injective_on_separator_bytes(spark):
    """Components containing the separator/sentinel bytes must not
    make distinct tuples collide (round-7 advice: a raw concat_ws
    undercounted — ('a\\x01b','c') vs ('a','b\\x01c') folded to one
    tuple). The md5-per-component encoding keeps them apart."""
    t = spark.createDataFrame(
        [("a\x01b", "c"), ("a", "b\x01c"),
         ("a:b", "c"), ("a", "b:c"),
         ("x\x00null", None), ("x", None)],
        "k string, d string")
    got = _run(spark, _reg(t=t),
               Check("t", "unique_combination", ("k", "d")))
    assert got == {("t", "unique_combination", "k,d"): 0}


def test_relationship_ignores_null_fks(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    got = _run(spark, _reg(c=child, p=parent),
               Check("c", "relationship", ("fk",),
                     to_entity="p", to_columns=("pk",)))
    # 99 is orphaned; the NULL fk is ignored (dbt relationships test)
    assert got == {("c", "relationship", "fk"): 1}


def test_all_checks_union_into_one_report(spark):
    t = spark.createDataFrame([(1,), (1,)], "k long")
    got = _run(spark, _reg(t=t),
               Check("t", "not_null", ("k",)),
               Check("t", "unique", ("k",)))
    assert got == {("t", "not_null", "k"): 0, ("t", "unique", "k"): 1}


def test_config_validation():
    with pytest.raises(ValueError):
        Check("t", "primary_key", ("k",))
    with pytest.raises(ValueError):
        Check("t", "unique", ())
    with pytest.raises(ValueError):
        Check("t", "relationship", ("k",))  # no to_entity
    with pytest.raises(ValueError):
        Check("t", "relationship", ("a", "b"), to_entity="p",
              to_columns=("x",))  # arity mismatch
    with pytest.raises(ValueError):
        VaultChecksConfig("t", ())
