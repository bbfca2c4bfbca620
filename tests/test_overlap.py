"""Source-overlap matrix (llm/overlap.py): hand-checked set sizes,
intersections and integer Jaccard; zero-overlap pairs absent. The
sf-scale oracle parity rides in test_oracle_parity via the declared
fixture (source_overlap_matrix)."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.overlap import (SourceOverlapConfig,
                                             build_source_overlap)


def _reg(spark, rows):
    df = spark.createDataFrame(rows, "src string, text string")
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    return reg


def _cfg(**kw):
    base = dict(source="t", group_col="src", text_col="text", shingle_n=3)
    base.update(kw)
    return SourceOverlapConfig("ov", **base)


def _rows(spark, reg, cfg):
    return {(r["group_a"], r["group_b"]):
            (r["n_a"], r["n_b"], r["n_shared"], r["jaccard_ppm"])
            for r in build_source_overlap(spark, reg, cfg).collect()}


def test_exact_intersection_and_ppm(spark):
    # A: {a b c, b c d, c d e}  B: {a b c}  -> shared 1, J = 1/3
    reg = _reg(spark, [("A", "a b c d"), ("A", "b c d e"),
                       ("B", "a b c")])
    got = _rows(spark, reg, _cfg())
    assert got == {("A", "B"): (3, 1, 1, 333_333)}


def test_zero_overlap_pairs_absent(spark):
    reg = _reg(spark, [("A", "a b c"), ("B", "x y z"), ("C", "a b c")])
    got = _rows(spark, reg, _cfg())
    assert got == {("A", "C"): (1, 1, 1, 1_000_000)}


def test_duplicate_shingles_within_group_count_once(spark):
    # the same shingle twice in one group is ONE set element
    reg = _reg(spark, [("A", "a b c"), ("A", "a b c"), ("B", "a b c")])
    got = _rows(spark, reg, _cfg())
    assert got == {("A", "B"): (1, 1, 1, 1_000_000)}


def test_short_docs_yield_no_shingles(spark):
    reg = _reg(spark, [("A", "a b"), ("B", "a b c")])
    got = _rows(spark, reg, _cfg())
    assert got == {}


def test_validation():
    with pytest.raises(ValueError, match="shingle_n"):
        _cfg(shingle_n=0)
