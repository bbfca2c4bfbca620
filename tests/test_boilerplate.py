"""Cross-document line-frequency boilerplate removal
(llm/boilerplate.py): every-copy-removed semantics (unlike dedup's
first-occurrence-wins), the distinct-document census (in-doc repeats
alone never trigger), the min_chars floor, and line-order-preserving
reassembly. The driver fixture (docs_boilerplate_clean, bundle member)
is row-level verified against the DuckDB mirror by
test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.boilerplate import (BoilerplateConfig,
                                                 build_boilerplate_removal)

G = DEFAULT


def _run(spark, rows, **kw):
    cfg = BoilerplateConfig("t", source="docs", **kw)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    reg = Registry()
    reg.register("docs", lambda s, d=df: d, "docs")
    return {r.doc_id: r for r in
            build_boilerplate_removal(spark, reg, cfg, G).collect()}


def test_every_copy_removed_including_first(spark):
    got = _run(spark, [
        (0, "cookie banner here\nreal prose of doc zero"),
        (1, "cookie banner here\nreal prose of doc one"),
    ])
    # the banner disappears from BOTH docs — no first-occurrence survivor
    assert got[0].cleaned_text == "real prose of doc zero"
    assert got[1].cleaned_text == "real prose of doc one"
    assert got[0].n_boiler_lines == 1 and got[1].n_boiler_lines == 1


def test_in_document_repeats_are_not_boilerplate(spark):
    got = _run(spark, [
        (0, "repeated inside\nrepeated inside\nrepeated inside"),
        (1, "completely different text"),
    ])
    # 3 copies but only 1 distinct doc -> census floor not met
    assert got[0].n_boiler_lines == 0
    assert got[0].cleaned_text.count("repeated inside") == 3


def test_min_chars_floor_protects_short_lines(spark):
    got = _run(spark, [(0, "ok\nlong shared boilerplate line"),
                       (1, "ok\nlong shared boilerplate line")],
               min_chars=5)
    # 'ok' recurs but is under the floor; the long line is removed
    assert got[0].cleaned_text == "ok" and got[1].cleaned_text == "ok"
    assert got[0].n_boiler_lines == 1


def test_normalization_and_order_preserved(spark):
    got = _run(spark, [
        (0, "first real line\n  SHARED FOOTER  \nlast real line"),
        (1, "shared footer\nother content here"),
    ])
    # case/whitespace-insensitive match; survivors keep document order
    assert got[0].cleaned_text == "first real line\nlast real line"
    assert got[1].cleaned_text == "other content here"


def test_null_text_emits_no_row_and_empty_cleans_to_empty(spark):
    got = _run(spark, [(0, None), (1, "shared liner x\nshared liner x"),
                       (2, "shared liner x")])
    assert 0 not in got
    # doc 1's two copies + doc 2's one copy = 2 distinct docs -> removed
    assert got[1].cleaned_text == "" and got[1].n_boiler_lines == 2
    assert got[2].cleaned_text == "" and got[2].cleaned_len == 0


def test_config_guards():
    with pytest.raises(ValueError):
        BoilerplateConfig("t", min_docs=1)
    with pytest.raises(ValueError):
        BoilerplateConfig("t", min_chars=0)
    with pytest.raises(ValueError):
        BoilerplateConfig("t", id_col="doc id")
