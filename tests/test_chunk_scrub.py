"""Exact substring-dedup transform (llm/chunking.py ChunkScrub): the
earliest corpus-order copy of a duplicated chunk survives, every later
copy is cut from the reassembled text, tails below min_chunk_len are
untouchable, and reassembly preserves chunk order. The driver fixture
(docs_chunk_scrubbed) is row-level verified against the DuckDB mirror
by test_oracle_parity."""

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.chunking import (ChunkScrubConfig,
                                              build_chunk_scrub)

G = DEFAULT


def _reg(df):
    reg = Registry()
    reg.register("docs", lambda s, d=df: d, "docs")
    return reg


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows, **kw):
    cfg = ChunkScrubConfig("t", source="docs", **kw)
    out = build_chunk_scrub(spark, _reg(_docs(spark, rows)), cfg, G)
    return {r.doc_id: r for r in out.collect()}


def test_first_occurrence_survives_later_copies_cut(spark):
    # 10-char chunks; doc 0 and doc 2 share one exact chunk
    shared = "aaaaabbbbb"
    rows = [(0, shared + "cccccddddd"),
            (1, "eeeeefffff"),
            (2, shared + "ggggghhhhh")]
    got = _run(spark, rows, chunk_chars=10, min_chunk_len=5)
    assert got[0].n_removed_chunks == 0
    assert got[0].cleaned_text == rows[0][1]
    assert got[2].n_removed_chunks == 1
    assert got[2].cleaned_text == "ggggghhhhh"
    assert got[2].cleaned_len == 10
    assert got[1].n_removed_chunks == 0


def test_within_doc_repeat_keeps_first_chunk(spark):
    rows = [(7, "xxxxxyyyyy" + "xxxxxyyyyy" + "zzzzzwwwww")]
    got = _run(spark, rows, chunk_chars=10, min_chunk_len=5)
    assert got[7].n_chunks == 3
    assert got[7].n_removed_chunks == 1
    assert got[7].cleaned_text == "xxxxxyyyyy" + "zzzzzwwwww"


def test_short_tails_never_removed(spark):
    # identical 3-char tails below min_chunk_len survive everywhere
    rows = [(0, "aaaaabbbbb" + "tail"),
            (1, "cccccddddd" + "tail")]
    got = _run(spark, rows, chunk_chars=10, min_chunk_len=5)
    assert got[0].cleaned_text.endswith("tail")
    assert got[1].cleaned_text.endswith("tail")
    assert got[0].n_removed_chunks == got[1].n_removed_chunks == 0


def test_fully_duplicated_doc_scrubs_to_empty(spark):
    rows = [(0, "aaaaabbbbb"), (1, "aaaaabbbbb")]
    got = _run(spark, rows, chunk_chars=10, min_chunk_len=5)
    assert got[0].cleaned_text == "aaaaabbbbb"
    assert got[1].cleaned_text == ""
    assert got[1].cleaned_len == 0
    assert got[1].n_removed_chunks == 1


def test_normalization_matches_case_variants(spark):
    rows = [(0, "AAAAABBBBB"), (1, "aaaaabbbbb")]
    got = _run(spark, rows, chunk_chars=10, min_chunk_len=5)
    assert got[1].cleaned_text == ""          # matched case-folded
    got = _run(spark, rows, chunk_chars=10, min_chunk_len=5,
               normalize=False)
    assert got[1].cleaned_text == "aaaaabbbbb"  # exact mode: no match


def test_null_text_doc_emits_no_row(spark):
    rows = [(0, "aaaaabbbbb"), (1, None)]
    got = _run(spark, rows, chunk_chars=10, min_chunk_len=5)
    assert set(got) == {0}
