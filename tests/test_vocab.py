"""Corpus vocabulary top-k (llm/vocab.py): hand-computed tf/df, the
deterministic (tf desc, token asc) tie break, and k-truncation. The
driver fixture (text_vocab_topk) is row-level verified against the
DuckDB mirror by test_oracle_parity."""

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.vocab import VocabTopkConfig, build_vocab_topk

G = DEFAULT


def _run(spark, rows, **kw):
    cfg = VocabTopkConfig("t", source="docs", **kw)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    reg = Registry()
    reg.register("docs", lambda s, d=df: d, "docs")
    return build_vocab_topk(spark, reg, cfg, G).collect()


def test_tf_df_and_rank(spark):
    rows = [(0, "a a b"), (1, "a c"), (2, "b b b")]
    got = _run(spark, rows)
    by_tok = {r.token: r for r in got}
    assert (by_tok["b"].tf, by_tok["b"].df) == (4, 2)
    assert (by_tok["a"].tf, by_tok["a"].df) == (3, 2)
    assert (by_tok["c"].tf, by_tok["c"].df) == (1, 1)
    assert [r.token for r in sorted(got, key=lambda r: r.rnk)] == \
        ["b", "a", "c"]


def test_tie_break_is_token_ascending(spark):
    rows = [(0, "z q m"), (1, "q z m")]          # all tf=2, df=2
    got = sorted(_run(spark, rows), key=lambda r: r.rnk)
    assert [r.token for r in got] == ["m", "q", "z"]
    assert [r.rnk for r in got] == [1, 2, 3]


def test_k_truncates_after_ordering(spark):
    rows = [(0, "a a a b b c")]
    got = _run(spark, rows, k=2)
    assert [(r.token, r.rnk) for r in
            sorted(got, key=lambda r: r.rnk)] == [("a", 1), ("b", 2)]


def test_empty_and_multispace_text(spark):
    rows = [(0, ""), (1, "  a   a "), (2, "a")]
    got = _run(spark, rows)
    assert [(r.token, r.tf, r.df) for r in got] == [("a", 3, 2)]


def test_grouped_vocab_ranks_within_each_group(spark):
    from datavault4dbt_spark.llm.vocab import (GroupedVocabConfig,
                                               build_grouped_vocab)
    from datavault4dbt_spark.context import Registry

    rows = [(0, "en", "a a b"), (1, "en", "b c"), (2, "de", "x")]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, "
                                     "text string")
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: df
    cfg = GroupedVocabConfig("gv", source="t", k=2)
    got = {(r["lang"], r["rnk"]): (r["token"], r["tf"], r["df"])
           for r in build_grouped_vocab(spark, reg, cfg).collect()}
    # en: a(tf2) and b(tf2) tie -> token asc; c truncated at k=2.
    # de ranks independently.
    assert got == {("en", 1): ("a", 2, 1), ("en", 2): ("b", 2, 2),
                   ("de", 1): ("x", 1, 1)}
