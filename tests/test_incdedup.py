"""Incremental corpus dedup (llm/incdedup.py): the batch-by-batch
store loop must equal the one-shot first-occurrence-wins rule (the
replay verification pattern), the index must carry dropped documents'
signatures forward, and batch ranges must be ordered by id. The driver
fixture (dedup_incremental) is row-level verified against the DuckDB
one-shot SQL by test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.dedup import build_minhash_lsh
from datavault4dbt_spark.llm.incdedup import (
    IncrementalDedupConfig, build_incremental_dedup)

G = DEFAULT


def _reg(df):
    reg = Registry()
    reg.register("docs", lambda s, d=df: d, "docs")
    return reg


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


UNIQUE = [
    "alpha beta gamma delta epsilon zeta",
    "one two three four five six seven",
    "red green blue yellow purple orange",
    "north south east west up down",
    "cat dog bird fish horse cow",
    "spring summer autumn winter solstice equinox",
]


def test_incremental_equals_one_shot_rule(spark):
    # 9 docs over 3 batches of 3: exact dup pairs spanning batches
    texts = [UNIQUE[0], UNIQUE[1], UNIQUE[2],
             UNIQUE[0], UNIQUE[3], UNIQUE[1],
             UNIQUE[4], UNIQUE[2], UNIQUE[5]]
    df = _docs(spark, texts)
    reg = _reg(df)
    cfg = IncrementalDedupConfig("t", source="docs", n_batches=3)
    got = {r.doc_id: (r.batch_id, r.is_kept)
           for r in build_incremental_dedup(spark, reg, cfg, G).collect()}
    # one-shot rule from the pair-finder itself
    pairs = build_minhash_lsh(spark, reg, cfg.minhash(), G).collect()
    dropped = {p.id_b for p in pairs}
    assert set(got) == set(range(9))
    for i in range(9):
        assert got[i][0] == i // 3            # contiguous id ranges
        assert got[i][1] == (i not in dropped), (i, got[i], dropped)
    # and the fixture really exercises both verdicts cross-batch
    assert got[3][1] is False and got[0][1] is True


def test_dropped_doc_still_blocks_later_duplicates(spark):
    # A (batch 0) ~ B (batch 1) ~ C (batch 2), all identical: B drops
    # against A; C must drop too — the index keeps B's signatures even
    # though B was dropped (first-occurrence-wins equivalence)
    texts = [UNIQUE[0], UNIQUE[1], UNIQUE[2],
             UNIQUE[0], UNIQUE[3], UNIQUE[4],
             UNIQUE[0], UNIQUE[5], "lorem ipsum dolor sit amet words"]
    df = _docs(spark, texts)
    cfg = IncrementalDedupConfig("t2", source="docs", n_batches=3)
    got = {r.doc_id: r.is_kept for r in
           build_incremental_dedup(spark, _reg(df), cfg, G).collect()}
    assert got[0] is True and got[3] is False and got[6] is False


def test_single_batch_degenerates_to_within_batch_dedup(spark):
    texts = [UNIQUE[0], UNIQUE[0], UNIQUE[1]]
    cfg = IncrementalDedupConfig("t3", source="docs", n_batches=1)
    got = {r.doc_id: (r.batch_id, r.is_kept) for r in
           build_incremental_dedup(spark, _reg(_docs(spark, texts)),
                                   cfg, G).collect()}
    assert got == {0: (0, True), 1: (0, False), 2: (0, True)}


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    cfg = IncrementalDedupConfig("t4", source="docs")
    out = build_incremental_dedup(spark, _reg(df), cfg, G)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "batch_id", "is_kept"}


def test_config_validation():
    with pytest.raises(ValueError):
        IncrementalDedupConfig("t", n_batches=0)
    with pytest.raises(ValueError):
        IncrementalDedupConfig("t", num_perm=16, bands=5)
    with pytest.raises(ValueError):
        IncrementalDedupConfig("t", id_col="bad-name")
