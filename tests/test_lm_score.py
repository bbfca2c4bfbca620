"""Bigram-LM quality score (llm/lm.py): fixed-point add-one-smoothed
mean token probability, trained on the id % train_mod == 0 slice. The
tests verify the arithmetic against a hand-computed model and the
contract edges (short docs, unseen tokens, empty training slice
behavior). The driver fixture (text_lm_score) is row-level verified
against the DuckDB mirror by test_oracle_parity."""

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.lm import SCALE, BigramLmConfig, build_lm_score

G = DEFAULT


def _reg(df):
    reg = Registry()
    reg.register("docs", lambda s, d=df: d, "docs")
    return reg


def _run(spark, rows, **kw):
    cfg = BigramLmConfig("t", source="docs", **kw)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in build_lm_score(spark, _reg(df), cfg, G)
            .collect()}


def test_hand_computed_model(spark):
    # train doc (id 0): "a b a b" -> bigrams (a,b)x2, (b,a)x1
    # prefix counts: a->2, b->1 ; vocab V = {a, b} = 2
    got = _run(spark, [(0, "a b a b"), (1, "a b c")])
    # doc 1 bigrams: (a,b): (2+1)*S // (2+2) ; (b,c): (0+1)*S // (1+2)
    q_ab = (3 * SCALE) // 4
    q_bc = SCALE // 3
    assert got[1].n_bigrams == 2
    assert got[1].n_seen == 1
    assert got[1].score_ppm == (q_ab + q_bc) // 2
    # the training doc scores itself too: (a,b),(b,a),(a,b)
    q_ba = (2 * SCALE) // 3
    assert got[0].n_bigrams == 3
    assert got[0].n_seen == 3
    assert got[0].score_ppm == (q_ab + q_ba + q_ab) // 3


def test_unseen_prefix_uniform_fallback(spark):
    # "x y": neither trained; prefix x unseen -> q = S // (0 + V)
    got = _run(spark, [(0, "a b"), (1, "x y")])
    assert got[1].n_seen == 0
    assert got[1].score_ppm == SCALE // 2      # V = {a, b}


def test_short_docs_null_score(spark):
    got = _run(spark, [(0, "a b"), (1, "single"), (3, "")])
    assert got[1].n_bigrams == 0 and got[1].score_ppm is None
    assert got[3].n_bigrams == 0 and got[3].score_ppm is None
    assert set(got) == {0, 1, 3}


def test_min_count_prunes_bigram_table(spark):
    # (a,b) trained once -> pruned at min_count=2 -> scored as unseen
    got = _run(spark, [(0, "a b"), (1, "a b")], min_count=2)
    assert got[1].n_seen == 0
    # prefix a still counts (c_pre=1), V=2 -> q = S // 3
    assert got[1].score_ppm == SCALE // 3


def test_train_mod_slices_training_set(spark):
    # train_mod=3: only id 0 trains; ids 1,2 are held out
    got = _run(spark, [(0, "a b"), (1, "a b"), (2, "c d")],
               train_mod=3)
    assert got[1].n_seen == 1
    assert got[2].n_seen == 0


# -- CCNet perplexity bucketing over the LM score ---------------------------

from datavault4dbt_spark.llm.lm import CcnetBucketsConfig, build_ccnet_buckets


def _run_buckets(spark, docs, scores):
    """docs: (doc_id, lang); scores: (doc_id, score_ppm or None)."""
    reg = Registry()
    ddf = spark.createDataFrame(docs, "doc_id long, lang string")
    sdf = spark.createDataFrame(scores, "doc_id long, score_ppm long")
    reg.register("docs", lambda s, d=ddf: d, "docs")
    reg.register("scores", lambda s, d=sdf: d, "scores")
    cfg = CcnetBucketsConfig("t", source="docs", score_entity="scores")
    return {r.doc_id: r for r in
            build_ccnet_buckets(spark, reg, cfg, G).collect()}


def test_exact_terciles(spark):
    # 6 distinct scores -> clean thirds: top 2 head, mid 2, low 2 tail
    docs = [(i, "en") for i in range(6)]
    scores = [(i, (6 - i) * 10) for i in range(6)]   # 60,50,40,30,20,10
    got = _run_buckets(spark, docs, scores)
    assert [got[i].ppl_bucket for i in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail"]
    assert [got[i].keep for i in range(6)] == [
        True, True, True, True, False, False]


def test_cutoff_ties_all_land_in_higher_bucket(spark):
    # three docs share the head-cutoff score: no arbitrary tie split —
    # all three bucket as head even though that overfills the third
    docs = [(i, "en") for i in range(6)]
    scores = [(0, 50), (1, 50), (2, 50), (3, 10), (4, 10), (5, 10)]
    got = _run_buckets(spark, docs, scores)
    assert [got[i].ppl_bucket for i in range(3)] == ["head"] * 3
    assert [got[i].ppl_bucket for i in range(3, 6)] == ["middle"] * 3


def test_null_scores_bucket_as_tail(spark):
    docs = [(0, "en"), (1, "en"), (2, "en"), (3, "en")]
    scores = [(0, 30), (1, 20), (2, 10), (3, None)]
    got = _run_buckets(spark, docs, scores)
    assert got[3].ppl_bucket == "tail" and got[3].keep is False
    assert got[0].ppl_bucket == "head"


def test_languages_bucket_independently(spark):
    # same absolute score lands in different buckets per language
    docs = [(0, "en"), (1, "en"), (2, "en"), (10, "fr"), (11, "fr"),
            (12, "fr")]
    scores = [(0, 90), (1, 50), (2, 10), (10, 50), (11, 40), (12, 30)]
    got = _run_buckets(spark, docs, scores)
    assert got[1].ppl_bucket == "middle"    # 50 is en's middle
    assert got[10].ppl_bucket == "head"     # 50 is fr's head
