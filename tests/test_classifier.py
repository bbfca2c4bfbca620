"""Learned quality classifier (llm/classifier.py): hand-computed
posterior weights over hashed features, teacher-slice routing (odd-id
docs never influence the model), the unseen-feature prior, empty-doc
NULLs, and config guards. The driver fixture (quality_classifier,
bundle member) is row-level verified against the DuckDB mirror by
test_oracle_parity."""

import hashlib

import pytest

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.classifier import (QualityClassifierConfig,
                                                build_quality_classifier,
                                                classifier_weights_frame)
from datavault4dbt_spark.llm.lm import SCALE

G = DEFAULT

# A "good" doc passes every Gopher default rule (>= 50 words, >= 2
# stopwords, alphabetic, sane lengths); a "bad" doc fails the
# word-count floor. Distinct vocabularies so features separate.
GOOD = ("the " + "a " + " ".join(f"good{i}" for i in range(60))).strip()
BAD = "junk1 junk2 junk3"


def _reg(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    reg = Registry()
    reg.register("docs", lambda s, d=df: d, "docs")
    return reg


def _run(spark, rows, **kw):
    cfg = QualityClassifierConfig("t", source="docs", **kw)
    return cfg, {r.doc_id: r for r in
                 build_quality_classifier(spark, _reg(spark, rows), cfg,
                                          G).collect()}


def _bucket(cfg, tok):
    h = hashlib.md5(f"{cfg.salt}:{tok}".encode()).hexdigest()
    return int(h[:4], 16) % cfg.n_features


def test_weights_match_python_posteriors(spark):
    # train slice = even ids: doc 0 labeled keep=True (GOOD), doc 2
    # labeled False (BAD). Replay the census per hashed bucket.
    rows = [(0, GOOD), (1, GOOD), (2, BAD), (3, BAD)]
    cfg = QualityClassifierConfig("t", source="docs")
    got = {r.f: r.w_ppm for r in classifier_weights_frame(
        _reg(spark, rows).load(spark, "docs"), cfg).collect()}
    census: dict = {}
    for doc_id, text in rows:
        if doc_id % 2:
            continue
        label = doc_id == 0
        for tok in text.split():
            pos, neg = census.get(_bucket(cfg, tok), (0, 0))
            census[_bucket(cfg, tok)] = (pos + (1 if label else 0),
                                         neg + (0 if label else 1))
    want = {f: ((pos + 1) * SCALE) // (pos + neg + 2)
            for f, (pos, neg) in census.items()}
    assert got == want


def test_scores_separate_and_threshold_splits(spark):
    rows = [(0, GOOD), (1, GOOD), (2, BAD), (3, BAD)]
    _cfg, got = _run(spark, rows)
    # held-out docs score like their class: GOOD tokens carry high
    # posteriors, BAD tokens low ones
    assert got[1].score_ppm > got[3].score_ppm
    _cfg, got = _run(spark, rows, threshold_ppm=SCALE // 2)
    assert got[1].selected and not got[3].selected


def test_odd_ids_never_train(spark):
    # flipping an ODD doc's text must not move anyone's score — the
    # model is fit on the even slice only
    base = [(0, GOOD), (1, GOOD), (2, BAD)]
    _c, a = _run(spark, base)
    _c, b = _run(spark, [(0, GOOD), (1, "zz1 zz2 zz3"), (2, BAD)])
    assert a[0].score_ppm == b[0].score_ppm
    assert a[2].score_ppm == b[2].score_ppm


def test_unseen_tokens_take_the_prior(spark):
    # doc 5's vocabulary shares no bucket-colliding token with the
    # train slice only by luck — so craft it: a single unseen token
    # scores exactly SCALE/2 unless its bucket collides; accept either
    # exact prior or a census value, but an EMPTY census (no train
    # rows) must make every score the prior
    rows = [(1, GOOD), (3, BAD), (5, "mystery")]   # ids all odd: no train
    _cfg, got = _run(spark, rows)
    for d in (1, 3, 5):
        assert got[d].score_ppm == SCALE // 2


def test_empty_docs_null_score(spark):
    _cfg, got = _run(spark, [(0, GOOD), (2, None), (4, "")])
    assert got[2].n_tokens == 0 and got[2].score_ppm is None
    assert got[2].selected is None
    assert got[4].score_ppm is None


def test_config_guards():
    with pytest.raises(ValueError):
        QualityClassifierConfig("t", n_features=500)   # not a power of 2
    with pytest.raises(ValueError):
        QualityClassifierConfig("t", n_features=1)
    with pytest.raises(ValueError):
        QualityClassifierConfig("t", threshold_ppm=SCALE + 1)
    with pytest.raises(ValueError):
        QualityClassifierConfig("t", salt="a'b")
    with pytest.raises(ValueError):
        QualityClassifierConfig("t", id_col="bad name")
