"""Selection-operator behavior (llm/selection.py): canonical pick is
the quality argmax with a deterministic tie-break, the salted two-stage
source cap equals the single-window spec, and the stratified split is a
stable pure function of (salt, id). Exactness of the driver-checked
configs is covered by test_oracle_parity."""

import pytest

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.selection import (
    CanonicalConfig, SourceCapConfig, StratifiedSplitConfig,
    build_canonical_selection, build_source_cap, build_stratified_split)

G = DEFAULT


def _reg(**frames):
    reg = Registry()
    for name, df in frames.items():
        reg.register(name, lambda s, d=df: d, name)
    return reg


# ------------------------------------------------ canonical selection --

def test_canonical_picks_highest_quality_then_lowest_id(spark):
    groups = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (7, 7, 2), (9, 7, 2)],
        "doc_id long, group_id long, group_size long")
    quality = spark.createDataFrame(
        # group 1: doc 2 wins on quality; group 7: tie -> doc 7 wins
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5), (9, 0.5)],
        "doc_id long, quality_score double")
    reg = _reg(dedup_groups=groups, text_quality=quality)
    out = build_canonical_selection(
        spark, reg, CanonicalConfig("t"), G).collect()
    canon = {r.doc_id for r in out if r.is_canonical}
    assert canon == {2, 7}
    assert len(out) == 5  # every grouped doc gets a verdict row


def test_curation_with_canonical_keeps_best_not_lowest_id(spark):
    """The curation chain's canonical_entity mode drops NON-canonical
    group members (keep-best-quality) where the default pair heuristic
    would keep the lowest id."""
    from datavault4dbt_spark.llm.curation import (
        CurationConfig, build_curation)

    groups = spark.createDataFrame(
        [(1, 1, 2), (2, 1, 2)], "doc_id long, group_id long, group_size long")
    quality = spark.createDataFrame(
        # doc 2 beats doc 1 on quality; both clear min_quality
        [(1, 0.6, 10), (2, 0.9, 12)],
        "doc_id long, quality_score double, n_tokens long")
    lang = spark.createDataFrame(
        [(1, "en"), (2, "en")], "doc_id long, predicted_lang string")
    pairs = spark.createDataFrame(
        [(1, 2, 3)], "id_a long, id_b long, n_bands long")
    reg = _reg(dedup_groups=groups, text_quality=quality,
               text_langid=lang, dedup_minhash_lsh=pairs)
    reg.register("canonical_docs",
                 lambda s: build_canonical_selection(
                     s, reg, CanonicalConfig("c"), G), "canonical_docs")
    default = {r.doc_id for r in build_curation(
        spark, reg, CurationConfig("d"), G).collect()}
    best = {r.doc_id for r in build_curation(
        spark, reg, CurationConfig("b", canonical_entity="canonical_docs"),
        G).collect()}
    assert default == {1}   # pair heuristic keeps the lower id
    assert best == {2}      # canonical mode keeps the higher quality


# ------------------------------------------------------- source cap --

def test_source_cap_two_stage_equals_single_window(spark):
    import random
    rnd = random.Random(7)
    rows = [(i, f"s{i % 3}") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    q = spark.createDataFrame(
        [(i, round(rnd.random(), 6)) for i in range(300)],
        "doc_id long, quality_score double")
    reg = _reg(documents=docs, text_quality=q)
    cfg = SourceCapConfig("t", cap=7, n_salts=5)
    got = sorted((r.doc_id, r.source, r.cap_rank) for r in
                 build_source_cap(spark, reg, cfg, G).collect())
    # single-window spec, computed driver-side
    quality = {i: v for i, v in q.collect()}
    want = []
    for s in ("s0", "s1", "s2"):
        members = sorted((i for i, src in rows if src == s),
                         key=lambda i: (-quality[i], i))
        want += [(i, s, rank + 1)
                 for rank, i in enumerate(members[:cfg.cap])]
    assert got == sorted(want)


def test_source_cap_skewed_source_stays_bounded(spark):
    # one source holds 90% of the rows; the result must still be the
    # exact top-cap of that source
    rows = [(i, "big" if i < 180 else "small") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    q = spark.createDataFrame(
        [(i, float((i * 37) % 100) / 100) for i in range(200)],
        "doc_id long, quality_score double")
    reg = _reg(documents=docs, text_quality=q)
    out = build_source_cap(
        spark, reg, SourceCapConfig("t", cap=4, n_salts=8), G).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src["big"]) == 4 and len(by_src["small"]) == 4
    # ranks are 1..cap and ordered by quality desc
    big = sorted(by_src["big"], key=lambda r: r.cap_rank)
    assert [r.cap_rank for r in big] == [1, 2, 3, 4]
    assert all(big[i].quality_score >= big[i + 1].quality_score
               for i in range(3))


def test_source_cap_rejects_bad_config():
    with pytest.raises(ValueError):
        SourceCapConfig("t", cap=0)
    with pytest.raises(ValueError):
        SourceCapConfig("t", source_col="bad-name")


# --------------------------------------------------- stratified split --

def test_split_is_stable_under_corpus_growth(spark):
    """Adding documents must not reassign existing ones — the property
    that keeps eval sets stable across corpus versions."""
    cfg = StratifiedSplitConfig("t", fractions=(("en", 0.6, 0.2),))
    small = spark.createDataFrame(
        [(i, "en") for i in range(50)], "doc_id long, lang string")
    big = spark.createDataFrame(
        [(i, "en") for i in range(200)], "doc_id long, lang string")
    a = {r.doc_id: r.split for r in build_stratified_split(
        spark, _reg(documents=small), cfg, G).collect()}
    b = {r.doc_id: r.split for r in build_stratified_split(
        spark, _reg(documents=big), cfg, G).collect()}
    assert all(b[i] == a[i] for i in a)
    assert set(b.values()) == {"train", "validation", "test"}


def test_split_respects_per_stratum_fractions(spark):
    cfg = StratifiedSplitConfig(
        "t", fractions=(("en", 1.0, 0.0), ("de", 0.0, 1.0)),
        default_train=0.0, default_val=0.0)
    docs = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(90)],
        "doc_id long, lang string")
    out = build_stratified_split(spark, _reg(documents=docs), cfg, G) \
        .collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.split)
    assert by_lang == {"en": {"train"}, "de": {"validation"},
                       "fr": {"test"}}


def test_split_rejects_bad_fractions():
    with pytest.raises(ValueError):
        StratifiedSplitConfig("t", fractions=(("en", 0.8, 0.3),))
    with pytest.raises(ValueError):
        StratifiedSplitConfig("t", fractions=(("o'brien", 0.5, 0.2),))
    with pytest.raises(ValueError):
        StratifiedSplitConfig("t", default_train=1.2)


# ------------------------------------------------------ percentile rank --

def test_percentile_rank_ties_and_bounds(spark):
    from datavault4dbt_spark.context import Registry
    from datavault4dbt_spark.llm.selection import (PercentileRankConfig,
                                                   build_percentile_rank)
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "en", 20), (4, "en", 40),
         (5, "de", 7)],
        "doc_id bigint, lang string, n_chars bigint")
    reg = Registry()
    reg.spark_loaders["documents"] = lambda _s: df
    out = {r["doc_id"]: (r["rnk"], r["n"], r["pr_ppm"])
           for r in build_percentile_rank(
               spark, reg, PercentileRankConfig("pr")).collect()}
    assert out[1] == (1, 4, 0)                  # min -> 0
    assert out[2] == (2, 4, 333_333)            # ties share the rank
    assert out[3] == (2, 4, 333_333)
    assert out[4] == (4, 4, 1_000_000)          # max -> 1e6
    assert out[5] == (1, 1, 0)                  # 1-row stratum -> 0
