"""Semantic tests for the round-5 training-data operators beyond oracle
parity: repetition flags, PII redaction, mix weights, packing bins,
semdedup cluster scoping."""

import pytest

from datavault4dbt_spark import fixtures
from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.scrub import (RepetitionConfig, PiiRedactConfig,
                                           build_repetition, build_pii_redact)
from datavault4dbt_spark.llm.sampling import (DatasetMixConfig,
                                              SequencePackingConfig,
                                              build_dataset_mix,
                                              build_sequence_packing)
from datavault4dbt_spark.llm.semdedup import SemDedupConfig, build_semdedup


def _doc_reg(spark, rows):
    """Registry over an inline documents table: rows = (doc_id, text)."""
    reg = Registry()
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    reg.spark_loaders["documents"] = lambda _s: df
    return reg


def test_repetition_flags_degenerate_doc(spark):
    reg = _doc_reg(spark, [
        (1, "spam spam spam spam spam spam"),       # one bigram repeated
        (2, "a quick brown fox jumps over dogs"),   # all bigrams unique
        (3, "x"),                                   # too short for bigrams
    ])
    cfg = RepetitionConfig("rep", flag_threshold=0.5)
    out = {r["doc_id"]: r.asDict()
           for r in build_repetition(spark, reg, cfg).collect()}
    assert out[1]["is_repetitive"] and out[1]["dup_ngram_fraction"] == 1.0
    assert out[1]["top_ngram_share"] == 1.0
    assert not out[2]["is_repetitive"] and out[2]["dup_ngram_fraction"] == 0.0
    # short doc survives the left join with zeroed gram stats
    assert out[3]["n_tokens"] == 1 and out[3]["dup_ngram_fraction"] == 0.0
    assert out[2]["distinct_token_ratio"] == 1.0
    assert out[1]["distinct_token_ratio"] == pytest.approx(1 / 6, abs=1e-6)
    # unigram Gini: all-same doc -> 0; all-distinct 7 tokens -> 1 - 7/49
    assert out[1]["gini_diversity"] == 0.0
    assert out[2]["gini_diversity"] == pytest.approx(1 - 7 / 49, abs=1e-6)
    assert out[3]["gini_diversity"] == 0.0   # single token


def test_pii_redact_counts_and_scrubs(spark):
    reg = _doc_reg(spark, [
        (1, "mail bob.smith@corp.example.com and 192.168.0.1 please"),
        (2, "clean text no pii"),
        (3, "call +1 555 123 4567 twice +44 207 946 0958"),
    ])
    cfg = PiiRedactConfig("pii")
    out = {r["doc_id"]: r.asDict()
           for r in build_pii_redact(spark, reg, cfg).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1
    assert "<EMAIL>" in out[1]["redacted"] and "<IP>" in out[1]["redacted"]
    assert "bob.smith" not in out[1]["redacted"]
    assert out[2]["pii_free"] and out[2]["redacted"] == "clean text no pii"
    assert out[3]["n_phone"] == 2 and out[3]["redacted"].count("<PHONE>") == 2
    assert out[3]["redacted"] == "call <PHONE> twice <PHONE>"
    assert out[1]["n_pii_total"] == 2 and not out[1]["pii_free"]


def test_pii_patterns_reject_unportable_regex(spark):
    reg = _doc_reg(spark, [(1, "x")])
    bad = PiiRedactConfig("bad", patterns=(("d", "\\d+", "<N>"),))
    with pytest.raises(ValueError, match="portability"):
        build_pii_redact(spark, reg, bad)


def test_dataset_mix_respects_weights(spark, sf_dir):
    reg = fixtures.registry(spark, sf_dir)
    cfg = DatasetMixConfig("mix")
    docs = reg.load(spark, "documents")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").count().withColumnRenamed("count", "n")
                  .collect()}
    kept = {r["lang"]: r["n"] for r in
            build_dataset_mix(spark, reg, cfg)
            .groupBy("lang").count().withColumnRenamed("count", "n")
            .collect()}
    weights = dict(cfg.weights)
    for lang, total in totals.items():
        w = weights.get(lang, cfg.default_weight)
        frac = kept.get(lang, 0) / total
        # md5-uniform sampling: loose 3-sigma-ish bound at fixture scale
        assert abs(frac - w) < 0.15, (lang, frac, w)
    # determinism: the same plan yields the identical kept set
    a = {r["doc_id"] for r in build_dataset_mix(spark, reg, cfg).collect()}
    b = {r["doc_id"] for r in build_dataset_mix(spark, reg, cfg).collect()}
    assert a == b


def test_sequence_packing_matches_python_reference(spark, sf_dir):
    """The distributed prefix-sum packing must equal a sequential Python
    replay of the same boundary-assignment rule, per shard."""
    reg = fixtures.registry(spark, sf_dir)
    cfg = SequencePackingConfig("pack", budget=256, n_shards=4)
    rows = build_sequence_packing(spark, reg, cfg).collect()
    assert rows

    docs = sorted(
        (r["doc_id"], len([t for t in (r["text"] or "").split(" ") if t]))
        for r in reg.load(spark, "documents").select("doc_id", "text")
                    .collect())
    want = {}
    offset = [0] * cfg.n_shards
    for doc_id, n_tok in docs:
        shard = doc_id % cfg.n_shards
        b = offset[shard] // cfg.budget
        key = (shard, b)
        agg = want.setdefault(key, [0, 0, doc_id])
        agg[0] += 1
        agg[1] += n_tok
        offset[shard] += n_tok
    got = {(r["shard"], r["bin"]):
           [r["n_docs"], r["bin_tokens"], r["first_doc"]] for r in rows}
    assert got == want
    # the rule's fill guarantee: consecutive bins' combined tokens cover
    # at least one full budget (a single bin may run short only because
    # the previous bin's last document overflowed into its range)
    by_shard = {}
    for (shard, b), (_n, tok, _f) in sorted(want.items()):
        by_shard.setdefault(shard, []).append(tok)
    for shard, toks in by_shard.items():
        for a, b2 in zip(toks, toks[1:]):
            assert a + b2 >= cfg.budget


def test_semdedup_scopes_pairs_to_cells(spark):
    # 2 clusters along axes; ids 0/1 seed the centroids. Vectors 0,2,4
    # are near-parallel (cluster A); 1,3 near-parallel (cluster B);
    # 5 is cluster-A-assigned but dissimilar enough to survive.
    rows = [
        (0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
        (2, [0.999, 0.01, 0.0]), (3, [0.01, 0.999, 0.0]),
        (4, [0.998, 0.02, 0.0]), (5, [0.7, 0.0, 0.714]),
    ]
    reg = Registry()
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    reg.spark_loaders["embeddings"] = lambda _s: df
    cfg = SemDedupConfig("sd", n_clusters=2, threshold=0.95)
    out = {r["vec_id"]: r.asDict()
           for r in build_semdedup(spark, reg, cfg).collect()}
    # losers: higher ids of each near-parallel pair, scoped to cells
    assert set(out) == {2, 3, 4}
    assert out[2]["cell"] == 0 and out[4]["cell"] == 0
    assert out[3]["cell"] == 1
    assert out[4]["n_better_dups"] == 2          # dup of both 0 and 2
    assert out[4]["best_sim"] >= 0.99
    # the plan joins on the cell key — no cartesian pair generation
    plan = build_semdedup(spark, reg, cfg)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_scalar_quantize_roundtrip_error_bound(spark):
    from datavault4dbt_spark.llm.quantize import (ScalarQuantizeConfig,
                                                  build_scalar_quantize)
    rows = [
        (0, [0.0, 5.0, 1.0]),
        (1, [1.0, 5.0, 0.5]),
        (2, [0.5, 5.0, 0.25]),   # dim 1 is constant -> code 0, err 0
    ]
    reg = Registry()
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    reg.spark_loaders["embeddings"] = lambda _s: df
    cfg = ScalarQuantizeConfig("q", levels=4)
    out = {r["vec_id"]: r.asDict()
           for r in build_scalar_quantize(spark, reg, cfg).collect()}
    assert all(r["n_dims"] == 3 for r in out.values())
    codes = {k: [int(c) for c in v["codes"].split(",")] for k, v in out.items()}
    # dim 0 range [0,1], 4 levels: 0.0->0, 1.0->3 (clamped), 0.5->2
    assert codes[0][0] == 0 and codes[1][0] == 3 and codes[2][0] == 2
    # constant dimension always codes to 0
    assert all(codes[k][1] == 0 for k in codes)
    # reconstruction error bounded by half a quantization step per dim;
    # here max step is range/levels = 0.25 -> per-dim err <= 0.125
    assert all(v["recon_mae"] <= 0.125 + 1e-9 for v in out.values())


def test_null_text_follows_null_in_null_out(spark):
    """NULL document text: metrics go NULL (or zero where a missing
    gram-group legitimately means 'none'), rows are never dropped —
    the same convention as multimodal's NULL payloads. Both engines
    produce NULL for the same expressions, so oracle parity holds by
    construction; this pins the Spark-side shape."""
    from datavault4dbt_spark.llm.sampling import (SequencePackingConfig,
                                                  build_sequence_packing)
    reg = _doc_reg(spark, [(1, None), (2, "two tokens here")])

    rep = {r["doc_id"]: r.asDict() for r in build_repetition(
        spark, reg, RepetitionConfig("r")).collect()}
    assert set(rep) == {1, 2}
    assert rep[1]["n_tokens"] is None and rep[1]["dup_ngram_fraction"] == 0.0
    assert not rep[1]["is_repetitive"]
    assert rep[1]["gini_diversity"] is None   # NULL text -> NULL, not 1.0

    pii = {r["doc_id"]: r.asDict() for r in build_pii_redact(
        spark, reg, PiiRedactConfig("p")).collect()}
    assert pii[1]["redacted"] is None and pii[1]["pii_free"] is None
    assert pii[2]["pii_free"]

    # NULL token counts collect in the NULL bin (sum() skips NULLs, the
    # bin expression propagates NULL) — deterministic on both engines
    packs = build_sequence_packing(
        spark, reg, SequencePackingConfig("pk", n_shards=1)).collect()
    bins = {r["bin"]: r for r in packs}
    assert None in bins and bins[None]["n_docs"] == 1


def test_substring_dup_finds_known_shared_run(spark):
    from datavault4dbt_spark.llm.substring import (SubstringDupConfig,
                                                   build_substring_dup)
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    reg = _doc_reg(spark, [
        (1, f"prefix one two {shared} suffix here now"),
        (2, f"{shared} completely different tail words follow after"),
        (3, "unrelated content with no overlap at all whatsoever"),
        # shares only 6 tokens with doc 1 (< min_run 8)
        (4, "prefix one two alpha beta gamma nothing else matches"),
    ])
    cfg = SubstringDupConfig("ss", gram_n=3, min_run=8, max_doc_freq=0)
    out = {(r["id_a"], r["id_b"]): r.asDict()
           for r in build_substring_dup(spark, reg, cfg).collect()}
    assert set(out) == {(1, 2)}
    # t consecutive 3-gram matches == run of t + 2 tokens; the shared
    # block is exactly 10 tokens
    assert out[(1, 2)]["max_shared_run"] == 10


def test_tfidf_ranks_rare_terms_first(spark):
    from datavault4dbt_spark.llm.tfidf import TfidfConfig, build_tfidf
    reg = _doc_reg(spark, [
        (1, "common common common rareword common"),
        (2, "common words only common here"),
        (3, "common another doc common common"),
    ])
    out = {r["doc_id"]: r for r in
           build_tfidf(spark, reg, TfidfConfig("tt", top_k=1)).collect()}
    # 'rareword': tf=1, df=1, n=3 -> 3.0; 'common' in doc 1: tf=4, df=3
    # -> 4.0 — common still wins on raw tf; verify exact scores instead
    full = {(r["doc_id"], r["term"]): r["tfidf"] for r in
            build_tfidf(spark, reg, TfidfConfig("tt", top_k=10)).collect()}
    assert full[(1, "rareword")] == 3.0
    assert full[(1, "common")] == 4.0
    assert out[2]["term"] in ("words", "only", "here")  # df=1 terms win
    assert out[2]["tfidf"] == 3.0


def test_packing_manifest_consistent_with_bin_rollup(spark, sf_dir):
    """The per-doc manifest and the per-bin rollup are two views of one
    assignment rule: grouping the manifest must reproduce the rollup."""
    from datavault4dbt_spark.llm.sampling import (
        PackingManifestConfig, SequencePackingConfig,
        build_packing_manifest, build_sequence_packing)
    from pyspark.sql import functions as F

    reg = fixtures.registry(spark, sf_dir)
    man = build_packing_manifest(
        spark, reg, PackingManifestConfig("m", budget=256, n_shards=8))
    rolled = {(r["shard"], r["bin"]): (r["n_docs"], r["bin_tokens"],
                                       r["first_doc"])
              for r in man.groupBy("shard", "bin")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.expr("CAST(sum(n_tok) AS BIGINT)").alias("bin_tokens"),
                   F.min("doc_id").alias("first_doc")).collect()}
    bins = {(r["shard"], r["bin"]): (r["n_docs"], r["bin_tokens"],
                                     r["first_doc"])
            for r in build_sequence_packing(
                spark, reg, SequencePackingConfig("p", budget=256,
                                                  n_shards=8)).collect()}
    assert rolled == bins
    # offsets are the prefix sums the bins were cut from
    row = man.filter("shard = 0").orderBy("doc_id").limit(1).first()
    assert row["bin_offset_tokens"] == 0 and row["bin"] == 0


def test_corpus_shuffle_matches_python_reference(spark):
    """corpus_shuffle: shard/key/pos must equal a Python md5 replay —
    48-bit key from the first 12 md5 nibbles of 'salt:id', shard =
    key % n_shards, pos = rank within shard by (key, id)."""
    import hashlib
    from datavault4dbt_spark.llm.sampling import (CorpusShuffleConfig,
                                                  build_corpus_shuffle)

    ids = [0, 1, 5, 7, 13, 42, 999, 10_000]
    reg = Registry()
    df = spark.createDataFrame([(i, "x") for i in ids],
                               "doc_id BIGINT, text STRING")
    reg.spark_loaders["documents"] = lambda _s: df
    cfg = CorpusShuffleConfig("cs", n_shards=3, salt="s1")
    got = {r.doc_id: (r.shard, r.pos, r.shuffle_key)
           for r in build_corpus_shuffle(spark, reg, cfg, DEFAULT)
           .collect()}

    keys = {i: int(hashlib.md5(f"s1:{i}".encode()).hexdigest()[:12], 16)
            for i in ids}
    want = {}
    for shard in range(3):
        members = sorted((keys[i], i) for i in ids if keys[i] % 3 == shard)
        for pos, (k, i) in enumerate(members, start=1):
            want[i] = (shard, pos, k)
    assert got == want


def test_corpus_shuffle_rerun_and_salt_sensitivity(spark):
    """Same salt -> identical assignment on rerun (reproducibility);
    different salt -> a different permutation (the knob is real)."""
    from datavault4dbt_spark.llm.sampling import (CorpusShuffleConfig,
                                                  build_corpus_shuffle)

    reg = Registry()
    df = spark.createDataFrame([(i, "x") for i in range(64)],
                               "doc_id BIGINT, text STRING")
    reg.spark_loaders["documents"] = lambda _s: df
    run = lambda salt: sorted(  # noqa: E731
        (r.doc_id, r.shard, r.pos) for r in build_corpus_shuffle(
            spark, reg, CorpusShuffleConfig("cs", n_shards=4, salt=salt),
            DEFAULT).collect())
    a1, a2, b = run("a"), run("a"), run("b")
    assert a1 == a2
    assert a1 != b
    # every doc exactly once, positions contiguous from 1 per shard
    assert len(a1) == 64
    by_shard = {}
    for _i, shard, pos in a1:
        by_shard.setdefault(shard, []).append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def _temp_mix_replay(ids_by_stratum, alpha, budget_ppm, salt):
    """Python mirror of temperature_mix's integer fixed-point formula."""
    import hashlib
    import math
    n_total = sum(len(v) for v in ids_by_stratum.values())
    w_ppb = {}
    for s, ids in ids_by_stratum.items():
        p = len(ids) / n_total
        x = {"1": p, "0.5": math.sqrt(p),
             "0.25": math.sqrt(math.sqrt(p))}[alpha]
        w_ppb[s] = math.floor(x * 1_000_000_000)
    z = sum(w_ppb.values())
    kept = {}
    for s, ids in ids_by_stratum.items():
        q_ppm = (w_ppb[s] * 1_000_000) // z
        rate = min(1_000_000,
                   ((q_ppm * budget_ppm) // 1_000_000)
                   * n_total // len(ids))
        for i in ids:
            u16 = int(hashlib.md5(f"{salt}:{i}".encode())
                      .hexdigest()[:4], 16)
            if u16 * 1_000_000 < rate * 65536:
                kept[i] = (s, rate)
    return kept


def test_temperature_mix_matches_python_reference(spark):
    """Skewed strata at alpha=0.5: the boosted tail stratum's rate hits
    the 1e6 cap while the heavy stratum is suppressed below budget, and
    every kept row matches the Python replay of the integer formula."""
    from datavault4dbt_spark.llm.sampling import (TemperatureMixConfig,
                                                  build_temperature_mix)

    strata = {"big": list(range(0, 90)), "small": list(range(100, 110))}
    rows = [(i, s) for s, ids in strata.items() for i in ids]
    reg = Registry()
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
    reg.spark_loaders["documents"] = lambda _s: df
    cfg = TemperatureMixConfig("tm", alpha="0.5", budget_ppm=700_000,
                               salt="t1")
    got = {r.doc_id: (r.source, r.rate_ppm)
           for r in build_temperature_mix(spark, reg, cfg, DEFAULT)
           .collect()}
    want = _temp_mix_replay(strata, "0.5", 700_000, "t1")
    assert got == want
    rates = {s: r for s, r in got.values()}
    assert rates["small"] == 1_000_000          # cap branch
    assert rates["big"] < 700_000               # suppressed below budget


def test_temperature_mix_alpha_one_is_flat(spark):
    """alpha=1 degenerates to plain budget sampling: every stratum's
    rate equals the replay's (≈ budget up to ppm flooring)."""
    from datavault4dbt_spark.llm.sampling import (TemperatureMixConfig,
                                                  build_temperature_mix)

    strata = {"a": list(range(0, 30)), "b": list(range(50, 70))}
    rows = [(i, s) for s, ids in strata.items() for i in ids]
    reg = Registry()
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
    reg.spark_loaders["documents"] = lambda _s: df
    cfg = TemperatureMixConfig("tm1", alpha="1", budget_ppm=500_000)
    got = {r.doc_id: (r.source, r.rate_ppm)
           for r in build_temperature_mix(spark, reg, cfg, DEFAULT)
           .collect()}
    assert got == _temp_mix_replay(strata, "1", 500_000, "temp")
    for _s, rate in got.values():
        assert abs(rate - 500_000) <= 1_000     # flat up to flooring


def test_temperature_mix_rejects_unportable_alpha(spark):
    from datavault4dbt_spark.llm.sampling import TemperatureMixConfig
    with pytest.raises(ValueError, match="alpha"):
        TemperatureMixConfig("bad", alpha="0.3")


def test_grouped_quantiles_match_python_order_statistics(spark):
    """Exact type-1 quartiles: q_k = the smallest value whose
    cumulative count reaches k/4 of the group — checked against
    Python's order-statistic indexing, NULLs excluded, per group."""
    from datavault4dbt_spark.llm.profile import (GroupedQuantilesConfig,
                                                 build_grouped_quantiles)

    groups = {"a": [5, 1, 9, 3, 7, 7, 2], "b": [10, 10, 10],
              "c": [4], "d": [None, 8, 6]}
    rows = [(f"{g}{i}", g, v) for g, vs in groups.items()
            for i, v in enumerate(vs)]
    reg = Registry()
    df = spark.createDataFrame(rows,
                               "doc_id STRING, source STRING, n_chars BIGINT")
    reg.spark_loaders["documents"] = lambda _s: df
    cfg = GroupedQuantilesConfig("gq")
    got = {r.source: (r.n_rows, r.v_min, r.q25, r.q50, r.q75, r.v_max)
           for r in build_grouped_quantiles(spark, reg, cfg, DEFAULT)
           .collect()}

    import math
    want = {}
    for g, vs in groups.items():
        s = sorted(v for v in vs if v is not None)
        n = len(s)
        # type-1: smallest v with cum*4 >= k*n == s[ceil(k*n/4) - 1]
        q = lambda k: s[math.ceil(k * n / 4) - 1]  # noqa: E731
        want[g] = (n, s[0], q(1), q(2), q(3), s[-1])
    assert got == want


def test_token_budget_counts_and_shares(spark):
    """Hand-computed token accounting: shares are integer ppm floors
    of each source's token fraction; empty/whitespace docs count 0."""
    from datavault4dbt_spark.llm.sources import (TokenBudgetConfig,
                                                 build_token_budget)

    rows = [(1, "a b c", "s1"), (2, "d e", "s1"), (3, "f", "s2"),
            (4, "", "s2"), (5, "  ", "s2")]
    reg = Registry()
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, source STRING")
    reg.spark_loaders["documents"] = lambda _s: df
    got = {r.source: (r.n_docs, r.n_tokens, r.token_share_ppm)
           for r in build_token_budget(
               spark, reg, TokenBudgetConfig("tb"), DEFAULT).collect()}
    assert got == {"s1": (2, 5, 5 * 1_000_000 // 6),
                   "s2": (3, 1, 1_000_000 // 6)}
