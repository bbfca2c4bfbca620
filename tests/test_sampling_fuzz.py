"""Property-based checks for the sampling operators: random corpora
through sequence_packing must equal a sequential Python replay of the
boundary-assignment rule, and dataset_mix must equal the md5-derived
Python decision per document. Batched like test_hash_fuzz (few
examples, one Spark job each — per-example jobs would take minutes)."""

import hashlib

from hypothesis import given, settings, strategies as st

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.sampling import (DatasetMixConfig,
                                              SequencePackingConfig,
                                              build_dataset_mix,
                                              build_sequence_packing)
import pytest

pytestmark = pytest.mark.slow

# word-soup documents: token counts 0..80, ids sparse and unordered
_docs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000),
              st.integers(min_value=0, max_value=80)),
    min_size=1, max_size=40,
    unique_by=lambda t: t[0])


def _reg(spark, rows):
    reg = Registry()
    data = [(i, " ".join("w" for _ in range(n)), "en" if i % 2 else "de")
            for i, n in rows]
    df = spark.createDataFrame(data, "doc_id BIGINT, text STRING, lang STRING")
    reg.spark_loaders["documents"] = lambda _s: df
    return reg


@settings(max_examples=8, deadline=None)
@given(rows=_docs)
def test_fuzz_packing_equals_sequential_replay(spark, rows):
    cfg = SequencePackingConfig("pk", budget=64, n_shards=3)
    got = {(r["shard"], r["bin"]): (r["n_docs"], r["bin_tokens"],
                                    r["first_doc"])
           for r in build_sequence_packing(spark, _reg(spark, rows), cfg)
           .collect()}
    want: dict = {}
    offset = [0] * cfg.n_shards
    for doc_id, n_tok in sorted(rows):
        shard = doc_id % cfg.n_shards
        b = offset[shard] // cfg.budget
        n, tok, first = want.get((shard, b), (0, 0, doc_id))
        want[(shard, b)] = (n + 1, tok + n_tok, first)
        offset[shard] += n_tok
    assert got == want


@settings(max_examples=8, deadline=None)
@given(rows=_docs)
def test_fuzz_mix_equals_python_md5_decision(spark, rows):
    cfg = DatasetMixConfig("mx", weights=(("en", 0.7),), default_weight=0.2)
    got = {r["doc_id"] for r in
           build_dataset_mix(spark, _reg(spark, rows), cfg).collect()}
    want = set()
    for doc_id, _n in rows:
        h = hashlib.md5(f"{cfg.salt}:{doc_id}".encode()).hexdigest()
        u = int(h[:4], 16) / 65536.0
        w = 0.7 if doc_id % 2 else 0.2
        if u < w:
            want.add(doc_id)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(rows=_docs,
       budget_ppm=st.integers(min_value=0, max_value=1_000_000),
       max_repeats=st.integers(min_value=1, max_value=3))
def test_fuzz_resample_equals_python_fixed_point_replay(spark, rows,
                                                        budget_ppm,
                                                        max_repeats):
    """Random corpora/budgets/caps: the repeat-expansion output (exact
    copy multiset per document) must equal a pure-Python replay of the
    ppb/ppm integer pipeline — floor(sqrt(p)*1e9) weights, integer
    normalization, the max_repeats cap, the md5 fractional draw."""
    import math

    from datavault4dbt_spark.llm.sampling import (
        TemperatureResampleConfig, build_temperature_resample)

    cfg = TemperatureResampleConfig(
        "tr", strata_col="lang", budget_ppm=budget_ppm,
        max_repeats=max_repeats)
    got = sorted((r["doc_id"], r["repeat_idx"], r["rate_ppm"])
                 for r in build_temperature_resample(
                     spark, _reg(spark, rows), cfg).collect())

    n_s: dict = {}
    for doc_id, _n in rows:
        lang = "en" if doc_id % 2 else "de"
        n_s[lang] = n_s.get(lang, 0) + 1
    n_total = sum(n_s.values())
    w_ppb = {s: math.floor(math.sqrt(n / n_total) * 1_000_000_000)
             for s, n in n_s.items()}
    z = sum(w_ppb.values())
    rate = {s: min(max_repeats * 1_000_000,
                   ((((w_ppb[s] * 1_000_000) // z) * budget_ppm)
                    // 1_000_000) * n_total // n_s[s])
            for s in n_s}
    want = []
    for doc_id, _n in rows:
        r = rate["en" if doc_id % 2 else "de"]
        h = hashlib.md5(f"{cfg.salt}:{doc_id}".encode()).hexdigest()
        u16 = int(h[:4], 16)
        copies = r // 1_000_000 + (1 if u16 * 1_000_000
                                   < (r % 1_000_000) * 65536 else 0)
        want += [(doc_id, k, r) for k in range(1, copies + 1)]
    assert got == sorted(want)


# chunk grammar reference: pure-Python replay of the window rule
def _py_chunks(text, chunk, stride):
    if text is None:
        return []
    n = len(text)
    n_chunks = 1 if n <= chunk else 1 + -((n - chunk) // -stride)
    return [(i, 1 + i * stride, text[i * stride: i * stride + chunk])
            for i in range(n_chunks)]


_chunk_docs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000),
              st.one_of(st.none(),
                        st.text(alphabet="abc xyz", max_size=60))),
    min_size=1, max_size=25, unique_by=lambda t: t[0])


@given(_chunk_docs,
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=12))
@settings(max_examples=8, deadline=None)
def test_chunk_grammar_matches_python_reference(spark, rows, chunk, stride):
    """Random corpora + window geometries: the Spark chunk grammar must
    equal the sequential Python replay (offsets, text, counts), with
    stride clamped to the config contract."""
    from datavault4dbt_spark.llm.chunking import ChunkConfig, chunk_dataframe

    stride = min(stride, chunk)            # config contract
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = ChunkConfig("cf", chunk_chars=chunk, stride=stride)
    got = sorted((r.doc_id, r.chunk_id, r.chunk_start, r.chunk_text,
                  r.n_chunks)
                 for r in chunk_dataframe(df, cfg).collect())
    want = sorted(
        (i, cid, start, txt, len(_py_chunks(t, chunk, stride)))
        for i, t in rows
        for cid, start, txt in _py_chunks(t, chunk, stride))
    assert got == want


# -------------------------------------------- proportional allocation --

def test_proportional_sample_exact_total_and_hamilton(spark):
    """The allocation sums to exactly total_n and follows the
    largest-remainder rule against a Python replay."""
    from datavault4dbt_spark.context import Registry
    from datavault4dbt_spark.llm.sampling import (
        ProportionalSampleConfig, build_proportional_sample)

    sizes = {"a": 7, "b": 13, "c": 3, "d": 29}
    rows, i = [], 0
    for s, c in sizes.items():
        for _ in range(c):
            rows.append((i, s)); i += 1
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    reg = Registry()
    reg.spark_loaders["documents"] = lambda _s: df
    N = 11
    out = build_proportional_sample(
        spark, reg, ProportionalSampleConfig("ps", total_n=N)).collect()
    got_alloc = {}
    for r in out:
        got_alloc.setdefault(r["lang"], 0)
        got_alloc[r["lang"]] += 1
        assert r["sample_rank"] <= r["n_alloc"]
    assert sum(got_alloc.values()) == N
    # Python Hamilton replay
    T = sum(sizes.values())
    base = {s: (N * c) // T for s, c in sizes.items()}
    rem = {s: (N * c) % T for s, c in sizes.items()}
    extra = N - sum(base.values())
    for s in sorted(sizes, key=lambda s: (-rem[s], s))[:extra]:
        base[s] += 1
    assert {s: n for s, n in base.items() if n} == got_alloc


def test_proportional_sample_degenerate_n_exceeds_corpus(spark):
    from datavault4dbt_spark.context import Registry
    from datavault4dbt_spark.llm.sampling import (
        ProportionalSampleConfig, build_proportional_sample)

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id bigint, lang string")
    reg = Registry()
    reg.spark_loaders["documents"] = lambda _s: df
    out = build_proportional_sample(
        spark, reg, ProportionalSampleConfig("ps", total_n=10)).collect()
    assert len(out) == 3               # capped at the corpus
