"""Property tests: the chunk-scrub and boilerplate-removal plans equal
naive per-document Python references on random corpora. (The driver
gate certifies one fixture each against DuckDB; this sweeps the input
space — chunk boundaries, tie-breaking by corpus order, every-copy
semantics, normalization.)"""

from hypothesis import given, settings, strategies as st

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.llm.boilerplate import (BoilerplateConfig,
                                                 build_boilerplate_removal)
from datavault4dbt_spark.llm.chunking import (ChunkScrubConfig,
                                              build_chunk_scrub)
import pytest

pytestmark = pytest.mark.slow

G = DEFAULT

# tiny alphabet + short words force cross-doc chunk/line collisions
words = st.sampled_from(["aa", "bb", "cc", "dd"])
doc_text = st.lists(words, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc_text, min_size=1, max_size=6)


def _reg(df):
    reg = Registry()
    reg.register("docs", lambda s, d=df: d, "docs")
    return reg


def _chunks(text, n):
    # the doc_chunks grammar: >= 1 chunk for any non-NULL text
    out, i = [], 0
    while True:
        out.append(text[i:i + n])
        i += n
        if i >= len(text):
            return out


def _naive_scrub(texts, chunk_chars, min_len):
    seen = {}
    for d, t in enumerate(texts):
        for cid, ch in enumerate(_chunks(t, chunk_chars)):
            # candidacy keys on RAW length (the operator filters on
            # chunk_len); normalization applies only to matching
            if len(ch) >= min_len:
                seen.setdefault(ch.strip().lower(), []).append((d, cid))
    removed = set()
    for key, lst in seen.items():
        if len(lst) >= 2:
            removed.update(lst[1:])   # corpus order == append order
    out = {}
    for d, t in enumerate(texts):
        chs = _chunks(t, chunk_chars)
        kept = [c for i, c in enumerate(chs) if (d, i) not in removed]
        n_rm = sum(1 for i in range(len(chs)) if (d, i) in removed)
        out[d] = (len(chs), n_rm, "".join(kept))
    return out


@settings(max_examples=10, deadline=None)
@given(texts=corpus)
def test_chunk_scrub_equals_naive(spark, texts):
    cfg = ChunkScrubConfig("t", source="docs", chunk_chars=5,
                           min_chunk_len=3)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_chunks, r.n_removed_chunks, r.cleaned_text)
           for r in build_chunk_scrub(spark, _reg(df), cfg, G).collect()}
    want = _naive_scrub(texts, 5, 3)
    assert got == want


def _naive_boiler(texts, min_docs, min_chars):
    from collections import defaultdict
    docs_per = defaultdict(set)
    for d, t in enumerate(texts):
        for line in t.split("\n"):
            n = line.strip().lower()
            if len(n) >= min_chars:
                docs_per[n].add(d)
    boiler = {k for k, v in docs_per.items() if len(v) >= min_docs}
    out = {}
    for d, t in enumerate(texts):
        lines = t.split("\n")
        rm = [line.strip().lower() in boiler
              and len(line.strip().lower()) >= min_chars
              for line in lines]
        kept = [line for line, r in zip(lines, rm) if not r]
        cleaned = "\n".join(kept)
        out[d] = (len(lines), sum(rm), len(cleaned), cleaned)
    return out


# multi-line docs: lines drawn from a tiny pool so cross-doc repeats
line_pool = st.sampled_from(
    ["shared banner", "menu item", "unique prose %d", "xx", ""])
doc_lines = st.lists(
    st.tuples(line_pool, st.integers(0, 99)), min_size=1, max_size=5
).map(lambda ls: "\n".join(
    (l % i if "%d" in l else l) for l, i in ls))
line_corpus = st.lists(doc_lines, min_size=1, max_size=5)


@settings(max_examples=10, deadline=None)
@given(texts=line_corpus)
def test_boilerplate_equals_naive(spark, texts):
    cfg = BoilerplateConfig("t", source="docs", min_docs=2, min_chars=5)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_lines, r.n_boiler_lines, r.cleaned_len,
                      r.cleaned_text)
           for r in build_boilerplate_removal(
               spark, _reg(df), cfg, G).collect()}
    want = _naive_boiler(texts, 2, 5)
    assert got == want
