"""Degenerate-input hardening: zero-norm vectors under ANSI mode, NULL
payloads/content, lowercase placeholder configs, regex-metachar quote
characters, offset id spaces, unsupported SimHash widths."""

import pytest
from pyspark.sql import functions as F

from datavault4dbt_spark.context import DEFAULT, GlobalConfig, Registry
from datavault4dbt_spark.functions.hashing import (
    HashSpec, hash_expr_sql, SPARK, DUCKDB)

G = DEFAULT


def test_zero_norm_vector_does_not_crash_cosine(spark):
    """ANSI mode is on by default in Spark 4: a zero vector must yield
    NULL cosine (try_divide) and drop out of the threshold filter —
    matching DuckDB's NULL on x/0 — not DIVIDE_BY_ZERO."""
    from datavault4dbt_spark.llm.dedup import (EmbeddingCosineConfig,
                                               build_embedding_cosine)
    rows = [(i, [0.0] * 64 if i == 2 else [float((i + j) % 5 - 2)
                                           for j in range(64)])
            for i in range(6)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    reg = Registry()
    reg.spark_loaders["zvecs"] = lambda _s: vecs
    out = build_embedding_cosine(
        spark, reg, EmbeddingCosineConfig("z", source="zvecs"), G).collect()
    assert all(r.id_a != 2 and r.id_b != 2 for r in out)

    from datavault4dbt_spark.llm.similarity import AnnConfig, build_ann_topk
    out2 = build_ann_topk(
        spark, reg, AnnConfig("za", source="zvecs",
                              query_filter="vec_id < 3"), G).collect()
    assert all(r.cosine is not None for r in out2)


def test_ann_ivf_offset_id_space_not_empty(spark):
    """Centroids are the n_cells lowest ids by RANK — an id space
    starting at 1000 must still produce results."""
    from datavault4dbt_spark.llm.similarity import IvfConfig, build_ann_ivf
    rows = [(1000 + i, [float((i * 7 + j) % 5 - 2) for j in range(64)])
            for i in range(20)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    reg = Registry()
    reg.spark_loaders["ovecs"] = lambda _s: vecs
    cfg = IvfConfig("oivf", source="ovecs", n_cells=4, nprobe=2,
                    query_filter="vec_id < 1005")
    out = build_ann_ivf(spark, reg, cfg, G).collect()
    assert out and all(r.cosine is not None for r in out)


def test_multimodal_null_payload_yields_null_features(spark):
    from datavault4dbt_spark.llm.multimodal import (MultimodalConfig,
                                                    build_multimodal_features)
    docs = spark.createDataFrame(
        [(1, "hello"), (2, None)], "doc_id long, text string")
    reg = Registry()
    reg.spark_loaders["ndocs"] = lambda _s: docs
    out = {r.doc_id: r for r in build_multimodal_features(
        spark, reg, MultimodalConfig("m", source="ndocs"), G).collect()}
    assert out[1].width is not None and out[1].n_bytes == 5
    assert out[2].width is None and out[2].height is None \
        and out[2].n_bytes is None


def test_multimodal_header_decode_parses_and_rejects(spark):
    """The FIMG container parse: valid header -> dims from the id
    grammar with n_bytes = body + 12; corrupt row (id % corrupt_every
    == 0) -> NULL dims but real byte count; NULL body -> all NULL;
    byte-level rejects (short buffer, bad magic, non-digit dims)."""
    from datavault4dbt_spark.llm.multimodal import (
        MultimodalDecodeConfig, build_multimodal_decode, _header_decode)
    docs = spark.createDataFrame(
        [(1, "hello"), (7, "corrupt row"), (2, None)],
        "doc_id long, text string")
    reg = Registry()
    reg.spark_loaders["hdocs"] = lambda _s: docs
    out = {r.doc_id: r for r in build_multimodal_decode(
        spark, reg, MultimodalDecodeConfig("m", source="hdocs"), G)
        .collect()}
    assert (out[1].width, out[1].height) == (1 + 37 % 1920, 1 + 101 % 1080)
    assert out[1].n_bytes == len("hello") + 12
    assert out[7].width is None and out[7].n_bytes == len("corrupt row")
    assert out[2].n_bytes is None and out[2].width is None
    # byte-level reject paths, straight on the parser
    assert _header_decode(b"FIMG00100020body") == (10, 20)
    assert _header_decode(b"FIMG0010002") == (None, None)      # short
    assert _header_decode(b"GIMF00100020body") == (None, None)  # magic
    assert _header_decode(b"FIMG00x00020body") == (None, None)  # digits
    assert _header_decode(b"FIMG+0100020body") == (None, None)  # sign
    assert _header_decode(None) == (None, None)
    with pytest.raises(ValueError, match="corrupt_every"):
        MultimodalDecodeConfig("m", corrupt_every=1)


def test_simhash_rejects_unsupported_widths():
    from datavault4dbt_spark.llm.dedup import SimHashConfig
    with pytest.raises(ValueError, match="multiple of 4"):
        SimHashConfig("s", bits=64)
    with pytest.raises(ValueError, match="multiple of 4"):
        SimHashConfig("s", bits=30)
    SimHashConfig("s", bits=32)        # supported width passes


def test_all_null_zero_key_with_lowercase_placeholder(spark):
    """A lowercase null placeholder must still hit the NULLIF all-null
    guard after the case fold: all-NULL keys hash to the zero key in
    BOTH dialects."""
    import duckdb
    g = GlobalConfig(null_placeholder_string="null")
    spec = HashSpec("h", ("a", "b"))
    got = spark.sql(
        f"SELECT {hash_expr_sql(spec, g, SPARK)} FROM "
        f"(SELECT CAST(NULL AS STRING) a, CAST(NULL AS STRING) b)").first().h
    want = duckdb.connect().execute(
        f"SELECT {hash_expr_sql(spec, g, DUCKDB)} FROM "
        f"(SELECT CAST(NULL AS VARCHAR) a, CAST(NULL AS VARCHAR) b) t").fetchone()[0]
    assert got == want == g.unknown_key


def test_regex_metachar_quote_character_parity(spark):
    """quote_character='$' feeds a DuckDB REGEX pattern: it must swap
    the literal character (as Spark's REPLACE does), not anchor."""
    import duckdb
    g = GlobalConfig(quote_character="$")
    spec = HashSpec("h", ("v",))
    vals = ["plain", "do$$ar", "$lead", "trail$"]
    spark.createDataFrame([(v,) for v in vals], "v string") \
        .createOrReplaceTempView("qvals")
    got = {r.v: r.h for r in spark.sql(
        f"SELECT v, {hash_expr_sql(spec, g, SPARK)} FROM qvals").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE qvals (v VARCHAR)")
    con.executemany("INSERT INTO qvals VALUES (?)", [(v,) for v in vals])
    want = {v: h for v, h in con.execute(
        f"SELECT v, {hash_expr_sql(spec, g, DUCKDB)} FROM qvals").fetchall()}
    assert got == want


def test_streaming_dedup_batch_path_keeps_first_arrival(spark):
    """The batch twin keeps the min-event-time row per hash,
    deterministically."""
    import datetime
    from datavault4dbt_spark.streaming.dedup import streaming_exact_dedup
    TS = datetime.datetime
    df = spark.createDataFrame(
        [(1, "x", TS(2024, 1, 2)), (2, "x", TS(2024, 1, 1)),
         (3, "y", TS(2024, 1, 3))],
        "id long, props string, ts timestamp").repartition(4)
    out = {r.content_hash: r.id for r in
           streaming_exact_dedup(df, "props", "ts").collect()}
    assert sorted(out.values()) == [2, 3]      # earliest per hash


def test_contamination_max_doc_freq_caps_hot_grams(spark, sf_dir):
    """The opt-in document-frequency cap drops boilerplate grams before
    the probe join, with identical semantics in the oracle."""
    from conftest import compare_spark_duck
    from datavault4dbt_spark import fixtures
    from datavault4dbt_spark.llm.contamination import (
        ContaminationConfig, build_contamination, contamination_oracle)
    from datavault4dbt_spark.plans.sqlbuild import SqlBuilder

    cfg = ContaminationConfig("contam_capped", max_doc_freq=2)
    reg = fixtures.registry(spark, sf_dir)
    df = build_contamination(spark, reg, cfg)
    b = SqlBuilder()
    final = contamination_oracle(b, fixtures.oracle_registry(), cfg)
    compare_spark_duck(spark, sf_dir, df, b.render(f"SELECT * FROM {final}"))
    # the cap genuinely bites on this corpus (small vocabulary -> hot
    # shingles exist): capped totals are strictly below uncapped
    uncapped = build_contamination(
        spark, reg, ContaminationConfig("contam_raw"))
    from pyspark.sql import functions as F
    tot = lambda d: d.agg(F.sum("n_shared_ngrams")).first()[0]  # noqa: E731
    assert tot(df) < tot(uncapped)


def test_pii_rejects_bad_label_and_replacement(spark):
    from datavault4dbt_spark.context import Registry
    from datavault4dbt_spark.llm.scrub import (PiiRedactConfig,
                                               build_pii_redact)
    reg = Registry()
    reg.spark_loaders["documents"] = lambda sp: sp.range(1).selectExpr(
        "id AS doc_id", "'x' AS text")
    with pytest.raises(ValueError, match="identifier"):
        build_pii_redact(spark, reg,
                         PiiRedactConfig("p", patterns=(
                             ("bad label", "x", "<X>"),)))
    with pytest.raises(ValueError, match="portability"):
        build_pii_redact(spark, reg,
                         PiiRedactConfig("p", patterns=(
                             ("ok", "x", "<owner's>"),)))


def test_replay_rejects_empty_members():
    from datavault4dbt_spark.plans.replay import ReplayConfig
    with pytest.raises(ValueError, match="member"):
        ReplayConfig("r", "2024-01-01 00:00:00", ())


def test_multimodal_decoder_selection_and_oracle_contract(spark):
    """Round-6: 'auto' resolves to Pillow when importable, else stub —
    and the oracle generator refuses non-stub decoders (real codecs
    are not SQL-expressible; those entries go rows-only)."""
    from datavault4dbt_spark.llm.multimodal import (
        MultimodalConfig, _resolve_decoder, multimodal_oracle)
    from datavault4dbt_spark.plans.sqlbuild import SqlBuilder

    try:
        import PIL.Image  # noqa: F401
        expected = "pil"
    except ImportError:
        expected = "stub"
    assert _resolve_decoder("auto") == expected
    assert _resolve_decoder("stub") == "stub"
    assert _resolve_decoder("pil") == "pil"    # explicit stays explicit
    with pytest.raises(ValueError, match="decoder"):
        MultimodalConfig("m", decoder="ffmpeg")
    reg = Registry()
    reg.duckdb_relations["documents"] = "documents"
    with pytest.raises(ValueError, match="not SQL-expressible"):
        multimodal_oracle(SqlBuilder(), reg,
                          MultimodalConfig("m", decoder="pil"), G)


def _bmp_bytes(w: int, h: int) -> bytes:
    """Minimal uncompressed 24-bit BMP, built in pure Python so the
    Pillow path can be exercised without any image fixture files."""
    import struct

    row = (w * 3 + 3) & ~3
    data = b"\x00" * (row * h)
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def test_multimodal_pil_decode_real_dimensions(spark):
    """When Pillow is importable the 'pil' decoder must return REAL
    image dimensions through the same mapInPandas shape, and decode
    corrupt payloads to NULL features instead of failing the task."""
    pytest.importorskip("PIL")
    from datavault4dbt_spark.llm.multimodal import (
        MultimodalConfig, build_multimodal_features)

    rows = [(1, bytearray(_bmp_bytes(7, 3))),
            (2, bytearray(_bmp_bytes(1, 1))),
            (3, bytearray(b"not an image")),
            (4, None)]
    docs = spark.createDataFrame(rows, "doc_id long, img binary")
    reg = Registry()
    reg.spark_loaders["imgs"] = lambda _s: docs
    out = {r.doc_id: r for r in build_multimodal_features(
        spark, reg, MultimodalConfig("m", source="imgs",
                                     payload_from="img",
                                     decoder="pil"), G).collect()}
    assert (out[1].width, out[1].height) == (7, 3)
    assert (out[2].width, out[2].height) == (1, 1)
    assert out[3].width is None and out[3].n_bytes == 12
    assert out[4].width is None and out[4].n_bytes is None


def test_doc_chunks_grammar_edges(spark):
    """NULL text -> no rows; empty text -> ONE empty chunk (the doc
    must survive chunk-keyed joins); exact-boundary text -> no phantom
    trailing chunk; overlap reconstructs the original text."""
    from datavault4dbt_spark.llm.chunking import (ChunkConfig,
                                                  build_doc_chunks)
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "abcdefgh"), (4, "abcdefghij")],
        "doc_id long, text string")
    reg = Registry()
    reg.spark_loaders["cdocs"] = lambda _s: docs
    cfg = ChunkConfig("ch", source="cdocs", chunk_chars=8, stride=4)
    rows = build_doc_chunks(spark, reg, cfg, G).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc
    assert [(r.chunk_id, r.chunk_text) for r in by_doc[2]] == [(0, "")]
    assert [(r.chunk_id, r.chunk_text) for r in by_doc[3]] == [
        (0, "abcdefgh")]          # len == chunk_chars: exactly 1 chunk
    got4 = sorted((r.chunk_id, r.chunk_start, r.chunk_text)
                  for r in by_doc[4])
    assert got4 == [(0, 1, "abcdefgh"), (1, 5, "efghij")]
    assert all(r.n_chunks == len(by_doc[r.doc_id]) for r in rows)
    with pytest.raises(ValueError, match="stride"):
        ChunkConfig("bad", chunk_chars=4, stride=8)


def test_source_gate_drops_offending_sources_only(spark):
    """Short-heavy, duplicate-heavy and low-volume sources are dropped
    wholesale; clean sources keep every document."""
    from datavault4dbt_spark.llm.sources import (
        SourceStatsConfig, SourceGateConfig, build_source_stats,
        build_source_gate)
    long = " ".join("w" for _ in range(60))
    rows = (
        [(i, f"{long} unique{i}", "en", "clean") for i in range(10)]
        + [(100 + i, "tiny doc", "en", "shorty") for i in range(10)]
        + [(200 + i, long + " dup", "en", "mirror") for i in range(10)]
        + [(300, long, "en", "sparse")])          # < min_docs
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    reg = Registry()
    reg.spark_loaders["documents"] = lambda _s: docs
    reg.spark_loaders["source_stats"] = (
        lambda sp: build_source_stats(
            sp, reg, SourceStatsConfig("source_stats"), G))
    out = build_source_gate(spark, reg, SourceGateConfig("sg"), G).collect()
    assert {r.source for r in out} == {"clean"}
    assert len(out) == 10


def test_chunk_dedup_span_merge_and_counts(spark):
    """Hand-computable duplicate spans: two docs share a paragraph that
    strided chunking covers with OVERLAPPING chunks — the span merge
    must count each duplicated character once; a doc with no shared
    chunks reports zeros with NULL offsets; normalization folds case/
    padding; min_chunk_len drops short tails from dup detection."""
    from datavault4dbt_spark.llm.chunking import (ChunkConfig,
                                                  ChunkDedupConfig,
                                                  build_doc_chunks,
                                                  build_chunk_dedup)
    shared = "0123456789abcdefghij"           # 20 chars, 2 chunks @12/8
    docs = spark.createDataFrame(
        [(1, shared), (2, shared.upper()), (3, "zzzzzzzzzzzzzzzzzzzz")],
        "doc_id long, text string")
    reg = Registry()
    reg.spark_loaders["ddocs"] = lambda _s: docs
    reg.spark_loaders["chz"] = lambda sp: build_doc_chunks(
        sp, reg, ChunkConfig("chz", source="ddocs",
                             chunk_chars=12, stride=8), G)
    out = {r.doc_id: r for r in build_chunk_dedup(
        spark, reg, ChunkDedupConfig("cd", chunks_entity="chz",
                                     min_chunk_len=5), G).collect()}
    # docs 1+2 share both chunks (case-folded): chunks [1,12] and
    # [9,20] merge into ONE span covering all 20 chars
    for d in (1, 2):
        r = out[d]
        assert (r.n_chunks, r.n_dup_chunks, r.n_dup_spans) == (2, 2, 1)
        assert (r.dup_chars, r.first_dup_start, r.last_dup_end,
                r.doc_chars) == (20, 1, 20, 20)
    assert (out[3].n_dup_chunks, out[3].n_dup_spans,
            out[3].dup_chars) == (0, 0, 0)
    assert out[3].first_dup_start is None and out[3].last_dup_end is None
    # normalize=False: case difference breaks the match
    out_raw = {r.doc_id: r for r in build_chunk_dedup(
        spark, reg, ChunkDedupConfig("cd2", chunks_entity="chz",
                                     min_chunk_len=5, normalize=False),
        G).collect()}
    assert all(r.n_dup_chunks == 0 for r in out_raw.values())
    with pytest.raises(ValueError, match="min_docs"):
        ChunkDedupConfig("cd3", min_docs=1)


def test_dataset_profile_counts_and_minmax(spark):
    """Null accounting, distinct counts and portable min/max; doubles
    are profiled count-only (min/max NULL — their string rendering is
    not dialect-portable)."""
    from datavault4dbt_spark.llm.profile import (ProfileConfig,
                                                 build_dataset_profile)
    docs = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "b", None), (4, "a", 4.5)],
        "id long, s string, d double")
    reg = Registry()
    reg.spark_loaders["t"] = lambda _s: docs
    cfg = ProfileConfig("p", source="t",
                        columns=(("id", "bigint"), ("s", "string"),
                                 ("d", "double")))
    out = {r.col_name: r for r in build_dataset_profile(
        spark, reg, cfg, G).collect()}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 0
    assert out["id"].n_distinct == 4
    assert (out["id"].min_value, out["id"].max_value) == ("1", "4")
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert (out["s"].min_value, out["s"].max_value) == ("a", "b")
    assert out["d"].n_nulls == 1 and out["d"].min_value is None
    with pytest.raises(ValueError, match="non-empty"):
        ProfileConfig("p", columns=())
    # names are interpolated into stack()/SELECT SQL in two dialects —
    # anything beyond a plain identifier is rejected (round-6 advice)
    for bad in ("a'b", "a b", "a\\b", "a;--", ""):
        with pytest.raises(ValueError, match="identifier"):
            ProfileConfig("p", columns=((bad, "string"),))


def test_line_clean_rules_and_null_contract(spark):
    """min_words and terminal punctuation bite per line; all-dropped
    docs clean to the EMPTY string (both engines — DuckDB's
    array_to_string(empty) is NULL without the guard), NULL text stays
    NULL; rule toggles work."""
    from datavault4dbt_spark.llm.lineclean import (LineCleanConfig,
                                                   build_line_clean)
    docs = spark.createDataFrame(
        [(1, "good long line here.\nshort.\nno punctuation line at all\n"
             "another proper line!"),
         (2, "menu\nlogin\nok"),
         (3, None)],
        "doc_id long, text string")
    reg = Registry()
    reg.spark_loaders["ld"] = lambda _s: docs
    out = {r.doc_id: r for r in build_line_clean(
        spark, reg, LineCleanConfig("lc", source="ld"), G).collect()}
    assert out[1].n_lines == 4 and out[1].n_kept_lines == 2
    assert out[1].cleaned_text == ("good long line here.\n"
                                   "another proper line!")
    assert out[2].n_kept_lines == 0 and out[2].cleaned_text == ""
    assert out[3].cleaned_text is None and out[3].n_lines is None
    # punctuation rule off: word count alone decides
    loose = {r.doc_id: r for r in build_line_clean(
        spark, reg, LineCleanConfig("lc2", source="ld",
                                    require_terminal_punct=False),
        G).collect()}
    assert loose[1].n_kept_lines == 3
    with pytest.raises(ValueError, match="portability"):
        LineCleanConfig("bad", terminal_chars=".'")
