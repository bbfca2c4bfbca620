"""YAML project runner: a directory of reference-shaped YAML files ->
dependency-ordered incremental loads (the `dbt run` front door)."""

import pytest

from datavault4dbt_spark import fixtures
from datavault4dbt_spark.context import testdata_registry as make_registry
from datavault4dbt_spark.plans.incremental import ParquetStore
from datavault4dbt_spark.plans.project import load_project, run_project

pytestmark = pytest.mark.slow


FILES = {
    "stage_customer.yml": """
kind: stage
source_model: customer
ldts: "TIMESTAMP '2024-01-01 00:00:00' + (c_custkey % 3) * INTERVAL '1' DAY"
rsrc: '!TPCH/customer'
hashed_columns:
  hk_customer_h: [c_custkey]
  hd_customer_n_s:
    is_hashdiff: true
    columns: [c_acctbal, c_mktsegment]
""",
    "hub_customer.yml": """
kind: hub
hashkey: hk_customer_h
business_keys: [c_custkey]
source_models:
  - name: stage_customer
    bk_columns: [c_custkey]
""",
    "sat_customer_n0_s.yml": """
kind: sat_v0
source_model: stage_customer
parent_hashkey: hk_customer_h
src_hashdiff: hd_customer_n_s
src_payload: [c_acctbal, c_mktsegment]
""",
    "sat_customer_n0_s_v1.yml": """
kind: sat_v1
sat_v0: sat_customer_n0_s
parent_hashkey: hk_customer_h
src_hashdiff: hd_customer_n_s
add_is_current_flag: true
""",
}


def _write_project(tmp_path):
    d = tmp_path / "project"
    d.mkdir()
    for fn, body in FILES.items():
        (d / fn).write_text(body)
    return str(d)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_load_project_kinds_deps_materializations(spark, tmp_path):
    decls = load_project(_write_project(tmp_path))
    assert set(decls) == {"stage_customer", "hub_customer",
                          "sat_customer_n0_s", "sat_customer_n0_s_v1"}
    assert decls["stage_customer"].materialize == "view"
    assert decls["hub_customer"].materialize == "incremental"
    assert decls["sat_customer_n0_s_v1"].materialize == "view"
    assert "stage_customer" in decls["hub_customer"].deps
    assert decls["sat_customer_n0_s_v1"].deps == ("sat_customer_n0_s",)


def test_run_project_loads_and_is_idempotent(spark, sf_dir, tmp_path):
    fixtures.ensure_session_conf(spark)
    proj = _write_project(tmp_path)
    store = ParquetStore(spark, str(tmp_path / "warehouse"))

    counts = run_project(spark, proj, store, make_registry(sf_dir))
    want_hub = fixtures.entity_query("hub_customer")(spark, sf_dir)
    assert counts["hub_customer"] == want_hub.count()
    assert counts["stage_customer"] is None          # view: not stored
    assert not store.exists("stage_customer")
    # stored hub matches the fixture-built hub row-for-row
    assert _rows(store.read("hub_customer")) == _rows(want_hub)

    # rerun: incremental entities append nothing (idempotent)
    counts2 = run_project(spark, proj, store, make_registry(sf_dir))
    assert counts2["hub_customer"] == 0
    assert counts2["sat_customer_n0_s"] == 0
    assert _rows(store.read("hub_customer")) == _rows(want_hub)


def test_load_project_rejects_unknown_kind(tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "x.yml").write_text("kind: nope\nsource_model: customer\n")
    with pytest.raises(ValueError, match="unknown or missing kind"):
        load_project(str(d))


def test_run_project_snapshot_pit_chain(spark, sf_dir, tmp_path):
    """The harder DAG through run_project: snapshot spine (table) ->
    snap_v1 (view) -> PIT (incremental over hub + sat + snapshots).
    PIT cardinality = |hub keys| x |active snapshots|, and re-runs
    append nothing."""
    import shutil
    fixtures.ensure_session_conf(spark)
    proj = str(tmp_path / "proj2")
    shutil.copytree("examples/project", proj)
    store = ParquetStore(spark, str(tmp_path / "wh2"))

    counts = run_project(spark, proj, store, make_registry(sf_dir))
    assert counts["control_snap_v0"] and counts["pit_customer"]
    hub_n = store.read("hub_customer").count()
    # PIT = hub keys x active snapshots (count actives from the stored
    # pit's distinct sdts — the v1 view itself is not materialized)
    active_n = store.read("pit_customer").select("sdts").distinct().count()
    # Jan 1-31 all sit inside the 3-month daily retention at the fixed
    # current_ts, so every spine row is active here
    assert 0 < active_n <= store.read("control_snap_v0").count()
    assert counts["pit_customer"] == hub_n * active_n

    # bridge rides the same spine: customer->nation paths per active
    # snapshot, incremental via bridge_key anti-join
    assert counts["bridge_customer_nation"] > 0
    # the soft-constraint suite ran after the loads and found a green
    # vault: one verdict row per declared check, all zero violations
    checks = store.read("vault_checks").collect()
    assert len(checks) == 6
    assert all(r.n_violations == 0 for r in checks)

    counts2 = run_project(spark, proj, store, make_registry(sf_dir))
    assert counts2["pit_customer"] == 0
    assert counts2["bridge_customer_nation"] == 0
    assert store.read("pit_customer").count() == hub_n * active_n


def test_run_project_llm_curation_pipeline(spark, sf_dir, tmp_path):
    """The YAML project front door drives the training-data operators:
    examples/curation_project materializes quality -> langid ->
    minhash -> dup_groups/curation/contamination in dependency order,
    and each stored table equals the direct fixture-built result."""
    import shutil

    fixtures.ensure_session_conf(spark)
    proj = str(tmp_path / "cur_proj")
    shutil.copytree("examples/curation_project", proj)
    store = ParquetStore(spark, str(tmp_path / "cur_wh"))

    counts = run_project(spark, proj, store, make_registry(sf_dir))
    assert set(counts) == {"text_quality", "text_langid",
                           "dedup_minhash_lsh", "dedup_groups",
                           "docs_curated", "contamination_ngrams",
                           "text_repetition", "pii_redact", "dataset_mix",
                           "sequence_packing", "semdedup_embeddings",
                           "quantize_embeddings", "dedup_substring", "text_tfidf",
                           "packing_manifest", "dedup_report",
                           "source_stats", "docs_source_gated",
                           "doc_chunks", "dataset_profile", "text_line_clean",
                           "chunk_dedup_spans", "docs_decontaminated",
                           "multimodal_decode", "canonical_docs",
                           "docs_split", "docs_source_capped",
                           "docs_chunk_scrubbed", "text_lm_score",
                           "gopher_rules", "dsir_score",
                           "docs_boilerplate_clean",
                           "docs_ccnet_buckets", "text_vocab_topk",
                           "corpus_shuffle", "temperature_mix",
                           "source_len_quantiles", "docs_curated_best",
                           "curation_strategy_diff",
                           "source_token_budget"}
    for name in ("dedup_groups", "docs_curated", "contamination_ngrams",
                 "text_repetition", "dataset_mix", "sequence_packing",
                 "semdedup_embeddings", "quantize_embeddings",
                 "dedup_substring", "text_tfidf", "packing_manifest",
                 "dedup_report", "source_stats", "docs_source_gated",
                 "doc_chunks", "dataset_profile", "text_line_clean",
                 "chunk_dedup_spans", "multimodal_decode",
                 "canonical_docs", "docs_split", "docs_source_capped",
                 "docs_chunk_scrubbed", "text_lm_score", "gopher_rules",
                 "dsir_score", "docs_boilerplate_clean",
                 "docs_ccnet_buckets", "text_vocab_topk",
                 "corpus_shuffle", "temperature_mix",
                 "source_len_quantiles", "docs_curated_best",
                 "curation_strategy_diff", "source_token_budget"):
        want = _rows(fixtures.entity_query(name)(spark, sf_dir))
        assert _rows(store.read(name)) == want, name

    # rerun: table materializations rebuild to the same state
    counts2 = run_project(spark, proj, store, make_registry(sf_dir))
    assert counts2 == counts
    assert _rows(store.read("docs_curated")) == _rows(
        fixtures.entity_query("docs_curated")(spark, sf_dir))


def test_load_project_rejects_incremental_llm_kind(tmp_path):
    d = tmp_path / "bad_llm"
    d.mkdir()
    (d / "dedup_groups.yml").write_text(
        "kind: dup_groups\nmaterialize: incremental\n"
        "pairs_entity: dedup_minhash_lsh\n")
    with pytest.raises(ValueError, match="cannot be materialized"):
        load_project(str(d))


def test_run_project_analytics_pipeline(spark, sf_dir, tmp_path):
    """The round-9 kinds drive end-to-end through the YAML front door:
    examples/analytics_project materializes every reporting/data-ops
    step, and each stored table equals the direct fixture-built
    result (the fixtures declare identical configs)."""
    import shutil

    fixtures.ensure_session_conf(spark)
    proj = str(tmp_path / "an_proj")
    shutil.copytree("examples/analytics_project", proj)
    store = ParquetStore(spark, str(tmp_path / "an_wh"))

    counts = run_project(spark, proj, store, make_registry(sf_dir))
    assert set(counts) == {
        "lineitem_rollup", "lineitem_current", "lineitem_quarantine",
        "lineitem_moments", "events_props", "events_transitions",
        "events_locf", "events_rolling", "events_skew", "docs_pivot",
        "docs_histogram", "docs_length_gate", "docs_sample",
        "docs_vocab_by_lang",
        # round-10 kinds
        "part_linkage", "part_cooccur", "docs_overlap", "events_ohlc",
        "events_attribution", "docs_kanon", "docs_length_pr",
        "events_trending", "docs_normalize", "events_paths",
        "events_active", "docs_prop_sample",
        # round-10 session kinds (persisted ANN index, URL gate,
        # outlier gate, negative sampling, profile drift)
        "embeddings_ann_index", "docs_url_gate", "events_outliers",
        "docs_negatives", "docs_drift", "docs_frames", "docs_resize",
        "docs_kfold"}
    # spot-check three stored tables against the direct fixture builds
    # (same configs modulo entity name)
    reg = fixtures.registry(spark, sf_dir)
    for stored, fixture_name, key in (
            ("lineitem_rollup", "lineitem_rollup_census",
             ("l_returnflag", "l_linestatus", "g_l_returnflag",
              "g_l_linestatus")),
            ("events_transitions", "event_transitions",
             ("from_event", "to_event")),
            ("docs_sample", "docs_exact_sample", ("doc_id",)),
            ("events_attribution", "events_last_touch", ("event_id",)),
            ("part_cooccur", "part_cooccurrence",
             ("item_a", "item_b"))):
        got = sorted(
            tuple(str(x) for x in r)
            for r in store.read(stored)
            .select(*reg.load(spark, fixture_name).columns).collect())
        want = sorted(tuple(str(x) for x in r)
                      for r in reg.load(spark, fixture_name).collect())
        assert got == want, stored
