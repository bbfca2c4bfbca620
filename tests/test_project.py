"""YAML project runner: a directory of reference-shaped YAML files ->
dependency-ordered incremental loads (the `dbt run` front door)."""

import pytest

from datavault4dbt_spark import fixtures
from datavault4dbt_spark.context import testdata_registry as make_registry
from datavault4dbt_spark.plans.incremental import ParquetStore
from datavault4dbt_spark.plans.project import load_project, run_project


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
