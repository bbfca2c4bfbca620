"""yaml_metadata parity: reference-shaped YAML blocks must produce the
same results as the equivalent dataclass configs, including build-time
schema introspection (no source_schema in the YAML)."""

from pyspark.sql import functions as F

from datavault4dbt_spark import fixtures, yaml_api
from datavault4dbt_spark.context import testdata_registry as make_registry
from datavault4dbt_spark.operators.stage import build_stage
from datavault4dbt_spark.operators.hub import build_hub


STAGE_YAML = """
source_model: customer
ldts: "TIMESTAMP '2024-01-01 00:00:00' + (c_custkey % 3) * INTERVAL '1' DAY"
rsrc: '!TPCH/customer'
missing_columns:
  c_extra: INT
prejoined_columns:
  n_name:
    src_table: nation
    bk: n_name
    this_column_name: c_nationkey
    ref_column_name: n_nationkey
derived_columns:
  nation_name_upper:
    value: UPPER(n_name)
    datatype: STRING
hashed_columns:
  hk_customer_h: [c_custkey]
  hk_nation_h: [c_nationkey]
  hk_customer_nation_l: [c_custkey, c_nationkey]
  hd_customer_n_s:
    is_hashdiff: true
    columns: [c_acctbal, c_mktsegment]
  hd_customer_p_s:
    is_hashdiff: true
    columns: [c_name]
"""

HUB_YAML = """
hashkey: hk_nation_h
business_keys: [n_nationkey]
source_models:
  - name: stage_nation
    bk_columns: [n_nationkey]
  - name: stage_customer
    bk_columns: [c_nationkey]
  - name: stage_supplier
    bk_columns: [s_nationkey]
"""


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_stage_yaml_matches_dataclass_config(spark, sf_dir):
    fixtures.ensure_session_conf(spark)
    cfg = yaml_api.parse_stage(STAGE_YAML, name="stage_customer")
    reg = make_registry(sf_dir)
    got = build_stage(spark, reg, cfg)
    want = fixtures.entity_query("stage_customer")(spark, sf_dir)
    # YAML config introspects the FULL customer schema (8 columns vs the
    # fixture's explicit 5) — compare on the fixture's column set
    assert set(want.columns) <= set(got.columns)
    assert _rows(got.select(*want.columns)) == _rows(want)


def test_hub_yaml_multisource(spark, sf_dir):
    fixtures.ensure_session_conf(spark)
    cfg = yaml_api.parse_hub(HUB_YAML, name="hub_nation_multisource")
    reg = fixtures.registry(spark, sf_dir)
    got = build_hub(spark, reg, cfg)
    want = fixtures.entity_query("hub_nation_multisource")(spark, sf_dir)
    assert _rows(got) == _rows(want)


def test_sat_and_pit_parsers_roundtrip():
    sat = yaml_api.parse("sat_v0", """
source_model: stage_customer
parent_hashkey: hk_customer_h
src_hashdiff: hd_customer_n_s
src_payload: [c_acctbal, c_mktsegment]
""", name="sat_customer_n0_s")
    assert sat == fixtures.SATS["sat_customer_n0_s"]

    pit = yaml_api.parse("pit", """
tracked_entity: hub_customer
hashkey: hk_customer_h
sat_names: [sat_customer_n0_s, sat_customer_p0_s]
snapshot_relation: control_snap_v1
dimension_key: dimension_key
snapshot_trigger_column: is_active
""", name="pit_customer")
    assert pit == fixtures.PITS["pit_customer"]
