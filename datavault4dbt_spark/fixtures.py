"""Declared Data Vault model over the driver's TPC-H-ish testdata.

Mirrors the reference's canonical test model (reference:
macros/rehashing/rehash_all_rdv_entities.sql:17-129) per FIXTURES.md:
stage configs per source table, hubs/links/satellites on top. Each
entity here yields BOTH a Spark plan and DuckDB oracle SQL from one
config — these are the driver's t2 correctness queries.

ldts derivation is deterministic (FIXTURES.md §1): three daily batches
keyed on the primary key modulo 3, so incremental/multi-batch semantics
are exercised by construction.
"""

from __future__ import annotations

from .context import DEFAULT, Registry, testdata_registry
from .functions.hashing import HashSpec
from .operators.stage import (StageConfig, DerivedColumn, Prejoin,
                              MultiActiveConfig, build_stage, stage_oracle)
from .operators.hub import HubConfig, EntitySource, build_hub, hub_oracle
from .operators.link import LinkConfig, build_link, link_oracle
from .operators.sat import (SatConfig, SatV1Config, build_sat_v0, build_sat_v1,
                            sat_v0_oracle, sat_v1_oracle)
from .plans.sqlbuild import SqlBuilder

G = DEFAULT


def _batched(key: str) -> str:
    """3 deterministic daily batches — valid in Spark SQL and DuckDB."""
    return f"TIMESTAMP '2024-01-01 00:00:00' + ({key} % 3) * INTERVAL '1' DAY"


STAGES = {
    "stage_customer": StageConfig(
        name="stage_customer", source_model="customer",
        ldts=_batched("c_custkey"), rsrc="!TPCH/customer",
        source_schema=(("c_custkey", "BIGINT"), ("c_name", "STRING"),
                       ("c_nationkey", "INT"), ("c_acctbal", "DOUBLE"),
                       ("c_mktsegment", "STRING")),
        missing_columns=(("c_extra", "INT"),),
        prejoined_columns=(Prejoin("nation", (("c_nationkey", "n_nationkey"),),
                                   (("n_name", "n_name", "STRING"),)),),
        derived_columns=(DerivedColumn("nation_name_upper", "UPPER(n_name)", "STRING"),),
        hashed_columns=(
            HashSpec("hk_customer_h", ("c_custkey",)),
            HashSpec("hk_nation_h", ("c_nationkey",)),
            HashSpec("hk_customer_nation_l", ("c_custkey", "c_nationkey")),
            HashSpec("hd_customer_n_s", ("c_acctbal", "c_mktsegment"), is_hashdiff=True),
            HashSpec("hd_customer_p_s", ("c_name",), is_hashdiff=True),
        )),
    "stage_nation": StageConfig(
        name="stage_nation", source_model="nation",
        ldts="TIMESTAMP '2024-01-01 00:00:00'", rsrc="!TPCH/nation",
        source_schema=(("n_nationkey", "INT"), ("n_name", "STRING"),
                       ("n_regionkey", "INT")),
        hashed_columns=(
            HashSpec("hk_nation_h", ("n_nationkey",)),
            HashSpec("hd_nation_s", ("n_name", "n_regionkey"), is_hashdiff=True),
        )),
    "stage_supplier": StageConfig(
        name="stage_supplier", source_model="supplier",
        ldts=_batched("s_suppkey"), rsrc="!TPCH/supplier",
        source_schema=(("s_suppkey", "BIGINT"), ("s_name", "STRING"),
                       ("s_nationkey", "INT"), ("s_acctbal", "DOUBLE")),
        hashed_columns=(
            HashSpec("hk_supplier_h", ("s_suppkey",)),
            HashSpec("hk_nation_h", ("s_nationkey",)),
            HashSpec("hk_supplier_nation_l", ("s_suppkey", "s_nationkey")),
            HashSpec("hd_supplier_s", ("s_acctbal",), is_hashdiff=True),
        )),
    "stage_part": StageConfig(
        name="stage_part", source_model="part",
        ldts=_batched("p_partkey"), rsrc="!TPCH/part",
        source_schema=(("p_partkey", "BIGINT"), ("p_name", "STRING"),
                       ("p_brand", "STRING"), ("p_type", "STRING"),
                       ("p_size", "INT"), ("p_retailprice", "DOUBLE")),
        hashed_columns=(
            HashSpec("hk_part_h", ("p_partkey",)),
            HashSpec("hd_part_s", ("p_brand", "p_type", "p_size", "p_retailprice"),
                     is_hashdiff=True),
        )),
    # multi-active stage: orders grouped under their customer per batch
    # (reference MA pattern: macros/staging/databricks/stage.sql:391-444)
    "stage_orders": StageConfig(
        name="stage_orders", source_model="orders",
        ldts=_batched("o_orderkey"), rsrc="!TPCH/orders",
        source_schema=(("o_orderkey", "BIGINT"), ("o_custkey", "BIGINT"),
                       ("o_orderstatus", "STRING"), ("o_totalprice", "DOUBLE"),
                       ("o_orderdate", "TIMESTAMP"), ("o_orderpriority", "STRING")),
        # FLOOR first: Spark's double->int cast truncates, DuckDB's rounds
        derived_columns=(DerivedColumn("o_total_bucket",
                                       "CAST(FLOOR(o_totalprice) AS INT)", "INT"),),
        hashed_columns=(
            HashSpec("hk_order_h", ("o_orderkey",)),
            HashSpec("hk_customer_h", ("o_custkey",)),
            HashSpec("hk_order_customer_nl", ("o_orderkey", "o_custkey")),
            HashSpec("hd_order_ms", ("o_orderstatus", "o_orderpriority"),
                     is_hashdiff=True),
        ),
        multi_active=MultiActiveConfig(("o_orderkey",), "hk_customer_h")),
    "stage_lineitem": StageConfig(
        name="stage_lineitem", source_model="lineitem",
        ldts=_batched("l_orderkey"), rsrc="!TPCH/lineitem",
        source_schema=(("l_orderkey", "BIGINT"), ("l_partkey", "BIGINT"),
                       ("l_suppkey", "BIGINT"), ("l_linenumber", "INT"),
                       ("l_quantity", "DOUBLE"), ("l_extendedprice", "DOUBLE"),
                       ("l_discount", "DOUBLE"), ("l_tax", "DOUBLE"),
                       ("l_returnflag", "STRING"), ("l_linestatus", "STRING"),
                       ("l_shipdate", "TIMESTAMP")),
        hashed_columns=(
            HashSpec("hk_part_supplier_l", ("l_partkey", "l_suppkey")),
            HashSpec("hk_part_h", ("l_partkey",)),
            HashSpec("hk_supplier_h", ("l_suppkey",)),
            HashSpec("hk_lineitem_nl", ("l_orderkey", "l_linenumber")),
            HashSpec("hd_lineitem_s", ("l_quantity", "l_extendedprice", "l_discount"),
                     is_hashdiff=True),
        )),
    "stage_events": StageConfig(
        name="stage_events", source_model="events",
        ldts="date_trunc('hour', ts)", rsrc="!TPCH/events",
        source_schema=(("event_id", "BIGINT"), ("ts", "TIMESTAMP"),
                       ("user_id", "BIGINT"), ("event_type", "STRING"),
                       ("value", "DOUBLE"), ("props", "STRING")),
        hashed_columns=(
            HashSpec("hk_user_h", ("user_id",)),
            HashSpec("hk_event_nl", ("event_id",)),
        )),
}


HUBS = {
    "hub_customer": HubConfig("hub_customer", "hk_customer_h", ("c_custkey",),
                              (EntitySource("stage_customer"),)),
    "hub_nation": HubConfig("hub_nation", "hk_nation_h", ("n_nationkey",),
                            (EntitySource("stage_nation"),)),
    # multi-source hub with per-source renamed bk columns
    # (reference: macros/tables/databricks/hub.sql:150-219)
    "hub_nation_multisource": HubConfig(
        "hub_nation_multisource", "hk_nation_h", ("n_nationkey",),
        (EntitySource("stage_nation", bk_columns=("n_nationkey",)),
         EntitySource("stage_customer", bk_columns=("c_nationkey",)),
         EntitySource("stage_supplier", bk_columns=("s_nationkey",)))),
    "hub_order": HubConfig("hub_order", "hk_order_h", ("o_orderkey",),
                           (EntitySource("stage_orders"),)),
    "hub_part": HubConfig("hub_part", "hk_part_h", ("p_partkey",),
                          (EntitySource("stage_part"),)),
    "hub_supplier": HubConfig("hub_supplier", "hk_supplier_h", ("s_suppkey",),
                              (EntitySource("stage_supplier"),)),
    "hub_user": HubConfig("hub_user", "hk_user_h", ("user_id",),
                          (EntitySource("stage_events"),)),
}

LINKS = {
    "link_customer_nation": LinkConfig(
        "link_customer_nation", "hk_customer_nation_l",
        ("hk_customer_h", "hk_nation_h"), (EntitySource("stage_customer"),)),
    "link_supplier_nation": LinkConfig(
        "link_supplier_nation", "hk_supplier_nation_l",
        ("hk_supplier_h", "hk_nation_h"), (EntitySource("stage_supplier"),)),
    "link_part_supplier": LinkConfig(
        "link_part_supplier", "hk_part_supplier_l",
        ("hk_part_h", "hk_supplier_h"), (EntitySource("stage_lineitem"),)),
}

SATS = {
    "sat_customer_n0_s": SatConfig("sat_customer_n0_s", "stage_customer",
                                   "hk_customer_h", "hd_customer_n_s",
                                   payload=("c_acctbal", "c_mktsegment")),
    "sat_customer_p0_s": SatConfig("sat_customer_p0_s", "stage_customer",
                                   "hk_customer_h", "hd_customer_p_s",
                                   payload=("c_name",)),
    "sat_part_s": SatConfig("sat_part_s", "stage_part", "hk_part_h", "hd_part_s",
                            payload=("p_brand", "p_type", "p_size", "p_retailprice")),
    "sat_nation_s": SatConfig("sat_nation_s", "stage_nation", "hk_nation_h",
                              "hd_nation_s", payload=("n_name", "n_regionkey")),
}

SATS_V1 = {
    "sat_customer_n0_s_v1": SatV1Config("sat_customer_n0_s_v1", "sat_customer_n0_s",
                                        "hk_customer_h", "hd_customer_n_s",
                                        add_is_current_flag=True),
    "sat_part_s_v1": SatV1Config("sat_part_s_v1", "sat_part_s",
                                 "hk_part_h", "hd_part_s"),
}


def ensure_session_conf(spark):
    """Set runtime-settable confs the fixtures rely on (the driver may
    hand us a session built without them)."""
    for k, v in (("spark.sql.session.timeZone", "UTC"),
                 ("spark.sql.legacy.parquet.nanosAsLong", "true"),
                 ("spark.sql.adaptive.enabled", "true")):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def registry(spark, sf_dir: str) -> Registry:
    """Spark-side registry: raw tables + lazily-built stage/sat plans."""
    ensure_session_conf(spark)
    reg = testdata_registry(sf_dir)
    for name, cfg in STAGES.items():
        reg.spark_loaders[name] = (
            lambda spark, c=cfg: build_stage(spark, reg, c, G))
    for name, cfg in SATS.items():
        reg.spark_loaders[name] = (
            lambda spark, c=cfg: build_sat_v0(spark, reg, c, G))
    return reg


def oracle_registry() -> Registry:
    """Oracle-side registry: raw tables are driver-registered DuckDB views;
    stages/sats resolve to their CTE names."""
    reg = Registry()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        reg.duckdb_relations[t] = t
    for name in list(STAGES) + list(SATS):
        reg.duckdb_relations[name] = name
    return reg


def _add_stage_ctes(b: SqlBuilder, reg: Registry, stage_names):
    for s in stage_names:
        stage_oracle(b, reg, STAGES[s], G)


def _add_sat_ctes(b: SqlBuilder, reg: Registry, sat_names):
    for s in sat_names:
        _add_stage_ctes(b, reg, [SATS[s].source_model])
        sat_v0_oracle(b, reg, SATS[s], G)


def entity_oracle_sql(name: str) -> str:
    """Full DuckDB oracle SQL for one declared entity query."""
    b = SqlBuilder()
    reg = oracle_registry()
    if name in STAGES:
        final = stage_oracle(b, reg, STAGES[name], G)
    elif name in HUBS:
        cfg = HUBS[name]
        _add_stage_ctes(b, reg, [sm.name for sm in cfg.source_models])
        final = hub_oracle(b, reg, cfg, G)
    elif name in LINKS:
        cfg = LINKS[name]
        _add_stage_ctes(b, reg, [sm.name for sm in cfg.source_models])
        final = link_oracle(b, reg, cfg, G)
    elif name in SATS:
        cfg = SATS[name]
        _add_stage_ctes(b, reg, [cfg.source_model])
        final = sat_v0_oracle(b, reg, cfg, G)
    elif name in SATS_V1:
        cfg = SATS_V1[name]
        _add_sat_ctes(b, reg, [cfg.sat_v0])
        final = sat_v1_oracle(b, reg, cfg, G)
    else:
        raise KeyError(name)
    return b.render(f"SELECT * FROM {final}")


def entity_query(name: str):
    """(spark, sf_dir) -> DataFrame builder for one declared entity."""
    def run(spark, sf_dir):
        reg = registry(spark, sf_dir)
        if name in STAGES:
            return build_stage(spark, reg, STAGES[name], G)
        if name in HUBS:
            return build_hub(spark, reg, HUBS[name], G)
        if name in LINKS:
            return build_link(spark, reg, LINKS[name], G)
        if name in SATS:
            return build_sat_v0(spark, reg, SATS[name], G)
        if name in SATS_V1:
            return build_sat_v1(spark, reg, SATS_V1[name], G)
        raise KeyError(name)
    return run


def all_entity_names() -> list:
    return (list(STAGES) + list(HUBS) + list(LINKS) + list(SATS) + list(SATS_V1))
