"""Non-historized (transactional) satellite and link.

nh_sat — reference: macros/tables/nh_sat.sql:11 /
macros/tables/databricks/nh_sat.sql:25-81 (first row per hashkey when
multi-batch at 42-43, NOT-IN insert at 68-75).

nh_link — reference: macros/tables/nh_link.sql:9 /
macros/tables/databricks/nh_link.sql:1-298 (per-source payload mapping
at 219-235, union_strategy 'all'|'distinct' at 33-42, optional
earliest-per-hashkey dedup at 253-264).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder
from ..plans.incremental import hwm_filter, hwm_filter_static, anti_join_new


@dataclass(frozen=True)
class NhSatConfig:
    name: str
    source_model: str
    parent_hashkey: str
    payload: tuple
    source_is_single_batch: bool = True
    additional_columns: tuple = ()


def build_nh_sat(spark, reg: Registry, cfg: NhSatConfig, g: GlobalConfig = DEFAULT,
                 target: DataFrame | None = None, disable_hwm: bool = False) -> DataFrame:
    cols = [cfg.parent_hashkey, g.ldts_alias, g.rsrc_alias, *cfg.payload,
            *cfg.additional_columns]
    # one string projection = one py4j round trip (guide §5)
    src = reg.load(spark, cfg.source_model).selectExpr(*cols)
    if target is not None and not disable_hwm:
        src = hwm_filter(src, target, g)
    if not cfg.source_is_single_batch:
        src = (src.selectExpr(
                   "*", f"ROW_NUMBER() OVER (PARTITION BY "
                   f"{cfg.parent_hashkey} ORDER BY {g.ldts_alias}) AS __rn")
               .filter("__rn = 1").drop("__rn"))
    return anti_join_new(src, target, [cfg.parent_hashkey])


def nh_sat_oracle(b: SqlBuilder, reg: Registry, cfg: NhSatConfig,
                  g: GlobalConfig = DEFAULT) -> str:
    cols = [cfg.parent_hashkey, g.ldts_alias, g.rsrc_alias, *cfg.payload,
            *cfg.additional_columns]
    sel = f"SELECT {', '.join(cols)} FROM {reg.duckdb_relation(cfg.source_model)}"
    if not cfg.source_is_single_batch:
        sel += (f"\nQUALIFY ROW_NUMBER() OVER (PARTITION BY {cfg.parent_hashkey} "
                f"ORDER BY {g.ldts_alias}) = 1")
    return b.cte(cfg.name, sel)


@dataclass(frozen=True)
class NhLinkConfig:
    name: str
    link_hashkey: str
    foreign_hashkeys: tuple
    payload: tuple  # target payload names
    source_models: tuple  # EntitySource with fk_columns / payload mapping
    union_strategy: str = "all"  # 'all' | 'distinct'
    source_is_single_batch: bool = True
    additional_columns: tuple = ()


def build_nh_link(spark, reg: Registry, cfg: NhLinkConfig, g: GlobalConfig = DEFAULT,
                  target: DataFrame | None = None, disable_hwm: bool = False) -> DataFrame:
    parts = []
    for sm in cfg.source_models:
        df = reg.load(spark, sm.name)
        hk = sm.hk_column or cfg.link_hashkey
        fks = sm.fk_columns or cfg.foreign_hashkeys
        pay = sm.payload or cfg.payload
        # one string projection = one py4j round trip (guide §5)
        sel = [f"{hk} AS {cfg.link_hashkey}"]
        sel += [f"{s} AS {t}" for s, t in zip(fks, cfg.foreign_hashkeys)]
        sel += list(cfg.additional_columns)
        sel += [g.ldts_alias, g.rsrc_alias]
        sel += [f"{s} AS {t}" for s, t in zip(pay, cfg.payload)]
        src = df.selectExpr(*sel)
        if target is not None and not disable_hwm:
            # per-source watermark when the source declares rsrc_static
            # (reference: nh_link.sql:61-100 record-source performance
            # lookup — a NEW source's history predates the global HWM
            # and must not be filtered by other sources' watermarks)
            if sm.rsrc_static:
                src = hwm_filter_static(src, target, sm.rsrc_static, g)
            else:
                src = hwm_filter(src, target, g)
        parts.append(src)
    union = reduce(lambda a, b: a.unionByName(b), parts)
    if cfg.union_strategy == "distinct" and len(parts) > 1:
        union = union.distinct()
    if not cfg.source_is_single_batch:
        union = (union.selectExpr(
                     "*", f"ROW_NUMBER() OVER (PARTITION BY "
                     f"{cfg.link_hashkey} ORDER BY {g.ldts_alias}, "
                     f"{g.rsrc_alias}) AS __rn")
                 .filter("__rn = 1").drop("__rn"))
    return anti_join_new(union, target, [cfg.link_hashkey])


def nh_link_oracle(b: SqlBuilder, reg: Registry, cfg: NhLinkConfig,
                   g: GlobalConfig = DEFAULT) -> str:
    selects = []
    for sm in cfg.source_models:
        hk = sm.hk_column or cfg.link_hashkey
        fks = sm.fk_columns or cfg.foreign_hashkeys
        pay = sm.payload or cfg.payload
        cols = [f"{hk} AS {cfg.link_hashkey}"]
        cols += [f"{s} AS {t}" for s, t in zip(fks, cfg.foreign_hashkeys)]
        cols += list(cfg.additional_columns)
        cols += [g.ldts_alias, g.rsrc_alias]
        cols += [f"{s} AS {t}" for s, t in zip(pay, cfg.payload)]
        selects.append(f"SELECT {', '.join(cols)} FROM {reg.duckdb_relation(sm.name)}")
    joiner = "\nUNION\n" if (cfg.union_strategy == "distinct"
                             and len(selects) > 1) else "\nUNION ALL\n"
    u = b.cte(f"{cfg.name}__union", joiner.join(selects))
    sel = f"SELECT * FROM {u}"
    if not cfg.source_is_single_batch:
        sel += (f"\nQUALIFY ROW_NUMBER() OVER (PARTITION BY {cfg.link_hashkey} "
                f"ORDER BY {g.ldts_alias}, {g.rsrc_alias}) = 1")
    return b.cte(cfg.name, sel)
