"""Link operator: earliest-arrival distinct relationships.

Re-implements reference: macros/tables/link.sql:8 /
macros/tables/databricks/link.sql:1-267 — identical algorithm to the hub
keyed on the link hashkey with >= 2 foreign hashkeys (validation at
databricks/link.sql:4-10).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder
from ..plans.incremental import hwm_filter, hwm_filter_static, anti_join_new


@dataclass(frozen=True)
class LinkConfig:
    name: str
    link_hashkey: str
    foreign_hashkeys: tuple  # >= 2
    source_models: tuple  # EntitySource (fk_columns maps per-source names)
    additional_columns: tuple = ()

    def __post_init__(self):
        if len(self.foreign_hashkeys) < 2:
            raise ValueError(
                f"link {self.name}: needs >=2 foreign hashkeys "
                "(reference: macros/tables/databricks/link.sql:4-10)")


def build_link(spark, reg: Registry, cfg: LinkConfig, g: GlobalConfig = DEFAULT,
               target: DataFrame | None = None, disable_hwm: bool = False) -> DataFrame:
    parts = []
    for sm in cfg.source_models:
        df = reg.load(spark, sm.name)
        hk = sm.hk_column or cfg.link_hashkey
        fks = sm.fk_columns or cfg.foreign_hashkeys
        # one string projection = one py4j round trip (guide §5)
        sel = [f"{hk} AS {cfg.link_hashkey}"]
        sel += [f"{s} AS {t}" for s, t in zip(fks, cfg.foreign_hashkeys)]
        sel += list(cfg.additional_columns)
        sel += [g.ldts_alias, g.rsrc_alias]
        src = df.selectExpr(*sel)
        if target is not None and not disable_hwm:
            # per-source watermark with probe when rsrc_static declared
            # (reference: databricks/link.sql:44-131 mirror of the hub)
            if sm.rsrc_static:
                src = hwm_filter_static(src, target, sm.rsrc_static, g)
            else:
                src = hwm_filter(src, target, g)
        parts.append(src)
    union = reduce(lambda a, b: a.unionByName(b), parts)
    # window as SQL text inside one selectExpr (guide §5 — identical
    # plan, one py4j round trip instead of Window/Column objects)
    dedup = (union.selectExpr(
                "*", f"ROW_NUMBER() OVER (PARTITION BY {cfg.link_hashkey}"
                f" ORDER BY {g.ldts_alias}, {g.rsrc_alias}) AS __rn")
             .filter("__rn = 1").drop("__rn"))
    return anti_join_new(dedup, target, [cfg.link_hashkey])


def link_oracle(b: SqlBuilder, reg: Registry, cfg: LinkConfig,
                g: GlobalConfig = DEFAULT) -> str:
    selects = []
    for sm in cfg.source_models:
        hk = sm.hk_column or cfg.link_hashkey
        fks = sm.fk_columns or cfg.foreign_hashkeys
        cols = [f"{hk} AS {cfg.link_hashkey}"]
        cols += [f"{s} AS {t}" for s, t in zip(fks, cfg.foreign_hashkeys)]
        cols += list(cfg.additional_columns)
        cols += [g.ldts_alias, g.rsrc_alias]
        selects.append(f"SELECT {', '.join(cols)} FROM {reg.duckdb_relation(sm.name)}")
    u = b.cte(f"{cfg.name}__union", "\nUNION ALL\n".join(selects))
    return b.cte(cfg.name,
                 f"SELECT * FROM {u} QUALIFY ROW_NUMBER() OVER "
                 f"(PARTITION BY {cfg.link_hashkey} ORDER BY {g.ldts_alias}, {g.rsrc_alias}) = 1")
