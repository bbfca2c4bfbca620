"""Hub operator: earliest-arrival distinct business keys.

Re-implements reference: macros/tables/hub.sql:13-129 (dispatcher) /
macros/tables/databricks/hub.sql:1-261. Pipeline: per-source select with
column mapping -> UNION ALL -> earliest row per hashkey (ROW_NUMBER) ->
[incremental: anti-join vs target] -> insert.

Determinism note: the reference orders the dedup window by ldts only
(hub.sql:228), which is nondeterministic under ties; we add rsrc as a
tie-breaker in BOTH the Spark plan and the oracle SQL.

Scale: the window + anti-join shuffle on the same key (hashkey), so AQE
reuses the exchange; hashkeys are uniformly-distributed hashes, so no
skew handling is needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder
from ..plans.incremental import hwm_filter, hwm_filter_static, anti_join_new


@dataclass(frozen=True)
class EntitySource:
    """One source stage feeding an entity, with per-source column mapping
    (reference: macros/supporting/source_models.sql:40-62)."""

    name: str
    hk_column: str | None = None   # defaults to target hashkey name
    bk_columns: tuple | None = None  # defaults to target business keys
    rsrc_static: str | None = None
    fk_columns: tuple | None = None  # links: foreign hashkeys mapping
    payload: tuple | None = None     # nh_link: per-source payload mapping


@dataclass(frozen=True)
class HubConfig:
    name: str
    hashkey: str
    business_keys: tuple
    source_models: tuple  # EntitySource
    additional_columns: tuple = ()


def _source_select(df: DataFrame, sm: EntitySource, cfg: HubConfig,
                   g: GlobalConfig) -> DataFrame:
    hk = sm.hk_column or cfg.hashkey
    bks = sm.bk_columns or cfg.business_keys
    # one string projection = one py4j round trip (guide §5); every
    # name here is interpolated into the oracle SQL already, so the
    # plain-identifier contract holds
    sel = [f"{hk} AS {cfg.hashkey}"]
    sel += [f"{b} AS {t}" for b, t in zip(bks, cfg.business_keys)]
    sel += list(cfg.additional_columns)
    sel += [g.ldts_alias, g.rsrc_alias]
    return df.selectExpr(*sel)


def build_hub(spark, reg: Registry, cfg: HubConfig, g: GlobalConfig = DEFAULT,
              target: DataFrame | None = None, disable_hwm: bool = False) -> DataFrame:
    parts = []
    for sm in cfg.source_models:
        src = _source_select(reg.load(spark, sm.name), sm, cfg, g)
        if target is not None and not disable_hwm:
            # per-source watermark when the source declares rsrc_static
            # (reference: hub.sql:44-131), global max(ldts) otherwise
            if sm.rsrc_static:
                src = hwm_filter_static(src, target, sm.rsrc_static, g)
            else:
                src = hwm_filter(src, target, g)
        parts.append(src)
    union = reduce(lambda a, b: a.unionByName(b), parts)
    # window as SQL text inside one selectExpr (guide §5 — identical
    # plan, one py4j round trip instead of Window/Column objects)
    dedup = (union.selectExpr(
                "*", f"ROW_NUMBER() OVER (PARTITION BY {cfg.hashkey} "
                f"ORDER BY {g.ldts_alias}, {g.rsrc_alias}) AS __rn")
             .filter("__rn = 1").drop("__rn"))
    return anti_join_new(dedup, target, [cfg.hashkey])


def hub_oracle(b: SqlBuilder, reg: Registry, cfg: HubConfig,
               g: GlobalConfig = DEFAULT) -> str:
    """DuckDB SQL for the initial (full) hub load; stages must already be
    CTEs in ``b``."""
    selects = []
    for sm in cfg.source_models:
        hk = sm.hk_column or cfg.hashkey
        bks = sm.bk_columns or cfg.business_keys
        cols = [f"{hk} AS {cfg.hashkey}"]
        cols += [f"{s} AS {t}" for s, t in zip(bks, cfg.business_keys)]
        cols += list(cfg.additional_columns)
        cols += [g.ldts_alias, g.rsrc_alias]
        selects.append(f"SELECT {', '.join(cols)} FROM {reg.duckdb_relation(sm.name)}")
    union = "\nUNION ALL\n".join(selects)
    u = b.cte(f"{cfg.name}__union", union)
    return b.cte(cfg.name,
                 f"SELECT * FROM {u} QUALIFY ROW_NUMBER() OVER "
                 f"(PARTITION BY {cfg.hashkey} ORDER BY {g.ldts_alias}, {g.rsrc_alias}) = 1")
