"""Record-tracking satellite: one row per (tracked hashkey, ldts, rsrc,
stage) sighting across sources.

Reference: macros/tables/rec_track_sat.sql:16 /
macros/tables/databricks/rec_track_sat.sql:100-242 — SELECT DISTINCT per
source with rsrc overridden by the static literal and stg = UPPER(source
name); union; final filter excludes both ghost ldts sentinels (233-234);
incremental insert keyed on concat(hk, ldts, rsrc).

Incremental pruning (reference: rec_track_sat.sql:93-103): each source
gets its OWN high-water mark, probed over target rows whose rsrc
matches that source's rsrc_static — one source lagging (or brand new)
must not be filtered by the others' watermarks. At 100 TB the per-
source HWM literal prunes the source scan via row-group min-max
skipping; the concat-key anti-join then only sees the post-HWM slice.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..functions.hashing import sql_str
from ..plans.incremental import hwm_filter_static
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class RecTrackConfig:
    name: str
    tracked_hashkey: str
    source_models: tuple  # EntitySource (hk_column per source; rsrc_static literal)
    additional_columns: tuple = ()


def build_rec_track_sat(spark, reg: Registry, cfg: RecTrackConfig,
                        g: GlobalConfig = DEFAULT,
                        target: DataFrame | None = None) -> DataFrame:
    parts = []
    for sm in cfg.source_models:
        df = reg.load(spark, sm.name)
        hk = sm.hk_column or cfg.tracked_hashkey
        # one string projection = one py4j round trip (guide §5); same
        # rendering as the oracle's column list
        rsrc = (sql_str(sm.rsrc_static) if sm.rsrc_static
                else g.rsrc_alias)
        sel = [f"{hk} AS {cfg.tracked_hashkey}", g.ldts_alias,
               f"CAST({rsrc} AS STRING) AS {g.rsrc_alias}",
               f"CAST({sql_str(sm.name.upper())} AS STRING) "
               f"AS {g.stg_alias}"]
        sel += list(cfg.additional_columns)
        proj = df.selectExpr(*sel)
        if target is not None and sm.rsrc_static:
            proj = hwm_filter_static(proj, target, sm.rsrc_static, g)
        parts.append(proj.distinct())
    union = reduce(lambda a, b: a.unionByName(b), parts)
    out = union.filter(
        f"{g.ldts_alias} != CAST('{g.end_of_all_times}' AS TIMESTAMP)"
        f" AND {g.ldts_alias} != "
        f"CAST('{g.beginning_of_all_times}' AS TIMESTAMP)")
    if target is None:
        return out
    key = F.concat_ws("||", cfg.tracked_hashkey, g.ldts_alias, g.rsrc_alias)
    existing = target.select(
        F.concat_ws("||", cfg.tracked_hashkey, g.ldts_alias, g.rsrc_alias)
        .alias("__k")).distinct()
    return (out.withColumn("__k", key)
            .join(existing, on="__k", how="left_anti").drop("__k"))


def rec_track_oracle(b: SqlBuilder, reg: Registry, cfg: RecTrackConfig,
                     g: GlobalConfig = DEFAULT) -> str:
    selects = []
    for sm in cfg.source_models:
        hk = sm.hk_column or cfg.tracked_hashkey
        rsrc = (sql_str(sm.rsrc_static) if sm.rsrc_static else g.rsrc_alias)
        cols = [f"{hk} AS {cfg.tracked_hashkey}", g.ldts_alias,
                f"CAST({rsrc} AS STRING) AS {g.rsrc_alias}",
                f"CAST({sql_str(sm.name.upper())} AS STRING) AS {g.stg_alias}"]
        cols += list(cfg.additional_columns)
        selects.append(
            f"SELECT DISTINCT {', '.join(cols)} FROM {reg.duckdb_relation(sm.name)}")
    u = b.cte(f"{cfg.name}__union", "\nUNION ALL\n".join(selects))
    return b.cte(cfg.name, f"""SELECT * FROM {u}
WHERE {g.ldts_alias} != CAST('{g.end_of_all_times}' AS TIMESTAMP)
  AND {g.ldts_alias} != CAST('{g.beginning_of_all_times}' AS TIMESTAMP)""")
