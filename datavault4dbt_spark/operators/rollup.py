"""OLAP grouping-sets census: ROLLUP / CUBE subtotal aggregation in one
pass — the per-dimension + subtotal + grand-total table a warehouse mart
(or a training-data source census) prints without running 2^n separate
GROUP BYs.

Output: one row per grouping set per key combination —
``(group cols..., g_<col> flags..., n_rows, <sum cols as exact integer
cents>)``. The ``g_<col>`` columns are the SQL-standard ``GROUPING()``
indicators (1 = the column is rolled up in this row), which is the only
way to distinguish a subtotal row from a genuine NULL group value; both
engines emit them, so the driver hash pins subtotal identity, not just
subtotal values.

Scale design (100 TB): Spark plans ``rollup``/``cube`` as ONE Expand
operator (each input row is replicated once per grouping set, n+1 for
rollup / 2^n for cube) feeding ONE hash aggregate with map-side partial
combine — a single shuffle on the expanded grouping key, no
per-grouping-set rescans of the input. Sums fold as exact integer cents
(``CAST(round(x*100) AS BIGINT)``) inside the scan-stage projection, so
the replicated rows carry only the grouping key + fixed-width longs and
the whole pipeline below the exchange stays in whole-stage codegen (the
Expand fan-out is pinned in tests/test_plan_quality.py — 2^n grouping
sets over a wide dimension list is the one way this operator degrades,
so cube is capped at 5 dimensions).

Reference anchor: none (the reference's marts stop at PIT/bridge
snapshots); this extends the engine's information-mart surface with the
standard SQL grouping-sets census (ISO/IEC 9075-2 §7.9). DuckDB oracles
the plan with the same ``GROUP BY ROLLUP/CUBE`` + ``GROUPING()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class GroupingSetsConfig:
    name: str
    source: str
    group_cols: Tuple[str, ...]
    mode: str = "rollup"                     # 'rollup' | 'cube'
    # (alias, source expression) pairs summed as exact integer cents
    sum_cents: Tuple[Tuple[str, str], ...] = field(default_factory=tuple)

    def __post_init__(self):
        if self.mode not in ("rollup", "cube"):
            raise ValueError(f"{self.name}: mode must be rollup|cube")
        if not self.group_cols:
            raise ValueError(f"{self.name}: group_cols must be non-empty")
        if self.mode == "cube" and len(self.group_cols) > 5:
            # 2^n Expand fan-out: refuse the shape that degrades at scale
            raise ValueError(f"{self.name}: cube capped at 5 dimensions "
                             f"(2^n row replication in Expand)")
        if len(set(self.group_cols)) != len(self.group_cols):
            raise ValueError(f"{self.name}: duplicate group_cols")
        for c in self.group_cols:
            ensure_identifier(c, "column", self.name)
        reserved = ({"n_rows"} | {f"g_{c}" for c in self.group_cols}
                    | set(self.group_cols))
        seen = set()
        for alias, _expr in self.sum_cents:
            ensure_identifier(alias, "column", self.name)
            if alias in reserved or alias in seen:
                raise ValueError(f"{self.name}: sum alias {alias!r} "
                                 f"collides with an output column")
            seen.add(alias)


def _cents(expr: str):
    return F.expr(f"CAST(round(({expr}) * 100) AS BIGINT)")


def build_grouping_sets(spark, reg: Registry, cfg: GroupingSetsConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    src = reg.load(spark, cfg.source)
    # scan-stage projection: grouping keys + fixed-width cent longs only,
    # so Expand replicates narrow rows
    proj = src.select(
        *[F.col(c) for c in cfg.group_cols],
        *[_cents(expr).alias(f"__c_{alias}")
          for alias, expr in cfg.sum_cents])
    grouped = (proj.cube(*cfg.group_cols) if cfg.mode == "cube"
               else proj.rollup(*cfg.group_cols))
    aggs = ([F.grouping(c).cast("int").alias(f"g_{c}")
             for c in cfg.group_cols]
            + [F.count(F.lit(1)).alias("n_rows")]
            + [F.sum(f"__c_{alias}").alias(alias)
               for alias, _ in cfg.sum_cents])
    return grouped.agg(*aggs)


def grouping_sets_oracle(b: SqlBuilder, reg: Registry,
                         cfg: GroupingSetsConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    keys = ", ".join(cfg.group_cols)
    gflags = ", ".join(
        f"CAST(GROUPING({c}) AS INT) AS g_{c}" for c in cfg.group_cols)
    sums = "".join(
        f", CAST(SUM(CAST(round(({expr}) * 100) AS BIGINT)) "
        f"AS BIGINT) AS {alias}"
        for alias, expr in cfg.sum_cents)
    return b.cte(
        cfg.name,
        f"SELECT {keys}, {gflags}, count(*) AS n_rows{sums} "
        f"FROM {src} GROUP BY {cfg.mode.upper()}({keys})")
