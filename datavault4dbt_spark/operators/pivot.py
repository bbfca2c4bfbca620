"""Pivot (long-to-wide conditional aggregation): one output row per
group with a column per declared pivot value — the crosstab every
report layer runs (docs per language by source, events per type by
day). Values are DECLARED, not discovered: both engines then agree on
the output schema without a discovery scan, and a value silently
vanishing from the data keeps its (zero) column instead of silently
narrowing the table.

Scale design (100 TB): Spark's ``groupBy().pivot(col, values)`` with an
explicit value list compiles to a two-level aggregate — a
map-side-combined (group, pivot) census first, then the ``__pivot_*``
transpose keyed on the group alone, whose exchange moves only census
rows (at most |groups| x |values|), never the input; one scan, no
per-value rescans (pinned in tests/test_plan_quality.py). Empty cells are coalesced to 0 so the wide
table is total (Spark's pivot yields NULL there; DuckDB's FILTER
aggregate yields 0 for counts — the coalesce makes both engines emit
the same total table). Sums fold as exact integer cents, the engine's
cross-verification convention.

Reference anchor: none (the reference emits long-form tables only);
DuckDB oracles via ``count(*)/sum() FILTER (WHERE ...)`` — the ISO
conditional-aggregation form of the same query.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Tuple

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class PivotConfig:
    """``values``: the declared pivot domain — each becomes two output
    columns ``n_<value>`` and (if ``sum_expr``) ``sum_<value>``.
    Values must be simple lowercase tokens (they are interpolated as
    both identifiers and quoted literals in two dialects)."""

    name: str
    source: str
    group_col: str
    pivot_col: str
    values: Tuple[str, ...]
    sum_expr: str | None = None   # summed as exact integer cents

    def __post_init__(self):
        if not self.values:
            raise ValueError(f"{self.name}: values must be non-empty")
        if len(set(self.values)) != len(self.values):
            raise ValueError(f"{self.name}: duplicate pivot values")
        if self.group_col == self.pivot_col:
            raise ValueError(f"{self.name}: group_col and pivot_col "
                             f"must differ")
        for c in (self.group_col, self.pivot_col):
            ensure_identifier(c, "column", self.name)
        for v in self.values:
            if not re.fullmatch(r"[a-z][a-z0-9_]*", v):
                raise ValueError(
                    f"{self.name}: pivot value {v!r} must be a plain "
                    f"lowercase token — it becomes a column name in "
                    f"both dialects")


def build_pivot(spark, reg: Registry, cfg: PivotConfig,
                g: GlobalConfig = DEFAULT) -> DataFrame:
    src = reg.load(spark, cfg.source)
    aggs = [F.count(F.lit(1)).alias("n")]
    if cfg.sum_expr:
        aggs.append(F.sum(F.expr(
            f"CAST(round(({cfg.sum_expr}) * 100) AS BIGINT)")).alias("s"))
    wide = (src.groupBy(cfg.group_col)
            .pivot(cfg.pivot_col, list(cfg.values)).agg(*aggs))
    # single-agg pivot names columns `<value>`; multi-agg `<value>_<alias>`
    out = [F.col(cfg.group_col)]
    for v in cfg.values:
        n_col = v if not cfg.sum_expr else f"{v}_n"
        out.append(F.coalesce(F.col(f"`{n_col}`"), F.lit(0))
                   .alias(f"n_{v}"))
        if cfg.sum_expr:
            out.append(F.coalesce(F.col(f"`{v}_s`"), F.lit(0))
                       .cast("bigint").alias(f"sum_{v}_cents"))
    return wide.select(*out)


def pivot_oracle(b: SqlBuilder, reg: Registry, cfg: PivotConfig,
                 g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    cols = []
    for v in cfg.values:
        cols.append(f"count(*) FILTER (WHERE {cfg.pivot_col} = '{v}') "
                    f"AS n_{v}")
        if cfg.sum_expr:
            cols.append(
                f"CAST(coalesce(sum(CAST(round(({cfg.sum_expr}) * 100) "
                f"AS BIGINT)) FILTER (WHERE {cfg.pivot_col} = '{v}'), 0) "
                f"AS BIGINT) AS sum_{v}_cents")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.group_col}, {', '.join(cols)} FROM {src} "
        f"GROUP BY {cfg.group_col}")
