"""Schema-contract quarantine: split a source into a valid lane and a
quarantine lane by a set of declared row rules, with the quarantine
rows carrying WHICH rules failed — the bad-record routing every
production ingestion runs (dbt's severity-error tests stop the build;
a pipeline instead quarantines and continues, re-processing the lane
after a fix).

The violations REPORT (operators/checks.py) counts breaches per
entity; this operator is its row-level routing counterpart. Rules are
SQL boolean predicates valid in both dialects; a row is quarantined iff
at least one rule's predicate is FALSE or NULL (NULL = the rule could
not be evaluated — quarantine, never silently pass; the NOT-IN-style
NULL trap the reference's anti-join loaders also guard against).

Scale design (100 TB): rule evaluation is a scan-stage boolean
projection (zero shuffles, whole-stage codegen — pinned in
tests/test_plan_quality.py); the reason string concatenates failed
rule names in declaration order with no aggregation. Both lanes are
filters over the same projection, so a load writes valid + quarantine
in one pass each (or one pass total with a partitioned write on
``is_quarantined``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Tuple

from pyspark.sql import DataFrame

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class QuarantineConfig:
    """``rules``: (rule_name, predicate_sql) pairs — a row PASSES a
    rule iff the predicate is TRUE. ``id_cols`` identify the row in
    the quarantine lane; ``payload_cols`` ride along for triage."""

    name: str
    source: str
    rules: Tuple[Tuple[str, str], ...]
    id_cols: Tuple[str, ...]
    payload_cols: Tuple[str, ...] = ()

    def __post_init__(self):
        if not self.rules:
            raise ValueError(f"{self.name}: rules must be non-empty")
        if not self.id_cols:
            raise ValueError(f"{self.name}: id_cols must be non-empty")
        for c in (*self.id_cols, *self.payload_cols):
            ensure_identifier(c, "column", self.name)
        for rn, _pred in self.rules:
            if not re.fullmatch(r"[a-z][a-z0-9_]*", rn):
                raise ValueError(
                    f"{self.name}: rule name {rn!r} must be a plain "
                    f"lowercase token (it lands in the reason string)")


def _flag_exprs(cfg: QuarantineConfig) -> list:
    """One boolean pass-flag per rule; NULL predicate -> FALSE
    (quarantine on unevaluable)."""
    return [f"coalesce(CAST(({pred}) AS BOOLEAN), FALSE) AS __ok_{rn}"
            for rn, pred in cfg.rules]


def _reason_expr(cfg: QuarantineConfig) -> str:
    parts = ", ".join(
        f"CASE WHEN __ok_{rn} THEN NULL ELSE '{rn}' END"
        for rn, _ in cfg.rules)
    # concat_ws skips NULLs in BOTH dialects -> comma-joined failed
    # rule names in declaration order
    return f"concat_ws(',', {parts})"


def build_quarantine(spark, reg: Registry, cfg: QuarantineConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    """The quarantine LANE (offending rows + reasons). The valid lane
    is the same projection filtered the other way — `split_lanes`
    returns both for pipeline use; the driver-checked entity is the
    quarantine side, whose content pins both (row sets partition the
    source)."""
    return split_lanes(spark, reg, cfg, g)[1]


def route_lanes(rows: DataFrame, cfg: QuarantineConfig) -> tuple:
    """Shared frame core: (valid, quarantine) lanes over any input
    frame — the batch operator and the streaming twin
    (streaming/curation.py streaming_quarantine) both call this, so
    the two paths cannot drift. Stateless scan-stage projection: runs
    unchanged inside a micro-batch plan."""
    flagged = rows.selectExpr(
        *dict.fromkeys((*cfg.id_cols, *cfg.payload_cols)),
        *_flag_exprs(cfg))
    all_ok = " AND ".join(f"__ok_{rn}" for rn, _ in cfg.rules)
    out_cols = list(dict.fromkeys((*cfg.id_cols, *cfg.payload_cols)))
    valid = flagged.filter(all_ok).selectExpr(*out_cols)
    quarantined = (flagged.filter(f"NOT ({all_ok})")
                   .selectExpr(*out_cols,
                               f"{_reason_expr(cfg)} AS failed_rules"))
    return valid, quarantined


def split_lanes(spark, reg: Registry, cfg: QuarantineConfig,
                g: GlobalConfig = DEFAULT) -> tuple:
    return route_lanes(reg.load(spark, cfg.source), cfg)


def quarantine_oracle(b: SqlBuilder, reg: Registry, cfg: QuarantineConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    cols = ", ".join(dict.fromkeys((*cfg.id_cols, *cfg.payload_cols)))
    flags = ", ".join(_flag_exprs(cfg))
    flagged = b.cte(f"{cfg.name}__f",
                    f"SELECT {cols}, {flags} FROM {src}")
    all_ok = " AND ".join(f"__ok_{rn}" for rn, _ in cfg.rules)
    return b.cte(
        cfg.name,
        f"SELECT {cols}, {_reason_expr(cfg)} AS failed_rules "
        f"FROM {flagged} WHERE NOT ({all_ok})")
