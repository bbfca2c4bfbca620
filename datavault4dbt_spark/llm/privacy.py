"""k-anonymity suppression: flag and suppress quasi-identifier
combinations whose anonymity set is smaller than k.

The release-gate check of Sweeney 2002 ("k-anonymity: a model for
protecting privacy"): a row is k-anonymous iff at least k rows share
its quasi-identifier (QI) combination — rare combinations re-identify
individuals by linkage. Training-data pipelines run this before
publishing corpus metadata (language x dialect x region cards, user
cohort exports): rows in under-k groups keep their payload but have
the QI columns suppressed (NULLed), the standard cell-suppression
remedy, and every row carries its anonymity-set size so downstream
gates can choose stricter k without recomputing.

Complements llm/scrub.py's PII redaction (direct identifiers) — QI
suppression handles the indirect ones.

Scale design (100 TB): ONE QI-keyed exchange; the anonymity-set size
is a single count window over it and the suppression is a scan-stage
CASE on the window output — no census join-back, no second shuffle
(pinned in tests/test_plan_quality.py). NULL QI values group together
(both engines' window partitioning treats NULL as a value), matching
k-anonymity's definition where NULL is itself an observable value.

Determinism: counts and flags are exact; suppressed cells are NULL in
both engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class KAnonymityConfig:
    """``quasi_cols``: the quasi-identifier columns (suppressed
    together — partial suppression leaks the remaining combination).
    ``k``: minimum anonymity-set size."""

    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    quasi_cols: tuple = ("lang", "source")
    k: int = 5

    def __post_init__(self):
        if not self.quasi_cols:
            raise ValueError(f"{self.name}: quasi_cols must be non-empty")
        if len(set(self.quasi_cols)) != len(self.quasi_cols):
            raise ValueError(f"{self.name}: duplicate quasi_cols")
        if self.k < 2:
            raise ValueError(f"{self.name}: k must be >= 2 "
                             f"(k=1 suppresses nothing by definition)")
        for c in (self.id_col,) + self.quasi_cols:
            ensure_identifier(c, "column", self.name)


def build_k_anonymity(spark, reg: Registry, cfg: KAnonymityConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    qis = list(cfg.quasi_cols)
    src = reg.load(spark, cfg.source).select(cfg.id_col, *qis)
    w = Window.partitionBy(*qis)
    marked = src.select(
        cfg.id_col, *qis,
        F.count(F.lit(1)).over(w).alias("group_n"))
    suppress = F.col("group_n") < cfg.k
    return marked.select(
        cfg.id_col,
        *[F.when(~suppress, F.col(c)).alias(c) for c in qis],
        "group_n",
        suppress.alias("is_suppressed"))


def k_anonymity_oracle(b: SqlBuilder, reg: Registry,
                       cfg: KAnonymityConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    qis = ", ".join(cfg.quasi_cols)
    marked = b.cte(
        f"{cfg.name}__m",
        f"SELECT {cfg.id_col}, {qis}, "
        f"count(*) OVER (PARTITION BY {qis}) AS group_n FROM {src}")
    cells = ", ".join(
        f"CASE WHEN group_n >= {cfg.k} THEN {c} END AS {c}"
        for c in cfg.quasi_cols)
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, {cells}, group_n, "
        f"group_n < {cfg.k} AS is_suppressed FROM {marked}")
