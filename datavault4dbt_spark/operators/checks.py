"""Soft-constraint vault checks: the reference's documented `dbt test`
suite as one declarative operator.

Reference: docs/26_general-usage-notes/40_testing-a-data-vault/
40_testing-a-data-vault.md — Data Vault 2.0 rejects hard database
constraints (raw data must always land) and instead runs SOFT
constraints after loading: not_null / unique on hub & link hashkeys,
unique_combination_of_columns on satellite (hashkey, load-date[, MA
keys]) grains, and relationship (foreign-hashkey containment) from
links/satellites to their parents. That doc's per-entity-type test
table is exactly what this operator declares and evaluates; the result
is a violations report (one row per check), the soft-constraint
analogue of `dbt test`'s summary.

Check semantics (dbt generic-test parity):

- ``not_null``: rows where ANY listed column is NULL;
- ``unique`` / ``unique_combination``: surplus rows beyond one per
  distinct tuple — ``count(*) - count(DISTINCT tuple)`` over an
  injective per-component-md5 encoding (fixed-width components cannot
  collide across separator placement) with NULLs folded to a sentinel
  md5 can never emit, so NULL tuples count identically in both
  engines;
- ``relationship``: child rows whose (non-NULL, like dbt's
  relationships test) foreign key has no parent — a left-anti count
  against the distinct parent keys.

Scale: every check is one aggregation; the report unions them into a
single plan whose branches the scheduler runs in parallel (the bundle
pattern). unique/unique_combination shuffle on the checked tuple
(uniform hashkeys); relationship anti-joins broadcast the parent key
set when small, else hash-join on the key. Nothing collects beyond the
per-check counts themselves.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder

_KINDS = ("not_null", "unique", "unique_combination", "relationship")


@dataclass(frozen=True)
class Check:
    entity: str
    kind: str
    columns: tuple
    to_entity: str = ""      # relationship parent
    to_columns: tuple = ()   # parent key columns (default: columns)

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"check on {self.entity}: unknown kind "
                             f"{self.kind!r} (expected one of {_KINDS})")
        if not self.columns:
            raise ValueError(f"check on {self.entity}: needs >= 1 column")
        for c in (*self.columns, *self.to_columns):
            ensure_identifier(c, "column", f"check on {self.entity}")
        if self.kind == "relationship":
            if not self.to_entity:
                raise ValueError(
                    f"check on {self.entity}: relationship needs "
                    f"to_entity")
            if self.to_columns and \
                    len(self.to_columns) != len(self.columns):
                raise ValueError(
                    f"check on {self.entity}: to_columns arity must "
                    f"match columns")

    @property
    def parent_cols(self) -> tuple:
        return self.to_columns or self.columns


@dataclass(frozen=True)
class VaultChecksConfig:
    name: str
    checks: tuple = field(default=())

    def __post_init__(self):
        if not self.checks:
            raise ValueError(f"{self.name}: needs >= 1 check")


def _label(c: Check):
    cols = ",".join(c.columns)
    return (F.lit(c.entity).alias("entity"),
            F.lit(c.kind).alias("check_kind"),
            F.lit(cols).alias("check_cols"))


def _agg_metric_sql(c: Check) -> str:
    """The check's violation count as ONE SQL aggregate expression —
    identical text shape to the oracle's (vault_checks_oracle below)."""
    if c.kind == "not_null":
        pred = " OR ".join(f"{col} IS NULL" for col in c.columns)
        return f"SUM(CASE WHEN {pred} THEN 1 ELSE 0 END)"
    # INJECTIVE tuple encoding: each component is md5-hashed (fixed
    # 32-hex width) before joining, so values containing any
    # separator/sentinel byte cannot make distinct tuples collide
    # (round-7 advice); NULL components fold to a sentinel md5 can
    # never emit. The oracle runs the same expression, so both engines
    # count identical distinct tuples (including all-NULL ones, which
    # countDistinct alone would skip).
    tup = ", ".join(f"coalesce(md5(CAST({col} AS STRING)), 'null')"
                    for col in c.columns)
    return f"count(*) - count(DISTINCT concat_ws(':', {tup}))"


def build_vault_checks(spark, reg: Registry, cfg: VaultChecksConfig,
                       g: GlobalConfig = DEFAULT) -> DataFrame:
    # Aggregate-kind checks (not_null / unique / unique_combination) on
    # the SAME entity share one scan: each branch of the final union
    # recomputes its entity's whole build subtree (persisting the
    # checked entities was measured-and-rejected in r12 — the cache
    # build cost more than the duplicate aggregates), so fusing N
    # same-entity aggregates into one agg + stack() halves that
    # entity's builds in the plan. Row content is unchanged (same
    # label/count per check); row order within the union differs only
    # when same-entity agg checks were declared non-adjacent, and the
    # driver compare is order-insensitive.
    groups: dict = {}   # entity -> [check, ...] in declared order
    order: list = []    # (entity, first_check) in declared order
    for c in cfg.checks:
        if c.kind == "relationship":
            order.append((None, c))
        else:
            if c.entity not in groups:
                order.append((c.entity, c))
            groups.setdefault(c.entity, []).append(c)
    parts = []
    for entity, c0 in order:
        if entity is None:   # relationship: anti-join count
            c = c0
            df = reg.load(spark, c.entity)
            child = df.selectExpr(*c.columns).na.drop("any")
            parent = (reg.load(spark, c.to_entity)
                      .selectExpr(*[f"{p} AS {k}" for k, p in
                                    zip(c.columns, c.parent_cols)])
                      .distinct())
            agg = (child.join(parent, on=list(c.columns), how="left_anti")
                   .agg(F.count(F.lit(1)).alias("n")))
            parts.append(agg.select(
                *_label(c), F.coalesce(F.col("n"), F.lit(0))
                .cast("long").alias("n_violations")))
            continue
        checks = groups[entity]
        df = reg.load(spark, entity)
        agg = df.selectExpr(
            *[f"{_agg_metric_sql(c)} AS n{i}"
              for i, c in enumerate(checks)])
        rows = ", ".join(
            f"'{c.entity}', '{c.kind}', '{','.join(c.columns)}', "
            f"CAST(coalesce(n{i}, 0) AS BIGINT)"
            for i, c in enumerate(checks))
        parts.append(agg.selectExpr(
            f"stack({len(checks)}, {rows}) AS "
            f"(entity, check_kind, check_cols, n_violations)"))
    return reduce(lambda a, b: a.unionByName(b), parts)


def vault_checks_oracle(b: SqlBuilder, reg: Registry,
                        cfg: VaultChecksConfig,
                        g: GlobalConfig = DEFAULT) -> str:
    parts = []
    for c in cfg.checks:
        rel = reg.duckdb_relation(c.entity)
        cols = ",".join(c.columns)
        label = (f"'{c.entity}' AS entity, '{c.kind}' AS check_kind, "
                 f"'{cols}' AS check_cols")
        if c.kind == "not_null":
            pred = " OR ".join(f"{col} IS NULL" for col in c.columns)
            q = (f"SELECT {label}, CAST(coalesce(SUM(CASE WHEN {pred} "
                 f"THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations "
                 f"FROM {rel}")
        elif c.kind in ("unique", "unique_combination"):
            # identical injective construction as the Spark side
            # (per-component md5, ':'-joined fixed-width tuple)
            tup = " || ':' || ".join(
                f"coalesce(md5(CAST({col} AS VARCHAR)), 'null')"
                for col in c.columns)
            q = (f"SELECT {label}, CAST(count(*) - "
                 f"count(DISTINCT ({tup})) AS BIGINT) AS n_violations "
                 f"FROM {rel}")
        else:
            parent = reg.duckdb_relation(c.to_entity)
            on = " AND ".join(
                f"ch.{k} = pa.{p}"
                for k, p in zip(c.columns, c.parent_cols))
            nn = " AND ".join(f"ch.{k} IS NOT NULL" for k in c.columns)
            q = (f"SELECT {label}, CAST(count(*) AS BIGINT) "
                 f"AS n_violations FROM {rel} ch "
                 f"WHERE {nn} AND NOT EXISTS (SELECT 1 FROM {parent} "
                 f"pa WHERE {on})")
        parts.append(q)
    return b.cte(cfg.name, "\nUNION ALL\n".join(parts))
