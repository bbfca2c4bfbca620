"""SCD type-1 merge materialization: latest-wins keyed upsert of
versioned batches into a persisted current-state table — the `merge`
incremental strategy of warehouse dbt adapters, beside the insert-only
strategy the reference uses everywhere (reference: every table macro
guards inserts with NOT-IN/NOT-EXISTS, e.g.
macros/tables/databricks/hub.sql:248-257; the databricks adapter's
alternative merge strategy has no reference macro — this operator
supplies it).

Semantics: batches are processed in ascending version order; within a
batch the latest row per key (tie columns descending) wins; an existing
key's row is REPLACED, a new key's row inserted — the final table holds
exactly one current row per key ever seen. (key, version, tie) must be
unique — the determinism contract every SCD1 feed needs anyway.

CDC mode: with ``delete_expr`` set (a boolean SQL expression — the
feed's tombstone marker), a key whose LATEST row is a delete leaves
the current-state table entirely (MERGE ... WHEN MATCHED AND tombstone
THEN DELETE); a later non-delete version re-inserts it. A NULL marker
means not-deleted in both engines (coalesce to FALSE). This is the
full CDC-apply: upserts and deletes through one deterministic
latest-wins rule, certified against the one-shot SQL (latest row per
key, kept iff not a tombstone).

Scale design (100 TB target, daily-batch steady state): each merge is
ONE key-equi anti join of the target against the batch's keys (AQE
broadcasts the small daily batch) plus a union — with Delta this is a
transactional MERGE that rewrites only files containing matched keys;
the ParquetStore twin rewrites the table through the same
read-modify-write swap the maintenance operators use
(plans/incremental.py overwrite). The batch's own latest-per-key window
shuffles only the batch. The replay loop is certified against the
one-shot SQL (latest (version, tie) per key over the full history) by
the driver hash — the plans/replay.py verification pattern.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.incremental import scratch_store
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class Scd1MergeConfig:
    """``version_expr``: SQL (valid in both dialects) deriving the
    batch/version number from a source row — the replay splits the
    source on its distinct values and merges them in ascending order.
    ``tie_cols``: within-(key, version) descending tie-break."""

    name: str
    source: str
    key_cols: Tuple[str, ...]
    version_expr: str
    tie_cols: Tuple[str, ...]
    payload_cols: Tuple[str, ...] = ()
    version_alias: str = "version_seq"
    delete_expr: str | None = None     # CDC tombstone marker

    def __post_init__(self):
        if not self.key_cols or not self.tie_cols:
            raise ValueError(
                f"{self.name}: key_cols and tie_cols must be non-empty")
        for c in (*self.key_cols, *self.tie_cols, *self.payload_cols,
                  self.version_alias):
            ensure_identifier(c, "column", self.name)

    @property
    def out_cols(self) -> tuple:
        return (*self.key_cols, self.version_alias, *self.tie_cols,
                *self.payload_cols)


def _versioned(cfg: Scd1MergeConfig, df: DataFrame) -> DataFrame:
    delete = (f"coalesce(CAST(({cfg.delete_expr}) AS BOOLEAN), FALSE)"
              if cfg.delete_expr else "FALSE")
    return df.selectExpr(
        *dict.fromkeys((*cfg.key_cols, *cfg.tie_cols, *cfg.payload_cols)),
        f"CAST({cfg.version_expr} AS BIGINT) AS {cfg.version_alias}",
        f"{delete} AS __del")


def merge_scd1_batch(store, table: str, batch: DataFrame,
                     cfg: Scd1MergeConfig) -> None:
    """Upsert ONE version batch into the store table — the shared core
    a foreachBatch streaming feed would call per micro-batch."""
    w = Window.partitionBy(*cfg.key_cols).orderBy(
        *[F.desc(t) for t in cfg.tie_cols])
    latest = (batch.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .select(*cfg.out_cols, "__del"))
    # tombstoned keys leave the table (anti-join removes them along
    # with updated keys); only surviving latest rows re-enter
    survivors = latest.filter(~F.col("__del")).select(*cfg.out_cols)
    # NOT rebalance-clustered (unlike the hive-partitioned loop writers
    # in incdedup/annindex): the overwrite is unpartitioned, so the
    # keyless REBALANCE only trimmed 59 -> 32 files while its extra
    # exchange per version measured a ~25% loss on interleaved minima
    # (7.5 vs 6.0 s); the anti-join's own AQE-coalesced layout is
    # already well-sized here
    if store.exists(table):
        kept = store.read(table).join(
            latest.select(*cfg.key_cols), list(cfg.key_cols), "left_anti")
        store.overwrite(table, kept.unionByName(survivors))
    else:
        store.overwrite(table, survivors)


def build_scd1_merge(spark, reg: Registry, cfg: Scd1MergeConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    src = _versioned(cfg, reg.load(spark, cfg.source))
    # driver-side scalar probe (the HWM-probe pattern): one value per
    # batch, baked into each batch filter so the scan prunes on it
    versions = [r[0] for r in
                src.select(cfg.version_alias).distinct().collect()]
    if any(v is None for v in versions):
        # a NULL version row would silently vanish from the replay but
        # rank in the one-shot SQL — fail with the actual problem
        raise ValueError(f"{cfg.name}: version_expr produced NULL")
    versions.sort()
    store = scratch_store(spark, cfg.name, prefix="dv4dbt_scd1")
    import shutil
    shutil.rmtree(store.path("current"), ignore_errors=True)
    for v in versions:
        merge_scd1_batch(store, "current",
                         src.filter(F.col(cfg.version_alias) == v), cfg)
    if not versions:
        return src.select(*cfg.out_cols)
    return store.read("current").select(*cfg.out_cols)


def scd1_merge_oracle(b: SqlBuilder, reg: Registry, cfg: Scd1MergeConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    keys = ", ".join(cfg.key_cols)
    ties = ", ".join(f"{t} DESC" for t in cfg.tie_cols)
    cols = ", ".join(dict.fromkeys(
        (*cfg.key_cols, *cfg.tie_cols, *cfg.payload_cols)))
    delete = (f"coalesce(CAST(({cfg.delete_expr}) AS BOOLEAN), FALSE)"
              if cfg.delete_expr else "FALSE")
    versioned = b.cte(
        f"{cfg.name}__v",
        f"SELECT {cols}, CAST({cfg.version_expr} AS BIGINT) "
        f"AS {cfg.version_alias}, {delete} AS __del FROM {src}")
    ranked = b.cte(
        f"{cfg.name}__r",
        f"SELECT *, row_number() OVER (PARTITION BY {keys} "
        f"ORDER BY {cfg.version_alias} DESC, {ties}) AS __rn "
        f"FROM {versioned}")
    out = ", ".join(cfg.out_cols)
    return b.cte(cfg.name,
                 f"SELECT {out} FROM {ranked} "
                 f"WHERE __rn = 1 AND NOT __del")
