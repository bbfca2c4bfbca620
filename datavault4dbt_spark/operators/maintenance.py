"""Maintenance operators: rehashing + PIT snapshot cleanup.

Rehashing (reference: macros/rehashing/single_entities/*.sql dispatchers,
databricks impls macros/rehashing/single_entities/databricks/*.sql,
orchestrator macros/rehashing/rehash_all_rdv_entities.sql:139-166):
recompute hash columns with a new hash configuration (e.g. MD5 ->
SHA256 migration). The reference mutates tables in place (ALTER TABLE
ADD COLUMN + UPDATE); in Spark the idiomatic equivalent is
recompute-and-overwrite — a single projection with the new hash
expression, then an atomic table rewrite. No UPDATE path exists or is
needed (insert-only architecture).

clean_up_pit (reference: macros/hooks/clean_up_pits.sql:27-49; databricks
DELETE at 128-137): post-load hook deleting PIT rows whose snapshot
timestamp is no longer active in the (logarithmically thinning) snapshot
control table — keeps PITs from growing monotonically.

Scale: rehash is one full-table scan + write (map-only, no shuffle);
clean_up_pit is an anti-filter against a broadcast-sized set of active
snapshot timestamps.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT
from ..functions.hashing import HashSpec, hash_expr_sql, SPARK
from ..plans.incremental import ParquetStore


@dataclass(frozen=True)
class RehashSpec:
    """One entity's hash columns, declared from its natural inputs
    (reference naming-convention YAML: rehash_all_rdv_entities.sql:17-129).

    ``hashes``: HashSpec per hash column to recompute — a hub hashkey
    from business keys, a link hashkey from its hubs' business keys, a
    satellite hashdiff from payload columns.
    """

    table: str
    hashes: tuple  # HashSpec
    drop_old: bool = True
    suffix: str = "__new"


def rehash_frame(df: DataFrame, spec: RehashSpec,
                 g: GlobalConfig = DEFAULT) -> DataFrame:
    """Pure transformation: df with every configured hash column
    recomputed under ``g`` (hash algorithm/case/sentinels from the new
    GlobalConfig). With drop_old=False both versions are kept
    (old name + ``<name><suffix>``) for cut-over validation, mirroring
    the reference's add-column-then-drop flow
    (alter_table_add_col.sql / get_rename_column_sql.sql)."""
    out = df
    for h in spec.hashes:
        new_col = F.expr(hash_expr_sql(h, g, SPARK, alias=False))
        if spec.drop_old:
            out = out.withColumn(h.name, new_col)
        else:
            out = out.withColumn(f"{h.name}{spec.suffix}", new_col)
    return out


def rehash_table(store: ParquetStore, spec: RehashSpec,
                 g: GlobalConfig = DEFAULT) -> int:
    """Recompute-and-overwrite one stored entity; returns row count."""
    df = rehash_frame(store.read(spec.table), spec, g)
    n = df.count()
    store.overwrite(spec.table, df)
    return n


def rehash_all(store: ParquetStore, specs: tuple,
               g: GlobalConfig = DEFAULT) -> dict:
    """Orchestrator over every declared entity (reference:
    rehash_all_rdv_entities.sql:139-166 loops hubs -> links -> sats)."""
    return {s.table: rehash_table(store, s, g) for s in specs}


def clean_up_pit(store: ParquetStore, pit_name: str, snapshot_df: DataFrame,
                 g: GlobalConfig = DEFAULT,
                 snapshot_trigger_column: str | None = None) -> int:
    """DELETE FROM pit WHERE sdts NOT IN (active snapshot sdts).

    ``snapshot_df``: the control_snap_v1 relation; rows where the
    trigger column is true define the active set. Returns rows deleted.
    With Delta this would be ``DeltaTable.delete``; on the parquet store
    it is the same anti-filter + atomic rewrite.
    """
    trigger = snapshot_trigger_column or g.snapshot_trigger_column
    active = {r[0] for r in
              snapshot_df.filter(F.col(trigger))
              .select(g.sdts_alias).distinct().collect()}
    if not active:
        # An empty active set means a misconfigured trigger or an empty
        # control table — deleting "everything not in {}" would silently
        # drop the whole PIT. Refuse instead.
        raise ValueError(
            f"clean_up_pit({pit_name}): no active snapshots under "
            f"trigger column {trigger!r}; refusing to delete all rows")
    # Fast path: a PIT stored hive-partitioned by sdts (see
    # ParquetStore.append(partition_by=...)) — every row of a partition
    # shares its sdts, so the DELETE is whole-partition by construction
    # and becomes a metadata-only directory drop: no scan, no rewrite,
    # O(#snapshots) regardless of PIT size. This is the 100 TB path.
    parts = store.partitions(pit_name, g.sdts_alias)
    if parts:
        active_strs = {_ts_partition_str(a) for a in active}
        stale = [d for d in parts if _ts_partition_str(d) not in active_strs]
        before = store.read(pit_name).count()
        store.drop_partitions(pit_name, g.sdts_alias, stale)
        return before - store.read(pit_name).count()
    pit = store.read(pit_name)
    before = pit.count()
    store.delete_where(pit_name, ~F.col(g.sdts_alias).isin(active))
    return before - store.read(pit_name).count()


def _ts_partition_str(v) -> str:
    """Canonical comparison string for a snapshot timestamp: Python
    datetimes stringify as 'YYYY-MM-DD HH:MM:SS[.ffffff]' while hive
    partition values drop trailing fractional zeros — normalize both by
    trimming the fraction's trailing zeros."""
    s = str(v)
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s
