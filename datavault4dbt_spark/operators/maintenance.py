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
from ..functions.hashing import (HashSpec, hash_expr_sql,
                                 ma_hash_window_sql, SPARK)
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
    """DELETE FROM pit WHERE sdts NOT IN (active snapshot sdts)
    (reference: macros/hooks/clean_up_pits.sql:27-38, 128-137).

    ``snapshot_df``: the control_snap_v1 relation; rows where the
    trigger column is true define the active set. Returns rows deleted.
    With Delta this would be ``DeltaTable.delete``; on the parquet store
    it is the same anti-filter + atomic rewrite.
    """
    return _clean_up_by_snapshot(store, pit_name, snapshot_df, g,
                                 snapshot_trigger_column, "clean_up_pit")


def clean_up_bridge(store: ParquetStore, bridge_name: str,
                    snapshot_df: DataFrame, g: GlobalConfig = DEFAULT,
                    snapshot_trigger_column: str | None = None) -> int:
    """clean_up_pit's analogue for bridges (round-7 advice #5): bridge
    rows carry the same per-snapshot sdts grain (operators/bridge.py —
    one row per base key per ACTIVE snapshot, snapshot-extension
    anti-inserts), so retiring a snapshot thins the bridge exactly like
    the PIT — DELETE WHERE sdts NOT IN (active set), whole-partition
    metadata drops on an sdts-partitioned store. Reference:
    macros/hooks/clean_up_pits.sql:27-38 applied to the bridge table
    (the reference documents the hook for PITs and BRIDGEs alike —
    both are snapshot-keyed query-assistant structures)."""
    return _clean_up_by_snapshot(store, bridge_name, snapshot_df, g,
                                 snapshot_trigger_column,
                                 "clean_up_bridge")


def _clean_up_by_snapshot(store: ParquetStore, table: str,
                          snapshot_df: DataFrame, g: GlobalConfig,
                          snapshot_trigger_column: str | None,
                          label: str) -> int:
    trigger = snapshot_trigger_column or g.snapshot_trigger_column
    # Driver-side collect is bounded by the SNAPSHOT SPINE (thousands
    # of rows at most — one per logged snapshot instant), never by the
    # PIT/bridge. Pass the control_snap relation here, not a data table: a
    # high-cardinality sdts source would materialize on the driver.
    active = {r[0] for r in
              snapshot_df.filter(F.col(trigger))
              .select(g.sdts_alias).distinct().collect()}
    if not active:
        # An empty active set means a misconfigured trigger or an empty
        # control table — deleting "everything not in {}" would silently
        # drop the whole table. Refuse instead.
        raise ValueError(
            f"{label}({table}): no active snapshots under "
            f"trigger column {trigger!r}; refusing to delete all rows")
    # Fast path: a PIT stored hive-partitioned by sdts (see
    # ParquetStore.append(partition_by=...)) — every row of a partition
    # shares its sdts, so the DELETE is whole-partition by construction
    # and becomes a metadata-only directory drop: no scan, no rewrite,
    # O(#snapshots) regardless of PIT size. This is the 100 TB path.
    # Guards: (a) a MIXED layout (hive dirs + flat files from an
    # unpartitioned append) must use the rewrite path or flat-file rows
    # would silently survive; (b) if no active value matches any
    # partition string, the match itself is broken (session timezone
    # changed between write and cleanup, sdts type drift) — dropping
    # "everything stale" would then delete the whole table, so refuse.
    parts = store.partitions(table, g.sdts_alias)
    if parts and not store.has_flat_files(table):
        active_strs = {_ts_partition_str(a) for a in active}
        stale = [d for d in parts if _ts_partition_str(d) not in active_strs]
        if len(stale) == len(parts):
            raise ValueError(
                f"{label}({table}): no active snapshot matches "
                f"any sdts partition (tz/type drift between write and "
                f"cleanup?); refusing to drop every partition")
        # deleted-row count from the dropped partitions' parquet footers
        # (metadata-only): the fast path never scans the table itself
        deleted = store.partition_row_count(
            table, [parts[d] for d in stale])
        store.drop_partitions(table, g.sdts_alias, stale)
        return deleted
    # Rewrite path (unpartitioned/mixed parquet layout) — or the native
    # DELETE path on stores whose delete is already targeted (Delta:
    # partition-predicate deletes are metadata-only commits and report
    # numDeletedRows themselves, so no before/after count scans).
    # Same drift guard as the hive fast path: if NO stored row matches
    # any active sdts (session-timezone or timestamp-type drift between
    # write and cleanup), "delete everything stale" means the whole table
    # — refuse. The probe is limit(1) over an sdts-pruned scan, cheap
    # on any backend.
    cond = ~F.col(g.sdts_alias).isin(active)
    if not store.read(table).filter(
            F.col(g.sdts_alias).isin(active)).limit(1).count():
        # distinguish drift (rows exist, none match -> refuse) from a
        # legitimately empty PIT (nothing to clean -> 0, like before
        # the guard existed)
        if not store.read(table).limit(1).count():
            return 0
        raise ValueError(
            f"{label}({table}): no stored row matches any active "
            f"snapshot sdts (tz/type drift between write and cleanup?); "
            f"refusing to delete every row")
    if getattr(store, "DELETE_RETURNS_METRICS", False):
        return store.delete_where(table, cond)
    before = store.read(table).count()
    store.delete_where(table, cond)
    return before - store.read(table).count()


def _ts_partition_str(v) -> str:
    """Canonical comparison string for a snapshot timestamp: Python
    datetimes stringify as 'YYYY-MM-DD HH:MM:SS[.ffffff]' while hive
    partition values drop trailing fractional zeros — normalize both by
    trimming the fraction's trailing zeros."""
    s = str(v)
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


# ------------------------------------------- driver-gated cleanup entity --

@dataclass(frozen=True)
class PitCleanupConfig:
    """Run the clean_up_pit hook END-TO-END under the driver's oracle
    gate (round-8 advice #5): materialize a PIT hive-partitioned on
    sdts, thin the snapshot control table with ``keep_predicate``,
    DELETE through the hook's metadata-only partition-drop fast path,
    and emit the SURVIVING rows — which the oracle computes
    declaratively (``pit WHERE sdts IN (thinned actives)``,
    reference macros/hooks/clean_up_pits.sql:27-49). A green hash
    certifies exactly which rows the DELETE kept; clean_up_bridge
    funnels through the same ``_clean_up_by_snapshot`` core, so the
    certification covers both hooks' shared semantics."""

    name: str
    pit_entity: str
    snapshot_relation: str
    # portable SQL predicate over the snapshot columns: which ACTIVE
    # snapshots survive the thinning (the log_logic retention shape)
    keep_predicate: str = "is_active AND is_beginning_of_week"
    trigger_column: str = "is_active"


def build_pit_cleanup(spark, reg, cfg: PitCleanupConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    import shutil

    from ..plans.incremental import scratch_store

    pit = reg.load(spark, cfg.pit_entity)
    store = scratch_store(spark, cfg.name, prefix="dv4dbt_pitclean")
    shutil.rmtree(store.path("pit"), ignore_errors=True)
    # sdts-partitioned layout: the DELETE below exercises the
    # metadata-only whole-partition drop — the 100 TB path. Cluster by
    # the partition column before the write (guide §6): the PIT plan
    # ends hash-distributed on its dedup keys, so a direct partitionBy
    # write emits up to tasks x snapshots tiny files, which the
    # cleanup's footer census and the surviving-rows read-back then
    # pay for file-by-file; one AQE-sized exchange yields one file per
    # sdts partition at this scale (and advisory-sized files at 100 TB).
    from ..plans.incremental import rebalance_for_write
    store.append("pit", rebalance_for_write(pit, g.sdts_alias),
                 partition_by=(g.sdts_alias,))
    thinned = (reg.load(spark, cfg.snapshot_relation)
               .withColumn(cfg.trigger_column, F.expr(cfg.keep_predicate)))
    clean_up_pit(store, "pit", thinned, g,
                 snapshot_trigger_column=cfg.trigger_column)
    # canonical projection: the hive read appends the partition column
    # last and re-infers its type — restore the PIT's column order and
    # the exact timestamp type
    return store.read("pit").selectExpr(
        *[c if c != g.sdts_alias
          else f"CAST({g.sdts_alias} AS TIMESTAMP) AS {g.sdts_alias}"
          for c in pit.columns])


def pit_cleanup_oracle(b, reg, cfg: PitCleanupConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    pit = reg.duckdb_relation(cfg.pit_entity)
    snap = reg.duckdb_relation(cfg.snapshot_relation)
    return b.cte(
        cfg.name,
        f"SELECT * FROM {pit} WHERE {g.sdts_alias} IN "
        f"(SELECT {g.sdts_alias} FROM {snap} WHERE {cfg.keep_predicate})")


# ------------------------------------------------------ YAML rehash-all --

_DEPRECATED = "_deprecated"


def _naming_mismatches(y: dict) -> list:
    """Validate declared hash column names against the YAML's
    naming_conventions (reference: rehash_all_rdv_entities.sql:20-24 —
    hashkey_syntax / hub_hashkey_syntax / link_hashkey_syntax /
    hashdiff_syntax glob patterns). A name that violates its pattern is
    almost always a column mix-up (hashdiff declared as hashkey etc.) —
    surface it before any table is touched."""
    import fnmatch

    nc = (y.get("config") or {}).get("naming_conventions") or {}
    if not nc:
        return []

    def bad(name, *patterns):
        pats = [p for p in patterns if p]
        if not pats:
            return False
        return not any(fnmatch.fnmatch(name.lower(), p.lower()) for p in pats)

    hk_pat = nc.get("hashkey_syntax")
    hub_pat = nc.get("hub_hashkey_syntax")
    link_pat = nc.get("link_hashkey_syntax")
    hd_pat = nc.get("hashdiff_syntax")
    errs = []
    for h in y.get("hubs") or []:
        if bad(h["hashkey"], hub_pat, hk_pat):
            errs.append(f"hub {h['name']}: hashkey {h['hashkey']!r}")
    for l in y.get("links") or []:
        if bad(l["link_hashkey"], link_pat, hk_pat):
            errs.append(f"link {l['name']}: link_hashkey {l['link_hashkey']!r}")
        for hc in l.get("hub_config") or []:
            if bad(hc["hub_hashkey"], hub_pat, hk_pat):
                errs.append(f"link {l['name']}: hub_hashkey {hc['hub_hashkey']!r}")
    for sect in ("satellites", "ma_satellites", "nh_satellites"):
        for s in y.get(sect) or []:
            if bad(s["hashkey"], hub_pat, link_pat, hk_pat):
                errs.append(f"{sect[:-1]} {s['name']}: hashkey {s['hashkey']!r}")
            if "hashdiff" in s and bad(s["hashdiff"], hd_pat):
                errs.append(f"{sect[:-1]} {s['name']}: hashdiff {s['hashdiff']!r}")
    return errs


def _ghost_mask(g: GlobalConfig):
    """Ghost records keep their existing hash values through a rehash
    (reference: rehash_single_ma_satellite.sql ghost_records CTE —
    CAST(sat.hashkey ..) AS new): they are identified by rsrc."""
    return F.col(g.rsrc_alias).isin(g.default_unknown_rsrc,
                                    g.default_error_rsrc)


def _parent_lookup(parent_df: DataFrame, hashkey: str, extra_cols: tuple,
                   alias: str):
    """(join_key, [new_hashkey], extra business keys) — one row per
    join key (reference: parent_lookup CTE with QUALIFY ROW_NUMBER()=1).
    Joins on <hashkey>_deprecated when the parent is already rehashed
    (its current column then holds the NEW value to copy)."""
    dep = hashkey + _DEPRECATED
    rehashed = dep in parent_df.columns
    join_col = dep if rehashed else hashkey
    sel = [F.col(join_col).alias(f"{alias}__jk")]
    if rehashed:
        sel.append(F.col(hashkey).alias(f"{alias}__new_hk"))
    for c in extra_cols:
        sel.append(F.col(c).alias(f"{alias}__{c}"))
    return parent_df.select(*sel).dropDuplicates([f"{alias}__jk"]), rehashed


def rehash_vault(store: ParquetStore, entity_yaml: str,
                 g: GlobalConfig = DEFAULT,
                 drop_old_values: bool = True,
                 allow_orphans: bool = False) -> dict:
    """Rehash an entire RDV from one YAML document (reference:
    macros/rehashing/rehash_all_rdv_entities.sql:139-166 + the
    databricks single-entity macros): hubs, then links, then
    satellites, ma_satellites, nh_satellites.

    Semantics mirrored from the reference:
    - hubs recompute their hashkey from their own business keys;
    - links join each hub on the hub's OLD hashkey (kept as
      ``_deprecated`` during the pass) to fetch business keys, copy the
      hub's new hashkey, and recompute the link hashkey over all hubs'
      business keys (+ additional_hash_input_cols);
    - satellites copy the parent's new hashkey through the same
      ``_deprecated`` join and recompute their hashdiff from payload;
    - ma_satellites recompute the GROUP hashdiff per (hashkey, ldts)
      over the multi-active key (window form, one shuffle);
    - nh_satellites only re-key;
    - ghost records (rsrc SYSTEM/ERROR) pass their hash values through
      unchanged (ghost_records CTE);
    - old columns survive as ``<col>_deprecated`` until the end of the
      pass, then drop when ``drop_old_values`` (the reference's ALTER
      ... DROP COLUMN loop becomes part of the final rewrite).

    Spark-first: each entity is ONE projection (+ a broadcast-friendly
    parent lookup join for sats) and an atomic table rewrite — no
    ALTER/UPDATE/MERGE machinery, no per-column DDL round-trips.
    Returns {table: [columns dropped (or kept as _deprecated)]}.
    """
    import yaml

    y = yaml.safe_load(entity_yaml)
    errs = _naming_mismatches(y)
    if errs:
        raise ValueError("naming convention violations: " + "; ".join(errs))
    ghost = _ghost_mask(g)
    touched: dict = {}

    def swap(df, col, new_expr):
        """old -> <col>_deprecated, col = new (ghosts keep old)."""
        return (df.withColumnRenamed(col, col + _DEPRECATED)
                .withColumn(col, F.when(ghost, F.col(col + _DEPRECATED))
                            .otherwise(new_expr)))

    # Structural validation BEFORE any table is touched: a mid-pass
    # KeyError would leave the vault half-migrated.
    for link in y.get("links") or []:
        if not link.get("hub_config"):
            raise ValueError(
                f"link {link.get('name')}: hub_config is required")
    for sect in ("satellites", "ma_satellites", "nh_satellites"):
        for s in y.get(sect) or []:
            if not s.get("parent_entity"):
                raise ValueError(
                    f"{sect[:-1]} {s.get('name')}: parent_entity required")

    def check_orphans(df, name, jk_cols):
        """Non-ghost rows whose parent lookup missed would silently get
        hash-of-NULL (the zero-key sentinel) — collapsing distinct rows
        onto one key. Detect and refuse (reference MERGE leaves such
        rows NULL, equally corrupt; here the state is recoverable
        because nothing has been written yet)."""
        if allow_orphans:
            return
        miss = F.lit(False)
        for c in jk_cols:
            miss = miss | F.col(c).isNull()
        if df.filter(~ghost & miss).limit(1).count():
            raise ValueError(
                f"{name}: rows found whose parent join missed (orphan "
                f"rows, or the parent was rehashed in a previous pass so "
                f"its old hashkeys are gone). Fix the parent state or "
                f"pass allow_orphans=True to zero-key them")

    for hub in y.get("hubs") or []:
        name, hk = hub["name"], hub["hashkey"]
        inputs = tuple(hub["business_keys"]) + tuple(
            hub.get("additional_hash_input_cols") or [])
        df = store.read(name)
        new = F.expr(hash_expr_sql(HashSpec(hk, inputs), g, SPARK, alias=False))
        store.overwrite(name, swap(df, hk, new))
        touched[name] = [hk + _DEPRECATED]

    for link in y.get("links") or []:
        name, lhk = link["name"], link["link_hashkey"]
        df = store.read(name)
        bk_exprs = []           # hub_config order, per-hub key order
        hub_new = {}            # hub hashkey col -> new value expr
        tmp_cols = []           # exact generated columns to drop
        jk_cols = []
        for i, hc in enumerate(link["hub_config"]):
            alias = f"__h{i}"
            lookup, rehashed = _parent_lookup(
                store.read(hc["hub_name"]), hc["hub_hashkey"],
                tuple(hc["business_keys"]), alias)
            tmp_cols += [c for c in lookup.columns]
            jk_cols.append(f"{alias}__jk")
            df = df.join(F.broadcast(lookup),
                         df[hc["hub_hashkey"]] == lookup[f"{alias}__jk"],
                         "left")
            pre = [f"{alias}__{c}" for c in hc["business_keys"]]
            bk_exprs += pre
            if rehashed:
                hub_new[hc["hub_hashkey"]] = F.col(f"{alias}__new_hk")
            else:
                hub_new[hc["hub_hashkey"]] = F.expr(hash_expr_sql(
                    HashSpec(hc["hub_hashkey"], tuple(pre)), g, SPARK,
                    alias=False))
        check_orphans(df, name, jk_cols)
        inputs = tuple(bk_exprs) + tuple(
            link.get("additional_hash_input_cols") or [])
        out = swap(df, lhk, F.expr(hash_expr_sql(
            HashSpec(lhk, inputs), g, SPARK, alias=False)))
        dropped = [lhk + _DEPRECATED]
        for hk_col, new in hub_new.items():
            out = swap(out, hk_col, new)
            dropped.append(hk_col + _DEPRECATED)
        out = out.drop(*tmp_cols)
        store.overwrite(name, out)
        touched[name] = dropped

    def rekey(df, s):
        """Copy the parent's new hashkey (or recompute from parent
        business keys when the parent was not part of this rehash)."""
        hk = s["hashkey"]
        parent_df = store.read(s["parent_entity"])
        need_bks = (hk + _DEPRECATED) not in parent_df.columns
        extra = tuple(s.get("business_keys") or []) if need_bks else ()
        lookup, rehashed = _parent_lookup(parent_df, hk, extra, "__p")
        df = df.join(F.broadcast(lookup), df[hk] == lookup["__p__jk"], "left")
        check_orphans(df, s["name"], ["__p__jk"])
        if rehashed:
            new = F.col("__p__new_hk")
        else:
            pre = tuple(f"__p__{c}" for c in s.get("business_keys") or [])
            if not pre:
                raise ValueError(
                    f"{s['name']}: parent {s['parent_entity']} is not "
                    f"rehashed and no business_keys given to recompute")
            new = F.expr(hash_expr_sql(HashSpec(hk, pre), g, SPARK,
                                       alias=False))
        return swap(df, hk, new), hk, list(lookup.columns)

    def finish_leaf(name, df, tmp_cols, dep_cols):
        """Satellites are leaves — nothing downstream joins on their
        _deprecated columns, so when drop_old_values they are dropped in
        the SAME rewrite (satellites dominate vault bytes; a second
        full rewrite just to drop columns would double migration I/O).
        Hubs/links must keep theirs until the end of the pass."""
        df = df.drop(*tmp_cols)
        if drop_old_values:
            df = df.drop(*dep_cols)
        store.overwrite(name, df)
        touched[name] = dep_cols

    for s in y.get("satellites") or []:
        df, hk, tmp = rekey(store.read(s["name"]), s)
        hd = s["hashdiff"]
        spec = HashSpec(hd, tuple(s["payload"]), is_hashdiff=True)
        df = swap(df, hd, F.expr(hash_expr_sql(spec, g, SPARK, alias=False)))
        finish_leaf(s["name"], df, tmp,
                    [hk + _DEPRECATED, hd + _DEPRECATED])

    for s in y.get("ma_satellites") or []:
        df, hk, tmp = rekey(store.read(s["name"]), s)
        hd = s["hashdiff"]
        spec = HashSpec(hd, tuple(s["payload"]), is_hashdiff=True,
                        multi_active_key=tuple(s["ma_keys"]))
        # group hashdiff per (OLD hashkey, ldts) — the window form of the
        # reference's ma_hashdiff_prep GROUP BY (one shuffle, no re-join)
        grp = ma_hash_window_sql(spec, g,
                                 (hk + _DEPRECATED, g.ldts_alias))
        df = swap(df, hd, F.expr(grp))
        finish_leaf(s["name"], df, tmp,
                    [hk + _DEPRECATED, hd + _DEPRECATED])

    for s in y.get("nh_satellites") or []:
        df, hk, tmp = rekey(store.read(s["name"]), s)
        finish_leaf(s["name"], df, tmp, [hk + _DEPRECATED])

    if drop_old_values:
        for name in [h["name"] for h in y.get("hubs") or []] \
                + [l["name"] for l in y.get("links") or []]:
            store.overwrite(name, store.read(name).drop(*touched[name]))
    return touched
