"""Bucketed materialization: shuffle-free co-located joins at scale.

The vault's hot joins all key on a hash key — hub↔satellite anti-join
inserts, PIT equi+range probes, eff-sat presence checks. At 100 TB each
of those is a shuffle of both sides on every load unless the tables are
*pre-partitioned on disk by the join key*. Spark's native answer is
bucketing (``DataFrameWriter.bucketBy`` + ``saveAsTable``): each table
is written as ``n_buckets`` files hash-partitioned by the key, the
bucketing is recorded in the catalog, and a join of two tables bucketed
on the same key with the same bucket count compiles to a SortMergeJoin
with ZERO Exchange on either side — the shuffle happened once, at write
time, and is amortized over every subsequent load.

This is engine capability the reference cannot express: its warehouses
(reference: macros/tables/databricks/hub.sql materialized incremental
tables) leave physical co-location to the platform. Here it is a
first-class storage option beside ``ParquetStore``/``DeltaStore`` —
catalog-backed because Spark only tracks bucketing through the
catalog, not through bare parquet paths — and implements the same
store protocol (read/exists/append/overwrite), so ``run_pipeline`` can
materialize a whole vault bucketed by passing a BucketedVault as the
store (``tests/test_bucketing.py`` drives that end-to-end).

Sizing rule at scale: pick ``n_buckets`` so a bucket of the LARGEST
bucketed table fits an executor's shuffle-free sort (~100-500 MB);
all tables that join each other must share the bucket count, so size
for the satellite (biggest), not the hub.

Spark enforces bucket-spec consistency when a CONFLICTING spec is
specified: appending with a different bucket count or columns to an
existing bucketed table raises. An append that specifies NO bucketing
adopts the catalog table's recorded spec (it does not corrupt the
layout, but it also does not error) — keep one bucket_cols map per
database so every writer declares the same intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class BucketedVault:
    """Catalog-backed store writing tables bucketed by their join key.

    ``bucket_cols`` maps entity name -> tuple of bucket columns; every
    mapped entity is also sortBy'd on those columns (sorted buckets let
    the join skip its per-bucket sort). Unmapped entities write as
    plain catalog tables — the store protocol stays total, so a
    pipeline can bucket just its hubs/sats and leave spines alone.
    """

    # delete_where is a filter + overwrite here (no per-commit metrics)
    DELETE_RETURNS_METRICS = False

    def __init__(self, spark, database: str, location: str,
                 n_buckets: int = 16, bucket_cols: dict | None = None):
        self.spark = spark
        self.database = database
        self.n_buckets = n_buckets
        self.bucket_cols = dict(bucket_cols or {})
        loc = location.replace("'", "''")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} "
                  f"LOCATION '{loc}'")

    def _qualified(self, name: str) -> str:
        return f"{self.database}.{name}"

    def repair(self, name: str):
        """Explicit crash recovery for `overwrite`'s two-rename swap
        (the same protocol as ParquetStore.repair, lifted to catalog
        tables): if a crash landed between RENAME(final -> old) and
        RENAME(tmp -> final), the committed copy survives as
        `<name>__old` — restore it. A leftover `<name>__tmp` (crash
        mid-write or pre-swap) is dropped: the swap never started, so
        final/old still hold the data. Only writers call this
        (overwrite() self-heals); read()/exists() never write to the
        catalog (round-6 advice: a reader that recovered here could
        drop a concurrent writer's in-flight __tmp staging table, or
        restore __old over a completing swap and strand its data)."""
        q = self._qualified(name)
        cat = self.spark.catalog
        if not cat.tableExists(q) and cat.tableExists(q + "__old"):
            self.spark.sql(f"ALTER TABLE {q}__old RENAME TO {q}")
        self.spark.sql(f"DROP TABLE IF EXISTS {q}__tmp")

    def _check_recovered(self, name: str):
        from .incremental import StoreRecoveryNeeded
        q = self._qualified(name)
        cat = self.spark.catalog
        if not cat.tableExists(q) and cat.tableExists(q + "__old"):
            raise StoreRecoveryNeeded(
                f"{q} missing with committed copy in {q}__old — "
                f"call repair({name!r}) or rerun the overwrite")

    def exists(self, name: str) -> bool:
        """Read-only on the catalog; raises StoreRecoveryNeeded in the
        crash window rather than answering False (False would demote
        the next load to an initial load and discard history)."""
        self._check_recovered(name)
        return self.spark.catalog.tableExists(self._qualified(name))

    def read(self, name: str) -> DataFrame:
        self._check_recovered(name)
        return self.spark.table(self._qualified(name))

    def _writer(self, df: DataFrame, name: str, mode: str):
        """``name`` is the LOGICAL table (bucket-spec lookup key) — the
        writer may target a staging table under a different physical
        name but must carry the logical table's bucketing."""
        w = df.write.mode(mode).format("parquet")
        cols = self.bucket_cols.get(name)
        if cols:
            w = w.bucketBy(self.n_buckets, *cols).sortBy(*cols)
        return w

    def append(self, name: str, df: DataFrame, partition_by: tuple = ()):
        """Insert-only append; ``partition_by`` composes with bucketing
        (hive partitions outer, buckets inner) like any Spark table.
        Checks the overwrite crash window first — an unchecked append
        there recreates the table with only the new rows and strands
        the committed copy in `__old` (see ParquetStore.append)."""
        self._check_recovered(name)
        w = self._writer(df, name, "append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.saveAsTable(self._qualified(name))

    def overwrite(self, name: str, df: DataFrame, partition_by: tuple = ()):
        """Full replace, staged through a temp catalog table and swapped
        in with two metadata-only RENAMEs (round-5 advice closed both
        earlier caveats):

        - no data-loss window: the new data is fully committed to
          ``<name>__tmp`` BEFORE the live table is touched, and the old
          data survives as ``<name>__old`` until the swap completes —
          a crash at any point leaves a committed copy that the next
          overwrite (or explicit ``repair``) restores (the earlier
          localCheckpoint staging could lose the old table if an
          executor holding checkpoint blocks died after the drop);
        - near-reader-atomic: the unavailable window shrinks from the
          whole distributed rewrite to the two catalog RENAMEs
          (metadata-only). A racing read in that sliver sees
          table-not-found or a transient StoreRecoveryNeeded and
          succeeds on retry; full atomicity needs a transactional
          format (DeltaStore.overwrite).

        Writing to the temp name also means the plan may freely READ
        the table being replaced — no checkpoint materialization
        needed. The temp table carries the LOGICAL table's bucket spec,
        which the RENAME preserves, so the no-Exchange join property
        holds across overwrites (pinned in tests/test_bucketing.py)."""
        q = self._qualified(name)
        self.repair(name)   # writers self-heal any prior crash state
        self.spark.sql(f"DROP TABLE IF EXISTS {q}__tmp")
        w = self._writer(df, name, "overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.saveAsTable(q + "__tmp")
        self.spark.sql(f"DROP TABLE IF EXISTS {q}__old")
        if self.spark.catalog.tableExists(q):
            self.spark.sql(f"ALTER TABLE {q} RENAME TO {q}__old")
        self.spark.sql(f"ALTER TABLE {q}__tmp RENAME TO {q}")
        self.spark.sql(f"DROP TABLE IF EXISTS {q}__old")

    # -- maintenance protocol: rewrite-path only ----------------------
    # No hive directory layout exists under the catalog's control, so
    # the partition fast path never applies: clean_up_pit sees no
    # partitions and takes its rewrite path through delete_where.
    def partitions(self, name: str, col: str) -> dict:
        return {}

    def has_flat_files(self, name: str) -> bool:
        return True

    def delete_where(self, name: str, condition) -> int | None:
        """DELETE by filter + overwrite (NULL conditions keep rows,
        matching SQL DELETE — same contract as ParquetStore)."""
        keep = ~F.coalesce(condition, F.lit(False))
        self.overwrite(name, self.read(name).filter(keep))
        return None

    def drop(self, name: str):
        self.spark.sql(f"DROP TABLE IF EXISTS {self._qualified(name)}")
