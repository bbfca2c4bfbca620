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
catalog, not through bare parquet paths.

Sizing rule at scale: pick ``n_buckets`` so a bucket of the LARGEST
bucketed table fits an executor's shuffle-free sort (~100-500 MB);
all tables that join each other must share the bucket count, so size
for the satellite (biggest), not the hub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class BucketedVault:
    """Catalog-backed store writing every table bucketed by its join key.

    Mirrors the ``ParquetStore`` read/append surface closely enough for
    entity loads (read / exists / append), but appends must declare the
    bucket key on first write; subsequent appends reuse the recorded
    bucketing (Spark enforces consistency).
    """

    def __init__(self, spark, database: str, location: str,
                 n_buckets: int = 16):
        self.spark = spark
        self.database = database
        self.n_buckets = n_buckets
        loc = location.replace("'", "''")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} "
                  f"LOCATION '{loc}'")

    def _qualified(self, name: str) -> str:
        return f"{self.database}.{name}"

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._qualified(name))

    def read(self, name: str) -> DataFrame:
        return self.spark.table(self._qualified(name))

    def append(self, name: str, df: DataFrame, bucket_cols=("hk",),
               sort_cols=()):
        """Insert-only append, bucketed by the join key. Sorting within
        buckets (``sort_cols``) additionally lets the join skip its
        per-bucket sort when both sides are sorted the same way."""
        w = (df.write.mode("append").format("parquet")
             .bucketBy(self.n_buckets, *bucket_cols))
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.saveAsTable(self._qualified(name))

    def drop(self, name: str):
        self.spark.sql(f"DROP TABLE IF EXISTS {self._qualified(name)}")
