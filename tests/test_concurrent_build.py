"""Round-12 optimization pins: pooled bundle construction and
AQE-clustered store writes.

Bundle member CONSTRUCTION runs from a thread pool (operators/bundle.py
_pooled_loads, guide §2.6) — these tests pin the two invariants that
make that safe and worthwhile: the registry builds every name exactly
once under concurrency (store-backed loaders run jobs against their
scratch path while building, so a duplicated build would race the
store), and the pooled union preserves declared member order (the
driver hashes the bundle result; a reordered union would still hash
equal, but the PLAN must stay byte-identical to the serial build so
plan pins hold).

Store writes through ``rebalance_for_write`` must bound the per-
partition file fanout — the store loops re-read their tables every
batch, so tiny-file fanout multiplies across the loop (guide §6).
"""

import os
import threading

import pytest

from datavault4dbt_spark.context import Registry


def test_registry_builds_each_name_exactly_once_under_concurrency(spark):
    calls = []
    barrier = threading.Barrier(8, timeout=30)

    def loader(s):
        calls.append(threading.get_ident())
        return s.range(3)

    reg = Registry()
    reg.spark_loaders["x"] = loader

    def hit():
        barrier.wait()
        return reg.load(spark, "x")

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1, (
        f"loader ran {len(calls)} times under 8 concurrent loads — "
        f"store-backed builders would race their scratch directory")


def test_registry_load_reentrant_for_dependencies(spark):
    """A loader recursing into load() for a dependency (every vault
    entity does) must not deadlock against the per-name build locks."""
    reg = Registry()
    reg.spark_loaders["dep"] = lambda s: s.range(2)
    reg.spark_loaders["top"] = lambda s: reg.load(s, "dep").selectExpr(
        "id * 2 AS id")
    assert reg.load(spark, "top").count() == 2


def test_pooled_bundle_matches_serial_union_order(spark):
    from datavault4dbt_spark.operators.bundle import (
        BundleConfig, BundleMember, build_bundle)

    reg = Registry()
    for i, name in enumerate(("alpha", "beta", "gamma")):
        reg.spark_loaders[name] = (
            lambda s, k=i: s.range(2).selectExpr(
                f"CAST(id + {k * 10} AS STRING) AS hk",
                "'d' AS hd",
                "TIMESTAMP '2024-01-01 00:00:00' AS ldts",
                "'t' AS rsrc"))
    cfg = BundleConfig("b", tuple(
        BundleMember(n, "hk", "hd") for n in ("alpha", "beta", "gamma")))
    out = build_bundle(spark, reg, cfg)
    # declared order preserved: the union's entity column follows the
    # member list, proving pool.map kept construction order
    got = [r.entity for r in out.select("entity").collect()]
    assert got == sorted(got, key=("alpha", "beta", "gamma").index)
    assert out.count() == 6


def test_rebalance_for_write_bounds_partition_fanout(spark, tmp_path):
    from pyspark.sql import functions as F

    from datavault4dbt_spark.plans.incremental import (
        ParquetStore, rebalance_for_write)

    store = ParquetStore(spark, str(tmp_path))
    df = (spark.range(1000).repartition(8)
          .withColumn("k", (F.col("id") % 3).cast("int")))
    store.append("t", rebalance_for_write(df, "k"), partition_by=("k",))
    files = [os.path.join(base, f)
             for base, _d, fs in os.walk(store.path("t"))
             for f in fs if f.endswith(".parquet")]
    # without clustering: up to 8 tasks x 3 values = 24 files; with the
    # AQE-sized rebalance each tiny partition value lands in one file
    assert len(files) <= 3, files
    assert store.read("t").count() == 1000
