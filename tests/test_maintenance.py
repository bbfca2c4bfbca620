"""Rehashing (recompute-and-overwrite) and clean_up_pit hook."""

import hashlib

import pytest
from pyspark.sql import functions as F

from datavault4dbt_spark import fixtures
from datavault4dbt_spark.context import GlobalConfig
from datavault4dbt_spark.functions.hashing import HashSpec
from datavault4dbt_spark.operators.maintenance import (
    RehashSpec, rehash_frame, rehash_table, clean_up_pit)
from datavault4dbt_spark.plans.incremental import ParquetStore


def test_rehash_hub_to_sha256(spark, sf_dir, tmp_path):
    store = ParquetStore(spark, str(tmp_path))
    hub = fixtures.entity_query("hub_customer")(spark, sf_dir)
    store.overwrite("hub_customer", hub)

    g256 = GlobalConfig(hash="SHA256")
    spec = RehashSpec("hub_customer",
                      (HashSpec("hk_customer_h", ("c_custkey",)),))
    n = rehash_table(store, spec, g256)
    out = store.read("hub_customer")
    assert n == hub.count()

    # independent oracle: the standardised form of a plain integer key
    # is '"<key>"' (trim/escape/replace are all no-ops), hashed with
    # sha256 after the UPPER no-op — computed here with hashlib
    row = out.filter(F.col("c_custkey") == 1).first()
    want = hashlib.sha256(b'"1"').hexdigest()
    assert row.hk_customer_h == want
    # ghost rows keep their zero/error keys out of scope of rehash?
    # no — the reference recomputes every row; zero-key inputs rehash to
    # sha-length digests as well
    assert all(len(r.hk_customer_h) == 64 for r in out.collect())


def test_rehash_keep_old_column(spark, sf_dir, tmp_path):
    hub = fixtures.entity_query("hub_nation")(spark, sf_dir)
    spec = RehashSpec("hub_nation",
                      (HashSpec("hk_nation_h", ("n_nationkey",)),),
                      drop_old=False)
    out = rehash_frame(hub, spec, GlobalConfig(hash="SHA1"))
    assert "hk_nation_h__new" in out.columns and "hk_nation_h" in out.columns
    r = out.filter(F.col("n_nationkey") == 1).first()
    assert r.hk_nation_h == hashlib.md5(b'"1"').hexdigest()
    assert r.hk_nation_h__new == hashlib.sha1(b'"1"').hexdigest()


def test_clean_up_pit(spark, sf_dir, tmp_path):
    store = ParquetStore(spark, str(tmp_path))
    pit = fixtures.entity_query("pit_customer")(spark, sf_dir)
    store.overwrite("pit_customer", pit)
    before = store.read("pit_customer").count()

    # thin the snapshot set: keep only weekly actives
    snap = fixtures.entity_query("control_snap_v1")(spark, sf_dir)
    thinned = snap.withColumn(
        "is_active", F.col("is_active") & F.col("is_beginning_of_week"))
    deleted = clean_up_pit(store, "pit_customer", thinned)
    after = store.read("pit_customer").count()
    assert deleted > 0
    assert after == before - deleted
    # every surviving sdts is in the thinned active set
    active = {r[0] for r in
              thinned.filter("is_active").select("sdts").collect()}
    left = {r[0] for r in
            store.read("pit_customer").select("sdts").distinct().collect()}
    assert left <= active


def test_clean_up_pit_refuses_empty_active_set(spark, sf_dir, tmp_path):
    """An empty active set (misconfigured trigger / empty control table)
    must raise instead of silently deleting the whole PIT."""
    store = ParquetStore(spark, str(tmp_path))
    pit = fixtures.entity_query("pit_customer")(spark, sf_dir)
    store.overwrite("pit_customer", pit)
    before = store.read("pit_customer").count()

    snap = fixtures.entity_query("control_snap_v1")(spark, sf_dir)
    none_active = snap.withColumn("is_active", F.lit(False))
    with pytest.raises(ValueError, match="refusing"):
        clean_up_pit(store, "pit_customer", none_active)
    assert store.read("pit_customer").count() == before


def test_clean_up_pit_partitioned_metadata_only(spark, sf_dir, tmp_path):
    """A PIT stored hive-partitioned by sdts takes the metadata-only
    path: stale snapshots become whole-directory drops (no rewrite),
    and the result matches the rewrite path row-for-row."""
    store = ParquetStore(spark, str(tmp_path))
    pit = fixtures.entity_query("pit_customer")(spark, sf_dir)
    store.append("pit_part", pit, partition_by=("sdts",))
    store.overwrite("pit_flat", pit)
    assert store.partitions("pit_part", "sdts")          # hive layout
    assert not store.partitions("pit_flat", "sdts")      # flat layout

    snap = fixtures.entity_query("control_snap_v1")(spark, sf_dir)
    thinned = snap.withColumn(
        "is_active", F.col("is_active") & F.col("is_beginning_of_week"))
    d_part = clean_up_pit(store, "pit_part", thinned)
    d_flat = clean_up_pit(store, "pit_flat", thinned)
    assert d_part == d_flat > 0
    # identical surviving rows (partition path reads sdts from dir names)
    left_p = sorted(
        tuple(str(r[c]) for c in sorted(pit.columns))
        for r in store.read("pit_part").collect())
    left_f = sorted(
        tuple(str(r[c]) for c in sorted(pit.columns))
        for r in store.read("pit_flat").collect())
    assert left_p == left_f
    # and the dropped partitions are really gone from the filesystem
    active = {r[0] for r in
              thinned.filter("is_active").select("sdts").collect()}
    assert len(store.partitions("pit_part", "sdts")) == len(active)
