"""Streaming SCD1 upsert (streaming/scd1.py): the foreachBatch twin
must produce the identical current-state table as the batch replay
(operators/merge.py) on the same arriving versions — both call the
shared merge_scd1_batch core — and replaying a micro-batch must be a
no-op (SCD1 merge's natural idempotence)."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.operators.merge import (Scd1MergeConfig,
                                                 build_scd1_merge)
from datavault4dbt_spark.plans.incremental import ParquetStore
from datavault4dbt_spark.streaming.scd1 import (micro_batch_scd1,
                                                start_scd1_stream)

pytestmark = pytest.mark.slow

# (key, version, seq, payload): keys recur across versions (updates),
# k3 appears only late (insert), k1 has an in-batch tie at v2
ROWS = [
    ("k1", 0, 1, "k1-v0"), ("k2", 0, 1, "k2-v0"),
    ("k1", 1, 1, "k1-v1"),
    ("k1", 2, 1, "k1-v2-low"), ("k1", 2, 9, "k1-v2-high"),
    ("k3", 2, 1, "k3-v2"),
]

CFG = Scd1MergeConfig("scd1s", "t", key_cols=("k",), version_expr="v",
                      tie_cols=("seq",), payload_cols=("p",))

EXPECTED = {"k1": (2, 9, "k1-v2-high"), "k2": (0, 1, "k2-v0"),
            "k3": (2, 1, "k3-v2")}


@pytest.fixture(scope="module")
def version_files(tmp_path_factory):
    """Versions staged as 3 arriving parquet files in version order."""
    import time
    import pandas as pd
    root = tmp_path_factory.mktemp("scd1_stream_src")
    for v in range(3):
        batch = [r for r in ROWS if r[1] == v]
        pd.DataFrame({
            "k": [r[0] for r in batch],
            "v": pd.array([r[1] for r in batch], dtype="int32"),
            "seq": pd.array([r[2] for r in batch], dtype="int32"),
            "p": [r[3] for r in batch],
        }).to_parquet(f"{root}/batch_{v}.parquet")
        time.sleep(0.05)
    return str(root)


def _current(store):
    return {r["k"]: (r["version_seq"], r["seq"], r["p"])
            for r in store.read("current").collect()}


def test_stream_equals_batch_merge(spark, tmp_path, version_files):
    store = ParquetStore(spark, str(tmp_path / "store"))
    schema = spark.read.parquet(version_files).schema
    q = start_scd1_stream(spark, CFG, store, version_files, schema,
                          str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    assert _current(store) == EXPECTED

    # batch replay over the same rows through build_scd1_merge
    reg = Registry()
    reg.register("t", lambda s: s.read.parquet(version_files), "t")
    got = {r["k"]: (r["version_seq"], r["seq"], r["p"])
           for r in build_scd1_merge(spark, reg, CFG).collect()}
    assert got == EXPECTED


def test_epoch_replay_is_noop(spark, tmp_path, version_files):
    """Re-delivering a processed micro-batch must leave the table
    unchanged — merge's latest-wins on identical input is idempotent,
    the property that lets the stream run without epoch bookkeeping."""
    store = ParquetStore(spark, str(tmp_path / "store2"))
    df = spark.read.parquet(version_files)
    cb = micro_batch_scd1(CFG, store)
    cb(df, 0)
    first = _current(store)
    assert first == EXPECTED
    cb(df, 0)   # replay the whole delivery
    assert _current(store) == first


def test_multi_version_micro_batch_orders_versions(spark, tmp_path,
                                                   version_files):
    """All versions arriving in ONE micro-batch must upsert in
    ascending version order (same final state as one-at-a-time)."""
    store = ParquetStore(spark, str(tmp_path / "store3"))
    # shuffle row order so version order cannot come from the file
    df = spark.read.parquet(version_files).orderBy("p")
    micro_batch_scd1(CFG, store)(df, 0)
    assert _current(store) == EXPECTED
