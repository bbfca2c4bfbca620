"""Native streaming deduplication (the eighth driver gate,
streaming/dropdup.py): dropDuplicatesWithinWatermark must drop a
byte-identical duplicate whether it arrives in the SAME micro-batch
epoch as its original or is re-delivered an epoch LATER (the
at-least-once replay shape — a cross-epoch state-store probe, not an
in-batch distinct), and must never drop a fresh key. The entity-level
oracle parity (stream result == base projection) runs in
tests/test_oracle_parity.py; these tests pin the operator mechanics
on a golden hand-staged arrival sequence."""

import glob
import os
import shutil

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.slow

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")

_SCHEMA = "event_id long, ts timestamp, user_id long"


def _stage(spark, src, rows_per_batch):
    """Write each row-list as one ordered single-file arrival."""
    os.makedirs(src, exist_ok=True)
    for k, rows in enumerate(rows_per_batch):
        df = spark.createDataFrame(rows, _SCHEMA)
        tmp = f"{src}.__b{k}__"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.replace(part, f"{src}/batch_{k}.parquet")
        os.utime(f"{src}/batch_{k}.parquet",
                 (1_700_000_000 + 100 * k,) * 2)
        shutil.rmtree(tmp, ignore_errors=True)


def _run_dedup(spark, src, out, ckpt, watermark="40 days"):
    stream = (spark.readStream.schema(_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withWatermark("ts", watermark)
              .dropDuplicatesWithinWatermark(["event_id"]))
    q = (stream.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    assert q.exception() is None
    return sorted((r.event_id, str(r.ts), r.user_id)
                  for r in spark.read.parquet(out).collect())


def test_same_epoch_and_cross_epoch_duplicates_emit_exactly_once(
        spark, tmp_path):
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    r1 = (1, t, 10)
    r2 = (2, t + dt.timedelta(hours=1), 20)
    r3 = (3, t + dt.timedelta(hours=2), 30)
    src = str(tmp_path / "arrivals")
    # epoch 0: key 1 twice (same-batch dup); epoch 1: key 2 fresh plus
    # key 1 re-delivered (cross-epoch replay — the state-store probe);
    # epoch 2: key 3 fresh plus keys 1 AND 2 re-delivered again
    _stage(spark, src, [[r1, r1], [r2, r1], [r3, r1, r2]])
    got = _run_dedup(spark, src, str(tmp_path / "out"),
                     str(tmp_path / "ckpt"))
    assert got == sorted((i, str(ts), u) for i, ts, u in (r1, r2, r3))


def test_fresh_keys_with_identical_payloads_all_survive(spark, tmp_path):
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    # same ts/user payload, three DIFFERENT keys across epochs — dedup
    # is keyed on event_id alone, so all three must be emitted
    rows = [(1, t, 10), (2, t, 10), (3, t, 10)]
    src = str(tmp_path / "arrivals")
    _stage(spark, src, [[rows[0]], [rows[1]], [rows[2]]])
    got = _run_dedup(spark, src, str(tmp_path / "out"),
                     str(tmp_path / "ckpt"))
    assert got == sorted((i, str(ts), u) for i, ts, u in rows)


def test_null_business_key_fails_loudly_at_staging(spark):
    from datavault4dbt_spark.context import Registry
    from datavault4dbt_spark.streaming.dropdup import (
        StreamingDropDupEntityConfig, build_streaming_dropdup)

    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    broken = base.withColumn(
        "event_id",
        F.when(F.col("event_id") % 97 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("event_id")))
    reg = Registry()
    reg.register("events", lambda s, d=broken: d, "events")
    with pytest.raises(ValueError, match="NULL event_id"):
        build_streaming_dropdup(
            spark, reg, StreamingDropDupEntityConfig("x"))
