"""Hopping-window parity: the driver-gated batch operator
(operators.events.build_hopping_agg) must compute the same windows a
STREAM computes with the identical F.window spec — Spark resolves
window() the same way in both modes, and this pins that the batch
operator's width/hop wiring matches what a live query would emit."""

import os

import pytest

from pyspark.sql import functions as F

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.operators.events import (
    HoppingAggConfig, build_hopping_agg)

pytestmark = pytest.mark.slow

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")


def test_streaming_hopping_windows_equal_batch_operator(spark, tmp_path):
    import duckdb
    src = str(tmp_path / "events_src")
    os.makedirs(src)
    duckdb.connect().execute(
        f"COPY (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) "
        f"FROM '{SF_DIR}/events.parquet') "
        f"TO '{src}/batch_0.parquet' (FORMAT PARQUET)")
    events = spark.read.parquet(src)
    reg = Registry()
    reg.register("events", lambda s, d=events: d, "events")
    cfg = HoppingAggConfig("h", width_seconds=3600, hop_seconds=900)
    want = sorted(map(tuple, build_hopping_agg(
        spark, reg, cfg, DEFAULT).collect()))

    stream = (spark.readStream.schema(events.schema).parquet(src)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withWatermark("ts", "2 hours"))
    agg = (stream.groupBy(
        F.window("ts", "3600 seconds", "900 seconds").alias("w"),
        "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
             .alias("sum_value_cents"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value_cents"))
    q = (agg.writeStream.format("memory").queryName("hop_parity")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple,
                     spark.sql("SELECT * FROM hop_parity").collect()))
    assert got == want


def test_append_mode_sentinel_flushes_all_real_windows(spark, tmp_path):
    """The seventh driver gate's core mechanic: APPEND mode only emits
    a window once the watermark passes its end, so a far-future
    sentinel arrival must flush every real window exactly once while
    the sentinel's own windows stay open and unemitted."""
    import datetime

    TS = datetime.datetime.fromisoformat
    rows = [(TS("2024-01-01 10:05:00"), "view", 1.0),
            (TS("2024-01-01 10:20:00"), "view", 2.0),
            (TS("2024-01-01 11:40:00"), "click", 3.0)]
    src = str(tmp_path / "hop_src")
    os.makedirs(src)
    schema = "ts TIMESTAMP, gcol STRING, value DOUBLE"
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(f"{src}.__a__")
    import glob
    import shutil
    part = glob.glob(f"{src}.__a__/part-*.parquet")[0]
    os.replace(part, f"{src}/batch_0.parquet")
    spark.createDataFrame(
        [(TS("2200-01-01 00:00:00"), "__sentinel__", 0.0)], schema) \
        .coalesce(1).write.mode("overwrite").parquet(f"{src}.__b__")
    part = glob.glob(f"{src}.__b__/part-*.parquet")[0]
    os.replace(part, f"{src}/batch_1.parquet")
    os.utime(f"{src}/batch_0.parquet", (1_700_000_000,) * 2)
    os.utime(f"{src}/batch_1.parquet", (1_700_000_100,) * 2)
    shutil.rmtree(f"{src}.__a__"); shutil.rmtree(f"{src}.__b__")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withWatermark("ts", "2 hours"))
    agg = (stream.groupBy(
               F.window("ts", "3600 seconds", "1800 seconds").alias("w"),
               "gcol")
           .agg(F.count(F.lit(1)).alias("n"))
           .select(F.col("w.start").alias("ws"), "gcol", "n"))
    out = str(tmp_path / "hop_out")
    q = (agg.writeStream.format("parquet").outputMode("append")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "hop_ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = {(str(r.ws), r.gcol, r.n)
           for r in spark.read.parquet(out).collect()}
    # every real window emitted exactly once, sentinel windows absent
    assert got == {
        ("2024-01-01 09:30:00", "view", 2),
        ("2024-01-01 10:00:00", "view", 2),
        ("2024-01-01 11:00:00", "click", 1),
        ("2024-01-01 11:30:00", "click", 1),
    }, got


def test_scoped_stream_shuffle_sets_restores_and_overrides(spark):
    """The stateful gates' state-store layout scope: default applies
    inside the block, STREAM_SHUFFLE_CONF overrides it, and the
    session's own setting is restored on both clean exit and error —
    a leaked override would silently reshape every later batch plan."""
    from datavault4dbt_spark.streaming.staging import (
        STREAM_SHUFFLE_CONF, scoped_stream_shuffle)

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        with scoped_stream_shuffle(spark, default=5):
            assert spark.conf.get(key) == "5"
        assert spark.conf.get(key) == prev

        spark.conf.set(STREAM_SHUFFLE_CONF, "11")
        try:
            with scoped_stream_shuffle(spark, default=5):
                assert spark.conf.get(key) == "11"
        finally:
            spark.conf.unset(STREAM_SHUFFLE_CONF)
        assert spark.conf.get(key) == prev

        with pytest.raises(RuntimeError, match="boom"):
            with scoped_stream_shuffle(spark, default=5):
                raise RuntimeError("boom")
        assert spark.conf.get(key) == prev
    finally:
        spark.conf.set(key, prev)
