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
