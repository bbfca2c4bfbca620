"""Streaming OHLC (streaming/ohlc.py): the foreachBatch twin must
produce the identical bars as the batch operator on the same events —
both run the shared partial/merge/finalize core — and replaying a
micro-batch must be a no-op (partition-overwrite bookkeeping)."""

import pytest

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.operators.events import (OhlcBarsConfig,
                                                  build_ohlc_bars)
from datavault4dbt_spark.plans.incremental import ParquetStore
from datavault4dbt_spark.streaming.ohlc import (micro_batch_ohlc,
                                                read_ohlc_bars,
                                                start_ohlc_stream)

pytestmark = pytest.mark.slow

CFG = OhlcBarsConfig("ohlc_s", source="events", bar_seconds=3600)


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """The sf0.001 events staged as 3 arriving parquet files."""
    import time
    root = tmp_path_factory.mktemp("ohlc_stream_src")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts",
                    "event_type", "value")
    for b in range(3):
        (ev.filter(f"event_id % 3 = {b}").coalesce(1)
         .write.parquet(f"{root}/batch_{b}"))
        time.sleep(0.05)
    return str(root)


def _bars(df):
    return {(r["event_type"], r["bar"]):
            (r["n_events"], r["sum_cents"], r["low_cents"],
             r["high_cents"], r["open_cents"], r["close_cents"],
             r["bar_start"])
            for r in df.collect()}


def test_stream_equals_batch_bars(spark, tmp_path, event_files):
    store = ParquetStore(spark, str(tmp_path / "store"))
    schema = spark.read.parquet(f"{event_files}/batch_0").schema
    q = start_ohlc_stream(spark, CFG, store, event_files + "/*", schema,
                          str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = _bars(read_ohlc_bars(CFG, store))

    reg = Registry()
    full = spark.read.parquet(event_files + "/*/*.parquet")
    reg.spark_loaders["events"] = lambda _s: full
    want = _bars(build_ohlc_bars(spark, reg, CFG))
    assert got == want
    assert len(got) > 10


def test_replayed_micro_batch_is_noop(spark, tmp_path, event_files):
    store = ParquetStore(spark, str(tmp_path / "store2"))
    fold = micro_batch_ohlc(CFG, store)
    b0 = spark.read.parquet(f"{event_files}/batch_0")
    b1 = spark.read.parquet(f"{event_files}/batch_1")
    fold(b0, 0)
    fold(b1, 1)
    once = _bars(read_ohlc_bars(CFG, store))
    fold(b1, 1)                      # epoch replay
    assert _bars(read_ohlc_bars(CFG, store)) == once
