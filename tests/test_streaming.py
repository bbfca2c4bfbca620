"""Streaming ingestion: file-stream -> foreachBatch -> hub/nh_sat loads
must equal the one-shot batch load (idempotent insert-only pattern),
and replaying a batch must insert nothing."""

import os

import pytest

from conftest import SF_DIR

from datavault4dbt_spark import fixtures
from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.operators.stage import build_stage
from datavault4dbt_spark.operators.hub import build_hub
from datavault4dbt_spark.operators.nh import build_nh_sat
from datavault4dbt_spark.plans.incremental import ParquetStore
from datavault4dbt_spark.streaming.ingest import (
    StreamIngestConfig, start_ingest, micro_batch_loader,
    windowed_event_counts)


@pytest.fixture(scope="module")
def event_batches(tmp_path_factory):
    """Split the events table into 3 arriving files by TIME range —
    realistic arrival order, so watermark-based ops drop nothing."""
    import duckdb
    root = tmp_path_factory.mktemp("stream_src")
    con = duckdb.connect()
    lo, hi = con.execute(
        f"SELECT min(ts), max(ts) FROM '{SF_DIR}/events.parquet'").fetchone()
    span = (hi - lo) / 3
    for i in range(3):
        cond = (f"ts >= TIMESTAMP '{lo + i * span}' AND "
                + (f"ts < TIMESTAMP '{lo + (i + 1) * span}'" if i < 2 else "TRUE"))
        con.execute(
            f"COPY (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) "
            f"FROM '{SF_DIR}/events.parquet' WHERE {cond}) "
            f"TO '{root}/batch_{i}.parquet' (FORMAT PARQUET)")
    return str(root)


def _ingest_cfg():
    return StreamIngestConfig(
        source_dir="",  # filled per test
        source_name="events",
        stage=fixtures.STAGES["stage_events"],
        hubs=(fixtures.HUBS["hub_user"],),
        nh_sats=(fixtures.NH_SATS["nh_sat_user_event"],),
        max_files_per_trigger=1)


def test_stream_equals_batch(spark, sf_dir, event_batches, tmp_path):
    fixtures.ensure_session_conf(spark)
    cfg = _ingest_cfg()
    cfg = type(cfg)(**{**cfg.__dict__, "source_dir": event_batches})
    store = ParquetStore(spark, str(tmp_path / "vault"))
    schema = spark.read.parquet(event_batches).schema

    q = start_ingest(spark, cfg, store, schema,
                     str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)

    # batch reference: the fixtures' registry (full-load semantics)
    reg = fixtures.registry(spark, sf_dir)
    want_hub = {tuple(r) for r in
                reg.load(spark, "hub_user").select("hk_user_h").collect()}
    got_hub = {tuple(r) for r in
               store.read("hub_user").select("hk_user_h").collect()}
    assert got_hub == want_hub

    want_sat = reg.load(spark, "nh_sat_user_event").count()
    got_sat = store.read("nh_sat_user_event").count()
    assert got_sat == want_sat


def test_replay_inserts_nothing(spark, event_batches, tmp_path):
    fixtures.ensure_session_conf(spark)
    cfg = _ingest_cfg()
    cfg = type(cfg)(**{**cfg.__dict__, "source_dir": event_batches})
    store = ParquetStore(spark, str(tmp_path / "vault"))
    batch = spark.read.parquet(f"{event_batches}/batch_0.parquet")
    loader = micro_batch_loader(cfg, store)
    loader(batch, 0)
    n1 = store.read("hub_user").count(), store.read("nh_sat_user_event").count()
    loader(batch, 1)   # at-least-once replay
    n2 = store.read("hub_user").count(), store.read("nh_sat_user_event").count()
    assert n1 == n2


def test_windowed_counts_stream_matches_batch(spark, event_batches, tmp_path):
    fixtures.ensure_session_conf(spark)
    schema = spark.read.parquet(event_batches).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(event_batches))
    agg = windowed_event_counts(stream)
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt_win")).start())
    q.awaitTermination(300)
    got = spark.table("win_counts")
    want = windowed_event_counts(spark.read.parquet(event_batches))
    # append mode only emits windows closed by the watermark; every
    # emitted row must match the batch computation exactly
    w = {tuple(map(str, r)) for r in want.collect()}
    g = {tuple(map(str, r)) for r in got.collect()}
    assert g <= w
    assert len(g) > 0


def test_streaming_exact_dedup_matches_batch(spark, event_batches, tmp_path):
    """Streamed horizon-dedup over arriving files (including a full
    duplicate file) must keep exactly one row per content hash — the
    same set a batch dedup of the union produces."""
    import shutil
    from pyspark.sql import functions as F
    from datavault4dbt_spark.streaming.dedup import streaming_exact_dedup

    fixtures.ensure_session_conf(spark)
    src = str(tmp_path / "dup_src")
    shutil.copytree(event_batches, src)
    shutil.copy(os.path.join(src, "batch_0.parquet"),
                os.path.join(src, "batch_0_replay.parquet"))

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    # horizon larger than the data's time span -> exact global dedup
    deduped = streaming_exact_dedup(stream, "props", "ts",
                                    watermark="3650 days")
    q = (deduped.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
         .start())
    q.awaitTermination(120)

    got = spark.sql("SELECT content_hash FROM dedup_out").collect()
    hashes = [r.content_hash for r in got]
    want = (spark.read.parquet(src)
            .select(F.md5(F.col("props").cast("string")).alias("h"))
            .distinct().count())
    assert len(hashes) == len(set(hashes)) == want
