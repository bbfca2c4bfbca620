"""Streaming as-of state join (streaming/asof.py): micro-batched
stream-static enrichment must equal the one-shot batch as-of join —
the static right side makes every event's match independent of other
stream rows, so splitting the stream can change nothing."""

import os

import pytest

from datavault4dbt_spark.context import DEFAULT
from datavault4dbt_spark.operators.asof import (
    AsofJoinConfig, asof_join_frames)
from datavault4dbt_spark.streaming.asof import start_asof_state_join

pytestmark = pytest.mark.slow

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def event_files(tmp_path_factory):
    import duckdb
    root = tmp_path_factory.mktemp("asof_stream_src")
    con = duckdb.connect()
    lo, hi = con.execute(
        f"SELECT min(ts), max(ts) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()
    span = (hi - lo) / 3
    for i in range(3):
        cond = (f"ts >= TIMESTAMP '{lo + i * span}' AND "
                + (f"ts < TIMESTAMP '{lo + (i + 1) * span}'"
                   if i < 2 else "TRUE"))
        con.execute(
            f"COPY (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) "
            f"FROM '{SF_DIR}/events.parquet' WHERE {cond}) "
            f"TO '{root}/batch_{i}.parquet' (FORMAT PARQUET)")
    return str(root)


def test_streaming_asof_equals_batch(spark, event_files, tmp_path):
    cfg = AsofJoinConfig(
        "s", strict=True,
        left_cols=("event_id", "user_id", "ts", "event_type"))
    all_events = spark.read.parquet(event_files)
    state = all_events.filter("event_type = 'click'")

    want = sorted(map(tuple, asof_join_frames(
        all_events, state, cfg).collect()))

    schema = all_events.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(event_files))
    got_rows = []
    q = start_asof_state_join(
        stream, state, cfg,
        sink=lambda df: got_rows.extend(map(tuple, df.collect())),
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert sorted(got_rows) == want
    # every micro-batch contributed (3 files, maxFilesPerTrigger=1)
    assert len(got_rows) == all_events.count()
