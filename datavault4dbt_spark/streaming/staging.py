"""Arrival-file staging for the driver-gated streaming entities.

A driver entity must SIMULATE arrival (a production stream watches a
directory someone else fills): the input frame is written as K
single-file parquet arrivals with strictly increasing mtimes, so a
file stream with maxFilesPerTrigger=1 delivers them as micro-batch
epochs 0..K-1 in declared order. Each frame is written DISTRIBUTED to
a sibling dir and its single output file renamed into the watched dir
— the driver never holds row data. Shared by streaming/incdedup.py's
shape, streaming/stateful.py (time-range batches + sentinel) and
streaming/ohlc.py (id-range batches).
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from contextlib import contextmanager

# Session conf key a deployment sets to size the streaming state/shuffle
# layout explicitly (e.g. 2000 on a 1000-executor cluster); tests use it
# to pin partition-count invariance of the streaming gates at 7 vs 32.
STREAM_SHUFFLE_CONF = "spark.dv4dbt.stream.shufflePartitions"

# Default state/shuffle partition count for a checkpointed STATEFUL
# streaming execution when STREAM_SHUFFLE_CONF is unset. Sized for the
# gate runs (micro-batches of 10^3-10^5 rows): each stateful operator
# writes one state-store delta file PER PARTITION PER MICRO-BATCH, so
# the batch session's 32 shuffle partitions cost 32 tasks + 32
# checkpoint files per operator per epoch — launch/fsync overhead, not
# parallelism, at this batch size. AQE never coalesces these (adaptive
# planning is disabled inside stateful streaming micro-batches), so the
# partition count must be right a priori, unlike the batch plans.
#
# Scope: ONLY the state-store gates (applyInPandasWithState sessions /
# funnel, native watermarked aggregation) take this scope. The
# foreachBatch gates (vault ingest, SCD1, incremental dedup, OHLC) run
# ordinary BATCH jobs per epoch — whole-target joins and window dedups
# that want the session's full parallelism and get AQE coalescing for
# free; measured at sf0.1, scoping them to 8 REGRESSED ingest
# 8.9->14.7s and scd1 5.2->8.1s while the stateful trio improved
# 26-35% (sessions 22.6->16.8, funnel 18.3->11.9, hopping 17.7->12.7).
_STREAM_SHUFFLE_DEFAULT = 8


@contextmanager
def scoped_stream_shuffle(spark, default: int = _STREAM_SHUFFLE_DEFAULT):
    """Scope ``spark.sql.shuffle.partitions`` to the streaming-query
    layout for the duration of a checkpointed execution, then restore.

    The state-store partition count of a stateful streaming operator is
    captured from the session's shuffle.partitions when the query first
    starts against a fresh checkpoint; the gates recreate their
    checkpoint per run, so this scope sizes every execution. The wrap
    covers start()..awaitTermination(); the returned read-back frames
    execute later under the caller's own session conf.

    Results are layout-invariant (pinned at 7 vs 32 via
    STREAM_SHUFFLE_CONF in tests/test_partition_invariance.py) — this
    knob is cost-only, exactly like shuffle.partitions in batch.
    """
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    override = spark.conf.get(STREAM_SHUFFLE_CONF, None)
    spark.conf.set(key, str(int(override) if override else default))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def stage_arrival_frames(frames, src_dir: str) -> None:
    """Write ``frames`` (same-schema DataFrames, already projected to
    the stream's columns) as ordered single-file arrivals."""
    base = time.time()
    for k, frame in enumerate(frames):
        tmp = f"{src_dir}.__stage{k}__"
        shutil.rmtree(tmp, ignore_errors=True)
        frame.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")
        if len(part) != 1:
            raise RuntimeError(f"expected one staged file, got {part}")
        dst = f"{src_dir}/batch_{k}.parquet"
        os.replace(part[0], dst)
        # pin arrival order explicitly — equal mtimes would still order
        # correctly by path, but the contract should not rest on names
        os.utime(dst, (base + 100 * k, base + 100 * k))
        shutil.rmtree(tmp, ignore_errors=True)
