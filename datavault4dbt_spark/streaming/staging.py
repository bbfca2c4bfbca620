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
