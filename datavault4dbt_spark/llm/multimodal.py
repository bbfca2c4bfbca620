"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Real pipelines carry image/audio/video as ``binary`` columns next to
typed metadata and run decode / resize / frame-sample as vectorized
Python over Arrow batches. The image/audio codec libraries are not in
this container, so the *decode* step is a clearly-marked deterministic
stub (`_stub_decode`, md5-derived pseudo-dimensions); everything the
Spark engine is responsible for — schema, binary encoding, Arrow batch
shape, ``mapInPandas`` signature, partition-parallel execution — is
real and oracle-checked (the stub's arithmetic is reproduced in DuckDB
SQL, so even the Python path gets a full value-level correctness gate).

Swapping `_stub_decode` for `PIL.Image.open` / `soundfile.read` changes
no plan shape: the UDF stays Arrow-batched, per-partition, shuffle-free.

Scale design (100 TB): binary payloads dominate bytes — the plan
projects (id, payload) only (column pruning reaches the parquet scan),
decodes inside ``mapInPandas`` (one Python worker per core, Arrow
zero-copy), and returns slim numeric features; no shuffle at all.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (StructType, StructField, LongType,
                               IntegerType, StringType)

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class MultimodalConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    payload_from: str = "text"   # column encoded into the binary payload
    modality: str = "image"


FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("modality", StringType()),
])


def _stub_decode(payload: bytes) -> tuple:
    """STUB for the codec step (no image/audio libs in this container).

    Deterministic fake decode: pseudo width/height from the payload's
    md5. A real deployment replaces this body with e.g.
    ``img = PIL.Image.open(io.BytesIO(payload)); return img.size`` —
    signature and call site stay identical.
    """
    h = hashlib.md5(payload).hexdigest()
    return int(h[0:2], 16), int(h[2:4], 16)


def _feature_batches(cfg: MultimodalConfig):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # NULL payloads arrive as None: decode to NULL features
            # (the oracle's md5(NULL)/octet_length(NULL) are NULL too) —
            # hashlib.md5(None)/len(None) would otherwise kill the task
            dims = [(None, None) if p is None else _stub_decode(p)
                    for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf[cfg.id_col],
                "n_bytes": payloads.map(
                    lambda p: None if p is None else len(p)).astype("Int64"),
                "width": pd.Series([d[0] for d in dims], dtype="Int32"),
                "height": pd.Series([d[1] for d in dims], dtype="Int32"),
                "modality": cfg.modality,
            })
    return fn


def build_multimodal_features(spark, reg: Registry, cfg: MultimodalConfig,
                              g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    # binary payload column — in production this IS the stored bytes;
    # here it is synthesized from a text column so the oracle can check
    # the full path (utf-8 encode is bit-identical in both engines).
    payloads = df.selectExpr(
        cfg.id_col, f"cast({cfg.payload_from} AS BINARY) AS payload")
    return payloads.mapInPandas(_feature_batches(cfg), FEATURE_SCHEMA)


def multimodal_oracle(b: SqlBuilder, reg: Registry, cfg: MultimodalConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    """DuckDB replica of the stub-decode arithmetic: md5 over the same
    utf-8 bytes; hex pairs -> ints via the shared nibble trick."""
    src = reg.duckdb_relation(cfg.source)

    def hex_byte(pos: int) -> str:  # 1-based hex char positions
        hi = f"(instr('0123456789abcdef', substr(h, {pos}, 1)) - 1)"
        lo = f"(instr('0123456789abcdef', substr(h, {pos + 1}, 1)) - 1)"
        return f"CAST({hi} * 16 + {lo} AS INT)"

    hcte = b.cte(f"{cfg.name}__h",
                 f"SELECT {cfg.id_col} AS doc_id, "
                 f"CAST(octet_length(CAST({cfg.payload_from} AS BLOB)) AS BIGINT)"
                 f" AS n_bytes, md5({cfg.payload_from}) AS h FROM {src}")
    return b.cte(cfg.name,
                 f"SELECT doc_id, n_bytes, {hex_byte(1)} AS width, "
                 f"{hex_byte(3)} AS height, '{cfg.modality}' AS modality "
                 f"FROM {hcte}")
