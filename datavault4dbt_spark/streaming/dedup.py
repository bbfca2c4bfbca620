"""Streaming deduplication for arriving documents.

Beyond-reference operator (the reference is batch-only): the streaming
counterpart of ``llm.dedup.build_exact_dedup`` — drop exact-content
duplicates as documents ARRIVE, with state bounded by a watermark.

Semantics: a document is a duplicate iff an identical content hash was
seen within the watermark horizon of its event time. State is the set
of content hashes inside the horizon — Spark evicts older state, so
memory is bounded by (arrival rate x watermark), not corpus size. This
is the standard trade for infinite streams: global exact dedup needs
unbounded state; horizon dedup composes with a periodic batch
``build_exact_dedup`` sweep over the accumulated store for anything
that re-appears later than the horizon.

Scale: md5 is computed map-side in the scan stage (whole-stage
codegen); ``dropDuplicatesWithinWatermark`` keys state on the hash —
uniform by construction, no skew. Works identically through
``foreachBatch`` replay because duplicates re-delivered at-least-once
hash to the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(events: DataFrame, content_col: str,
                          event_time_col: str = "ts",
                          watermark: str = "24 hours",
                          hash_col: str = "content_hash",
                          tiebreak_col: str | None = None) -> DataFrame:
    """First arrival per content hash within the watermark horizon.

    On a streaming DataFrame: ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` (Spark keeps hash state only
    inside the horizon). On a batch DataFrame the same call degrades to
    a plain first-per-hash dedup so batch/stream parity can be tested
    on identical input.
    """
    out = events.withColumn(
        hash_col, F.md5(F.col(content_col).cast("string"))).withColumn(
        event_time_col, F.col(event_time_col).cast("timestamp"))
    if out.isStreaming:
        out = (out.withWatermark(event_time_col, watermark)
               .dropDuplicatesWithinWatermark([hash_col]))
    else:
        # deterministic batch twin of "first arrival": min event time per
        # hash (bare dropDuplicates keeps an arbitrary partition-order
        # row, which would make stream/batch parity flaky). When
        # duplicates can SHARE an event time (batch-stamped corpora),
        # pass `tiebreak_col` (e.g. the doc id) — otherwise the equal-ts
        # survivor is still partition-order arbitrary
        from pyspark.sql import Window
        order = [F.col(event_time_col)]
        if tiebreak_col:
            order.append(F.col(tiebreak_col))
        w = Window.partitionBy(hash_col).orderBy(*order)
        out = (out.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1).drop("__rn"))
    return out
