"""Streaming incremental corpus dedup: the foreachBatch twin of
``llm.incdedup`` — new documents ARRIVE as a stream and each
micro-batch is deduplicated against the persisted MinHash signature
index, then appended to it.

This is the steady-state shape of a crawl pipeline: the index is the
durable state (a plain parquet table, not Spark streaming state), so
restarts recover from checkpoint + idempotent re-probe, state never
lives in the state store, and the same index serves batch backfills
(``build_incremental_dedup``) and the live stream interchangeably.
Both paths call the SAME per-batch core (``process_dedup_batch``), so
they cannot drift — the pytest pin feeds identical batches through
both and asserts identical verdicts. ``dedup_incremental``'s driver
entry hash-certifies that shared core against the one-shot DuckDB
rule every round.

Semantics: first occurrence wins across the whole processed history —
a document is dropped iff an earlier-arriving document (previous
micro-batch, or lower id within its own micro-batch) shares an LSH
band bucket with it. Signatures of every processed document are
appended so later near-duplicates of dropped documents are still
caught (see llm/incdedup.py's equivalence argument).

Scale: per micro-batch cost is one batch scan + one left-semi hash
join against the index on (band, sig) — md5-uniform keys, no skew; the
index grows insert-only and is never rescanned in full. At-least-once
replay safety comes from per-epoch presence probes against the
hive-partitioned batch_id layout — see ``micro_batch_dedup``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from ..llm.dedup import MinHashLshConfig, minhash_bucket_frame
from ..llm.incdedup import append_batch_index, process_dedup_batch
from ..plans.incremental import ParquetStore


@dataclass(frozen=True)
class StreamingDedupConfig:
    source_dir: str              # directory watched by readStream
    id_col: str = "doc_id"
    text_col: str = "text"
    shingle_n: int = 3
    num_perm: int = 16
    bands: int = 4
    max_files_per_trigger: int = 1

    def minhash(self) -> MinHashLshConfig:
        return MinHashLshConfig(
            "stream_dedup__mh", id_col=self.id_col,
            text_col=self.text_col, shingle_n=self.shingle_n,
            num_perm=self.num_perm, bands=self.bands)


def open_document_stream(spark, cfg: StreamingDedupConfig,
                         schema) -> DataFrame:
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", cfg.max_files_per_trigger)
            .parquet(cfg.source_dir))


def _has_epoch(store: ParquetStore, table: str, epoch: int) -> bool:
    """Did `epoch` already land in `table`? The tables are
    hive-partitioned on batch_id (llm/incdedup.py), so this probe
    prunes to one partition directory — O(epoch size), not O(history)."""
    if not store.exists(table):
        return False
    return bool(store.read(table)
                .filter(F.col("batch_id") == epoch)
                .limit(1).count())


def micro_batch_dedup(cfg: StreamingDedupConfig, store: ParquetStore):
    """foreachBatch callback sharing llm.incdedup's per-batch core,
    made idempotent under Spark's at-least-once epoch replay:

    - verdict AND index present for this epoch -> no-op (fully done);
    - verdict present, index missing (crash between the two appends —
      the core writes verdict first) -> repair by appending only the
      recomputed signatures; re-running the verdict probe here would
      be WRONG once the index held this epoch's own signatures (every
      doc would match itself and be flagged duplicate);
    - neither present -> normal processing.

    Same epoch => same micro-batch data is Spark's replay contract, so
    the recomputed signatures equal the lost ones."""
    mh = cfg.minhash()

    def dedup(batch_df: DataFrame, batch_id: int):
        k = int(batch_id)
        if _has_epoch(store, "result", k):
            if not _has_epoch(store, "index", k):
                append_batch_index(
                    store, minhash_bucket_frame(batch_df, mh), k)
            return
        process_dedup_batch(store, batch_df, mh, cfg.id_col, batch_id=k)
    return dedup


def start_dedup_stream(spark, cfg: StreamingDedupConfig,
                       store: ParquetStore, schema,
                       checkpoint_dir: str):
    """Wire stream -> foreachBatch(dedup) and start it. Returns the
    StreamingQuery; verdicts land in store table 'result', signatures
    in 'index'."""
    stream = open_document_stream(spark, cfg, schema)
    return (stream.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(micro_batch_dedup(cfg, store))
            .trigger(availableNow=True)
            .start())
