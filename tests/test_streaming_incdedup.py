"""Streaming incremental dedup (streaming/incdedup.py): the
foreachBatch twin must produce byte-identical verdicts to the batch
replay loop (llm/incdedup.py) on the same batches — both call the
shared process_dedup_batch core — and its replay guards must make
epoch re-delivery a no-op / a pure index repair."""

import glob

import pytest

from datavault4dbt_spark import fixtures
from datavault4dbt_spark.llm.dedup import minhash_bucket_frame
from datavault4dbt_spark.llm.incdedup import (IncrementalDedupConfig,
                                              build_incremental_dedup)
from datavault4dbt_spark.plans.incremental import ParquetStore
from datavault4dbt_spark.streaming.incdedup import (
    StreamingDedupConfig, StreamingDedupEntityConfig,
    build_streaming_incremental_dedup, micro_batch_dedup,
    start_dedup_stream)

pytestmark = pytest.mark.slow

UNIQUE = [
    "alpha beta gamma delta epsilon zeta",
    "one two three four five six seven",
    "red green blue yellow purple orange",
    "north south east west up down",
    "cat dog bird fish horse cow",
    "spring summer autumn winter solstice equinox",
]
# 9 docs over 3 arriving files: dup pairs SPAN batches (ids 3, 5, 7
# duplicate ids 0, 1, 2 from earlier epochs) and the verdicts mix
TEXTS = [UNIQUE[0], UNIQUE[1], UNIQUE[2],
         UNIQUE[0], UNIQUE[3], UNIQUE[1],
         UNIQUE[4], UNIQUE[2], UNIQUE[5]]


@pytest.fixture(scope="module")
def doc_id_batches(tmp_path_factory):
    """The crafted corpus split into 3 arriving files by the SAME
    contiguous-id-range rule the batch builder uses
    (llm/incdedup._batch_expr with n_batches=3, bound=9), written in
    batch order so the file stream delivers them as epochs 0, 1, 2."""
    import time
    import pandas as pd
    root = tmp_path_factory.mktemp("incdedup_stream_src")
    for k in range(3):
        pd.DataFrame({
            "doc_id": pd.array(range(3 * k, 3 * k + 3), dtype="int64"),
            "text": TEXTS[3 * k:3 * k + 3],
        }).to_parquet(f"{root}/batch_{k}.parquet")
        time.sleep(0.05)
    return str(root)


def _stream_verdicts(spark, src_dir, store_dir, ckpt_dir):
    cfg = StreamingDedupConfig(source_dir=src_dir)
    store = ParquetStore(spark, store_dir)
    schema = spark.read.parquet(src_dir).schema
    q = start_dedup_stream(spark, cfg, store, schema, ckpt_dir)
    q.awaitTermination(300)
    return cfg, store


def _batch_registry(spark, src_dir):
    from datavault4dbt_spark.context import Registry
    reg = Registry()
    reg.register("docs",
                 lambda s, d=src_dir: s.read.parquet(d), "docs")
    return reg


def test_stream_equals_batch_replay(spark, tmp_path, doc_id_batches):
    fixtures.ensure_session_conf(spark)
    _cfg, store = _stream_verdicts(
        spark, doc_id_batches, str(tmp_path / "store"),
        str(tmp_path / "ckpt"))
    got = {r.doc_id: (r.batch_id, r.is_kept)
           for r in store.read("result").collect()}

    bcfg = IncrementalDedupConfig("b", source="docs", n_batches=3)
    want = {r.doc_id: (r.batch_id, r.is_kept)
            for r in build_incremental_dedup(
                spark, _batch_registry(spark, doc_id_batches),
                bcfg).collect()}
    assert got == want and len(got) == 9
    # the crafted corpus carries real cross-batch duplicates: both drop
    assert {b for d, (b, kept) in got.items() if not kept} >= {1, 2}


def test_replayed_epoch_is_noop(spark, tmp_path, doc_id_batches):
    fixtures.ensure_session_conf(spark)
    cfg, store = _stream_verdicts(
        spark, doc_id_batches, str(tmp_path / "store"),
        str(tmp_path / "ckpt"))
    before = sorted(map(tuple, store.read("result").collect()))
    n_index = store.read("index").count()
    # re-deliver epoch 1's data through the callback (at-least-once)
    batch1 = spark.read.parquet(
        sorted(glob.glob(doc_id_batches + "/batch_*.parquet"))[1])
    micro_batch_dedup(cfg, store)(batch1, 1)
    assert sorted(map(tuple, store.read("result").collect())) == before
    assert store.read("index").count() == n_index


def test_partial_failure_repairs_index_only(spark, tmp_path,
                                            doc_id_batches):
    """Crash between the verdict append and the index append: replay
    must append ONLY the missing signatures — identical to the lost
    write — and leave the verdicts untouched."""
    import shutil
    fixtures.ensure_session_conf(spark)
    cfg, store = _stream_verdicts(
        spark, doc_id_batches, str(tmp_path / "store"),
        str(tmp_path / "ckpt"))
    before = sorted(map(tuple, store.read("result").collect()))
    batch2 = spark.read.parquet(
        sorted(glob.glob(doc_id_batches + "/batch_*.parquet"))[2])
    want_idx = sorted(
        map(tuple, minhash_bucket_frame(batch2, cfg.minhash())
            .collect()))
    # simulate the torn write by dropping epoch 2's index partition
    shutil.rmtree(store.path("index") + "/batch_id=2")
    micro_batch_dedup(cfg, store)(batch2, 2)
    got_idx = sorted(
        map(tuple, store.read("index").filter("batch_id = 2")
            .drop("batch_id").collect()))
    assert got_idx == want_idx
    assert sorted(map(tuple, store.read("result").collect())) == before


def test_entity_matches_batch_loop(spark, tmp_path, doc_id_batches):
    """The driver-gated entity (stage -> readStream -> foreachBatch ->
    persisted verdicts) must equal the batch replay loop on the same
    corpus, and a SECOND invocation (scratch reuse + fresh checkpoint,
    the driver/bench repeat pattern) must reproduce it."""
    fixtures.ensure_session_conf(spark)
    reg = _batch_registry(spark, doc_id_batches)
    cfg = StreamingDedupEntityConfig("t_stream_entity", source="docs",
                                     n_batches=3)
    got = {(r.doc_id, r.batch_id, r.is_kept)
           for r in build_streaming_incremental_dedup(spark, reg,
                                                      cfg).collect()}
    want = {(r.doc_id, r.batch_id, r.is_kept)
            for r in build_incremental_dedup(
                spark, reg,
                IncrementalDedupConfig("t_b", source="docs",
                                       n_batches=3)).collect()}
    assert got == want and len(got) == 9
    again = {(r.doc_id, r.batch_id, r.is_kept)
             for r in build_streaming_incremental_dedup(spark, reg,
                                                        cfg).collect()}
    assert again == want
