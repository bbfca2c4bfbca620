"""Partition-count invariance (r9 advice #5): every determinism claim
in the repo rests on salted hashes and total orders, not on partition
layout. Pin it: representative entities must produce IDENTICAL rows at
spark.sql.shuffle.partitions = 7 and 32 — tie-break nondeterminism
(rank without a total order, first() over an unordered frame, float
accumulation reordering that leaks into a folded integer) shows up
here before the driver can ever see it.

The entity set spans the shapes where layout could leak: windowed
rank/tie-breaks (ma_sat, vocab top-k, exact sample, percentile rank),
window-first/last aggregation (OHLC), salted draws (corpus shuffle,
proportional sample), store replay (SCD1 merge), census ppm arithmetic
(transitions)."""

import pytest

from datavault4dbt_spark import fixtures

ENTITIES = (
    "ma_sat_customer_orders",
    "text_vocab_topk",
    "docs_exact_sample",
    "events_ohlc_hourly",
    "docs_length_pr",
    "corpus_shuffle",
    "docs_proportional_sample",
    "lineitem_scd1_current",
    "event_transitions",
    # round-10 additions: salted-hash ranks and fence joins
    "docs_negative_samples",
    "events_value_outliers",
    "docs_kfold",
    "multimodal_framesample",
    # round-11 additions: Arrow encode+parse roundtrip (WAV) and the
    # stateful streaming funnel gate (state-store layout + snapshot
    # reduction must not leak into the reduced result)
    "multimodal_wav_decode",
    "multimodal_wav_stats",
    "event_funnel_stream",
    "multimodal_ulaw_stats",
    "multimodal_png_decode",
    # round-12 additions: the animated-GIF LZW frame decode (per-frame
    # fan-out inside Arrow batches must not depend on batch layout)
    # and the streaming vault-ingest gate (micro-batch file boundaries
    # + per-batch anti-joins must not leak into the loaded tables)
    "multimodal_gif_frames",
    "events_vault_ingest_stream",
    # the native watermarked-aggregation gate: watermark eviction and
    # append-mode emission must not depend on shuffle layout
    "events_hopping_stream",
    # the native streaming-dedup gate: per-key state-store probes and
    # duplicate-drop decisions must not depend on state layout
    "events_dedup_stream",
)


def _rows(spark, sf_dir, name, partitions):
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    # the stateful streaming gates scope their checkpointed execution
    # to a fixed state-partition count (staging.scoped_stream_shuffle);
    # the explicit override below makes THIS test's 7-vs-32 sweep reach
    # their state-store layout too, so the pin stays meaningful there
    from datavault4dbt_spark.streaming.staging import STREAM_SHUFFLE_CONF
    spark.conf.set(STREAM_SHUFFLE_CONF, str(partitions))
    try:
        df = fixtures.entity_query(name)(spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols)
                      for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.unset(STREAM_SHUFFLE_CONF)
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", ENTITIES)
def test_result_invariant_under_partition_count(spark, sf_dir, name):
    fixtures.ensure_session_conf(spark)
    at7 = _rows(spark, sf_dir, name, 7)
    at32 = _rows(spark, sf_dir, name, 32)
    assert at7, name
    assert at7 == at32, (
        f"{name}: rows differ between shuffle.partitions=7 and 32 — "
        f"a tie-break or accumulation-order nondeterminism")
