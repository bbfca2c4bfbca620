"""Unit pins for the round-10 trio: Tukey-fence outlier gate (exact
fences, planted outlier, NULL verdict), bucket-bounded negative
sampling (exact k, determinism, short-bucket underfill), and the
profile-drift census (null-ratio drift and min/max change polarities —
the synthetic corpus is NULL-free, so these branches need constructed
frames). The sf-scale oracle parity rides in test_oracle_parity via
the declared fixtures."""

from pyspark.sql import functions as F

from datavault4dbt_spark.context import Registry
from datavault4dbt_spark.llm.outliers import (TukeyOutlierConfig,
                                              build_tukey_outliers)
from datavault4dbt_spark.llm.negatives import (NegativeSamplesConfig,
                                               build_negative_samples)
from datavault4dbt_spark.llm.profile import (ProfileDriftConfig,
                                             build_profile_drift)


def _reg(name, df):
    reg = Registry()
    reg.spark_loaders[name] = lambda _s: df
    return reg


# ------------------------------------------------------ tukey outliers --

def test_tukey_fences_exact_and_null_verdict(spark):
    # group g: values 1..8 plus one 1000 spike and one NULL.
    # histogram n=9 -> q25 = min v with cum*4 >= 9  -> v=3 (cum 3*4=12)
    #                  q75 = min v with cum*4 >= 27 -> v=7 (cum 7)
    # fences: lo = 2x < 5*3 - 3*7 = -6 -> x < -3; hi = 2x > 5*7-3*3=26
    # -> x > 13 -> only the 1000 spike flags.
    rows = [(k, "g", float(v)) for k, v in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 1000])]
    rows.append((99, "g", None))
    df = spark.createDataFrame(rows, "event_id long, grp string, x double")
    cfg = TukeyOutlierConfig("t", source="t", group_col="grp",
                             id_cols=("event_id",),
                             value_expr="CAST(round(x) AS BIGINT)")
    out = {r.event_id: (r.q25, r.q75, r.is_outlier)
           for r in build_tukey_outliers(spark, _reg("t", df), cfg)
           .collect()}
    assert out[0] == (3, 7, False)
    assert out[8] == (3, 7, True)
    assert out[99][2] is None           # NULL value -> NULL verdict
    assert sum(1 for _, _, o in out.values() if o) == 1


# ---------------------------------------------------- negative samples --

def test_negative_samples_exact_k_and_determinism(spark):
    rows = [(i,) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long")
    cfg = NegativeSamplesConfig("n", source="t", anchor_filter=
                                "doc_id % 20 = 0", n_buckets=2, k=3)
    reg = _reg("t", df)
    got = sorted(map(tuple,
                     build_negative_samples(spark, reg, cfg).collect()))
    again = sorted(map(tuple,
                       build_negative_samples(spark, reg, cfg).collect()))
    assert got == again and got
    per_anchor = {}
    for a, nid, rank, _b in got:
        assert nid != a
        per_anchor.setdefault(a, []).append(rank)
    assert set(per_anchor) == {0, 20, 40}
    for ranks in per_anchor.values():
        assert sorted(ranks) == [1, 2, 3]


def test_negative_samples_short_bucket_underfills(spark):
    # 3 docs, 4 buckets, k=5: each anchor can draw at most its
    # bucket-mates — never pads, never crosses buckets
    df = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    cfg = NegativeSamplesConfig("n", source="t", anchor_filter="true",
                                n_buckets=4, k=5)
    rows = build_negative_samples(spark, _reg("t", df), cfg).collect()
    buckets = {}
    for r in rows:
        buckets[r.anchor_id] = r.bucket
    for r in rows:
        assert buckets.get(r.neg_id, r.bucket) == r.bucket


# ------------------------------------------------------- profile drift --

def test_profile_drift_flags_both_polarities(spark):
    # slice A (id < 50): x never NULL, y in 1..3
    # slice B (id >= 50): x NULL for half the rows, same y range
    rows = []
    for i in range(100):
        x = None if (i >= 50 and i % 2 == 0) else i
        rows.append((i, x, i % 3 + 1))
    df = spark.createDataFrame(rows, "id long, x long, y long")
    cfg = ProfileDriftConfig(
        "d", source="t", split_expr="id < 50",
        columns=(("x", "bigint"), ("y", "bigint")),
        null_drift_ppm=10_000)
    out = {r.col_name: r for r in
           build_profile_drift(spark, _reg("t", df), cfg).collect()}
    x = out["x"]
    assert (x.n_rows_a, x.n_rows_b) == (50, 50)
    assert (x.n_nulls_a, x.n_nulls_b) == (0, 25)
    assert x.null_ppm_b == 500_000 and x.null_drift
    assert x.minmax_changed            # 0..49 vs 51..99
    y = out["y"]
    assert not y.null_drift and not y.minmax_changed


# ------------------------------------------------------ frame sampling --

def test_frame_sample_stride_cap_and_corrupt_row(spark):
    """Constructed payload edges: a long video hits the max_frames cap
    with a real stride; a short one emits every frame; a corrupt
    (headerless) payload emits exactly ONE NULL-fields row."""
    from datavault4dbt_spark.llm.multimodal import (
        MultimodalFrameSampleConfig, build_multimodal_framesample)
    # id 7 -> corrupt (7 % 7 == 0); ids 1, 2 parse
    df = spark.createDataFrame(
        [(1, "body"), (2, "body"), (7, "body")], "doc_id long, t string")
    cfg = MultimodalFrameSampleConfig("f", source="t", payload_from="t",
                                      corrupt_every=7, max_frames=4)
    rows = build_multimodal_framesample(
        spark, _reg("t", df), cfg).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: fps = 1 + 13 % 30 = 14, dur = 1000 + 53 = 1053 ->
    # n_frames = 14742 // 1000 = 14; stride = 14 // 4 = 3;
    # cnt = min(4, ceil(14/3)=5) = 4 -> idx 0,3,6,9
    d1 = sorted(r.frame_idx for r in by_doc[1])
    assert d1 == [0, 3, 6, 9]
    assert all(r.n_frames == 14 and r.fps == 14 for r in by_doc[1])
    ts1 = {r.frame_idx: r.frame_ts_ms for r in by_doc[1]}
    assert ts1[9] == 9 * 1000 // 14
    # doc 2: fps = 27, dur = 1106 -> n_frames = 29; stride = 7;
    # cnt = min(4, ceil(29/7)=5) = 4
    assert sorted(r.frame_idx for r in by_doc[2]) == [0, 7, 14, 21]
    # doc 7: one row, NULL frame fields, n_bytes = len("body")
    assert len(by_doc[7]) == 1
    c = by_doc[7][0]
    assert c.fps is None and c.frame_idx is None and c.n_bytes == 4
