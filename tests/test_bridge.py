"""Bridge operator behavior (operators/bridge.py): multi-leg
traversal, ldts existence filter, eff-sat gating at each snapshot, and
the bridge_key anti-insert increment. The driver-gate fixture
(bridge_customer_nation) is covered row-level by test_oracle_parity."""

import datetime

import pytest

from pyspark.sql import functions as F

from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.operators.bridge import (
    BridgeConfig, BridgeLeg, build_bridge)

G = DEFAULT
TS = datetime.datetime.fromisoformat


def _reg(**frames):
    reg = Registry()
    for name, df in frames.items():
        reg.register(name, lambda s, d=df: d, name)
    return reg


def _frames(spark):
    hub = spark.createDataFrame(
        [("c1", TS("2024-01-01 01:00:00")),
         ("c2", TS("2024-01-02 01:00:00"))],
        "hk_c string, ldts timestamp")
    # c1 -> n1 (day 1), c2 -> n2 (day 2)
    link1 = spark.createDataFrame(
        [("l11", "c1", "n1", TS("2024-01-01 01:00:00")),
         ("l22", "c2", "n2", TS("2024-01-02 01:00:00"))],
        "hk_l string, hk_c string, hk_n string, ldts timestamp")
    # n1 -> s1 and s2; n2 -> s3 (all day 1)
    link2 = spark.createDataFrame(
        [("m1", "n1", "s1", TS("2024-01-01 01:00:00")),
         ("m2", "n1", "s2", TS("2024-01-01 01:00:00")),
         ("m3", "n2", "s3", TS("2024-01-01 01:00:00"))],
        "hk_m string, hk_n string, hk_s string, ldts timestamp")
    snap = spark.createDataFrame(
        [(TS("2024-01-01 12:00:00"),), (TS("2024-01-02 12:00:00"),)],
        "sdts timestamp")
    return hub, link1, link2, snap


def test_two_leg_traversal_and_existence_filter(spark):
    hub, link1, link2, snap = _frames(spark)
    reg = _reg(hub=hub, link_cn=link1, link_ns=link2, snap=snap)
    cfg = BridgeConfig(
        "b", "hub", "hk_c", "snap",
        (BridgeLeg("link_cn", "hk_l", "hk_c", "hk_n"),
         BridgeLeg("link_ns", "hk_m", "hk_n", "hk_s")))
    rows = {(r.hk_c, r.hk_n, r.hk_s, r.sdts.day)
            for r in build_bridge(spark, reg, cfg, G).collect()}
    # day 1: only c1's path exists (c2's link loads day 2);
    # day 2: both paths, c1 fans out to two suppliers on both days
    assert rows == {
        ("c1", "n1", "s1", 1), ("c1", "n1", "s2", 1),
        ("c1", "n1", "s1", 2), ("c1", "n1", "s2", 2),
        ("c2", "n2", "s3", 2)}


def test_eff_sat_gates_by_latest_state_at_sdts(spark):
    hub, link1, _link2, snap = _frames(spark)
    # l11 active day 1, deactivated day 2; l22 first effective day 2
    eff = spark.createDataFrame(
        [("l11", TS("2024-01-01 01:00:00"), True),
         ("l11", TS("2024-01-02 01:00:00"), False),
         ("l22", TS("2024-01-02 01:00:00"), True)],
        "hk_l string, ldts timestamp, is_active boolean")
    reg = _reg(hub=hub, link_cn=link1, eff=eff, snap=snap)
    cfg = BridgeConfig(
        "b", "hub", "hk_c", "snap",
        (BridgeLeg("link_cn", "hk_l", "hk_c", "hk_n", eff_sat="eff"),))
    rows = {(r.hk_c, r.hk_n, r.sdts.day)
            for r in build_bridge(spark, reg, cfg, G).collect()}
    assert rows == {("c1", "n1", 1), ("c2", "n2", 2)}


def test_incremental_inserts_only_new_snapshot_rows(spark):
    hub, link1, _l2, snap = _frames(spark)
    day1 = spark.createDataFrame(
        [(TS("2024-01-01 12:00:00"),)], "sdts timestamp")
    reg1 = _reg(hub=hub, link_cn=link1, snap=day1)
    reg2 = _reg(hub=hub, link_cn=link1, snap=snap)
    cfg = BridgeConfig(
        "b", "hub", "hk_c", "snap",
        (BridgeLeg("link_cn", "hk_l", "hk_c", "hk_n"),))
    phase1 = build_bridge(spark, reg1, cfg, G)
    inserts = build_bridge(spark, reg2, cfg, G, target=phase1)
    got = {(r.hk_c, r.sdts.day) for r in inserts.collect()}
    assert got == {("c1", 2), ("c2", 2)}  # day-1 rows anti-joined away
    # converged state equals the one-shot build
    full = build_bridge(spark, reg2, cfg, G)
    assert (sorted(map(tuple, phase1.collect() + inserts.collect()))
            == sorted(map(tuple, full.collect())))


def test_bridge_key_is_unique_per_path(spark):
    hub, link1, link2, snap = _frames(spark)
    reg = _reg(hub=hub, link_cn=link1, link_ns=link2, snap=snap)
    cfg = BridgeConfig(
        "b", "hub", "hk_c", "snap",
        (BridgeLeg("link_cn", "hk_l", "hk_c", "hk_n"),
         BridgeLeg("link_ns", "hk_m", "hk_n", "hk_s")))
    out = build_bridge(spark, reg, cfg, G)
    assert out.select("bridge_key").distinct().count() == out.count()


def test_config_validation():
    with pytest.raises(ValueError):
        BridgeConfig("b", "hub", "hk_c", "snap", ())
    with pytest.raises(ValueError):  # broken traversal chain
        BridgeConfig("b", "hub", "hk_c", "snap",
                     (BridgeLeg("l", "hk_l", "hk_x", "hk_n"),))
    with pytest.raises(ValueError):  # duplicate exposed column
        BridgeConfig("b", "hub", "hk_c", "snap",
                     (BridgeLeg("l", "hk_l", "hk_c", "hk_c"),))
