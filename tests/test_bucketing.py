"""Bucketed co-located joins: two tables bucketed on the join key must
join with ZERO Exchange (the 100 TB amortized-shuffle story), and
bucketed reads must equal path-based reads."""

import pytest

from datavault4dbt_spark import fixtures
from datavault4dbt_spark.plans.bucketing import BucketedVault


@pytest.fixture(scope="module")
def vault(spark, sf_dir, tmp_path_factory):
    fixtures.ensure_session_conf(spark)
    loc = tmp_path_factory.mktemp("bucketed_vault")
    v = BucketedVault(spark, "bkt_test", str(loc), n_buckets=4)
    reg = fixtures.registry(spark, sf_dir)
    hub = reg.load(spark, "hub_customer")
    sat = reg.load(spark, "sat_customer_n0_s")
    v.append("hub_customer", hub, bucket_cols=("hk_customer_h",),
             sort_cols=("hk_customer_h",))
    v.append("sat_customer_n0_s", sat, bucket_cols=("hk_customer_h",),
             sort_cols=("hk_customer_h",))
    yield v, hub, sat
    v.drop("hub_customer")
    v.drop("sat_customer_n0_s")


def test_bucketed_read_equals_source(spark, vault):
    v, hub, sat = vault
    assert v.exists("hub_customer") and v.exists("sat_customer_n0_s")
    got = {r["hk_customer_h"] for r in v.read("hub_customer").collect()}
    want = {r["hk_customer_h"] for r in hub.collect()}
    assert got == want
    assert v.read("sat_customer_n0_s").count() == sat.count()


def test_bucketed_join_has_no_exchange(spark, vault):
    v, hub, sat = vault
    # disable broadcast so the join strategy is SMJ and bucketing (not
    # a broadcast) is what removes the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (v.read("hub_customer")
             .join(v.read("sat_customer_n0_s")
                   .select("hk_customer_h", "hd_customer_n_s", "ldts"),
                   on="hk_customer_h"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the join is still correct
        assert j.count() == sat.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_pays_the_shuffle(spark, vault):
    """Control: the same join off bare DataFrames shows the Exchange the
    bucketed layout eliminates."""
    _v, hub, sat = vault
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = hub.join(sat.select("hk_customer_h", "hd_customer_n_s"),
                     on="hk_customer_h")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_append_accumulates_rows(spark, vault):
    v, hub, _sat = vault
    before = v.read("hub_customer").count()
    v.append("hub_customer", v.read("hub_customer").limit(5),
             bucket_cols=("hk_customer_h",), sort_cols=("hk_customer_h",))
    assert v.read("hub_customer").count() == before + 5
