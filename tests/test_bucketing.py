"""Bucketed co-located joins: two tables bucketed on the join key must
join with ZERO Exchange (the 100 TB amortized-shuffle story), bucketed
reads must equal path-based reads, and run_pipeline must materialize a
vault through a BucketedVault store end-to-end."""

import pytest

from datavault4dbt_spark import fixtures
from datavault4dbt_spark.plans.bucketing import BucketedVault


@pytest.fixture(scope="module")
def vault(spark, sf_dir, tmp_path_factory):
    fixtures.ensure_session_conf(spark)
    loc = tmp_path_factory.mktemp("bucketed_vault")
    v = BucketedVault(
        spark, "bkt_test", str(loc), n_buckets=4,
        bucket_cols={"hub_customer": ("hk_customer_h",),
                     "sat_customer_n0_s": ("hk_customer_h",)})
    reg = fixtures.registry(spark, sf_dir)
    hub = reg.load(spark, "hub_customer")
    sat = reg.load(spark, "sat_customer_n0_s")
    v.append("hub_customer", hub)
    v.append("sat_customer_n0_s", sat)
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


def test_append_accumulates_and_enforces_spec(spark, vault):
    v, hub, _sat = vault
    before = v.read("hub_customer").count()
    v.append("hub_customer", v.read("hub_customer").limit(5))
    assert v.read("hub_customer").count() == before + 5
    # Spark rejects an append with a different bucket layout
    v2 = BucketedVault(spark, "bkt_test", v.spark.conf.get(
        "spark.sql.warehouse.dir"), n_buckets=8,
        bucket_cols={"hub_customer": ("hk_customer_h",)})
    with pytest.raises(Exception, match="[Bb]ucket"):
        v2.append("hub_customer", v.read("hub_customer").limit(1))


def test_run_pipeline_through_bucketed_store(spark, sf_dir,
                                             tmp_path_factory):
    """A hub + sat vault materializes through BucketedVault via the
    generic pipeline, re-runs idempotently, and the stored tables join
    shuffle-free — the whole-vault co-location story end-to-end."""
    from datavault4dbt_spark.context import testdata_registry
    from datavault4dbt_spark.operators.hub import build_hub
    from datavault4dbt_spark.operators.sat import build_sat_v0
    from datavault4dbt_spark.operators.stage import build_stage
    from datavault4dbt_spark.plans.pipeline import EntityDecl, run_pipeline

    fixtures.ensure_session_conf(spark)
    loc = tmp_path_factory.mktemp("bucketed_pipeline")
    store = BucketedVault(
        spark, "bkt_pipe", str(loc), n_buckets=4,
        bucket_cols={"hub_customer": ("hk_customer_h",),
                     "sat_customer_n0_s": ("hk_customer_h",)})
    decls = {
        "stage_customer": EntityDecl(
            "stage_customer", build_stage,
            fixtures.STAGES["stage_customer"], materialize="view"),
        "hub_customer": EntityDecl(
            "hub_customer", build_hub, fixtures.HUBS["hub_customer"],
            deps=("stage_customer",), keys=("hk_customer_h",)),
        "sat_customer_n0_s": EntityDecl(
            "sat_customer_n0_s", build_sat_v0,
            fixtures.SATS["sat_customer_n0_s"],
            deps=("stage_customer",),
            keys=("hk_customer_h", "hd_customer_n_s", "ldts")),
    }
    try:
        counts1 = run_pipeline(spark, decls, store,
                               testdata_registry(sf_dir))
        counts2 = run_pipeline(spark, decls, store,
                               testdata_registry(sf_dir))
        assert counts1["hub_customer"] > 0
        assert counts2["hub_customer"] == 0   # idempotent rerun inserts nothing
        reg = fixtures.registry(spark, sf_dir)
        assert (store.read("hub_customer").count()
                == reg.load(spark, "hub_customer").count())
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = store.read("hub_customer").join(
                store.read("sat_customer_n0_s")
                .select("hk_customer_h", "hd_customer_n_s"),
                on="hk_customer_h")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        store.drop("stage_customer")
        store.drop("hub_customer")
        store.drop("sat_customer_n0_s")


def test_clean_up_pit_through_bucketed_store(spark, sf_dir,
                                             tmp_path_factory):
    """The maintenance protocol added to BucketedVault really carries
    clean_up_pit: catalog tables have no hive partitions, so the
    rewrite path (filter + overwrite) must run and thin the PIT."""
    from pyspark.sql import functions as F
    from datavault4dbt_spark.operators.maintenance import clean_up_pit

    fixtures.ensure_session_conf(spark)
    loc = tmp_path_factory.mktemp("bucketed_maint")
    store = BucketedVault(spark, "bkt_maint", str(loc), n_buckets=4)
    reg = fixtures.registry(spark, sf_dir)
    store.overwrite("pit_customer", reg.load(spark, "pit_customer"))
    before = store.read("pit_customer").count()
    snap = reg.load(spark, "control_snap_v1").withColumn(
        "is_active", F.col("is_active") & F.col("is_beginning_of_week"))
    try:
        deleted = clean_up_pit(store, "pit_customer", snap)
        after = store.read("pit_customer").count()
        assert deleted > 0 and after == before - deleted
        active = {r[0] for r in
                  snap.filter("is_active").select("sdts").collect()}
        left = {r[0] for r in store.read("pit_customer")
                .select("sdts").distinct().collect()}
        assert left <= active
    finally:
        store.drop("pit_customer")


def test_overwrite_staged_swap_keeps_bucketing_and_data(
        spark, sf_dir, tmp_path_factory):
    """Round-6: overwrite stages through <name>__tmp + two RENAMEs, so
    (a) the replaced data is correct even though the plan READS the
    table being replaced, (b) the bucket spec survives the rename (the
    post-overwrite join is still Exchange-free), and (c) no staging
    tables are left behind."""
    fixtures.ensure_session_conf(spark)
    loc = tmp_path_factory.mktemp("bucketed_swap")
    v = BucketedVault(
        spark, "bkt_swap", str(loc), n_buckets=4,
        bucket_cols={"hub_customer": ("hk_customer_h",),
                     "sat_customer_n0_s": ("hk_customer_h",)})
    reg = fixtures.registry(spark, sf_dir)
    v.append("hub_customer", reg.load(spark, "hub_customer"))
    v.append("sat_customer_n0_s", reg.load(spark, "sat_customer_n0_s"))
    try:
        before = v.read("hub_customer").count()
        assert before > 1
        # self-referential rewrite: drop one row, reading the live table
        keep = v.read("hub_customer").orderBy("hk_customer_h").limit(
            before - 1)
        v.overwrite("hub_customer", keep)
        assert v.read("hub_customer").count() == before - 1
        assert not spark.catalog.tableExists("bkt_swap.hub_customer__tmp")
        assert not spark.catalog.tableExists("bkt_swap.hub_customer__old")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = v.read("hub_customer").join(
                v.read("sat_customer_n0_s").select("hk_customer_h", "ldts"),
                on="hk_customer_h")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        v.drop("hub_customer")
        v.drop("sat_customer_n0_s")


def test_overwrite_crash_recovery_restores_committed_copy(
        spark, sf_dir, tmp_path_factory):
    """Simulate the two crash windows of the staged swap: (1) after
    RENAME(final -> old) but before RENAME(tmp -> final) — readers
    raise StoreRecoveryNeeded (read path is catalog-read-only) and an
    explicit repair() restores the committed old copy; (2) a stale
    __tmp from a crash mid-write — repair() (via the next overwrite)
    drops it without touching final, while plain reads leave it for
    the writer that owns it."""
    import pytest
    from datavault4dbt_spark.plans.incremental import StoreRecoveryNeeded
    fixtures.ensure_session_conf(spark)
    loc = tmp_path_factory.mktemp("bucketed_crash")
    v = BucketedVault(spark, "bkt_crash", str(loc), n_buckets=4,
                      bucket_cols={"hub_customer": ("hk_customer_h",)})
    reg = fixtures.registry(spark, sf_dir)
    v.append("hub_customer", reg.load(spark, "hub_customer"))
    try:
        n = v.read("hub_customer").count()
        # window 1: final renamed away, swap never finished
        spark.sql("ALTER TABLE bkt_crash.hub_customer "
                  "RENAME TO bkt_crash.hub_customer__old")
        with pytest.raises(StoreRecoveryNeeded, match="repair"):
            v.exists("hub_customer")
        with pytest.raises(StoreRecoveryNeeded, match="repair"):
            v.read("hub_customer")
        with pytest.raises(StoreRecoveryNeeded, match="repair"):
            v.append("hub_customer", reg.load(spark, "hub_customer"))
        v.repair("hub_customer")
        assert v.exists("hub_customer")
        assert v.read("hub_customer").count() == n
        # window 2: stale __tmp beside a healthy final — reads must
        # NOT drop it (it may be a live writer's staging table); the
        # next overwrite (owning writer) clears it
        v.read("hub_customer").limit(1).write.format("parquet") \
            .saveAsTable("bkt_crash.hub_customer__tmp")
        assert v.read("hub_customer").count() == n
        assert spark.catalog.tableExists("bkt_crash.hub_customer__tmp")
        v.overwrite("hub_customer", v.read("hub_customer"))
        assert v.read("hub_customer").count() == n
        assert not spark.catalog.tableExists("bkt_crash.hub_customer__tmp")
    finally:
        v.drop("hub_customer")
