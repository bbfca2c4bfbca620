"""DeltaStore parity: the same store interface ParquetStore implements,
over Delta Lake transactions. Skipped entirely when delta-spark is not
installed (this container does not bake it in); on a Delta-enabled
environment these tests certify drop-in interchangeability for
run_pipeline / clean_up_pit.
"""

import pytest

delta = pytest.importorskip("delta")

from pyspark.sql import SparkSession, functions as F

from datavault4dbt_spark.context import configure_session_builder
from datavault4dbt_spark.plans.delta import (DeltaStore, make_store,
                                             configure_delta_session_builder)


@pytest.fixture(scope="module")
def dspark():
    builder = configure_delta_session_builder(
        SparkSession.builder.master("local[4]")
        .appName("delta-store-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false"))
    spark = configure_session_builder(builder).getOrCreate()
    yield spark
    spark.stop()


@pytest.fixture()
def store(dspark, tmp_path):
    return DeltaStore(dspark, str(tmp_path / "vault"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, sdts string, v string")


def test_append_read_exists_roundtrip(dspark, store):
    assert not store.exists("t")
    store.append("t", _df(dspark, [(1, "a", "x")]))
    assert store.exists("t")
    store.append("t", _df(dspark, [(2, "b", "y")]))
    assert store.read("t").count() == 2


def test_overwrite_is_read_own_path_safe(dspark, store):
    store.append("t", _df(dspark, [(1, "a", "x"), (2, "b", "y")]))
    # plan reads the path being replaced — transactional overwrite
    # must not corrupt it (the ParquetStore analogue needs a swap)
    keep = store.read("t").filter(F.col("k") == 1)
    store.overwrite("t", keep)
    assert [r.k for r in store.read("t").collect()] == [1]


def test_delete_where_reports_metrics(dspark, store):
    store.append("t", _df(dspark, [(i, "a" if i % 2 else "b", "x")
                                   for i in range(10)]))
    n = store.delete_where("t", F.col("sdts") == "b")
    assert n == 5
    assert store.read("t").count() == 5
    assert store.DELETE_RETURNS_METRICS
    # zero-match DELETE: delta skips the empty commit, so history(1)
    # still shows the previous operation — must report 0, not raise
    assert store.delete_where("t", F.col("sdts") == "b") == 0
    assert store.read("t").count() == 5


def test_partitioned_append_and_native_partition_drop(dspark, store):
    store.append("t", _df(dspark, [(1, "s1", "x"), (2, "s2", "y"),
                                   (3, "s2", "z")]),
                 partition_by=("sdts",))
    # hive fast path must be disabled (native DELETE supersedes it)
    assert store.partitions("t", "sdts") == {}
    assert store.drop_partitions("t", "sdts", ["s2"]) == 1
    assert [r.sdts for r in store.read("t").collect()] == ["s1"]


def test_clean_up_pit_on_delta(dspark, store):
    from datavault4dbt_spark.operators.maintenance import clean_up_pit

    # 4 snapshot days x 5 rows, sdts-partitioned like a production PIT
    rows = [(i, f"2024-01-0{1 + i % 4} 00:00:00", "p") for i in range(20)]
    pit = (_df(dspark, rows).withColumnRenamed("k", "hk")
           .withColumn("sdts", F.to_timestamp("sdts")))
    store.append("pit_t", pit, partition_by=("sdts",))
    snap = (store.read("pit_t").select("sdts").distinct()
            .withColumn("is_active", F.dayofmonth("sdts") <= 2))
    # 2 of 4 days stale, 5 rows each -> 10 deleted, reported from the
    # DELETE commit's metrics (no count scans on the metrics path)
    assert clean_up_pit(store, "pit_t", snap) == 10
    assert store.read("pit_t").select("sdts").distinct().count() == 2


def test_run_pipeline_storage_agnostic(dspark, store, sf_dir):
    """The project pipeline must run unchanged against DeltaStore."""
    from datavault4dbt_spark import fixtures
    from datavault4dbt_spark.plans.pipeline import EntityDecl, run_pipeline
    from datavault4dbt_spark.operators.stage import build_stage
    from datavault4dbt_spark.operators.hub import build_hub

    reg = fixtures.registry(dspark, sf_dir)
    decls = {
        "stage_nation": EntityDecl("stage_nation", build_stage,
                                   fixtures.STAGES["stage_nation"],
                                   deps=("nation",), materialize="view"),
        "hub_nation": EntityDecl("hub_nation", build_hub,
                                 fixtures.HUBS["hub_nation"],
                                 deps=("stage_nation",)),
    }
    counts = run_pipeline(dspark, decls, store, reg)
    assert counts["hub_nation"] > 0
    again = run_pipeline(dspark, decls, store, reg)
    assert again["hub_nation"] == 0  # idempotent replay


def test_make_store_prefers_delta(dspark, tmp_path):
    s = make_store(dspark, str(tmp_path / "v"), prefer="auto")
    assert isinstance(s, DeltaStore)
