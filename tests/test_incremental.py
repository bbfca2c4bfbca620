"""Multi-batch replay: loading the three deterministic daily batches
one-by-one through the incremental path (HWM + anti-join append) must
produce exactly the single-shot full load (SURVEY §5 test plan)."""

import pytest
from pyspark.sql import functions as F

from datavault4dbt_spark import fixtures
from datavault4dbt_spark.context import DEFAULT, Registry
from datavault4dbt_spark.operators.hub import build_hub
from datavault4dbt_spark.operators.sat import build_sat_v0
from datavault4dbt_spark.operators.link import build_link
from datavault4dbt_spark.plans.incremental import ParquetStore, max_ldts

G = DEFAULT


def _staged_batches(spark, sf_dir, stage_name):
    """The stage split into its deterministic daily ldts batches."""
    full = fixtures.entity_query(stage_name)(spark, sf_dir)
    ghosts = full.filter(F.col("rsrc").isin("SYSTEM", "ERROR"))
    data = full.filter(~F.col("rsrc").isin("SYSTEM", "ERROR"))
    days = sorted(r[0] for r in data.select("ldts").distinct().collect())
    # ghost records ride along with the FIRST batch (they are generated
    # by the stage; replaying them is harmless but not realistic)
    return [data.filter(F.col("ldts") == d) if i else
            data.filter(F.col("ldts") == d).unionByName(ghosts)
            for i, d in enumerate(days)]


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(str(x) for x in r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("entity,builder", [
    ("hub_customer", build_hub),
    ("link_customer_nation", build_link),
    ("sat_customer_n0_s", build_sat_v0),
])
def test_batch_replay_equals_full_load(spark, sf_dir, tmp_path, entity, builder):
    cfg = fixtures._index()[entity][0]
    store = ParquetStore(spark, str(tmp_path))
    for batch in _staged_batches(spark, sf_dir, "stage_customer"):
        reg = Registry()
        reg.spark_loaders["stage_customer"] = lambda _s, b=batch: b
        target = store.read(entity) if store.exists(entity) else None
        new = builder(spark, reg, cfg, G, target=target)
        store.append(entity, new)

    want = fixtures.entity_query(entity)(spark, sf_dir)
    got = store.read(entity)
    assert _rows(got) == _rows(want)


def test_hwm_prunes_already_loaded_batches(spark, sf_dir, tmp_path):
    cfg = fixtures.HUBS["hub_customer"]
    store = ParquetStore(spark, str(tmp_path))
    batches = _staged_batches(spark, sf_dir, "stage_customer")

    reg = Registry()
    reg.spark_loaders["stage_customer"] = lambda _s, b=batches[0]: b
    store.append("hub", build_hub(spark, reg, cfg, G, target=None))
    hwm = max_ldts(store.read("hub"), G)

    # replay batch 0 + batch 1 together: HWM must prune batch 0 rows
    both = batches[0].unionByName(batches[1])
    reg2 = Registry()
    reg2.spark_loaders["stage_customer"] = lambda _s, b=both: b
    new = build_hub(spark, reg2, cfg, G, target=store.read("hub"))
    inserted = new.collect()
    assert all(r.ldts > hwm for r in inserted)
    # and nothing already present sneaks back in
    present = {r.hk_customer_h for r in store.read("hub").collect()}
    assert all(r.hk_customer_h not in present for r in inserted)
