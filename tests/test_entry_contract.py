"""Driver-contract smoke: entry() must run against a bare SparkSession
and return a stable-schema DataFrame; queries()/oracle_sql() must stay
consistent (every oracle key has a query, column names line up after
the driver's sort-by-name compare)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from datavault4dbt_spark import fixtures


def test_entry_runs_and_has_stable_schema(spark):
    df = entrymod.entry(spark)
    cols = set(df.columns)
    assert {"hk_customer_h", "c_custkey", "hd_customer_n_s",
            "ldts", "ledts"} <= cols
    assert df.count() >= 0


def test_queries_and_oracle_keys_consistent():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert list(qs) == fixtures.all_entity_names()
    # the driver checks the first 50 keys: the exposed surface must fit
    # entirely inside that window (bundled entities are verified through
    # vault_dims_bundle — see fixtures._BUNDLED / operators/bundle.py)
    assert len(qs) <= 50
    assert "vault_dims_bundle" in qs
    # every declared entity is either exposed or bundle-verified
    exposed = set(qs) | fixtures._BUNDLED
    assert exposed == set(fixtures.declared_entity_names())
