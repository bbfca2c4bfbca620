"""t2-style correctness: every declared entity query must hash-match the
DuckDB oracle generated from the same config (driver-style compare)."""

import pytest

from conftest import compare_spark_duck

from datavault4dbt_spark import fixtures

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", fixtures.declared_entity_names())
def test_entity_matches_oracle(spark, sf_dir, name):
    df = fixtures.entity_query(name)(spark, sf_dir)
    sql = fixtures.entity_oracle_sql(name)
    compare_spark_duck(spark, sf_dir, df, sql)
