"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes every declared Data Vault entity (stages, hubs,
links, satellites, ...) built by datavault4dbt_spark; oracle_sql()
returns the DuckDB SQL generated from the SAME config, so the driver's
t2 gate compares two independent executions of one declared semantic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datavault4dbt_spark import fixtures


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: current satellite state per customer — hub joined
    to the virtually end-dated satellite's current rows (sf0.001)."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    hub = fixtures.entity_query("hub_customer")(spark, sf_dir)
    sat = fixtures.entity_query("sat_customer_n0_s_v1")(spark, sf_dir)
    cur = sat.filter(F.col("IS_CURRENT")).select(
        "hk_customer_h", "hd_customer_n_s", "ldts", "ledts")
    return hub.select("hk_customer_h", "c_custkey").join(
        cur, "hk_customer_h", "inner")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fixtures.entity_query(name)
            for name in fixtures.all_entity_names()}


def oracle_sql() -> dict[str, str]:
    return {name: fixtures.entity_oracle_sql(name)
            for name in fixtures.all_entity_names()}
