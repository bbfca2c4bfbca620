"""Harness-path smoke: every timestamp a query emits must survive the
pandas datetime64[ns] conversion the correctness harness performs.

Round-1 regression: the ghost sentinels (then 0001-01-02 / 8888-12-31)
were valid Spark+DuckDB timestamps but raised OutOfBoundsDatetime when
the driver converted collected rows through pandas — 35/50 queries
erred without a single wrong value. This pins the conversion path
itself for entities that carry ghost records and end-dates.
"""

import pandas as pd

from datavault4dbt_spark import fixtures


# one representative per sentinel-bearing shape: stage (ghost rows),
# hub (ghost keys), sat v0+v1 (ledts end-dating), pit (ghost COALESCE)
ENTITIES = ["stage_region", "hub_region", "sat_nation_s",
            "sat_customer_n0_s_v1", "pit_customer"]


def test_pandas_roundtrip_sentinels(spark, sf_dir):
    for name in ENTITIES:
        df = fixtures.entity_query(name)(spark, sf_dir)
        rows = df.collect()
        assert rows, name
        # the driver builds a pandas frame from collected rows; any
        # out-of-ns-range timestamp raises OutOfBoundsDatetime here
        pdf = pd.DataFrame([r.asDict() for r in rows])
        assert len(pdf) == len(rows), name


def test_sentinels_inside_ns_window():
    g = fixtures.G
    lo, hi = pd.Timestamp.min, pd.Timestamp.max
    for v in (g.beginning_of_all_times, g.end_of_all_times):
        t = pd.Timestamp(v)
        assert lo < t < hi, v
    for v in (g.beginning_of_all_times_date, g.end_of_all_times_date):
        t = pd.Timestamp(v)
        assert lo < t < hi, v
