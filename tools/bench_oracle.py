"""Symmetric DuckDB-oracle benchmark: time every exposed entity's
oracle SQL at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) with
the same min-of-N method bench.py uses for the Spark side, and print
ONE JSON line. Run back-to-back with bench.py on the same (idle) host
for the like-for-like pair BENCH.md records each round.

Not part of pytest — the perf-bookkeeping twin of tools/driver_sim.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import duckdb
    from datavault4dbt_spark import fixtures

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2")))

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = sys.argv[1:] or fixtures.all_entity_names()
    timings = {}
    t_start = time.time()
    for name in names:
        sql = fixtures.entity_oracle_sql(name)
        best = None
        for _ in range(trials):
            q0 = time.time()
            # fetchall() materializes the full result — the analogue of
            # the Spark side's noop sink (execute alone is lazy-ish for
            # large outputs via the streaming result interface)
            con.execute(sql).fetchall()
            el = time.time() - q0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "oracle_total_query_seconds", "value": total,
        "unit": "sec", "queries": timings,
        "wall": round(time.time() - t_start, 3), "sf": sf_dir}))


if __name__ == "__main__":
    main()
