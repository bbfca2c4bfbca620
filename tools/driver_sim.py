"""Local simulation of the driver's correctness gate: run every
queries() entry AND its oracle_sql() at sf0.01, convert BOTH results
through pandas (the path that broke round 1), and compare row count,
schema (sorted column names) and a value hash. Prints per-query status
and a summary. Not part of pytest — a dev feedback loop."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_DIR = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")


def value_hash(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append("\x01".join(
            "\x00NULL" if v is None or (isinstance(v, float) and v != v)
            else (repr(v) if isinstance(v, float) else str(v))
            for v in tup))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[16]")
             .appName("driver-sim")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = sys.argv[1:]
    unknown = [n for n in only if n not in qs]
    if unknown:
        # a bundled or misspelled name would otherwise be skipped
        # SILENTLY and the run would certify nothing for it
        print(f"WARNING: not on the exposed surface (skipped): "
              f"{unknown} — bundled entities verify through their "
              f"bundle row or tests/test_oracle_parity.py")
    ok = bad = err = 0
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = pd.DataFrame([r.asDict() for r in sdf.collect()],
                                columns=sdf.columns)
            osql = oracles.get(name)
            if osql is None:
                print(f"{name}: rows-only {len(spdf)} ({time.time()-t0:.1f}s)")
                ok += 1
                continue
            opdf = con.execute(osql).df()
            rows = len(spdf) == len(opdf)
            schema = sorted(spdf.columns) == sorted(opdf.columns)
            vh = value_hash(spdf) == value_hash(opdf)
            status = "OK" if (rows and schema and vh) else (
                f"MISMATCH rows={rows} schema={schema} hash={vh} "
                f"(s={len(spdf)} o={len(opdf)})")
            if rows and schema and vh:
                ok += 1
            else:
                bad += 1
            print(f"{name}: {status} ({time.time()-t0:.1f}s)")
        except Exception as e:
            err += 1
            print(f"{name}: ERR {type(e).__name__}: {str(e)[:200]}")
        spark.catalog.clearCache()
    print(f"\nTOTAL ok={ok} bad={bad} err={err} wall={time.time()-t_start:.0f}s")
    spark.stop()


if __name__ == "__main__":
    main()
