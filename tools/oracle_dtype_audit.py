"""Static dtype audit of every declared entity's DuckDB oracle.

DuckDB widens SUM over integers to HUGEINT (and some arithmetic to
DECIMAL); ``duckdb.df()`` converts those to float64, so the driver's
value hash renders '655.0' where Spark prints '655' — the class of bug
that made event_sessions_stream red in round 10 (VERDICT r10 item #3).
Bundles mask it (members are rendered to VARCHAR for the row-union
hash), so this audit binds EVERY declared entity's oracle standalone
with LIMIT 0 and flags any final column whose DuckDB type would change
its pandas rendering: HUGEINT, UHUGEINT, DECIMAL, UBIGINT.

Usage: python tools/oracle_dtype_audit.py   (exit 1 if any flagged)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.001")
BAD_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def main():
    import duckdb

    from datavault4dbt_spark import fixtures

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    flagged = errs = 0
    for name in fixtures.declared_entity_names():
        sql = fixtures.entity_oracle_sql(name)
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            errs += 1
            print(f"{name}: BIND ERROR {type(e).__name__}: {e}")
            continue
        bad_cols = [
            (c, str(ty)) for c, ty in zip(rel.columns, rel.types)
            if str(ty).upper() in BAD_TYPES
            or str(ty).upper().startswith("DECIMAL")
        ]
        if bad_cols:
            flagged += 1
            print(f"{name}: FLAG {bad_cols}")
    n = len(fixtures.declared_entity_names())
    print(f"TOTAL entities={n} flagged={flagged} bind_errors={errs}")
    sys.exit(1 if flagged or errs else 0)


if __name__ == "__main__":
    main()
