"""Ghost-record value generation per datatype.

Re-implements the reference's databricks ghost-record branch
(reference: macros/supporting/ghost_record_per_datatype.sql:583-632):
every stage emits one 'unknown' row (beginning-of-all-times / SYSTEM /
zero-key) and one 'error' row (end-of-all-times / ERROR / error-key),
with per-datatype sentinel values. The generated SQL literal text is
valid in both Spark SQL and DuckDB, so the oracle gets the identical
rows for free.
"""

from __future__ import annotations

from ..context import GlobalConfig, DEFAULT
from .hashing import sql_str

_NUMERIC = {"INT", "INTEGER", "SMALLINT", "TINYINT", "BIGINT", "DOUBLE", "FLOAT", "REAL"}


def normalize_dtype(dt: str) -> str:
    dt = dt.strip().upper()
    aliases = {"VARCHAR": "STRING", "TEXT": "STRING", "LONG": "BIGINT",
               "INTEGER": "INT", "REAL": "FLOAT", "BOOL": "BOOLEAN",
               "TIMESTAMP_NTZ": "TIMESTAMP"}
    return aliases.get(dt, dt)


def ghost_value_sql(dtype: str, kind: str, g: GlobalConfig = DEFAULT) -> str:
    """SQL literal for a ghost value of the given datatype.

    kind: 'unknown' | 'error'. Text is dialect-neutral.
    """
    dt = normalize_dtype(dtype)
    unknown = kind == "unknown"
    if dt == "TIMESTAMP":
        v = g.beginning_of_all_times if unknown else g.end_of_all_times
        return f"CAST({sql_str(v)} AS TIMESTAMP)"
    if dt == "DATE":
        v = g.beginning_of_all_times_date if unknown else g.end_of_all_times_date
        return f"CAST({sql_str(v)} AS DATE)"
    if dt == "STRING":
        return sql_str(g.unknown_value_string if unknown else g.error_value_string)
    if dt in _NUMERIC or dt.startswith("DECIMAL"):
        v = g.unknown_value_numeric if unknown else g.error_value_numeric
        return f"CAST('{v}' AS {dt})"
    if dt == "BOOLEAN":
        return "CAST('FALSE' AS BOOLEAN)"
    if dt == "BINARY":
        return f"CAST({sql_str(g.unknown_key if unknown else g.error_key)} AS BINARY)"
    return f"CAST(NULL AS {dt})"


def ghost_hash_sql(kind: str, g: GlobalConfig = DEFAULT) -> str:
    """Ghost value for a hash column (reference: stage.sql:595-600).
    Binary vaults get the zero-key's raw bytes (unhex, identical in
    Spark and DuckDB) — a CAST would encode the hex TEXT instead."""
    key = g.unknown_key if kind == "unknown" else g.error_key
    if g.hash_is_binary:
        return f"unhex({sql_str(key)})"
    return f"CAST({sql_str(key)} AS STRING)"


def ghost_ldts_sql(kind: str, g: GlobalConfig = DEFAULT) -> str:
    v = g.beginning_of_all_times if kind == "unknown" else g.end_of_all_times
    return f"CAST({sql_str(v)} AS TIMESTAMP)"


def ghost_rsrc_sql(kind: str, g: GlobalConfig = DEFAULT) -> str:
    return sql_str(g.default_unknown_rsrc if kind == "unknown" else g.default_error_rsrc)
