"""Semi-structured JSON field extraction: typed scalar columns pulled
out of a JSON string column by path — the flatten step every event /
log / API-payload pipeline runs before anything relational can happen
to the data. Missing paths and type-mismatched values yield NULL (the
permissive contract ingestion needs; a strict lane can count the NULLs
downstream — see the quarantine pattern in the violations report,
operators/checks.py).

Scale design (100 TB): extraction is a pure scan-stage projection —
Spark's ``get_json_object`` evaluates inside whole-stage codegen with
no shuffle, no UDF, and column pruning still reaches the scan (only
the JSON column and the kept columns are read). Each configured path
is one expression; a 100-field flatten is still one pass. The oracle
renders the same paths through DuckDB's ``json_extract_string`` — the
one operator in this repo where the two dialects genuinely need
different function names, which is exactly what the dual-builder
pattern exists for.

Reference anchor: none (the reference's staging assumes relational
sources; derived_columns can hold warehouse JSON functions but no
macro models them) — this extends the staging surface the way
warehouse adapters' semi-structured types do.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

from pyspark.sql import DataFrame

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder

_TYPES = {"string", "int", "integer", "bigint", "double", "boolean"}
# Spark CAST type -> DuckDB CAST type
_DUCK_TYPES = {"string": "VARCHAR", "int": "INTEGER", "integer": "INTEGER",
               "bigint": "BIGINT", "double": "DOUBLE",
               "boolean": "BOOLEAN"}


@dataclass(frozen=True)
class JsonExtractConfig:
    """``fields``: (alias, json_path, type) triples. Paths use the
    ``$.a.b`` dotted form both engines accept; types are the portable
    scalar set. ``keep_cols`` pass through beside the extractions."""

    name: str
    source: str
    json_col: str
    fields: Tuple[Tuple[str, str, str], ...]
    keep_cols: Tuple[str, ...] = ()

    def __post_init__(self):
        if not self.fields:
            raise ValueError(f"{self.name}: fields must be non-empty")
        for c in (self.json_col, *self.keep_cols):
            ensure_identifier(c, "column", self.name)
        out_names = [*self.keep_cols, *(a for a, _p, _t in self.fields)]
        dupes = {n for n in out_names if out_names.count(n) > 1}
        if dupes:
            raise ValueError(f"{self.name}: duplicate output columns "
                             f"{sorted(dupes)} (aliases must not "
                             f"collide with keep_cols or each other)")
        for alias, path, typ in self.fields:
            ensure_identifier(alias, "column", self.name)
            if typ.lower() not in _TYPES:
                raise ValueError(f"{self.name}: {alias}: type {typ!r} "
                                 f"not in the portable set {_TYPES}")
            if not path.startswith("$") or "'" in path or '"' in path:
                raise ValueError(f"{self.name}: {alias}: path must be a "
                                 f"quote-free $.dotted form, got {path!r}")


def build_json_extract(spark, reg: Registry, cfg: JsonExtractConfig,
                       g: GlobalConfig = DEFAULT) -> DataFrame:
    src = reg.load(spark, cfg.source)
    # TRY_CAST, not CAST: Spark 4 runs ANSI mode by default, where a
    # malformed scalar would fail the whole scan instead of yielding
    # the permissive NULL this operator promises
    exprs = list(cfg.keep_cols) + [
        f"TRY_CAST(get_json_object({cfg.json_col}, '{path}') AS {typ}) "
        f"AS {alias}"
        for alias, path, typ in cfg.fields]
    return src.selectExpr(*exprs)


def json_extract_oracle(b: SqlBuilder, reg: Registry,
                        cfg: JsonExtractConfig,
                        g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    cols = list(cfg.keep_cols) + [
        f"TRY_CAST(json_extract_string({cfg.json_col}, '{path}') "
        f"AS {_DUCK_TYPES[typ.lower()]}) AS {alias}"
        for alias, path, typ in cfg.fields]
    return b.cte(cfg.name, f"SELECT {', '.join(cols)} FROM {src}")
