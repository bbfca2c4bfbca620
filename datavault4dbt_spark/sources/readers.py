"""Source registration: files/tables -> model registry entries.

The reference owns no I/O — dbt's ``ref()``/``source()`` resolve
relations and the warehouse reads them (SURVEY §2.3 Scan/source). In
this engine the :class:`~..context.Registry` plays that role; this
module provides the readers that populate it from storage: batch and
streaming, parquet/csv/json/orc (Delta when the runtime has
delta-spark installed — gated import, not required).

Scale notes: readers pass schemas explicitly where known (no inference
scan), push options straight to the DataSource (so Catalyst pushdown /
partition pruning work), and leave partition discovery to Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..context import Registry


_BATCH_FORMATS = {"parquet", "csv", "json", "orc", "delta"}


@dataclass(frozen=True)
class SourceConfig:
    name: str
    path: str
    format: str = "parquet"
    schema: str | None = None          # DDL string, e.g. "id BIGINT, v STRING"
    options: tuple = ()                # (("header", "true"), ...)
    duckdb_relation: str | None = None  # oracle-side SQL, when applicable


def _delta_available(spark) -> bool:
    try:
        spark._jvm.io.delta.tables.DeltaTable  # noqa: B018 — probe
        return True
    except Exception:
        return False


def read_source(spark, cfg: SourceConfig):
    if cfg.format not in _BATCH_FORMATS:
        raise ValueError(f"unsupported source format: {cfg.format}")
    if cfg.format == "delta" and not _delta_available(spark):
        raise RuntimeError("delta-spark is not installed in this runtime")
    r = spark.read.format(cfg.format)
    if cfg.schema:
        r = r.schema(cfg.schema)
    for k, v in cfg.options:
        r = r.option(k, v)
    return r.load(cfg.path)


def open_source_stream(spark, cfg: SourceConfig, max_files_per_trigger: int = 10):
    """Streaming variant (file source). Schema is mandatory for
    streaming file sources; when absent it is borrowed from a one-off
    batch read of the same location."""
    schema = cfg.schema or read_source(spark, cfg).schema
    r = (spark.readStream.format(cfg.format).schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger))
    for k, v in cfg.options:
        r = r.option(k, v)
    return r.load(cfg.path)


def register_sources(reg: Registry, configs) -> Registry:
    for cfg in configs:
        reg.register(
            cfg.name,
            (lambda spark, c=cfg: read_source(spark, c)),
            cfg.duckdb_relation or cfg.name)
    return reg
