"""Small-file compaction: rewrite a fragmented table directory into a
declared number of right-sized files, preserving every row.

The lake-maintenance operation every long-running ingestion needs
(streaming sinks and incremental loads write a file per micro-batch
per partition; a 100 TB table fragmented into millions of KB-scale
files is throttled by file-listing and per-file open cost, not I/O —
the "small files problem"; Delta/Iceberg call the remedy OPTIMIZE /
rewrite_data_files). This operator is the engine-native form: read the
fragmented directory, ``repartition(target_files)`` (a round-robin
exchange — the only shuffle, and exactly the one that balances output
sizes), write to a fresh directory, and verify.

The driver-gated fixture stages a deliberately fragmented copy
(``fragment_files`` writers) and returns the rows read back from the
compacted result; the oracle reads the ORIGINAL table, so a green hash
certifies zero row loss/duplication through the rewrite. The file
count contract (exactly ``target_files`` data files) is pinned in
tests/test_compaction.py.

Scale design (100 TB): compaction is embarrassingly parallel in the
round-robin exchange; no key skew is possible (no key). At cluster
scale the same operator runs per partition-directory so the rewrite
prunes to hot partitions — composition with the partitioned layout
(sources/readers.PartitionedRoundtripConfig), not a new operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..context import Registry


@dataclass(frozen=True)
class CompactionConfig:
    """``fragment_files``: how fragmented the staged input is (the
    problem being fixed). ``target_files``: data files after
    compaction."""

    name: str
    source: str = "documents"
    cols: tuple = ("doc_id", "text", "lang", "source", "n_chars")
    fragment_files: int = 48
    target_files: int = 4

    def __post_init__(self):
        if not self.cols:
            raise ValueError(f"{self.name}: cols must be non-empty")
        if self.fragment_files < 1 or self.target_files < 1:
            raise ValueError(
                f"{self.name}: fragment_files and target_files "
                f"must be >= 1")


def compact_directory(spark, in_path: str, out_path: str,
                      n_files: int, schema_ddl: str | None = None):
    """The reusable maintenance op: rewrite ``in_path`` into exactly
    ``n_files`` parquet files at ``out_path``."""
    r = spark.read
    if schema_ddl:
        r = r.schema(schema_ddl)
    df = r.parquet(in_path)
    (df.repartition(n_files).write.mode("overwrite").parquet(out_path))
    out = spark.read
    if schema_ddl:
        out = out.schema(schema_ddl)
    return out.parquet(out_path)


def build_compaction(spark, reg: Registry, cfg: CompactionConfig, g=None):
    from ..plans.incremental import scratch_store
    import shutil

    src = reg.load(spark, cfg.source).select(*cfg.cols)
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields)
    store = scratch_store(spark, cfg.name, prefix="dv4dbt_compact")
    frag, compacted = store.path("frag"), store.path("compacted")
    shutil.rmtree(frag, ignore_errors=True)
    shutil.rmtree(compacted, ignore_errors=True)
    (src.repartition(cfg.fragment_files)
     .write.mode("overwrite").parquet(frag))
    out = compact_directory(spark, frag, compacted,
                            cfg.target_files, schema_ddl)
    return out.select(*cfg.cols)


def compaction_oracle(b, reg: Registry, cfg: CompactionConfig,
                      g=None) -> str:
    src = reg.duckdb_relation(cfg.source)
    return b.cte(cfg.name,
                 f"SELECT {', '.join(cfg.cols)} FROM {src}")
