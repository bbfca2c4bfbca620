"""Document chunking: fixed-size overlapping character windows — the
context-window preparation step for pretraining and retrieval corpora
(every RAG/embedding pipeline re-cuts documents into overlapping
chunks; overlap preserves cross-boundary context, stride controls the
duplication factor).

Chunk grammar (1-based, both dialects):

    n_chunks   = 1                           if length <= chunk_chars
               = 1 + ceil((length - chunk_chars) / stride)  otherwise
    chunk_start(i) = 1 + i * stride          for i in [0, n_chunks)
    chunk_text(i)  = substring(text, chunk_start, chunk_chars)

NULL text yields no rows (there is nothing to cut); empty text yields
one empty chunk (the document exists — downstream joins keyed on
doc_id must not lose it). The last chunk may be shorter than
``chunk_chars`` (substring clamps identically in Spark and DuckDB).

Scale design (100 TB): pure scan-stage generate+project — the
``sequence``/``range`` explode and the substring run inside
whole-stage codegen with ZERO shuffles; output size is input size
times the overlap factor (chunk/stride), which the config makes
explicit. Chunk provenance (doc_id, chunk_id, chunk_start) rides
along, so any downstream dedup/score can be mapped back to exact
character offsets.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class ChunkConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    chunk_chars: int = 120
    stride: int = 90             # overlap = chunk_chars - stride

    def __post_init__(self):
        if self.chunk_chars < 1 or self.stride < 1:
            raise ValueError(
                f"{self.name}: chunk_chars and stride must be >= 1")
        if self.stride > self.chunk_chars:
            raise ValueError(
                f"{self.name}: stride ({self.stride}) > chunk_chars "
                f"({self.chunk_chars}) would skip characters between "
                f"chunks — use stride <= chunk_chars")


def _n_chunks_expr(cfg: ChunkConfig) -> str:
    """Identical text in Spark SQL and DuckDB; DOUBLE ceil is exact for
    any realistic document length (< 2^52)."""
    n = f"length({cfg.text_col})"
    return (f"CASE WHEN {n} <= {cfg.chunk_chars} THEN 1 "
            f"ELSE 1 + CAST(ceil(CAST({n} - {cfg.chunk_chars} AS DOUBLE) "
            f"/ {cfg.stride}) AS INT) END")


def chunk_dataframe(df: DataFrame, cfg: ChunkConfig,
                    carry: tuple = ()) -> DataFrame:
    """Chunk an arbitrary DataFrame — the single implementation both
    the batch builder and the streaming path use (stateless generate+
    project, so it runs unchanged inside a micro-batch plan; shared
    code means stream and batch cannot drift). ``carry``: extra
    columns to pass through unchanged (e.g. the event-time column a
    stream's watermark rides on)."""
    # Spark's sequence(0, -1) counts DOWN — guard with the NULL filter
    # (n_chunks >= 1 for every non-NULL text by construction)
    base = (df.filter(f"{cfg.text_col} IS NOT NULL")
            .selectExpr(cfg.id_col, *carry, cfg.text_col,
                        f"{_n_chunks_expr(cfg)} AS n_chunks"))
    return base.selectExpr(
        cfg.id_col, *carry,
        "explode(sequence(0, n_chunks - 1)) AS chunk_id",
        "n_chunks", cfg.text_col,
    ).selectExpr(
        cfg.id_col, *carry, "chunk_id", "n_chunks",
        f"1 + chunk_id * {cfg.stride} AS chunk_start",
        f"substring({cfg.text_col}, 1 + chunk_id * {cfg.stride}, "
        f"{cfg.chunk_chars}) AS chunk_text",
    ).selectExpr(cfg.id_col, *carry, "chunk_id", "n_chunks",
                 "chunk_start", "length(chunk_text) AS chunk_len",
                 "chunk_text")


def build_doc_chunks(spark, reg: Registry, cfg: ChunkConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    return chunk_dataframe(reg.load(spark, cfg.source), cfg)


def doc_chunks_oracle(b: SqlBuilder, reg: Registry, cfg: ChunkConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    base = b.cte(f"{cfg.name}__b",
                 f"SELECT {cfg.id_col}, {cfg.text_col}, "
                 f"{_n_chunks_expr(cfg)} AS n_chunks FROM {src} "
                 f"WHERE {cfg.text_col} IS NOT NULL")
    ex = b.cte(
        f"{cfg.name}__e",
        f"SELECT {cfg.id_col}, CAST(i AS INT) AS chunk_id, n_chunks, "
        f"CAST(1 + i * {cfg.stride} AS INT) AS chunk_start, "
        f"substring({cfg.text_col}, CAST(1 + i * {cfg.stride} AS INT), "
        f"{cfg.chunk_chars}) AS chunk_text "
        f"FROM {base}, UNNEST(range(0, n_chunks)) AS t(i)")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, chunk_id, n_chunks, chunk_start, "
        f"CAST(length(chunk_text) AS INT) AS chunk_len, chunk_text "
        f"FROM {ex}")
