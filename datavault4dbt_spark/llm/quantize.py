"""Scalar quantization of embeddings (the "SQ8" compression tier of an
IVF+SQ ANN index — Jégou et al. 2011 product-quantization lineage, the
scalar special case every production vector store ships).

Each dimension gets a corpus-wide [min, max] range; a value maps to
``floor((x - min) / (max - min) * levels)`` clamped to ``levels - 1``
(degenerate constant dimensions map to code 0). The operator emits the
per-vector code string plus the reconstruction error of dequantizing
back to the range midpoints — the quality metric that decides whether
SQ8 recall is acceptable before switching the search tier over.

Determinism/oracle contract: all arithmetic is IEEE double with the
same expression shape on both engines, and ``floor`` (never ``round``)
does the bucketing, so Spark and DuckDB agree bit-for-bit; the
reconstruction error folds in dimension order (an ordered fold, not a
shuffled SUM) for reproducible accumulation.

Scale design (100 TB): the stats table is ``n_dims`` rows — a
broadcast; codes are computed in one pass over the exploded vectors
(shuffle keyed on the dimension index for stats, then on vec_id for
reassembly — both skew-free: dims are uniform by construction, ids are
unique). At scale you persist the codes table and the search tier
scans codes (levels<=256 → 1 byte/dim) instead of float32 — a 4x scan
reduction the ANN operators in ``similarity.py`` can consume.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_min_parallelism
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class ScalarQuantizeConfig:
    name: str
    source: str = "embeddings"
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    levels: int = 256          # SQ8


def _code_expr(levels: int) -> str:
    """Identical in both dialects over columns (x, mn, mx)."""
    return (f"CASE WHEN mx = mn THEN 0 ELSE "
            f"least(CAST(floor((x - mn) / (mx - mn) * {levels}) AS INT), "
            f"{levels - 1}) END")


def _dq_expr(levels: int) -> str:
    return (f"(mn + (code + CAST(0.5 AS DOUBLE)) * (mx - mn) "
            f"/ CAST({levels} AS DOUBLE))")


def build_scalar_quantize(spark, reg: Registry, cfg: ScalarQuantizeConfig,
                          g: GlobalConfig = DEFAULT) -> DataFrame:
    df = ensure_min_parallelism(reg.load(spark, cfg.source))
    v = df.selectExpr(
        cfg.id_col,
        f"transform({cfg.vec_col}, x -> cast(x AS DOUBLE)) AS v")
    e = v.selectExpr(cfg.id_col, "posexplode(v) AS (i, x)")
    # consumed by stats AND the quantization join
    e = e.persist()
    stats = e.groupBy("i").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    q = (e.join(F.broadcast(stats), on="i")
         .selectExpr(cfg.id_col, "i", "x", "mn", "mx",
                     f"{_code_expr(cfg.levels)} AS code")
         .selectExpr(cfg.id_col, "i", "code",
                     f"abs(x - {_dq_expr(cfg.levels)}) AS err"))
    return (q.groupBy(cfg.id_col)
            .agg(F.array_sort(F.collect_list(F.struct("i", "code", "err")))
                 .alias("s"))
            .selectExpr(
                cfg.id_col,
                "size(s) AS n_dims",
                "concat_ws(',', transform(s, e -> CAST(e.code AS STRING)))"
                " AS codes",
                # ordered fold: deterministic FP accumulation
                "round(aggregate(s, cast(0.0 AS DOUBLE), "
                "(acc, e) -> acc + e.err) / size(s), 6) AS recon_mae"))


def scalar_quantize_oracle(b: SqlBuilder, reg: Registry,
                           cfg: ScalarQuantizeConfig,
                           g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    v = b.cte(f"{cfg.name}__v",
              f"SELECT {cfg.id_col}, "
              f"list_transform({cfg.vec_col}, x -> CAST(x AS DOUBLE)) AS v "
              f"FROM {src}")
    e = b.cte(f"{cfg.name}__e",
              f"SELECT {cfg.id_col}, i - 1 AS i, v[i] AS x FROM {v}, "
              f"UNNEST(range(1, len(v) + 1)) AS t(i)")
    stats = b.cte(f"{cfg.name}__stats",
                  f"SELECT i, min(x) AS mn, max(x) AS mx FROM {e} "
                  f"GROUP BY i")
    q = b.cte(
        f"{cfg.name}__q",
        f"SELECT e.{cfg.id_col}, e.i, "
        f"{_code_expr(cfg.levels)} AS code, x, mn, mx "
        f"FROM {e} e JOIN {stats} s ON e.i = s.i")
    qe = b.cte(
        f"{cfg.name}__qe",
        f"SELECT {cfg.id_col}, i, code, "
        f"abs(x - {_dq_expr(cfg.levels)}) AS err FROM {q}")
    # ordered re-assembly: list_sort over (i, code, err) structs mirrors
    # Spark's array_sort(collect_list(struct(...)))
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, CAST(len(s) AS INT) AS n_dims, "
        f"array_to_string(list_transform(s, e -> CAST(e.code AS VARCHAR)), ',')"
        f" AS codes, "
        f"round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(s, e -> e.err)), (acc, x) -> acc + x) / len(s), 6)"
        f" AS recon_mae FROM ("
        f"SELECT {cfg.id_col}, "
        f"list_sort(list(struct_pack(i := i, code := code, err := err))) AS s "
        f"FROM {qe} GROUP BY {cfg.id_col})")
