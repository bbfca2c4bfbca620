"""Similarity search over an embedding column (array<float>).

Two tiers, same output shape (query_id, neighbor_id, rank, cosine):

- ``ann_bruteforce`` : exact cosine top-k — the recall baseline. The
  query set is broadcast (it is small by definition), so the scan side
  never shuffles: score + per-query top-k via window.
- ``ann_lsh``        : sign-LSH bucketed top-k — the scale path. Each
  vector gets a deterministic bucket from the signs of its leading
  coordinates (a fixed, axis-aligned hyperplane family — chosen over
  random projections so the DuckDB oracle reproduces it bit-for-bit);
  search only compares queries with same-bucket candidates.

Scale design (100 TB): the candidate table is hash-partitioned by
bucket; queries broadcast; per-bucket top-k is a window over the
(bucket-pruned) join output, so shuffle volume is O(candidates), not
O(n_vectors). Raising `lsh_bits` shrinks buckets geometrically; a
multi-probe variant would union a few flipped-bit buckets — same plan
shape. All arithmetic is double-precision left-fold (textprep note) so
Spark and the oracle agree exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_min_parallelism
from ..plans.sqlbuild import SqlBuilder
from .dedup import _spark_dot, _spark_norm, _duck_dot, _duck_norm


@dataclass(frozen=True)
class AnnConfig:
    name: str
    source: str = "embeddings"
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    k: int = 5
    query_filter: str = "vec_id < 16"   # defines the query subset
    lsh_bits: int = 0                   # 0 = brute force; >0 = sign-LSH
    dim: int = 0                        # 0 = HOF fold (see dedup.py note)


def _bucket_expr(vec: str, bits: int, dialect: str) -> str:
    """Sign bucket from the first `bits` coordinates: bit i set iff
    vec[i+1] >= 0. Array indexing is 1-based in both engines; Spark
    needs element_at (bracket indexing with a variable is Duck-only)."""
    terms = []
    for i in range(bits):
        at = (f"element_at({vec}, {i + 1})" if dialect == "spark"
              else f"{vec}[{i + 1}]")
        terms.append(f"CASE WHEN {at} >= 0 THEN {2 ** i} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def build_ann_topk(spark, reg: Registry, cfg: AnnConfig,
                   g: GlobalConfig = DEFAULT) -> DataFrame:
    df = ensure_min_parallelism(reg.load(spark, cfg.source))
    v = df.selectExpr(
        cfg.id_col,
        f"transform({cfg.vec_col}, x -> cast(x AS DOUBLE)) AS v",
        f"({cfg.query_filter}) AS is_q")
    n = v.selectExpr(cfg.id_col, "v", "is_q", f"{_spark_norm('v')} AS nrm") \
         .persist()  # queries + candidates both read it
    if cfg.lsh_bits:
        n = n.selectExpr(cfg.id_col, "v", "is_q", "nrm",
                         f"{_bucket_expr('v', cfg.lsh_bits, 'spark')} AS bkt")
    queries = F.broadcast(n.filter("is_q"))
    cands = n
    join_cond = [F.col(f"q.{cfg.id_col}") != F.col(f"c.{cfg.id_col}")]
    if cfg.lsh_bits:
        join_cond.append(F.col("q.bkt") == F.col("c.bkt"))
    scored = (queries.alias("q").join(cands.alias("c"), join_cond)
              .selectExpr(f"q.{cfg.id_col} AS query_id",
                          f"c.{cfg.id_col} AS neighbor_id",
                          f"round({_spark_dot('q.v', 'c.v', cfg.dim)} / (q.nrm * c.nrm), 6)"
                          " AS cosine"))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= cfg.k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


def ann_topk_oracle(b: SqlBuilder, reg: Registry, cfg: AnnConfig,
                    g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    bkt = (f", {_bucket_expr('v', cfg.lsh_bits, 'duck')} AS bkt"
           if cfg.lsh_bits else "")
    v = b.cte(f"{cfg.name}__v",
              f"SELECT {cfg.id_col}, "
              f"list_transform({cfg.vec_col}, x -> CAST(x AS DOUBLE)) AS v, "
              f"({cfg.query_filter}) AS is_q FROM {src}")
    n = b.cte(f"{cfg.name}__n",
              f"SELECT {cfg.id_col}, v, is_q, {_duck_norm('v')} AS nrm{bkt} "
              f"FROM {v}")
    cond = f"q.{cfg.id_col} <> c.{cfg.id_col}"
    if cfg.lsh_bits:
        cond += " AND q.bkt = c.bkt"
    dot = _duck_dot("q.v", "c.v", "len(q.v)", cfg.dim)
    scored = b.cte(f"{cfg.name}__scored",
                   f"SELECT q.{cfg.id_col} AS query_id, "
                   f"c.{cfg.id_col} AS neighbor_id, "
                   f"round({dot} / (q.nrm * c.nrm), 6) AS cosine "
                   f"FROM {n} q JOIN {n} c ON {cond} WHERE q.is_q")
    return b.cte(cfg.name,
                 f"SELECT query_id, neighbor_id, rank, cosine FROM ("
                 f"SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
                 f"ORDER BY cosine DESC, neighbor_id ASC) AS rank "
                 f"FROM {scored}) WHERE rank <= {cfg.k}")
