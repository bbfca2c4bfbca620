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
                          f"round(try_divide({_spark_dot('q.v', 'c.v', cfg.dim)}, q.nrm * c.nrm), 6)"
                          " AS cosine")
              # zero-norm vectors have undefined cosine (try_divide ->
              # NULL, matching DuckDB x/0): exclude those pairs rather
              # than ranking them last
              .filter(F.col("cosine").isNotNull()))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= cfg.k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


@dataclass(frozen=True)
class IvfConfig:
    """IVF (inverted-file) ANN: coarse-quantize vectors into cells,
    search only the query's nearest `nprobe` cells.

    Centroids are the first `n_cells` vectors by id — a deterministic
    seed choice (k-means iterations would refine them; the *search
    structure* — assign, probe, rank — is identical and this keeps the
    DuckDB oracle bit-exact). At scale the centroid table is broadcast
    and each vector is scored against n_cells centroids in the scan
    stage; the candidate join keys on cell id.
    """

    name: str
    source: str = "embeddings"
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    k: int = 5
    n_cells: int = 8
    nprobe: int = 2
    query_filter: str = "vec_id < 16"


def build_ann_ivf(spark, reg: Registry, cfg: IvfConfig,
                  g: GlobalConfig = DEFAULT) -> DataFrame:
    df = ensure_min_parallelism(reg.load(spark, cfg.source))
    v = df.selectExpr(
        cfg.id_col,
        f"transform({cfg.vec_col}, x -> cast(x AS DOUBLE)) AS v",
        f"({cfg.query_filter}) AS is_q")
    n = v.selectExpr(cfg.id_col, "v", "is_q",
                     f"{_spark_norm('v')} AS nrm").persist()
    # deterministic centroid seed: the n_cells LOWEST ids by rank (a
    # TakeOrdered, no shuffle), NOT `id < n_cells` — id spaces that
    # start above n_cells (hash ids, offset sequences) would otherwise
    # yield zero centroids and a silently empty result
    cents = (n.orderBy(F.col(cfg.id_col)).limit(cfg.n_cells)
             .selectExpr(f"{cfg.id_col} AS cell", "v AS cv", "nrm AS cnrm"))
    scored_cells = (n.crossJoin(F.broadcast(cents))
                    .selectExpr(cfg.id_col, "v", "is_q", "nrm", "cell",
                                f"try_divide({_spark_dot('v', 'cv')}, nrm * cnrm) AS csim"))
    wc = (Window.partitionBy(cfg.id_col)
          .orderBy(F.desc("csim"), F.asc("cell")))
    ranked = scored_cells.withColumn("crank", F.row_number().over(wc))
    cands = ranked.filter("crank = 1").select(cfg.id_col, "v", "nrm", "cell")
    probes = (ranked.filter(F.col("is_q") & (F.col("crank") <= cfg.nprobe))
              .select(F.col(cfg.id_col).alias("query_id"),
                      F.col("v").alias("qv"), F.col("nrm").alias("qnrm"),
                      "cell"))
    scored = (F.broadcast(probes).alias("q")
              .join(cands.alias("c"),
                    [F.col("q.cell") == F.col("c.cell"),
                     F.col("q.query_id") != F.col(f"c.{cfg.id_col}")])
              .selectExpr("q.query_id",
                          f"c.{cfg.id_col} AS neighbor_id",
                          f"round(try_divide({_spark_dot('q.qv', 'c.v')}, q.qnrm * c.nrm), 6)"
                          " AS cosine")
              .filter(F.col("cosine").isNotNull())
              .distinct())   # a neighbor can appear via several probes
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= cfg.k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


def ann_ivf_oracle(b: SqlBuilder, reg: Registry, cfg: IvfConfig,
                   g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    v = b.cte(f"{cfg.name}__v",
              f"SELECT {cfg.id_col}, "
              f"list_transform({cfg.vec_col}, x -> CAST(x AS DOUBLE)) AS v, "
              f"({cfg.query_filter}) AS is_q FROM {src}")
    n = b.cte(f"{cfg.name}__n",
              f"SELECT {cfg.id_col}, v, is_q, {_duck_norm('v')} AS nrm FROM {v}")
    cents = b.cte(f"{cfg.name}__c",
                  f"SELECT {cfg.id_col} AS cell, v AS cv, nrm AS cnrm "
                  f"FROM {n} ORDER BY {cfg.id_col} LIMIT {cfg.n_cells}")
    dot = _duck_dot("n.v", "c.cv", "len(n.v)")
    ranked = b.cte(
        f"{cfg.name}__ranked",
        f"SELECT n.{cfg.id_col}, n.v, n.is_q, n.nrm, c.cell, "
        f"ROW_NUMBER() OVER (PARTITION BY n.{cfg.id_col} "
        f"ORDER BY {dot} / (n.nrm * c.cnrm) DESC, c.cell ASC) AS crank "
        f"FROM {n} n CROSS JOIN {cents} c")
    cands = b.cte(f"{cfg.name}__cands",
                  f"SELECT {cfg.id_col}, v, nrm, cell FROM {ranked} "
                  f"WHERE crank = 1")
    probes = b.cte(f"{cfg.name}__probes",
                   f"SELECT {cfg.id_col} AS query_id, v AS qv, nrm AS qnrm, "
                   f"cell FROM {ranked} WHERE is_q AND crank <= {cfg.nprobe}")
    qdot = _duck_dot("q.qv", "c.v", "len(q.qv)")
    scored = b.cte(f"{cfg.name}__scored",
                   f"SELECT DISTINCT q.query_id, c.{cfg.id_col} AS neighbor_id, "
                   f"round({qdot} / (q.qnrm * c.nrm), 6) AS cosine "
                   f"FROM {probes} q JOIN {cands} c ON q.cell = c.cell "
                   f"AND q.query_id <> c.{cfg.id_col} "
                   f"WHERE round({qdot} / (q.qnrm * c.nrm), 6) IS NOT NULL")
    return b.cte(cfg.name,
                 f"SELECT query_id, neighbor_id, rank, cosine FROM ("
                 f"SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
                 f"ORDER BY cosine DESC, neighbor_id ASC) AS rank "
                 f"FROM {scored}) WHERE rank <= {cfg.k}")


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
                   f"FROM {n} q JOIN {n} c ON {cond} WHERE q.is_q "
                   f"AND round({dot} / (q.nrm * c.nrm), 6) IS NOT NULL")
    return b.cte(cfg.name,
                 f"SELECT query_id, neighbor_id, rank, cosine FROM ("
                 f"SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
                 f"ORDER BY cosine DESC, neighbor_id ASC) AS rank "
                 f"FROM {scored}) WHERE rank <= {cfg.k}")
