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
O(n_vectors). Raising `lsh_bits` shrinks buckets geometrically;
``multiprobe`` recovers the recall that costs by additionally probing
the buckets at Hamming distance 1 on the leading bits (query side
only: the probe list explodes to `1 + multiprobe` rows per query, the
candidate table is untouched) — same plan shape, same deterministic
bucket family, so the DuckDB oracle reproduces it bit-for-bit. All
arithmetic is double-precision left-fold (textprep note) so Spark and
the oracle agree exactly.
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
    multiprobe: int = 0                 # extra Hamming-1 buckets probed
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
    queries = n.filter("is_q")
    join_cond = [F.col(f"q.{cfg.id_col}") != F.col(f"c.{cfg.id_col}")]
    if cfg.lsh_bits:
        if cfg.multiprobe:
            # probe the home bucket plus `multiprobe` single-bit flips;
            # probe buckets are pairwise distinct, and a candidate lives
            # in exactly one bucket, so no (q, c) pair can join twice —
            # no dedup needed
            flips = [f"bkt ^ {2 ** i}"
                     for i in range(min(cfg.multiprobe, cfg.lsh_bits))]
            queries = queries.withColumn(
                "pbkt", F.explode(F.expr(f"array(bkt, {', '.join(flips)})")))
            join_cond.append(F.col("q.pbkt") == F.col("c.bkt"))
        else:
            join_cond.append(F.col("q.bkt") == F.col("c.bkt"))
    queries = F.broadcast(queries)
    cands = n
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

    Centroids seed as the first `n_cells` vectors by id (deterministic;
    keeps the DuckDB oracle bit-exact when ``kmeans_iters == 0``).
    ``kmeans_iters`` > 0 runs that many Lloyd iterations — assign each
    pooled vector to its best centroid (broadcast cross-score + rank-1
    window, the same plan shape as the search itself), then recompute
    each cell's centroid as the elementwise mean (posexplode ->
    partial-aggregated AVG per (cell, coordinate) -> re-assembled
    array). ``kmeans_sample_mod`` trains on the deterministic hash
    sample ``xxhash64(id) % mod == 0`` — at 100 TB the refinement runs
    on a bounded sample while assignment/search still covers everything.

    A k-means-refined config used as a driver-checked query must set
    ``nprobe >= n_cells``: full probing makes the result the exact
    top-k (so the brute-force SQL is a valid oracle) while the whole
    k-means + IVF plan still executes under the gate — distributed FP
    averaging is not bit-reproducible in a single-node SQL engine, so
    refined centroids themselves cannot be oracle-pinned.

    At scale the centroid table is broadcast and each vector is scored
    against n_cells centroids in the scan stage; the candidate join
    keys on cell id.
    """

    name: str
    source: str = "embeddings"
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    k: int = 5
    n_cells: int = 8
    nprobe: int = 2
    query_filter: str = "vec_id < 16"
    kmeans_iters: int = 0
    kmeans_sample_mod: int = 1


def _kmeans_refine(cfg: IvfConfig, n: DataFrame, cents: DataFrame) -> DataFrame:
    """``kmeans_iters`` Lloyd iterations over the hash-sampled pool.

    Each iteration is two shuffles: the rank-1 assignment window on id
    (the pool side never moves — centroids broadcast) and the
    per-(cell, coordinate) AVG with map-side partial aggregation. Cells
    that lose all members drop out (standard Lloyd behavior); zero-norm
    centroids score NULL and sort last, never first.
    """
    if not cfg.kmeans_iters:
        return cents
    pool = n
    if cfg.kmeans_sample_mod > 1:
        pool = n.filter(
            F.pmod(F.xxhash64(F.col(cfg.id_col)),
                   F.lit(cfg.kmeans_sample_mod)) == 0)
    # NOT persisted: pool is a cheap filter over the already-persisted
    # `n`, so per-iteration rescans hit that cache — no second cached
    # copy to manage (and leak)
    for _ in range(cfg.kmeans_iters):
        w = (Window.partitionBy(cfg.id_col)
             .orderBy(F.desc("csim"), F.asc("cell")))
        assigned = (pool.crossJoin(F.broadcast(cents))
                    .selectExpr(cfg.id_col, "v", "cell",
                                f"try_divide({_spark_dot('v', 'cv')}, "
                                f"nrm * cnrm) AS csim")
                    .withColumn("__r", F.row_number().over(w))
                    .filter("__r = 1"))
        cents = (assigned.select("cell", F.posexplode("v").alias("i", "x"))
                 .groupBy("cell", "i").agg(F.avg("x").alias("m"))
                 .groupBy("cell")
                 .agg(F.array_sort(F.collect_list(F.struct("i", "m")))
                      .alias("s"))
                 .selectExpr("cell", "transform(s, e -> e.m) AS cv")
                 .selectExpr("cell", "cv", f"{_spark_norm('cv')} AS cnrm"))
    # stays LAZY: kmeans_iters is small (1-2), so the nested plan is
    # shallow and the whole refine+search executes as ONE job instead
    # of paying the per-job floor once per iteration
    return cents


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
    cents = _kmeans_refine(cfg, n, cents)
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
    if cfg.kmeans_iters:
        # refined centroids are not bit-reproducible cross-engine (FP
        # accumulation order); the config contract is full probing, so
        # the result is the exact top-k and brute force is the oracle
        if cfg.nprobe < cfg.n_cells:
            raise ValueError(
                f"{cfg.name}: kmeans_iters > 0 requires nprobe >= n_cells "
                f"for an oracle-checkable (exact) result")
        return ann_topk_oracle(b, reg, AnnConfig(
            cfg.name, source=cfg.source, id_col=cfg.id_col,
            vec_col=cfg.vec_col, k=cfg.k, query_filter=cfg.query_filter), g)
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
    qrel, qbkt = n, "q.bkt"
    if cfg.lsh_bits and cfg.multiprobe:
        flips = ", ".join(
            f"xor(bkt, {2 ** i})"
            for i in range(min(cfg.multiprobe, cfg.lsh_bits)))
        qrel = b.cte(f"{cfg.name}__probes",
                     f"SELECT *, UNNEST([bkt, {flips}]) AS pbkt "
                     f"FROM {n} WHERE is_q")
        qbkt = "q.pbkt"
    cond = f"q.{cfg.id_col} <> c.{cfg.id_col}"
    if cfg.lsh_bits:
        cond += f" AND {qbkt} = c.bkt"
    dot = _duck_dot("q.v", "c.v", "len(q.v)", cfg.dim)
    scored = b.cte(f"{cfg.name}__scored",
                   f"SELECT q.{cfg.id_col} AS query_id, "
                   f"c.{cfg.id_col} AS neighbor_id, "
                   f"round({dot} / (q.nrm * c.nrm), 6) AS cosine "
                   f"FROM {qrel} q JOIN {n} c ON {cond} WHERE q.is_q "
                   f"AND round({dot} / (q.nrm * c.nrm), 6) IS NOT NULL")
    return b.cte(cfg.name,
                 f"SELECT query_id, neighbor_id, rank, cosine FROM ("
                 f"SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
                 f"ORDER BY cosine DESC, neighbor_id ASC) AS rank "
                 f"FROM {scored}) WHERE rank <= {cfg.k}")
