"""SemDeDup: cluster-scoped semantic deduplication over embeddings.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): coarse-cluster the embedding space,
then compare pairs only WITHIN a cluster and drop all but one member of
each high-similarity pair. Complements the sign-LSH variant in
``dedup.py`` (``dedup_embedding_cosine``): LSH buckets by sign pattern
(recall depends on the hyperplane family), SemDeDup buckets by nearest
centroid (recall depends on cluster granularity) — production pipelines
run the centroid flavor because the cells are also what the IVF index
(``similarity.py``) searches, so one clustering serves both.

Determinism/oracle contract: centroids seed as the ``n_clusters``
lowest-id vectors (same rule as ``IvfConfig`` — a TakeOrdered, no
shuffle) so the DuckDB oracle reproduces the cells bit-for-bit.
K-means-refined centroids are deliberately NOT offered here: refined
cells are not cross-engine reproducible (FP accumulation order), and
``similarity.py`` already demonstrates the refinement machinery.

Scale design (100 TB): centroids broadcast; every vector is scored in
the scan stage and assigned by a rank-1 window keyed on its own id (no
skew); the pairwise join keys on the cell id, so its cost is bounded by
the largest cell — at scale you raise ``n_clusters`` so cells stay
O(corpus / n_clusters), exactly the IVF trade-off. No all-pairs join
exists in the plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_min_parallelism
from ..plans.sqlbuild import SqlBuilder
from .dedup import _spark_dot, _spark_norm, _duck_dot, _duck_norm


@dataclass(frozen=True)
class SemDedupConfig:
    name: str
    source: str = "embeddings"
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    n_clusters: int = 8
    # matches EmbeddingCosineConfig's default: the synthetic corpus's
    # planted near-dups sit around cosine ~0.4-0.6, so 0.4 keeps the
    # fixture non-empty (real text embeddings would use ~0.9+)
    threshold: float = 0.4


def build_semdedup(spark, reg: Registry, cfg: SemDedupConfig,
                   g: GlobalConfig = DEFAULT) -> DataFrame:
    df = ensure_min_parallelism(reg.load(spark, cfg.source))
    v = df.selectExpr(
        cfg.id_col,
        f"transform({cfg.vec_col}, x -> cast(x AS DOUBLE)) AS v")
    # consumed by the centroid seed AND the assignment scan
    n = v.selectExpr(cfg.id_col, "v", f"{_spark_norm('v')} AS nrm").persist()
    cents = (n.orderBy(F.col(cfg.id_col)).limit(cfg.n_clusters)
             .selectExpr(f"{cfg.id_col} AS cell", "v AS cv", "nrm AS cnrm"))
    wc = (Window.partitionBy(cfg.id_col)
          .orderBy(F.desc("csim"), F.asc("cell")))
    members = (n.crossJoin(F.broadcast(cents))
               .selectExpr(cfg.id_col, "v", "nrm", "cell",
                           f"try_divide({_spark_dot('v', 'cv')}, "
                           f"nrm * cnrm) AS csim")
               .withColumn("__r", F.row_number().over(wc))
               .filter("__r = 1")
               .select(cfg.id_col, "v", "nrm", "cell"))
    pairs = (members.alias("a").join(
                 members.alias("b"),
                 [F.col("a.cell") == F.col("b.cell"),
                  F.col(f"a.{cfg.id_col}") < F.col(f"b.{cfg.id_col}")])
             .selectExpr(f"b.{cfg.id_col} AS loser", "a.cell AS cell",
                         f"round(try_divide({_spark_dot('a.v', 'b.v')}, "
                         f"a.nrm * b.nrm), 6) AS cosine")
             .filter(F.col("cosine") >= cfg.threshold))
    return (pairs.groupBy("loser", "cell")
            .agg(F.count(F.lit(1)).alias("n_better_dups"),
                 F.max("cosine").alias("best_sim"))
            .selectExpr(f"loser AS {cfg.id_col}", "cell",
                        "n_better_dups", "best_sim"))


def semdedup_oracle(b: SqlBuilder, reg: Registry, cfg: SemDedupConfig,
                    g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    v = b.cte(f"{cfg.name}__v",
              f"SELECT {cfg.id_col}, "
              f"list_transform({cfg.vec_col}, x -> CAST(x AS DOUBLE)) AS v "
              f"FROM {src}")
    n = b.cte(f"{cfg.name}__n",
              f"SELECT {cfg.id_col}, v, {_duck_norm('v')} AS nrm FROM {v}")
    cents = b.cte(f"{cfg.name}__c",
                  f"SELECT {cfg.id_col} AS cell, v AS cv, nrm AS cnrm "
                  f"FROM {n} ORDER BY {cfg.id_col} LIMIT {cfg.n_clusters}")
    dot = _duck_dot("n.v", "c.cv", "len(n.v)")
    members = b.cte(
        f"{cfg.name}__m",
        f"SELECT {cfg.id_col}, v, nrm, cell FROM ("
        f"SELECT n.{cfg.id_col}, n.v, n.nrm, c.cell, "
        f"ROW_NUMBER() OVER (PARTITION BY n.{cfg.id_col} "
        f"ORDER BY {dot} / (n.nrm * c.cnrm) DESC, c.cell ASC) AS r "
        f"FROM {n} n CROSS JOIN {cents} c) WHERE r = 1")
    pdot = _duck_dot("a.v", "b.v", "len(a.v)")
    pairs = b.cte(
        f"{cfg.name}__p",
        f"SELECT b.{cfg.id_col} AS loser, a.cell AS cell, "
        f"round({pdot} / (a.nrm * b.nrm), 6) AS cosine "
        f"FROM {members} a JOIN {members} b ON a.cell = b.cell "
        f"AND a.{cfg.id_col} < b.{cfg.id_col} "
        f"WHERE round({pdot} / (a.nrm * b.nrm), 6) >= {cfg.threshold}")
    return b.cte(
        cfg.name,
        f"SELECT loser AS {cfg.id_col}, cell, "
        f"count(*) AS n_better_dups, max(cosine) AS best_sim "
        f"FROM {pairs} GROUP BY loser, cell")
