"""Persisted IVF ANN index: train once, append embedding batches
incrementally, probe only ``nprobe`` cells of the stored index.

The in-query IVF in llm/similarity.py rebuilds its index per run — the
backfill shape. At 100 TB the index is a *table* maintained exactly
like the dedup signature index (llm/incdedup.py): centroids are trained
ONCE (on the first batch), every new embedding batch is assigned to its
nearest cell and appended insert-only, and a lookup reads centroids +
the ``nprobe`` probed cells of the index store — never the corpus.

Store layout (plans/incremental.py ParquetStore):

- ``centroids``: (cell, cv, cnrm) — written once at init. Deterministic
  seed: the ``n_cells`` lowest-id vectors of the FIRST batch. Batches
  are contiguous id ranges (the incdedup convention), so these are also
  the corpus-wide lowest ids — which is what makes the one-shot oracle
  reproduce them bit-for-bit.
- ``index``: (id, v, nrm, cell, batch_id) — appended per batch,
  hive-partitioned by ``cell``, so a probe's ``cell IN (...)`` filter
  prunes to ``nprobe`` partition directories (PartitionFilters in the
  scan — pinned in tests/test_plan_quality.py).

Probe: queries score against the broadcast centroid table (n_cells
rows), take their top-``nprobe`` cells, and the DISTINCT probed cell
set — at most ``n_cells`` values, a census-scale driver probe exactly
like the HWM probes — is pushed into the index scan as a partition
filter. Candidate volume is the probed cells' contents, never the
corpus; per-query top-k is one window over that.

Correctness: with fixed centroids, a vector's cell assignment is
independent of which batch carried it, so the batch-by-batch store loop
converges to the one-shot assignment and llm/similarity.py's
``ann_ivf_oracle`` (kmeans_iters=0) is a valid oracle — the driver's
hash compare certifies the whole persisted loop against it (the
dedup_incremental adjudication pattern).

Reference anchor: the reference (a Data Vault loader) has no
similarity-search surface; this extends the build brief's
training-data-pipeline operators.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.incremental import (ParquetStore, rebalance_for_write,
                                 scratch_store)
from ..plans.sqlbuild import SqlBuilder
from .dedup import _spark_dot, _spark_norm
from .similarity import IvfConfig, ann_ivf_oracle


@dataclass(frozen=True)
class AnnIndexConfig:
    name: str
    source: str = "embeddings"
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    k: int = 5
    n_cells: int = 8
    nprobe: int = 2
    query_filter: str = "vec_id < 16"
    n_batches: int = 3   # contiguous id-range batches, appended in order

    def __post_init__(self):
        for c in (self.id_col, self.vec_col):
            ensure_identifier(c, "column", self.name)
        if self.n_batches < 1:
            raise ValueError(f"{self.name}: n_batches must be >= 1")
        if not (0 < self.nprobe <= self.n_cells):
            raise ValueError(f"{self.name}: need 0 < nprobe <= n_cells")

    def ivf(self) -> IvfConfig:
        """The equivalent one-shot config — its oracle certifies us."""
        return IvfConfig(
            self.name, source=self.source, id_col=self.id_col,
            vec_col=self.vec_col, k=self.k, n_cells=self.n_cells,
            nprobe=self.nprobe, query_filter=self.query_filter)


def _store(spark, name: str) -> ParquetStore:
    return scratch_store(spark, name, prefix="dv4dbt_annindex")


def _normed(df: DataFrame, cfg: AnnIndexConfig) -> DataFrame:
    return df.selectExpr(
        f"{cfg.id_col} AS id",
        f"transform({cfg.vec_col}, x -> cast(x AS DOUBLE)) AS v"
    ).selectExpr("id", "v", f"{_spark_norm('v')} AS nrm")


def init_ann_index(store: ParquetStore, first_batch: DataFrame,
                   cfg: AnnIndexConfig) -> None:
    """Train (seed) the centroid table from the first batch: the
    ``n_cells`` lowest-id vectors (a TakeOrdered — no shuffle). Written
    once; every later append reads it back broadcast."""
    cents = (_normed(first_batch, cfg)
             .orderBy(F.col("id")).limit(cfg.n_cells)
             .selectExpr("id AS cell", "v AS cv", "nrm AS cnrm"))
    store.overwrite("centroids", cents)


def append_ann_batch(store: ParquetStore, batch: DataFrame,
                     cfg: AnnIndexConfig, batch_id: int) -> None:
    """Assign a new batch to cells (broadcast centroid cross-score +
    rank-1 window — the llm/similarity.py assignment shape) and append
    it to the cell-partitioned index. Insert-only; centroids never
    move (re-training is a rebuild, not an append)."""
    cents = F.broadcast(store.read("centroids"))
    w = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("cell"))
    assigned = (_normed(batch, cfg).crossJoin(cents)
                .selectExpr("id", "v", "nrm", "cell",
                            f"try_divide({_spark_dot('v', 'cv')}, "
                            f"nrm * cnrm) AS csim")
                .withColumn("__r", F.row_number().over(w))
                .filter("__r = 1")
                .select("id", "v", "nrm", "cell",
                        F.lit(batch_id).cast("int").alias("batch_id")))
    # REBALANCE-clustered on the hive key: the window plan leaves the
    # batch hash-distributed on id, so a direct write would emit up to
    # tasks x cells tiny files that every probe read-back re-lists
    store.append("index", rebalance_for_write(assigned, "cell"),
                 partition_by=("cell",))


def probe_ann_index(store: ParquetStore, queries: DataFrame,
                    cfg: AnnIndexConfig) -> DataFrame:
    """Top-k lookup against the persisted index: queries x broadcast
    centroids -> top-nprobe cells per query; the DISTINCT probed cells
    (<= n_cells values — a census-scale driver probe, the HWM pattern)
    prune the index scan to those partitions; one window takes the
    per-query top-k. The corpus is never read on the candidate side."""
    cents = F.broadcast(store.read("centroids"))
    w = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("cell"))
    probes = (_normed(queries, cfg).crossJoin(cents)
              .selectExpr("id", "v", "nrm", "cell",
                          f"try_divide({_spark_dot('v', 'cv')}, "
                          f"nrm * cnrm) AS csim")
              .withColumn("__r", F.row_number().over(w))
              .filter(F.col("__r") <= cfg.nprobe)
              .select(F.col("id").alias("query_id"),
                      F.col("v").alias("qv"),
                      F.col("nrm").alias("qnrm"), "cell"))
    # census probe: the distinct cell list is bounded by n_cells
    cells = [r.cell for r in probes.select("cell").distinct().collect()]
    cands = store.read("index").filter(F.col("cell").isin(cells))
    scored = (F.broadcast(probes).alias("q")
              .join(cands.alias("c"),
                    [F.col("q.cell") == F.col("c.cell"),
                     F.col("q.query_id") != F.col("c.id")])
              .selectExpr("q.query_id", "c.id AS neighbor_id",
                          f"round(try_divide({_spark_dot('q.qv', 'c.v')}, "
                          f"q.qnrm * c.nrm), 6) AS cosine")
              .filter(F.col("cosine").isNotNull())
              .distinct())
    w2 = (Window.partitionBy("query_id")
          .orderBy(F.desc("cosine"), F.asc("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= cfg.k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


def _batch_expr(cfg: AnnIndexConfig, bound: int) -> str:
    """K contiguous id ranges whose order agrees with id order (the
    llm/incdedup.py convention)."""
    return f"CAST(({cfg.id_col} * {cfg.n_batches}) div {bound} AS INT)"


def build_ann_index_persisted(spark, reg: Registry, cfg: AnnIndexConfig,
                              g: GlobalConfig = DEFAULT) -> DataFrame:
    """Driver-gated replay: init from batch 0, append batches 0..K-1,
    then probe the persisted index for the query subset. Converged
    result == the one-shot IVF (fixed centroids make assignment
    batch-independent), so ann_ivf_oracle certifies the loop."""
    src = reg.load(spark, cfg.source)
    max_id = src.agg(F.max(cfg.id_col)).collect()[0][0]
    store = _store(spark, cfg.name)
    import shutil as _sh
    for t in ("centroids", "index"):
        _sh.rmtree(store.path(t), ignore_errors=True)
    if max_id is None:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, cosine double")
    bound = int(max_id) + 1
    batch_of = F.expr(_batch_expr(cfg, bound))
    init_ann_index(store, src.filter(batch_of == 0), cfg)
    for b in range(cfg.n_batches):
        append_ann_batch(store, src.filter(batch_of == b), cfg, b)
    return probe_ann_index(store, src.filter(cfg.query_filter), cfg)


def ann_index_persisted_oracle(b: SqlBuilder, reg: Registry,
                               cfg: AnnIndexConfig,
                               g: GlobalConfig = DEFAULT) -> str:
    return ann_ivf_oracle(b, reg, cfg.ivf(), g)
