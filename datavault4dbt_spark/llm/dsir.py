"""DSIR-style importance scoring: rank raw documents by how
target-like their n-gram statistics are — the data-selection step of
Xie et al. 2023 (Data Selection for Language Models via Importance
Resampling), where a small trusted TARGET corpus (Wikipedia, curated
books) defines the distribution and every raw crawl document gets an
importance weight under target-vs-raw bag-of-bigram models.

Fixed-point contract (deviation from the paper, documented): DSIR's
weight is a log-likelihood ratio — a sum of per-feature
``log p_target(k) - log p_raw(k)`` — but ``log`` is a libm call with
engine-specific rounding and cross-row DOUBLE sums are order-dependent,
neither of which survives this repo's bit-identical oracle gate (the
same reasoning as ``llm/lm.py`` and tfidf's log-free idf). Instead
each bigram occurrence contributes the exact integer

    q_k = ((c_target(k) + 1) * SCALE) div (c_target(k) + c_raw(k) + 2)

— the add-one-smoothed posterior probability (uniform class prior)
that feature k was drawn from the target corpus — and the document
score is ``sum(q_k) div n_bigrams``: the mean per-occurrence target
posterior, in [0, SCALE], monotone in target-likeness. A document of
features seen only in the target scores near SCALE, only in the raw
complement near 0, unseen anywhere exactly SCALE/2 (the uninformative
posterior). ``selected`` applies the configured ppm threshold — the
deterministic analogue of the paper's importance resample (which is
stochastic by design; a seeded Gumbel top-k can be layered on the
score downstream, but a threshold keeps the operator reproducible and
oracle-checkable).

The paper hashes n-grams into 10k buckets to bound model memory;
this implementation keeps exact bigrams and prunes the Zipf tail with
``min_count`` instead (the same vocabulary-bound argument as
tfidf.min_df) — hashing is a memory optimization the census agg does
not need, and md5-prefix bucketing has no portable hex->int across
the two dialects.

Scale design (100 TB): the bigram explode is scan-stage (higher-order
transform + inline, no UDFs); the census is ONE map-side-combined
groupBy over (p, c) with the target membership aggregated as
conditional counts IN THE SAME PASS (no second scan, no join between
two censuses); the scoring join is a plain equi-join on the pruned
model that AQE broadcasts when it fits and shuffle-joins when it does
not; the per-doc reduce is a uniform-key groupBy. Target membership
is an arbitrary SQL predicate evaluated in the scan stage — a 100 TB
run points it at a source/domain/quality column.

Reference anchor: none (the reference is a Data Vault loader); this
extends the build brief's training-data-pipeline surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder
from .textprep import spark_tokens, duck_tokens
from .lm import SCALE, _bigram_pairs


@dataclass(frozen=True)
class DsirConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    # SQL predicate (portable in both dialects) defining the TARGET
    # slice over the source columns
    target_predicate: str = "source = 'src0'"
    min_count: int = 1        # drop bigrams with total census count < this
    threshold_ppm: int = SCALE // 2   # selected iff score >= threshold

    def __post_init__(self):
        for c in (self.id_col, self.text_col):
            ensure_identifier(c, "column", self.name)
        if self.min_count < 1:
            raise ValueError(f"{self.name}: min_count must be >= 1")
        if not 0 <= self.threshold_ppm <= SCALE:
            raise ValueError(
                f"{self.name}: threshold_ppm must be within [0, {SCALE}]")


def _q_expr(dialect: str) -> str:
    """Smoothed target posterior per feature occurrence — exact
    integers end to end. Unmatched features coalesce to the 0-count
    posterior SCALE/2."""
    idiv = " div " if dialect == "spark" else " // "
    return (f"((coalesce(c_t, 0) + 1) * CAST({SCALE} AS BIGINT))"
            f"{idiv}(coalesce(c_t, 0) + coalesce(c_r, 0) + 2)")


def build_dsir_score(spark, reg: Registry, cfg: DsirConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    docs = reg.load(spark, cfg.source)
    bi = (docs.selectExpr(
            cfg.id_col,
            f"CAST(({cfg.target_predicate}) AS BOOLEAN) AS __tgt",
            f"{spark_tokens(cfg.text_col)} AS w")
          .selectExpr(cfg.id_col, "__tgt",
                      f"inline({_bigram_pairs(cfg, 'spark')})"))
    census = (bi.groupBy("p", "c")
              .agg(F.sum(F.when(F.col("__tgt"), 1).otherwise(0))
                   .alias("c_t"),
                   F.sum(F.when(F.col("__tgt"), 0).otherwise(1))
                   .alias("c_r")))
    if cfg.min_count > 1:
        census = census.filter(
            F.col("c_t") + F.col("c_r") >= cfg.min_count)
    scored = (bi.join(census, ["p", "c"], "left")
              .selectExpr(cfg.id_col,
                          f"{_q_expr('spark')} AS q"))
    per_doc = (scored.groupBy(cfg.id_col)
               .agg(F.count(F.lit(1)).cast("int").alias("n_bigrams"),
                    F.expr("sum(q) div count(*)").alias("score_ppm")))
    return (docs.selectExpr(cfg.id_col)
            .join(per_doc, [cfg.id_col], "left")
            .selectExpr(cfg.id_col,
                        "coalesce(n_bigrams, 0) AS n_bigrams",
                        "score_ppm",
                        f"score_ppm >= {cfg.threshold_ppm} AS selected"))


def dsir_score_oracle(b: SqlBuilder, reg: Registry, cfg: DsirConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    w = b.cte(
        f"{cfg.name}__w",
        f"SELECT {cfg.id_col}, "
        f"CAST(({cfg.target_predicate}) AS BOOLEAN) AS tgt, "
        f"{duck_tokens(cfg.text_col)} AS w FROM {src}")
    bi = b.cte(
        f"{cfg.name}__bi",
        f"SELECT {cfg.id_col}, tgt, u.pc.p AS p, u.pc.c AS c "
        f"FROM {w}, UNNEST({_bigram_pairs(cfg, 'duckdb')}) AS u(pc) "
        f"WHERE len(w) >= 2")
    having = (f" HAVING count(*) >= {cfg.min_count}"
              if cfg.min_count > 1 else "")
    cen = b.cte(
        f"{cfg.name}__cn",
        f"SELECT p, c, "
        f"sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_t, "
        f"sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS c_r "
        f"FROM {bi} GROUP BY p, c{having}")
    sc = b.cte(
        f"{cfg.name}__sc",
        f"SELECT b.{cfg.id_col}, {_q_expr('duckdb')} AS q "
        f"FROM {bi} b LEFT JOIN {cen} n ON b.p = n.p AND b.c = n.c")
    pd_ = b.cte(
        f"{cfg.name}__pd",
        f"SELECT {cfg.id_col}, CAST(count(*) AS INT) AS n_bigrams, "
        f"CAST(sum(q) // count(*) AS BIGINT) AS score_ppm "
        f"FROM {sc} GROUP BY {cfg.id_col}")
    return b.cte(
        cfg.name,
        f"SELECT d.{cfg.id_col}, "
        f"coalesce(p.n_bigrams, 0) AS n_bigrams, p.score_ppm, "
        f"p.score_ppm >= {cfg.threshold_ppm} AS selected "
        f"FROM {src} d LEFT JOIN {pd_} p "
        f"ON d.{cfg.id_col} = p.{cfg.id_col}")
