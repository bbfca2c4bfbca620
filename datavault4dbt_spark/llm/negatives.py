"""Deterministic negative sampling for contrastive training pairs:
each anchor document draws ``k`` pseudo-random negatives from its own
hash bucket — the (anchor, negative) construction step of every
contrastive / reranker / embedding-training pipeline, made exactly
reproducible (a re-run, a second engine, or a resumed job draws the
SAME negatives).

Mechanics: every document gets a bucket from its 48-bit salted md5 key
(``llm/sampling.py``'s shuffle-key primitive — exact integer in both
dialects); anchors (a declared filter) join candidates on bucket
equality only, each pair scores md5(anchor:candidate), and the k
smallest scores per anchor win (ties impossible: the full 48-bit score
plus candidate id orders totally). Self-pairs are excluded.

Scale design (100 TB): the bucket join bounds pair volume to
(anchors per bucket) x (bucket size) — with ``n_buckets`` scaled to
corpus/k the candidate side per anchor stays O(k) in expectation, and
the join is a plain equi hash join on a uniform md5-derived key (no
skew). Per-anchor top-k is a WindowGroupLimit (per-partition heaps,
never a global sort). No corpus-wide shuffle other than the bucket
exchange.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder
from .sampling import _shuffle_key


@dataclass(frozen=True)
class NegativeSamplesConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    anchor_filter: str = "doc_id % 25 = 0"   # SQL, valid in both dialects
    n_buckets: int = 8
    k: int = 4
    salt: str = "neg"

    def __post_init__(self):
        ensure_identifier(self.id_col, "column", self.name)
        if self.n_buckets < 1 or self.k < 1:
            raise ValueError(f"{self.name}: n_buckets and k must be >= 1")
        if "'" in self.salt or "\\" in self.salt:
            raise ValueError(f"{self.name}: salt must not contain "
                             f"quotes or backslashes")


def _pair_score(a: str, c: str, salt: str) -> str:
    return _shuffle_key(
        f"concat(CAST({a} AS STRING), ':', CAST({c} AS STRING))", salt)


def build_negative_samples(spark, reg: Registry,
                           cfg: NegativeSamplesConfig,
                           g: GlobalConfig = DEFAULT) -> DataFrame:
    i = cfg.id_col
    keyed = reg.load(spark, cfg.source).selectExpr(
        i,
        f"{_shuffle_key(i, cfg.salt)} % {cfg.n_buckets} AS bucket",
        f"({cfg.anchor_filter}) AS is_anchor")
    anchors = (keyed.filter("is_anchor")
               .selectExpr(f"{i} AS anchor_id", "bucket"))
    cands = keyed.selectExpr(f"{i} AS neg_id", "bucket")
    scored = (anchors.join(cands, "bucket")
              .filter(F.col("anchor_id") != F.col("neg_id"))
              .selectExpr(
                  "anchor_id", "neg_id", "bucket",
                  f"{_pair_score('anchor_id', 'neg_id', cfg.salt)} "
                  f"AS score"))
    w = (Window.partitionBy("anchor_id")
         .orderBy(F.asc("score"), F.asc("neg_id")))
    return (scored.withColumn("neg_rank", F.row_number().over(w))
            .filter(F.col("neg_rank") <= cfg.k)
            .select("anchor_id", "neg_id", "neg_rank", "bucket"))


def negative_samples_oracle(b: SqlBuilder, reg: Registry,
                            cfg: NegativeSamplesConfig,
                            g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    i = cfg.id_col
    keyed = b.cte(
        f"{cfg.name}__k",
        f"SELECT {i}, "
        f"{_shuffle_key(i, cfg.salt)} % {cfg.n_buckets} AS bucket, "
        f"({cfg.anchor_filter}) AS is_anchor FROM {src}")
    scored = b.cte(
        f"{cfg.name}__s",
        f"SELECT a.{i} AS anchor_id, c.{i} AS neg_id, a.bucket, "
        f"{_pair_score(f'a.{i}', f'c.{i}', cfg.salt)} AS score "
        f"FROM {keyed} a JOIN {keyed} c ON a.bucket = c.bucket "
        f"AND a.{i} <> c.{i} WHERE a.is_anchor")
    return b.cte(
        cfg.name,
        f"SELECT anchor_id, neg_id, neg_rank, bucket FROM ("
        f"SELECT anchor_id, neg_id, bucket, "
        f"ROW_NUMBER() OVER (PARTITION BY anchor_id "
        f"ORDER BY score ASC, neg_id ASC) AS neg_rank FROM {scored}"
        f") WHERE neg_rank <= {cfg.k}")
