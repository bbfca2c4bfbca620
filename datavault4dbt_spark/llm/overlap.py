"""Source-overlap matrix: exact pairwise shingle-set intersection and
Jaccard similarity between corpus strata (sources, dumps, snapshots).

The corpus-composition diagnostic run before mixing training data from
several crawls/dumps: how much of source B is already in source A?
Common Crawl snapshots overlap 30-70% month to month (Penedo 2023,
RefinedWeb, §3 discusses cross-snapshot dedup for exactly this
reason), so a mix that double-counts the overlap silently up-weights
the shared content. This operator reports, for every pair of strata,
the exact number of shared distinct word-shingles and the integer-ppm
Jaccard — the evidence behind a cross-source dedup or re-weighting
decision.

Beyond-reference operator (the reference's rsrc column tracks
per-source lineage but has no cross-source similarity surface).

Scale design (100 TB): shingles reduce to the DISTINCT (stratum,
md5-hash) level first — ONE exchange on the hash, with the md5
projection inside the scan stage so the shuffle moves 32-byte keys,
never text. The pair stage is a self-join on the shingle hash: each
shingle contributes at most C(G,2) pairs where G = the number of
strata it appears in — bounded by the stratum count (sources/dumps
are tens to hundreds, by construction not corpus-cardinality), so the
join output is census-sized, not corpus-sized. Per-stratum set sizes
are a tiny census joined back broadcast. Pairs sharing zero shingles
are absent from the output (inner-join semantics) — at 100 TB an
all-pairs zero-filled matrix is the caller's trivial outer join.

Determinism: md5-hashed shingles, integer ppm arithmetic — no doubles
anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder
from .textprep import (spark_tokens, duck_tokens, spark_shingles,
                       duck_shingles)


@dataclass(frozen=True)
class SourceOverlapConfig:
    """``group_col``: the stratum column (source / dump / snapshot).
    ``shingle_n``: word n-gram size — 3 is the cross-document-overlap
    default (1 would measure vocabulary overlap, not content)."""

    name: str
    source: str = "documents"
    group_col: str = "source"
    text_col: str = "text"
    shingle_n: int = 3

    def __post_init__(self):
        if self.shingle_n < 1:
            raise ValueError(f"{self.name}: shingle_n must be >= 1")
        for c in (self.group_col, self.text_col):
            ensure_identifier(c, "column", self.name)


def build_source_overlap(spark, reg: Registry, cfg: SourceOverlapConfig,
                         g: GlobalConfig = DEFAULT) -> DataFrame:
    gcol = cfg.group_col
    df = reg.load(spark, cfg.source)
    w = df.selectExpr(gcol, f"{spark_tokens(cfg.text_col)} AS w")
    # unhex(md5): the hash is internal (outputs are counts), so carry
    # it as 16-byte BINARY instead of the 32-char hex string — the
    # distinct and the pair self-join shuffle half the key bytes
    # (guide §2.3 narrower types); unhex is injective on md5 output, so
    # every count is unchanged
    sh = (w.selectExpr(
        gcol, f"explode({spark_shingles('w', cfg.shingle_n)}) AS s")
        .selectExpr(gcol, "unhex(md5(s)) AS h")
        .distinct())
    # three consumers (sizes + both join sides): persist the slim
    # (stratum, hash) index once — the ngram_jaccard pattern. Released
    # by Spark's LRU eviction (the returned frame is lazy, so an eager
    # unpersist would defeat the cache; bench.py clearCache()s between
    # queries)
    sh = sh.persist()
    sizes = sh.groupBy(gcol).agg(F.count(F.lit(1)).alias("n"))
    a, bb = sh.alias("a"), sh.alias("b")
    inter = (a.join(bb, on=[F.col("a.h") == F.col("b.h"),
                            F.col(f"a.{gcol}") < F.col(f"b.{gcol}")])
             .groupBy(F.col(f"a.{gcol}").alias("group_a"),
                      F.col(f"b.{gcol}").alias("group_b"))
             .agg(F.count(F.lit(1)).alias("n_shared")))
    sa = F.broadcast(sizes.selectExpr(f"{gcol} AS group_a", "n AS n_a"))
    sb = F.broadcast(sizes.selectExpr(f"{gcol} AS group_b", "n AS n_b"))
    return (inter.join(sa, "group_a").join(sb, "group_b")
            .selectExpr("group_a", "group_b", "n_a", "n_b", "n_shared",
                        "(n_shared * 1000000) div (n_a + n_b - n_shared) "
                        "AS jaccard_ppm"))


def source_overlap_oracle(b: SqlBuilder, reg: Registry,
                          cfg: SourceOverlapConfig,
                          g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    gcol = cfg.group_col
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {gcol}, {duck_tokens(cfg.text_col)} AS w FROM {src}")
    sh = b.cte(f"{cfg.name}__sh",
               f"SELECT DISTINCT {gcol}, md5(s) AS h FROM ("
               f"SELECT {gcol}, "
               f"unnest({duck_shingles('w', cfg.shingle_n)}) AS s "
               f"FROM {w})")
    sizes = b.cte(f"{cfg.name}__n",
                  f"SELECT {gcol}, count(*) AS n FROM {sh} GROUP BY {gcol}")
    inter = b.cte(f"{cfg.name}__i",
                  f"SELECT a.{gcol} AS group_a, x.{gcol} AS group_b, "
                  f"count(*) AS n_shared FROM {sh} a JOIN {sh} x "
                  f"ON a.h = x.h AND a.{gcol} < x.{gcol} GROUP BY 1, 2")
    return b.cte(
        cfg.name,
        f"SELECT group_a, group_b, sa.n AS n_a, sb.n AS n_b, n_shared, "
        f"(n_shared * 1000000) // (sa.n + sb.n - n_shared) AS jaccard_ppm "
        f"FROM {inter} JOIN {sizes} sa ON sa.{gcol} = group_a "
        f"JOIN {sizes} sb ON sb.{gcol} = group_b")
