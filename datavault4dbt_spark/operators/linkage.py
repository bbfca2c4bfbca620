"""Blocked fuzzy record linkage: approximate-duplicate candidate pairs
within equi-blocks, scored by Levenshtein edit distance.

The entity-resolution primitive (Fellegi & Sunter 1969; the blocking /
candidate-generation stage every linkage system — e.g. the public
Splink library — runs before pairwise scoring): comparing every record
against every other is O(n^2) and impossible at corpus scale, so
records are first grouped by cheap deterministic *blocking keys*
(brand + size, zip code, name initial, ...) and only within-block
pairs are scored. A declared ``max_block_size`` guard drops
pathological blocks (the all-NULL key, the default value) instead of
letting one hot block quadratically dominate the job — the same
df-cap idea as llm/substring.py's gram cap.

Beyond-reference operator (the reference's closest surface is the
hash-based exact match inside hub loading, macros/tables/*/hub.sql) —
the fuzzy-match stage a deduplicating stage load needs when business
keys arrive misspelled.

Scale design (100 TB): ONE aggregation census of block sizes (map-side
combined), joined back to the record side (AQE picks broadcast — the
census has one row per block, orders of magnitude smaller than the
corpus); the pair generation is a single equi self-join on the
blocking keys — a hash/sort-merge join, never a cartesian (pinned in
tests/test_plan_quality.py). Pair volume is bounded by
sum(block_size^2) <= max_block_size * n_rows by the cap. levenshtein()
is a JVM intrinsic inside whole-stage codegen — no UDFs.

Determinism: pairs are emitted once with ``id_a < id_b``; Levenshtein
is the standard unit-cost edit distance in both engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class BlockedLinkageConfig:
    """``block_cols``: the equi-blocking keys (records only ever compare
    within a block). ``max_distance``: keep pairs with edit distance <=
    this. ``max_block_size``: blocks holding more records than this are
    excluded wholesale (deterministic, census-driven) — the hot-block
    guard."""

    name: str
    source: str = "part"
    id_col: str = "p_partkey"
    text_col: str = "p_name"
    block_cols: tuple = ("p_brand", "p_size")
    max_distance: int = 4
    max_block_size: int = 1000

    def __post_init__(self):
        if not self.block_cols:
            raise ValueError(f"{self.name}: block_cols must be non-empty")
        if len(set(self.block_cols)) != len(self.block_cols):
            raise ValueError(f"{self.name}: duplicate block_cols")
        if self.max_distance < 0:
            raise ValueError(f"{self.name}: max_distance must be >= 0")
        if self.max_block_size < 2:
            raise ValueError(
                f"{self.name}: max_block_size must be >= 2 "
                f"(a 1-record block can never pair)")
        for c in (self.id_col, self.text_col) + self.block_cols:
            ensure_identifier(c, "column", self.name)


def build_blocked_linkage(spark, reg: Registry, cfg: BlockedLinkageConfig,
                          g: GlobalConfig = DEFAULT) -> DataFrame:
    blocks = list(cfg.block_cols)
    src = reg.load(spark, cfg.source).select(
        cfg.id_col, cfg.text_col, *blocks)
    sizes = (src.groupBy(*blocks)
             .agg(F.count(F.lit(1)).alias("__block_n"))
             .filter(F.col("__block_n") <= cfg.max_block_size)
             .drop("__block_n"))
    # the cap filter is applied to ONE side only: the pair join is an
    # equi join on the blocking keys, so a block dropped from the left
    # produces no pairs regardless of the right — same semantics, half
    # the census cost (Spark does not dedupe the shared census subtree)
    left = src.join(sizes, blocks, "inner").select(
        F.col(cfg.id_col).alias("id_a"),
        F.col(cfg.text_col).alias("__text_a"), *blocks)
    right = src.select(
        F.col(cfg.id_col).alias("id_b"),
        F.col(cfg.text_col).alias("__text_b"), *blocks)
    return (left.join(right, blocks, "inner")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.expr("CAST(levenshtein(__text_a, __text_b) AS INT)")
                    .alias("dist"))
            .filter(F.col("dist") <= cfg.max_distance))


def blocked_linkage_oracle(b: SqlBuilder, reg: Registry,
                           cfg: BlockedLinkageConfig,
                           g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    blocks = ", ".join(cfg.block_cols)
    base = b.cte(
        f"{cfg.name}__s",
        f"SELECT {cfg.id_col}, {cfg.text_col}, {blocks} FROM {src}")
    sizes = b.cte(
        f"{cfg.name}__n",
        f"SELECT {blocks} FROM {base} GROUP BY {blocks} "
        f"HAVING count(*) <= {cfg.max_block_size}")
    bounded = b.cte(
        f"{cfg.name}__b",
        f"SELECT s.* FROM {base} s JOIN {sizes} USING ({blocks})")
    return b.cte(
        cfg.name,
        f"SELECT a.{cfg.id_col} AS id_a, x.{cfg.id_col} AS id_b, "
        f"CAST(levenshtein(a.{cfg.text_col}, x.{cfg.text_col}) AS INT) "
        f"AS dist "
        f"FROM {bounded} a JOIN {base} x USING ({blocks}) "
        f"WHERE a.{cfg.id_col} < x.{cfg.id_col} "
        f"AND levenshtein(a.{cfg.text_col}, x.{cfg.text_col}) "
        f"<= {cfg.max_distance}")
