"""Source-level curation: per-source quality statistics and the
data-driven source gate (the RefinedWeb/C4 "domain filtering" move:
decide KEEP/DROP per origin, not per document — a crawler's bad
domains produce consistently bad documents, and filtering at source
granularity is both cheaper and more stable than per-doc scoring).

Public lineage: Penedo et al. 2023 (RefinedWeb §3.2, URL/source-level
filtering), Raffel et al. 2020 (C4 blocklists). No reference analogue
(the reference is a warehouse loader); these compose with the rest of
the curation family (`llm/curation.py`).

Scale design (100 TB): the statistics aggregate per `source` — there
are orders of magnitude fewer sources than documents, so the stats
table is tiny; the gate broadcasts the offending-source set to an
anti-join that runs in the scan stage of the corpus pass. One shuffle
total (the stats groupBy, map-side combined); the gate itself adds
none.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import (GlobalConfig, DEFAULT, Registry,
                       ensure_identifier)
from ..plans.sqlbuild import SqlBuilder
from .textprep import spark_tokens, duck_tokens


# --------------------------------------------------------- source_stats --

@dataclass(frozen=True)
class SourceStatsConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    source_col: str = "source"
    short_doc_tokens: int = 40   # docs under this count as "short"


def _tok_count(cfg: SourceStatsConfig, dialect: str) -> str:
    """Portable token count with the NULL-text convention pinned to 0
    (Spark's size(NULL) and DuckDB's len(NULL) disagree)."""
    toks = (spark_tokens(cfg.text_col) if dialect == "spark"
            else duck_tokens(cfg.text_col))
    size = "size" if dialect == "spark" else "len"
    return (f"CASE WHEN {cfg.text_col} IS NULL THEN 0 "
            f"ELSE {size}({toks}) END")


def build_source_stats(spark, reg: Registry, cfg: SourceStatsConfig,
                       g: GlobalConfig = DEFAULT) -> DataFrame:
    """Per-source curation statistics: document/token volume, the
    short-document share (the cheap proxy for boilerplate/low-quality
    origins), and the exact-duplicate share (md5 content hash — a
    source that mirrors or re-serves content shows up here first).

    One groupBy on `source` (map-side combined); every per-doc input
    (token count, content hash) is a scan-stage expression.
    """
    df = reg.load(spark, cfg.source)
    per_doc = df.selectExpr(
        cfg.source_col,
        f"{_tok_count(cfg, 'spark')} AS n_tok",
        f"md5({cfg.text_col}) AS h")
    return (per_doc.groupBy(cfg.source_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("n_tokens"),
                 F.sum(F.expr(
                     f"CASE WHEN n_tok < {cfg.short_doc_tokens} "
                     f"THEN 1 ELSE 0 END")).alias("n_short_docs"),
                 (F.count("h") - F.countDistinct("h")).alias("n_dup_docs"))
            .selectExpr(cfg.source_col, "n_docs", "n_tokens",
                        "n_short_docs", "n_dup_docs",
                        "round(n_short_docs / CAST(n_docs AS DOUBLE), 6) "
                        "AS short_ratio",
                        "round(n_dup_docs / CAST(n_docs AS DOUBLE), 6) "
                        "AS dup_ratio"))


def source_stats_oracle(b: SqlBuilder, reg: Registry,
                        cfg: SourceStatsConfig,
                        g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    per = b.cte(f"{cfg.name}__per",
                f"SELECT {cfg.source_col}, "
                f"{_tok_count(cfg, 'duck')} AS n_tok, "
                f"md5({cfg.text_col}) AS h FROM {src}")
    agg = b.cte(
        f"{cfg.name}__agg",
        f"SELECT {cfg.source_col}, count(*) AS n_docs, "
        f"CAST(sum(n_tok) AS BIGINT) AS n_tokens, "
        f"CAST(sum(CASE WHEN n_tok < {cfg.short_doc_tokens} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs, "
        f"count(h) - count(DISTINCT h) AS n_dup_docs "
        f"FROM {per} GROUP BY {cfg.source_col}")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.source_col}, n_docs, n_tokens, n_short_docs, "
        f"n_dup_docs, "
        f"round(n_short_docs / CAST(n_docs AS DOUBLE), 6) AS short_ratio, "
        f"round(n_dup_docs / CAST(n_docs AS DOUBLE), 6) AS dup_ratio "
        f"FROM {agg}")


# ---------------------------------------------------------- source gate --

@dataclass(frozen=True)
class SourceGateConfig:
    """Documents surviving the source-level gate: a source is DROPPED
    when its short-document share or exact-duplicate share exceeds the
    thresholds, or it has too few documents to judge (the
    low-volume-origin rule — RefinedWeb drops unjudgeable tails)."""

    name: str
    stats_entity: str = "source_stats"
    source: str = "documents"
    id_col: str = "doc_id"
    source_col: str = "source"
    max_short_ratio: float = 0.45
    max_dup_ratio: float = 0.5
    min_docs: int = 3


def _offending_pred(cfg: SourceGateConfig) -> str:
    return (f"short_ratio > {cfg.max_short_ratio} "
            f"OR dup_ratio > {cfg.max_dup_ratio} "
            f"OR n_docs < {cfg.min_docs}")


def build_source_gate(spark, reg: Registry, cfg: SourceGateConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    """Anti-join against the offending-source set. The set is
    vocabulary-of-origins sized (thousands at web scale, never
    corpus-sized), so it is broadcast explicitly — the corpus pass
    stays a single scan with a build-side lookup, no shuffle."""
    stats = reg.load(spark, cfg.stats_entity)
    bad = stats.filter(F.expr(_offending_pred(cfg))).select(cfg.source_col)
    df = reg.load(spark, cfg.source)
    return (df.join(F.broadcast(bad), on=cfg.source_col, how="left_anti")
            .select(cfg.id_col, cfg.source_col))


def source_gate_oracle(b: SqlBuilder, reg: Registry, cfg: SourceGateConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    stats = reg.duckdb_relation(cfg.stats_entity)
    src = reg.duckdb_relation(cfg.source)
    bad = b.cte(f"{cfg.name}__bad",
                f"SELECT {cfg.source_col} FROM {stats} "
                f"WHERE {_offending_pred(cfg)}")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, {cfg.source_col} FROM {src} d "
        f"WHERE NOT EXISTS (SELECT 1 FROM {bad} x "
        f"WHERE x.{cfg.source_col} = d.{cfg.source_col})")


# ------------------------------------------------------- token_budget --

@dataclass(frozen=True)
class TokenBudgetConfig:
    """Per-source token accounting: documents, tokens, and each
    source's share of the corpus in ppm — the table every mixing /
    budget decision starts from ("how many tokens do I actually have
    per source?"; the input to temperature_mix-style rate planning).
    The share is integer fixed-point (tokens * 1e6 div total), so both
    engines agree bit-for-bit; shares sum to <= 1e6 with the remainder
    lost to flooring (documented — consumers needing exact totals use
    n_tokens).

    Scale design (100 TB): tokenization + size() in the scan stage,
    ONE map-side-combined groupBy on the source key, and the 1-row
    corpus total rides back as a broadcast cross join — the
    tfidf/lm vocabulary pattern, never a driver collect."""

    name: str
    source: str = "documents"
    source_col: str = "source"
    text_col: str = "text"

    def __post_init__(self):
        for c in (self.source_col, self.text_col):
            ensure_identifier(c, "column", self.name)


def build_token_budget(spark, reg: Registry, cfg: TokenBudgetConfig,
                       g: GlobalConfig = DEFAULT) -> DataFrame:
    from pyspark.sql import functions as F

    docs = reg.load(spark, cfg.source).selectExpr(
        cfg.source_col,
        f"size({spark_tokens(cfg.text_col)}) AS n_tok")
    per_src = (docs.groupBy(cfg.source_col)
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_tok").alias("n_tokens")))
    total = per_src.agg(F.sum("n_tokens").alias("t"))
    return (per_src.crossJoin(F.broadcast(total))
            .selectExpr(cfg.source_col, "n_docs", "n_tokens",
                        "CASE WHEN t = 0 THEN 0 ELSE "
                        "(n_tokens * 1000000) div t END "
                        "AS token_share_ppm"))


def token_budget_oracle(b: SqlBuilder, reg: Registry,
                        cfg: TokenBudgetConfig,
                        g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    per = b.cte(
        f"{cfg.name}__p",
        f"SELECT {cfg.source_col}, count(*) AS n_docs, "
        f"CAST(sum(len({duck_tokens(cfg.text_col)})) AS BIGINT) "
        f"AS n_tokens FROM {src} GROUP BY {cfg.source_col}")
    tot = b.cte(f"{cfg.name}__t",
                f"SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM {per}")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.source_col}, n_docs, n_tokens, "
        f"CASE WHEN t = 0 THEN 0 ELSE (n_tokens * 1000000) // t END "
        f"AS token_share_ppm FROM {per}, {tot}")
