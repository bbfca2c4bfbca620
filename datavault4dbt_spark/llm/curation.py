"""Corpus curation: the composed training-data filter.

One declarative query chaining the pipeline's building blocks the way a
real pre-training data flow does: quality gate -> language tag ->
near-duplicate removal (keep the lower doc_id of every MinHash pair)
-> optional repetition gate (drop docs the Gopher-style repetition
signals flag, ``repetition_entity``).
Demonstrates that the LLM operators compose as registry entities
exactly like Data Vault entities (the oracle composes the same CTEs).

Scale: each input is itself a distributed query; the joins key on
doc_id (uniform) and the duplicate set is usually small -> broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class CurationConfig:
    name: str
    quality_entity: str = "text_quality"
    langid_entity: str = "text_langid"
    dedup_entity: str = "dedup_minhash_lsh"
    id_col: str = "doc_id"
    min_quality: float = 0.5
    repetition_entity: str = ""   # "" = no repetition gate
    # "" = drop every pair's id_b (keep-lowest-id heuristic). Set to a
    # canonical_selection entity (llm/selection.py) to instead drop
    # the NON-canonical member of every duplicate group — keep-best-
    # quality, the RefinedWeb-style upgrade; dedup_entity is then only
    # a config-level dependency hint (the groups already encode it).
    canonical_entity: str = ""


def build_curation(spark, reg: Registry, cfg: CurationConfig,
                   g: GlobalConfig = DEFAULT) -> DataFrame:
    q = reg.load(spark, cfg.quality_entity)
    lang = reg.load(spark, cfg.langid_entity) \
        .select(cfg.id_col, "predicted_lang")
    if cfg.canonical_entity:
        dup_losers = (reg.load(spark, cfg.canonical_entity)
                      .filter(~F.col("is_canonical"))
                      .select(cfg.id_col).distinct())
    else:
        dup_losers = reg.load(spark, cfg.dedup_entity) \
            .select(F.col("id_b").alias(cfg.id_col)).distinct()
    kept = (q.filter(F.col("quality_score") >= cfg.min_quality)
            .join(lang, cfg.id_col)
            .join(dup_losers, cfg.id_col, "left_anti"))
    if cfg.repetition_entity:
        rep_losers = (reg.load(spark, cfg.repetition_entity)
                      .filter("is_repetitive").select(cfg.id_col))
        kept = kept.join(rep_losers, cfg.id_col, "left_anti")
    return kept.select(cfg.id_col, "predicted_lang", "n_tokens",
                       "quality_score")


def curation_oracle(b: SqlBuilder, reg: Registry, cfg: CurationConfig,
                    g: GlobalConfig = DEFAULT) -> str:
    q = reg.duckdb_relation(cfg.quality_entity)
    lang = reg.duckdb_relation(cfg.langid_entity)
    rep_gate = ""
    if cfg.repetition_entity:
        rep = reg.duckdb_relation(cfg.repetition_entity)
        rep_gate = (f"AND q.{cfg.id_col} NOT IN "
                    f"(SELECT {cfg.id_col} FROM {rep} WHERE is_repetitive) ")
    if cfg.canonical_entity:
        canon = reg.duckdb_relation(cfg.canonical_entity)
        dup_gate = (f"AND q.{cfg.id_col} NOT IN (SELECT {cfg.id_col} "
                    f"FROM {canon} WHERE NOT is_canonical)")
    else:
        dup = reg.duckdb_relation(cfg.dedup_entity)
        dup_gate = (f"AND q.{cfg.id_col} NOT IN "
                    f"(SELECT id_b FROM {dup})")
    return b.cte(
        cfg.name,
        f"SELECT q.{cfg.id_col}, l.predicted_lang, q.n_tokens, "
        f"q.quality_score "
        f"FROM {q} q JOIN {lang} l ON q.{cfg.id_col} = l.{cfg.id_col} "
        f"WHERE q.quality_score >= {cfg.min_quality} "
        f"{rep_gate}{dup_gate}")


# ------------------------------------------------------- dedup_report --

@dataclass(frozen=True)
class DedupReportConfig:
    """Per-language corpus QA rollup: how much of each language stratum
    is duplicated, and its quality range — the dashboard query a data
    curation run ends with. Aggregations are deliberately EXACT
    (counts, ratios of counts, min/max): avg/sum over doubles
    accumulate in shuffle order and are not bit-reproducible across
    engines, which would break the oracle gate this repo holds every
    operator to."""

    name: str
    langid_entity: str = "text_langid"
    quality_entity: str = "text_quality"
    groups_entity: str = "dedup_groups"
    id_col: str = "doc_id"


def build_dedup_report(spark, reg: Registry, cfg: DedupReportConfig,
                       g: GlobalConfig = DEFAULT) -> DataFrame:
    lang = reg.load(spark, cfg.langid_entity) \
        .select(cfg.id_col, "predicted_lang")
    q = reg.load(spark, cfg.quality_entity) \
        .select(cfg.id_col, "quality_score")
    grp = reg.load(spark, cfg.groups_entity) \
        .select(cfg.id_col, "group_id")
    joined = (lang.join(q, cfg.id_col)
              .join(grp, cfg.id_col, "left"))
    return (joined.groupBy("predicted_lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count("group_id").alias("n_dup_docs"),
                 F.min("quality_score").alias("min_quality"),
                 F.max("quality_score").alias("max_quality"))
            .selectExpr("predicted_lang", "n_docs", "n_dup_docs",
                        "round(n_dup_docs / cast(n_docs AS DOUBLE), 6) "
                        "AS dup_fraction",
                        "min_quality", "max_quality"))


def dedup_report_oracle(b: SqlBuilder, reg: Registry,
                        cfg: DedupReportConfig,
                        g: GlobalConfig = DEFAULT) -> str:
    lang = reg.duckdb_relation(cfg.langid_entity)
    q = reg.duckdb_relation(cfg.quality_entity)
    grp = reg.duckdb_relation(cfg.groups_entity)
    agg = b.cte(
        f"{cfg.name}__agg",
        f"SELECT l.predicted_lang, count(*) AS n_docs, "
        f"count(g.group_id) AS n_dup_docs, "
        f"min(q.quality_score) AS min_quality, "
        f"max(q.quality_score) AS max_quality "
        f"FROM {lang} l JOIN {q} q ON l.{cfg.id_col} = q.{cfg.id_col} "
        f"LEFT JOIN {grp} g ON l.{cfg.id_col} = g.{cfg.id_col} "
        f"GROUP BY l.predicted_lang")
    return b.cte(
        cfg.name,
        f"SELECT predicted_lang, n_docs, n_dup_docs, "
        f"round(n_dup_docs / CAST(n_docs AS DOUBLE), 6) AS dup_fraction, "
        f"min_quality, max_quality FROM {agg}")
