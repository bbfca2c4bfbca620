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


def build_curation(spark, reg: Registry, cfg: CurationConfig,
                   g: GlobalConfig = DEFAULT) -> DataFrame:
    q = reg.load(spark, cfg.quality_entity)
    lang = reg.load(spark, cfg.langid_entity) \
        .select(cfg.id_col, "predicted_lang")
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
    dup = reg.duckdb_relation(cfg.dedup_entity)
    rep_gate = ""
    if cfg.repetition_entity:
        rep = reg.duckdb_relation(cfg.repetition_entity)
        rep_gate = (f"AND q.{cfg.id_col} NOT IN "
                    f"(SELECT {cfg.id_col} FROM {rep} WHERE is_repetitive) ")
    return b.cte(
        cfg.name,
        f"SELECT q.{cfg.id_col}, l.predicted_lang, q.n_tokens, "
        f"q.quality_score "
        f"FROM {q} q JOIN {lang} l ON q.{cfg.id_col} = l.{cfg.id_col} "
        f"WHERE q.quality_score >= {cfg.min_quality} "
        f"{rep_gate}"
        f"AND q.{cfg.id_col} NOT IN (SELECT id_b FROM {dup})")
