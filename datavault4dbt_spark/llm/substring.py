"""Shared-substring near-duplicate detection (the "deduplicate text
datasets" exact-substring recipe, Lee et al. 2021, public): two
documents are substring-duplicates when they share a run of at least
``min_run`` consecutive TOKENS. The reference implementation builds a
suffix array over the concatenated corpus — inherently sequential; the
Spark-first re-expression is a k-gram inverted index plus diagonal-run
analysis, all relational:

1. every document explodes to positioned k-token grams (md5-hashed);
2. a document-frequency cap drops boilerplate grams (same skew defense
   as the Jaccard operator — a stopword gram would otherwise join
   every doc against every doc);
3. the self-join on gram hash yields match points (a, b, pos_a, pos_b);
   matches lying on the same DIAGONAL (pos_a - pos_b constant) with
   CONSECUTIVE positions correspond to one shared substring: t
   consecutive k-gram matches == a shared run of k + t - 1 tokens;
4. the classic gaps-and-islands trick (pos_a - row_number() per
   (a, b, diag)) splits each diagonal into maximal consecutive
   islands; the longest island gives the pair's longest shared run.

Scale: the only join keys on the gram hash (uniform post-cap); islands
are window work keyed on (a, b, diag) — skew-bounded by the longest
document, not the corpus. Every step is whole-stage codegen or a keyed
shuffle; the DuckDB oracle replays the identical algebra.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder
from .textprep import (spark_tokens, duck_tokens, spark_shingles,
                       duck_shingles)


@dataclass(frozen=True)
class SubstringDupConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    gram_n: int = 5        # k-gram seed size
    min_run: int = 8       # report pairs sharing >= this many tokens
    max_doc_freq: int = 50  # drop grams in more docs than this (skew cap)


def build_substring_dup(spark, reg: Registry, cfg: SubstringDupConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    w = df.selectExpr(cfg.id_col, f"{spark_tokens(cfg.text_col)} AS w")
    grams = w.selectExpr(
        cfg.id_col,
        f"posexplode({spark_shingles('w', cfg.gram_n)}) AS (pos, s)") \
        .selectExpr(cfg.id_col, "pos", "md5(s) AS h")
    # the positioned gram index feeds three consumers (the doc-freq
    # census + both self-join sides); the join sides share one exchange
    # via ReusedExchange, but the census aggregates on h BEFORE any
    # exchange the join could reuse, so without a cache the tokenize +
    # shingle + md5 chain — the expensive scan-stage work — runs twice.
    # Persist the slim (id, pos, h) rows once (the ngram_jaccard /
    # simhash pattern; MEMORY_AND_DISK spills instead of evicting).
    grams = grams.persist()
    if cfg.max_doc_freq:
        hot = (grams.groupBy("h")
               .agg(F.countDistinct(cfg.id_col).alias("df"))
               .filter(F.col("df") > cfg.max_doc_freq).select("h"))
        grams = grams.join(F.broadcast(hot), "h", "left_anti")
    # match points: same gram hash, ordered pair a < b
    pts = (grams.alias("a").join(
               grams.alias("b"),
               [F.col("a.h") == F.col("b.h"),
                F.col(f"a.{cfg.id_col}") < F.col(f"b.{cfg.id_col}")])
           .selectExpr(f"a.{cfg.id_col} AS id_a", f"b.{cfg.id_col} AS id_b",
                       "a.pos AS pa", "b.pos AS pb",
                       "a.pos - b.pos AS diag")
           # two equal grams WITHIN one doc pair at different diagonals
           # are distinct match points; duplicates on the same point
           # (identical gram occurring twice at same positions) are
           # impossible — (doc, pos) is unique by construction
           )
    isl = (Window.partitionBy("id_a", "id_b", "diag").orderBy("pa"))
    runs = (pts.withColumn("grp", F.col("pa") - F.row_number().over(isl))
            .groupBy("id_a", "id_b", "diag", "grp")
            .agg(F.count(F.lit(1)).alias("t")))
    per_pair = (runs.groupBy("id_a", "id_b")
                .agg(F.max(F.col("t") + F.lit(cfg.gram_n - 1))
                     .alias("max_shared_run"),
                     F.count(F.lit(1)).alias("n_shared_regions")))
    return per_pair.filter(F.col("max_shared_run") >= cfg.min_run)


def substring_dup_oracle(b: SqlBuilder, reg: Registry,
                         cfg: SubstringDupConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w "
              f"FROM {src}")
    sh = duck_shingles("w", cfg.gram_n)
    grams = b.cte(
        f"{cfg.name}__g",
        f"SELECT {cfg.id_col}, i AS pos, md5(({sh})[i + 1]) AS h "
        f"FROM {w}, UNNEST(range(0, len({sh}))) AS t(i)")
    if cfg.max_doc_freq:
        hot = b.cte(f"{cfg.name}__hot",
                    f"SELECT h FROM {grams} GROUP BY h "
                    f"HAVING count(DISTINCT {cfg.id_col}) > {cfg.max_doc_freq}")
        grams = b.cte(f"{cfg.name}__gc",
                      f"SELECT * FROM {grams} "
                      f"WHERE h NOT IN (SELECT h FROM {hot})")
    pts = b.cte(
        f"{cfg.name}__pts",
        f"SELECT a.{cfg.id_col} AS id_a, b.{cfg.id_col} AS id_b, "
        f"a.pos AS pa, a.pos - b.pos AS diag "
        f"FROM {grams} a JOIN {grams} b ON a.h = b.h "
        f"AND a.{cfg.id_col} < b.{cfg.id_col}")
    runs = b.cte(
        f"{cfg.name}__runs",
        f"SELECT id_a, id_b, diag, "
        f"pa - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, diag "
        f"ORDER BY pa) AS grp FROM {pts}")
    agg = b.cte(
        f"{cfg.name}__agg",
        f"SELECT id_a, id_b, diag, grp, count(*) AS t FROM {runs} "
        f"GROUP BY id_a, id_b, diag, grp")
    return b.cte(
        cfg.name,
        f"SELECT id_a, id_b, max(t + {cfg.gram_n - 1}) AS max_shared_run, "
        f"count(*) AS n_shared_regions FROM {agg} "
        f"GROUP BY id_a, id_b "
        f"HAVING max(t + {cfg.gram_n - 1}) >= {cfg.min_run}")
