"""Corpus vocabulary statistics: the top-k token table by collection
frequency, with document frequency alongside — the first diagnostic a
training-data pipeline prints (Zipf-curve sanity, tokenizer-vocabulary
seeding, stopword discovery, contamination spot checks all start from
this table).

Output: ``(token, tf, df, rnk)`` — collection frequency (total
occurrences), document frequency (docs containing the token), and the
deterministic rank (tf descending, token ascending as the total-order
tie break).

Scale design (100 TB): tokenization is scan-stage (the shared
``textprep`` expression, no UDFs); the census is ONE groupBy over
uniform token keys with map-side partial aggregation (df via
two-level distinct-on-(token, doc) then count — Spark plans
count(DISTINCT) as a partial-deduplicating double aggregate, never a
driver-side distinct); the top-k is ``ORDER BY ... LIMIT k``, which
Catalyst compiles to TakeOrderedAndProject — per-partition bounded
heaps merged once, NO global sort of the vocabulary (pinned in
tests/test_plan_quality.py). The only full-width window in the plan
runs over the k-row result to stamp ``rnk``.

Reference anchor: none (the reference is a Data Vault loader); this
extends the build brief's training-data-pipeline surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder
from .textprep import spark_tokens, duck_tokens


@dataclass(frozen=True)
class VocabTopkConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    k: int = 200

    def __post_init__(self):
        for c in (self.id_col, self.text_col):
            ensure_identifier(c, "column", self.name)
        if self.k < 1:
            raise ValueError(f"{self.name}: k must be >= 1")


def build_vocab_topk(spark, reg: Registry, cfg: VocabTopkConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    from pyspark.sql import Window

    docs = reg.load(spark, cfg.source)
    toks = docs.selectExpr(
        cfg.id_col, f"explode({spark_tokens(cfg.text_col)}) AS token")
    census = (toks.groupBy("token")
              .agg(F.count(F.lit(1)).alias("tf"),
                   F.countDistinct(cfg.id_col).alias("df")))
    topk = (census.orderBy(F.desc("tf"), F.asc("token")).limit(cfg.k))
    # rnk window input is the k-row top-k result, not the vocabulary
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return topk.select("token", "tf", "df",
                       F.row_number().over(w).cast("int").alias("rnk"))


def vocab_topk_oracle(b: SqlBuilder, reg: Registry, cfg: VocabTopkConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w "
              f"FROM {src}")
    census = b.cte(
        f"{cfg.name}__c",
        f"SELECT t.t AS token, count(*) AS tf, "
        f"count(DISTINCT {cfg.id_col}) AS df "
        f"FROM {w}, UNNEST(w) AS t(t) GROUP BY t.t")
    topk = b.cte(f"{cfg.name}__k",
                 f"SELECT token, tf, df FROM {census} "
                 f"ORDER BY tf DESC, token LIMIT {cfg.k}")
    return b.cte(
        cfg.name,
        f"SELECT token, tf, df, CAST(row_number() OVER "
        f"(ORDER BY tf DESC, token) AS INT) AS rnk FROM {topk}")


# ------------------------------------------------------ grouped top-k --

@dataclass(frozen=True)
class GroupedVocabConfig:
    """Top-k tokens per group (language/source) — the per-stratum
    vocabulary card beside the corpus-wide one above (stopword lists
    and tokenizer coverage are per-language decisions).

    Scale design (100 TB): same scan-stage tokenization; the census is
    ONE (group, token) groupBy with map-side partials; the per-group
    top-k is a rank window over the AGGREGATED census (one row per
    distinct (group, token) — the reduced domain, never the corpus),
    so no per-group corpus sort and no TakeOrdered-per-group driver
    loop. tf-descending, token-ascending total order, the corpus-wide
    variant's contract."""

    name: str
    source: str = "documents"
    group_col: str = "lang"
    id_col: str = "doc_id"
    text_col: str = "text"
    k: int = 20

    def __post_init__(self):
        for c in (self.group_col, self.id_col, self.text_col):
            ensure_identifier(c, "column", self.name)
        if self.k < 1:
            raise ValueError(f"{self.name}: k must be >= 1")


def build_grouped_vocab(spark, reg: Registry, cfg: GroupedVocabConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    from pyspark.sql import Window

    docs = reg.load(spark, cfg.source)
    toks = docs.selectExpr(
        cfg.group_col, cfg.id_col,
        f"explode({spark_tokens(cfg.text_col)}) AS token")
    census = (toks.groupBy(cfg.group_col, "token")
              .agg(F.count(F.lit(1)).alias("tf"),
                   F.countDistinct(cfg.id_col).alias("df")))
    w = (Window.partitionBy(cfg.group_col)
         .orderBy(F.desc("tf"), F.asc("token")))
    return (census
            .withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= cfg.k)
            .select(cfg.group_col, "token", "tf", "df", "rnk"))


def grouped_vocab_oracle(b: SqlBuilder, reg: Registry,
                         cfg: GroupedVocabConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    grp = cfg.group_col
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {grp}, {cfg.id_col}, "
              f"{duck_tokens(cfg.text_col)} AS w FROM {src}")
    census = b.cte(
        f"{cfg.name}__c",
        f"SELECT {grp}, t.t AS token, count(*) AS tf, "
        f"count(DISTINCT {cfg.id_col}) AS df "
        f"FROM {w}, UNNEST(w) AS t(t) GROUP BY {grp}, t.t")
    ranked = b.cte(
        f"{cfg.name}__r",
        f"SELECT {grp}, token, tf, df, "
        f"CAST(row_number() OVER (PARTITION BY {grp} "
        f"ORDER BY tf DESC, token) AS INT) AS rnk FROM {census}")
    return b.cte(cfg.name,
                 f"SELECT * FROM {ranked} WHERE rnk <= {cfg.k}")
