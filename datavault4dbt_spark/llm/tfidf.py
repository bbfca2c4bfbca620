"""TF-IDF top terms per document (Salton & Buckley 1988 lineage — the
canonical term-weighting signal; used in data pipelines for keyword
extraction, topic tagging, and as a cheap relevance feature).

Weighting variant: ``tf * (N / df)`` — the LOG-FREE idf. Rationale:
``log`` is evaluated by different libm implementations across engines
and is not guaranteed bit-identical, while integer counts and one
double division are deterministic IEEE arithmetic everywhere — the
cross-engine parity contract this repo's oracle gate enforces. The
ranking is order-isomorphic to log-idf for fixed tf (monotone in
N/df), and the raw (tf, df) counts are emitted so a consumer can apply
any idf curve downstream.

Scale design (100 TB): term frequencies aggregate on (doc, term) with
map-side combine; document frequencies aggregate on term. The df table
is NOT unconditionally broadcast: a web-scale corpus has ~1e9 unique
terms (typos, code, URLs) — tens of GB — and a forced ``F.broadcast``
bypasses the autoBroadcast threshold and OOMs the executors instead of
degrading. Two mitigations, both on by default in the fixture:

- ``min_df`` drops terms seen in fewer than that many documents before
  the join (hapax legomena are the long tail of the vocabulary and
  carry no reusable idf signal — standard practice, and it shrinks the
  df side by typically >50%);
- the tf↔df join is left to Catalyst/AQE, which broadcasts at RUNTIME
  when the post-cut df table is actually under the threshold and
  degrades to a term-keyed shuffle join (uniform md5-free term keys,
  no skew hotter than natural Zipf — AQE skew-join splits those) when
  it is not. ``force_broadcast_df=True`` restores the hint for callers
  who know their vocabulary is bounded (e.g. token-id corpora).

The corpus size N rides along as a broadcast 1-row cross join — never
a driver-side collect inside the operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder
from .textprep import spark_tokens, duck_tokens


@dataclass(frozen=True)
class TfidfConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    top_k: int = 3
    min_df: int = 1              # drop terms with df < min_df pre-join
    force_broadcast_df: bool = False  # only for provably small vocabularies

    def __post_init__(self):
        if self.min_df < 1:
            raise ValueError(f"min_df must be >= 1, got {self.min_df}")


def build_tfidf(spark, reg: Registry, cfg: TfidfConfig,
                g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    terms = df.selectExpr(
        cfg.id_col, f"explode({spark_tokens(cfg.text_col)}) AS term")
    tf = (terms.groupBy(cfg.id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = (terms.groupBy("term")
             .agg(F.countDistinct(cfg.id_col).alias("df")))
    if cfg.min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= cfg.min_df)
    n = df.agg(F.count(F.lit(1)).alias("n"))
    dj = F.broadcast(dfreq) if cfg.force_broadcast_df else dfreq
    scored = (tf.join(dj, "term")
              .crossJoin(F.broadcast(n))
              .selectExpr(cfg.id_col, "term", "tf", "df",
                          "round(tf * (n / cast(df AS DOUBLE)), 6) "
                          "AS tfidf"))
    w = (Window.partitionBy(cfg.id_col)
         .orderBy(F.desc("tfidf"), F.asc("term")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= cfg.top_k)
            .select(cfg.id_col, "rank", "term", "tf", "df", "tfidf"))


def tfidf_oracle(b: SqlBuilder, reg: Registry, cfg: TfidfConfig,
                 g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    terms = b.cte(f"{cfg.name}__t",
                  f"SELECT {cfg.id_col}, "
                  f"UNNEST({duck_tokens(cfg.text_col)}) AS term FROM {src}")
    tf = b.cte(f"{cfg.name}__tf",
               f"SELECT {cfg.id_col}, term, count(*) AS tf FROM {terms} "
               f"GROUP BY {cfg.id_col}, term")
    having = (f" HAVING count(DISTINCT {cfg.id_col}) >= {cfg.min_df}"
              if cfg.min_df > 1 else "")
    dfreq = b.cte(f"{cfg.name}__df",
                  f"SELECT term, count(DISTINCT {cfg.id_col}) AS df "
                  f"FROM {terms} GROUP BY term{having}")
    n = b.cte(f"{cfg.name}__n", f"SELECT count(*) AS n FROM {src}")
    scored = b.cte(
        f"{cfg.name}__s",
        f"SELECT t.{cfg.id_col}, t.term, t.tf, d.df, "
        f"round(t.tf * (x.n / CAST(d.df AS DOUBLE)), 6) AS tfidf "
        f"FROM {tf} t JOIN {dfreq} d USING (term) CROSS JOIN {n} x")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, rank, term, tf, df, tfidf FROM ("
        f"SELECT *, ROW_NUMBER() OVER (PARTITION BY {cfg.id_col} "
        f"ORDER BY tfidf DESC, term ASC) AS rank FROM {scored}) "
        f"WHERE rank <= {cfg.top_k}")
