"""N-gram language-model quality scoring: train an add-one-smoothed
bigram model on a held-out slice of the corpus and score every document
by its mean token probability — the classic KenLM-style quality signal
(CCNet, Wenzek et al. 2020 score crawl text against a Wikipedia LM and
filter on perplexity; this is the same shape with the corpus' own even
half standing in for the reference corpus).

Fixed-point contract: the published form of the signal is log-space
perplexity, but ``log``/``pow`` are libm calls with engine-specific
rounding, and cross-row DOUBLE sums are order-dependent — neither
survives this repo's bit-identical oracle gate (same reasoning as
tfidf's log-free idf). Instead each bigram position scores an exact
integer

    q_i = ((c_bigram + 1) * SCALE) div (c_prefix + V)

(add-one smoothed token probability in parts-per-``SCALE``), and the
document score is ``sum(q_i) div n_bigrams`` — integer arithmetic end
to end, identical in Spark and DuckDB, monotone in the mean token
probability. Consumers who want log-perplexity can recover it
downstream from the emitted integer counts.

Model terms: ``c_bigram`` = training count of the (prev, cur) pair;
``c_prefix`` = training count of ``prev`` as a bigram prefix;
``V`` = distinct token vocabulary of the training slice (the add-one
denominator). Unseen prefixes score ``SCALE / V`` — the uniform
fallback a smoothed LM assigns.

Scale design (100 TB): the bigram explode is scan-stage (higher-order
slice/zip, no UDFs); the two model tables aggregate with map-side
combine on uniform word keys; ``min_count`` prunes the hapax tail
before the scoring join (the same vocabulary-bound argument as
tfidf.min_df — a web-scale bigram table is tens of billions of rows,
pruning count-1 entries cuts it by the Zipf tail); the scoring joins
are plain equi-joins the optimizer/AQE broadcasts when the pruned
model fits and shuffle-joins when it does not — never a forced
broadcast. V rides along as a broadcast 1-row cross join, never a
driver collect.

Reference anchor: none (the reference is a Data Vault loader); this
extends the build brief's training-data-pipeline surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder
from .textprep import spark_tokens, duck_tokens

SCALE = 1_000_000  # parts-per-million fixed point


@dataclass(frozen=True)
class BigramLmConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    train_mod: int = 2    # train on docs with id % train_mod == 0
    min_count: int = 1    # drop bigrams with training count < min_count

    def __post_init__(self):
        for c in (self.id_col, self.text_col):
            ensure_identifier(c, "column", self.name)
        if self.train_mod < 1:
            raise ValueError(f"{self.name}: train_mod must be >= 1")
        if self.min_count < 1:
            raise ValueError(f"{self.name}: min_count must be >= 1")


def _bigram_pairs(cfg: BigramLmConfig, dialect: str) -> str:
    """(prev, cur) explode over the token array — scan-stage in both
    dialects. Spark guards size<2 (sequence counts down); DuckDB's
    range(1, len<=1) is already empty."""
    if dialect == "spark":
        return (f"CASE WHEN size(w) >= 2 THEN transform("
                f"sequence(1, size(w) - 1), "
                f"i -> struct(element_at(w, i) AS p, "
                f"element_at(w, i + 1) AS c)) "
                f"ELSE array() END")
    return ("list_transform(range(1, greatest(len(w), 1)), "
            "i -> {'p': w[i], 'c': w[i + 1]})")


def lm_model_frames(docs: DataFrame, cfg: BigramLmConfig):
    """Train the add-one-smoothed bigram model over ``docs``'s
    ``id % train_mod == 0`` slice: ``(bigram counts, prefix counts,
    1-row vocabulary size)``. Split out so the streaming gate
    (streaming/curation.py) can train ONCE on a static reference
    corpus and score arriving micro-batches against the same frames
    the oracle-checked batch builder uses."""
    toks = docs.selectExpr(cfg.id_col,
                           f"{spark_tokens(cfg.text_col)} AS w")
    bi = toks.selectExpr(
        cfg.id_col,
        f"inline({_bigram_pairs(cfg, 'spark')})")
    train = bi.filter(F.col(cfg.id_col) % cfg.train_mod == 0)
    cbi = (train.groupBy("p", "c")
           .agg(F.count(F.lit(1)).alias("c_bi")))
    if cfg.min_count > 1:
        cbi = cbi.filter(F.col("c_bi") >= cfg.min_count)
    cpre = (train.groupBy("p")
            .agg(F.count(F.lit(1)).alias("c_pre")))
    vocab = (toks.filter(F.col(cfg.id_col) % cfg.train_mod == 0)
             .selectExpr("explode(w) AS t")
             .agg(F.countDistinct("t").alias("v")))
    return cbi, cpre, vocab


def lm_score_frame(docs: DataFrame, cbi: DataFrame, cpre: DataFrame,
                   vocab: DataFrame, cfg: BigramLmConfig,
                   carry: tuple = ()) -> DataFrame:
    """Score an arbitrary document frame against trained model frames —
    the single implementation batch and streaming share. ``carry``:
    extra columns passed through (e.g. a stream's language or
    event-time column) — PLAIN column names, not expressions (each
    item is re-projected after the join, where an alias expression's
    source column no longer exists). Documents with < 2 tokens keep a
    NULL score."""
    for c in carry:
        ensure_identifier(c, "carry column", cfg.name)
    toks = docs.selectExpr(cfg.id_col,
                           f"{spark_tokens(cfg.text_col)} AS w")
    bi = toks.selectExpr(
        cfg.id_col,
        f"inline({_bigram_pairs(cfg, 'spark')})")
    scored = (bi.join(cbi, ["p", "c"], "left")
              .join(cpre, ["p"], "left")
              .crossJoin(F.broadcast(vocab))
              .selectExpr(
                  cfg.id_col,
                  "c_bi IS NOT NULL AS seen",
                  f"((coalesce(c_bi, 0) + 1) * CAST({SCALE} AS BIGINT))"
                  f" div (coalesce(c_pre, 0) + v) AS q"))
    per_doc = (scored.groupBy(cfg.id_col)
               .agg(F.count(F.lit(1)).cast("int").alias("n_bigrams"),
                    F.sum(F.when(F.col("seen"), 1).otherwise(0))
                    .cast("int").alias("n_seen"),
                    F.expr("sum(q) div count(*)").alias("score_ppm")))
    # docs with < 2 tokens have no bigrams: keep them with NULL score
    return (docs.selectExpr(cfg.id_col, *carry)
            .join(per_doc, [cfg.id_col], "left")
            .selectExpr(cfg.id_col, *carry,
                        "coalesce(n_bigrams, 0) AS n_bigrams",
                        "coalesce(n_seen, 0) AS n_seen",
                        "score_ppm"))


def build_lm_score(spark, reg: Registry, cfg: BigramLmConfig,
                   g: GlobalConfig = DEFAULT) -> DataFrame:
    docs = reg.load(spark, cfg.source)
    # the docs->bigram projection is scan-stage, so splitting the
    # model/score frames costs no extra shuffle (model aggs and
    # scoring joins are unchanged)
    cbi, cpre, vocab = lm_model_frames(docs, cfg)
    return lm_score_frame(docs, cbi, cpre, vocab, cfg)


def lm_score_oracle(b: SqlBuilder, reg: Registry, cfg: BigramLmConfig,
                    g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w "
              f"FROM {src}")
    bi = b.cte(
        f"{cfg.name}__bi",
        f"SELECT {cfg.id_col}, u.pc.p AS p, u.pc.c AS c "
        f"FROM {w}, UNNEST({_bigram_pairs(cfg, 'duckdb')}) AS u(pc) "
        f"WHERE len(w) >= 2")
    having = (f" HAVING count(*) >= {cfg.min_count}"
              if cfg.min_count > 1 else "")
    cbi = b.cte(f"{cfg.name}__cb",
                f"SELECT p, c, count(*) AS c_bi FROM {bi} "
                f"WHERE {cfg.id_col} % {cfg.train_mod} = 0 "
                f"GROUP BY p, c{having}")
    cpre = b.cte(f"{cfg.name}__cp",
                 f"SELECT p, count(*) AS c_pre FROM {bi} "
                 f"WHERE {cfg.id_col} % {cfg.train_mod} = 0 GROUP BY p")
    vocab = b.cte(f"{cfg.name}__v",
                  f"SELECT count(DISTINCT t.t) AS v FROM {w}, "
                  f"UNNEST(w) AS t(t) "
                  f"WHERE {cfg.id_col} % {cfg.train_mod} = 0")
    scored = b.cte(
        f"{cfg.name}__s",
        f"SELECT b.{cfg.id_col}, cb.c_bi IS NOT NULL AS seen, "
        f"((coalesce(cb.c_bi, 0) + 1) * CAST({SCALE} AS BIGINT)) "
        f"// (coalesce(cp.c_pre, 0) + v.v) AS q "
        f"FROM {bi} b LEFT JOIN {cbi} cb ON b.p = cb.p AND b.c = cb.c "
        f"LEFT JOIN {cpre} cp ON b.p = cp.p CROSS JOIN {vocab} v")
    pd_ = b.cte(
        f"{cfg.name}__pd",
        f"SELECT {cfg.id_col}, CAST(count(*) AS INT) AS n_bigrams, "
        f"CAST(sum(CASE WHEN seen THEN 1 ELSE 0 END) AS INT) AS n_seen, "
        f"CAST(sum(q) // count(*) AS BIGINT) AS score_ppm "
        f"FROM {scored} GROUP BY {cfg.id_col}")
    return b.cte(
        cfg.name,
        f"SELECT d.{cfg.id_col}, "
        f"coalesce(p.n_bigrams, 0) AS n_bigrams, "
        f"coalesce(p.n_seen, 0) AS n_seen, p.score_ppm "
        f"FROM {src} d LEFT JOIN {pd_} p "
        f"ON d.{cfg.id_col} = p.{cfg.id_col}")


@dataclass(frozen=True)
class CcnetBucketsConfig:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3):
    per-language, split scored documents into head/middle/tail thirds
    by LM score and keep head+middle — the standard quality-filter
    shape for multilingual crawl corpora. ``score_entity`` is a
    ``build_lm_score`` output (higher score_ppm = more target-like;
    CCNet's perplexity is lower-is-better, so its head = our
    highest-score third)."""

    name: str
    score_entity: str = "text_lm_score"
    source: str = "documents"
    id_col: str = "doc_id"
    lang_col: str = "lang"

    def __post_init__(self):
        for c in (self.id_col, self.lang_col):
            ensure_identifier(c, "column", self.name)


_BUCKET_CASE = ("CASE WHEN score_ppm IS NULL THEN 'tail' "
                "WHEN score_ppm >= c_head THEN 'head' "
                "WHEN score_ppm >= c_mid THEN 'middle' "
                "ELSE 'tail' END")


def ccnet_cutoffs_frame(d: DataFrame) -> DataFrame:
    """Per-language tercile cutoff scores ``(lang, c_head, c_mid)``
    from any frame carrying ``lang`` and ``score_ppm`` — the static
    side the streaming gate broadcasts (streaming/curation.py), shared
    with the batch builder so the two paths cannot drift."""
    from pyspark.sql import Window

    hist = (d.filter("score_ppm IS NOT NULL")
            .groupBy("lang", "score_ppm")
            .agg(F.count(F.lit(1)).alias("c")))
    w = (Window.partitionBy("lang").orderBy(F.desc("score_ppm"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.select(
        "lang", "score_ppm",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("lang")).alias("n"))
    # both cutoffs from ONE pass over the cumulative histogram —
    # conditional max, no second window branch, no cutoff-cutoff join
    return cum.groupBy("lang").agg(
        F.max(F.expr("CASE WHEN cum * 3 >= n THEN score_ppm END"))
        .alias("c_head"),
        F.max(F.expr("CASE WHEN cum * 3 >= 2 * n THEN score_ppm END"))
        .alias("c_mid"))


def ccnet_assign_frame(d: DataFrame, cuts: DataFrame, id_col: str,
                       carry: tuple = ()) -> DataFrame:
    """Bucket-assign any ``(id, lang, score_ppm, *carry)`` frame
    against precomputed cutoffs (broadcast — one row per language).
    Shared by the batch builder and the streaming gate."""
    return (d.join(F.broadcast(cuts), ["lang"], "left")
            .selectExpr(id_col, *carry, "lang", "score_ppm",
                        f"{_BUCKET_CASE} AS ppl_bucket",
                        f"{_BUCKET_CASE} IN ('head', 'middle') AS keep"))


def build_ccnet_buckets(spark, reg: Registry, cfg: CcnetBucketsConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    """Exact tercile cutoffs WITHOUT a per-language corpus sort: the
    naive NTILE(3) OVER (PARTITION BY lang ORDER BY score) funnels each
    language's full corpus through one reducer — the one-domain-one-
    reducer skew CCNet itself avoids by computing cutoffs on a sample.
    This takes the exact-arithmetic version of that idea:

    1. histogram: map-side-combined groupBy (lang, score_ppm) — at most
       SCALE+1 distinct scores per language regardless of corpus size,
       so the only window in the plan runs over the BOUNDED histogram,
       never the corpus;
    2. cutoffs: descending cumulative count over the histogram;
       c_head = max score whose cum*3 >= n (the score where the top
       third is first complete), c_mid likewise at 2n — integer
       cross-multiplication, no division rounding;
    3. assignment: broadcast the per-language cutoff row back and
       bucket by comparison — ties at a cutoff all land in the higher
       bucket (deterministic; no arbitrary tie split).

    Unscored documents (< 2 tokens, score_ppm NULL) bucket as 'tail'.
    ``keep`` = head|middle, CCNet's published keep set."""
    docs = reg.load(spark, cfg.source).selectExpr(
        cfg.id_col, f"{cfg.lang_col} AS lang")
    score = reg.load(spark, cfg.score_entity).selectExpr(
        cfg.id_col, "score_ppm")
    d = docs.join(score, [cfg.id_col], "left")
    return ccnet_assign_frame(d, ccnet_cutoffs_frame(d), cfg.id_col)


def ccnet_buckets_oracle(b: SqlBuilder, reg: Registry,
                         cfg: CcnetBucketsConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    sc = reg.duckdb_relation(cfg.score_entity)
    d = b.cte(f"{cfg.name}__d",
              f"SELECT s.{cfg.id_col}, s.{cfg.lang_col} AS lang, "
              f"q.score_ppm FROM {src} s LEFT JOIN {sc} q "
              f"ON s.{cfg.id_col} = q.{cfg.id_col}")
    hist = b.cte(f"{cfg.name}__h",
                 f"SELECT lang, score_ppm, count(*) AS c FROM {d} "
                 f"WHERE score_ppm IS NOT NULL GROUP BY lang, score_ppm")
    cum = b.cte(
        f"{cfg.name}__cu",
        f"SELECT lang, score_ppm, "
        f"sum(c) OVER (PARTITION BY lang ORDER BY score_ppm DESC "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
        f"sum(c) OVER (PARTITION BY lang) AS n FROM {hist}")
    cuts = b.cte(
        f"{cfg.name}__ct",
        f"SELECT lang, "
        f"max(CASE WHEN cum * 3 >= n THEN score_ppm END) AS c_head, "
        f"max(CASE WHEN cum * 3 >= 2 * n THEN score_ppm END) AS c_mid "
        f"FROM {cum} GROUP BY lang")
    return b.cte(
        cfg.name,
        f"SELECT d.{cfg.id_col}, d.lang, d.score_ppm, "
        f"{_BUCKET_CASE} AS ppl_bucket, "
        f"{_BUCKET_CASE} IN ('head', 'middle') AS keep "
        f"FROM {d} d LEFT JOIN {cuts} c ON d.lang = c.lang")
