"""FineWeb-edu-shape learned quality classifier: a linear scorer over
HASHED token features whose integer fixed-point weights are fit from a
teacher-labeled slice of the corpus — the "train a cheap classifier on
an expensive annotator's labels, then score everything" pattern of
FineWeb-Edu (Penedo et al. 2024, where the annotator is an LLM rubric)
and the fasttext filters of CCNet/LLaMA (Wenzek et al. 2020; Touvron
et al. 2023, where it is a Wikipedia-vs-crawl objective). It completes
this repo's quality stack: rules (``llm/gopher.py``) -> LM perplexity
(``llm/lm.py``) -> learned classifier (here), per round-8 advice #4.

Model (deviation from the papers' logistic loss, documented): training
a real logistic regression needs iterative float optimization — not
expressible under this repo's bit-identical oracle gate. Instead the
weights are the add-one-smoothed class posterior per hashed feature

    w_ppm(f) = ((c_pos(f) + 1) * SCALE) div (c_pos(f) + c_neg(f) + 2)

— the Naive-Bayes-flavored linear model over bag-of-feature counts
(the same fixed-point posterior algebra as ``llm/dsir.py``, to which
this adds feature HASHING and a supervised label), and a document's
score is the integer mean of its token-feature weights:
``score_ppm = sum(w_ppm) div n_tokens`` in [0, SCALE], monotone in
teacher-likeness. Unseen features take the uninformative posterior
SCALE/2. ``selected`` applies the configured threshold.

Feature hashing (the papers' memory bound, portable here): each token
maps to a bucket via the first 16 bits of ``md5(salt:token)`` modulo
``n_features`` — the nibble-decode trick shared with
``llm/sampling.py``, identical text in both dialects; a power-of-two
``n_features`` divides 65536 exactly, so buckets are uniform. The
model is therefore a FIXED n_features-row table regardless of corpus
size — the property that lets a 100 TB run broadcast it.

Teacher: the Gopher rule verdict (``llm/gopher.py``'s conjunctive
``keep``) computed on the ``train_predicate`` slice — scan-stage
expressions, so "labeling" costs no extra pass. A production run can
point the predicate at a human/LLM-annotated subset; the plan shape is
unchanged.

Scale design (100 TB): label + tokenize + hash are scan-stage exprs;
the census is ONE map-side-combined groupBy onto n_features keys (the
combine collapses each scan partition to <= n_features rows, so the
shuffle moves kilobytes); the weight table is broadcast to the scoring
join; the per-doc reduce is one uniform-key groupBy. Total: two
shuffles, both bounded or uniform, matching ``llm/dsir.py``'s pinned
plan shape.

Reference anchor: none (the reference is a Data Vault loader); this
extends the build brief's training-data-pipeline surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder
from .gopher import (GopherRulesConfig, _measure_exprs, _verdict_exprs,
                     _RULE_COLS)
from .lm import SCALE
from .textprep import spark_tokens, duck_tokens, spark_nibble


@dataclass(frozen=True)
class QualityClassifierConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    # SQL predicate (portable in both dialects) selecting the LABELED
    # training slice; the teacher verdict is computed only there
    train_predicate: str = "doc_id % 2 = 0"
    n_features: int = 512          # power of two <= 65536
    salt: str = "qc"
    threshold_ppm: int = SCALE // 2

    def __post_init__(self):
        for c in (self.id_col, self.text_col):
            ensure_identifier(c, "column", self.name)
        n = self.n_features
        if n < 2 or n > 65536 or (n & (n - 1)):
            raise ValueError(
                f"{self.name}: n_features must be a power of two in "
                f"[2, 65536] (exact uniformity of the 16-bit hash)")
        if "'" in self.salt or "\\" in self.salt:
            raise ValueError(f"{self.name}: salt must not contain "
                             f"quotes/backslashes (SQL literal)")
        if not 0 <= self.threshold_ppm <= SCALE:
            raise ValueError(
                f"{self.name}: threshold_ppm must be within [0, {SCALE}]")

    def teacher(self) -> GopherRulesConfig:
        """Gopher rule table at paper defaults — the label generator.
        Only the token-measure/verdict EXPRESSIONS are used (no second
        entity is built)."""
        return GopherRulesConfig(f"{self.name}__teacher",
                                 source=self.source, id_col=self.id_col,
                                 text_col=self.text_col)


def _bucket_expr(cfg: QualityClassifierConfig, tok: str) -> str:
    """Hashed feature id for one token — 16 md5 bits mod n_features;
    valid verbatim in both dialects (spark_nibble == duck_nibble)."""
    h = f"md5(concat('{cfg.salt}:', {tok}))"
    u16 = "CAST(0 AS BIGINT)"
    for i in range(1, 5):
        u16 = f"({u16} * 16 + {spark_nibble(f'substr({h}, {i}, 1)')})"
    return f"CAST(({u16}) % {cfg.n_features} AS INT)"


_W_PPM = ("((c_pos + 1) * CAST({scale} AS BIGINT))"
          "{idiv}(c_pos + c_neg + 2)")


def _label_expr() -> str:
    return " AND ".join(_RULE_COLS) + " AS label"


def classifier_weights_frame(docs: DataFrame,
                             cfg: QualityClassifierConfig) -> DataFrame:
    """Fit the n_features-row weight table from the teacher-labeled
    slice — the static side a streaming gate would broadcast, shared
    with the batch builder so the two paths cannot drift."""
    t = cfg.teacher()
    w_t = (docs.filter(cfg.train_predicate)
           .selectExpr(cfg.id_col, f"{spark_tokens(cfg.text_col)} AS w"))
    meas = w_t.selectExpr("w", *_measure_exprs(t, "spark"))
    lab = (meas.selectExpr("w", *_verdict_exprs(t))
           .selectExpr("w", _label_expr()))
    feat = (lab.selectExpr("label", "explode(w) AS t")
            .selectExpr("label", f"{_bucket_expr(cfg, 't')} AS f"))
    census = (feat.groupBy("f")
              .agg(F.sum(F.when(F.col("label"), 1).otherwise(0))
                   .alias("c_pos"),
                   F.sum(F.when(F.col("label"), 0).otherwise(1))
                   .alias("c_neg")))
    return census.selectExpr(
        "f", _W_PPM.format(scale=SCALE, idiv=" div ") + " AS w_ppm")


def classifier_score_frame(docs: DataFrame, weights: DataFrame,
                           cfg: QualityClassifierConfig) -> DataFrame:
    """Score every document against a fitted weight table: broadcast
    join on the hashed feature + one per-doc reduce. Stateless, so it
    runs unchanged inside a streaming micro-batch plan."""
    toks = (docs.selectExpr(cfg.id_col,
                            f"{spark_tokens(cfg.text_col)} AS w")
            .selectExpr(cfg.id_col, "explode(w) AS t")
            .selectExpr(cfg.id_col, f"{_bucket_expr(cfg, 't')} AS f"))
    scored = (toks.join(F.broadcast(weights), ["f"], "left")
              .selectExpr(cfg.id_col,
                          f"coalesce(w_ppm, {SCALE // 2}) AS q"))
    per_doc = (scored.groupBy(cfg.id_col)
               .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"),
                    F.expr("sum(q) div count(*)").alias("score_ppm")))
    return (docs.selectExpr(cfg.id_col)
            .join(per_doc, [cfg.id_col], "left")
            .selectExpr(cfg.id_col,
                        "coalesce(n_tokens, 0) AS n_tokens",
                        "score_ppm",
                        f"score_ppm >= {cfg.threshold_ppm} AS selected"))


def build_quality_classifier(spark, reg: Registry,
                             cfg: QualityClassifierConfig,
                             g: GlobalConfig = DEFAULT) -> DataFrame:
    docs = reg.load(spark, cfg.source)
    return classifier_score_frame(docs, classifier_weights_frame(docs, cfg),
                                  cfg)


def quality_classifier_oracle(b: SqlBuilder, reg: Registry,
                              cfg: QualityClassifierConfig,
                              g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    t = cfg.teacher()
    w_t = b.cte(
        f"{cfg.name}__wt",
        f"SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w "
        f"FROM {src} WHERE {cfg.train_predicate}")
    meas = b.cte(
        f"{cfg.name}__m",
        "SELECT w, " + ", ".join(_measure_exprs(t, "duckdb"))
        + f" FROM {w_t}")
    lab = b.cte(
        f"{cfg.name}__l",
        "SELECT w, " + _label_expr() + " FROM ("
        "SELECT w, " + ", ".join(_verdict_exprs(t)) + f" FROM {meas})")
    feat = b.cte(
        f"{cfg.name}__f",
        f"SELECT label, {_bucket_expr(cfg, 'u.t')} AS f "
        f"FROM {lab}, UNNEST(w) AS u(t)")
    cen = b.cte(
        f"{cfg.name}__cn",
        f"SELECT f, "
        f"CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS c_pos, "
        f"CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS c_neg "
        f"FROM {feat} GROUP BY f")
    wts = b.cte(
        f"{cfg.name}__wgt",
        f"SELECT f, CAST("
        + _W_PPM.format(scale=SCALE, idiv=" // ")
        + f" AS BIGINT) AS w_ppm FROM {cen}")
    toks = b.cte(
        f"{cfg.name}__tk",
        f"SELECT {cfg.id_col}, {_bucket_expr(cfg, 'u.t')} AS f "
        f"FROM (SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w "
        f"FROM {src}), UNNEST(w) AS u(t)")
    sc = b.cte(
        f"{cfg.name}__sc",
        f"SELECT k.{cfg.id_col}, coalesce(g.w_ppm, {SCALE // 2}) AS q "
        f"FROM {toks} k LEFT JOIN {wts} g ON k.f = g.f")
    pd_ = b.cte(
        f"{cfg.name}__pd",
        f"SELECT {cfg.id_col}, CAST(count(*) AS INT) AS n_tokens, "
        f"CAST(sum(q) // count(*) AS BIGINT) AS score_ppm "
        f"FROM {sc} GROUP BY {cfg.id_col}")
    return b.cte(
        cfg.name,
        f"SELECT d.{cfg.id_col}, "
        f"coalesce(p.n_tokens, 0) AS n_tokens, p.score_ppm, "
        f"p.score_ppm >= {cfg.threshold_ppm} AS selected "
        f"FROM {src} d LEFT JOIN {pd_} p "
        f"ON d.{cfg.id_col} = p.{cfg.id_col}")
