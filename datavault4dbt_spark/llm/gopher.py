"""Gopher-style quality-rule filtering: the per-document rule table of
Rae et al. 2021 (Scaling Language Models: ... Gopher, appendix A1.1),
the de-facto standard pre-training text filter (reused by MassiveText,
RefinedWeb, FineWeb). Where ``llm/textstats.py``'s quality op emits a
blended score, this one emits the RULE VERDICTS — one boolean per rule
plus the conjunctive ``keep`` — which is what a curation pipeline
actually branches on (and what makes filter decisions auditable: a
dropped document says which rule dropped it).

Rules (documents are single text blobs here; the line-based Gopher
rules need newline structure the corpus lacks and are owned by
``llm/lineclean.py``):

- word count within [min_words, max_words]
- mean word length within [min_mean_wlen_e2, max_mean_wlen_e2] / 100
- symbol-to-word ratio <= symbol_ratio_pct / 100  ('#' or '...')
- fraction of words with an alphabetic character >= alpha_word_pct/100
- stopword count >= min_stopwords

Exactness contract: every emitted measure is an integer (mean word
length ships as a x100 fixed-point; ratios are never materialized —
each threshold compares via integer cross-multiplication, e.g.
``n_symbol_words * 100 <= n_words * symbol_ratio_pct``), so the Spark
plan and the DuckDB oracle agree bit-for-bit; no DOUBLE ever forms.

Scale design (100 TB): one pass, scan-stage only — tokenization and
every rule are higher-order array expressions inside whole-stage
codegen; zero shuffles, zero joins, zero UDFs; predicate/column
pruning reaches the parquet scan untouched.

Reference anchor: none (the reference is a Data Vault loader); this
extends the build brief's training-data-pipeline surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder
from .textprep import spark_tokens, duck_tokens
from .textstats import DEFAULT_STOPWORDS


@dataclass(frozen=True)
class GopherRulesConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    min_words: int = 50            # Gopher: 50
    max_words: int = 100_000       # Gopher: 100,000
    min_mean_wlen_e2: int = 300    # Gopher: 3 chars
    max_mean_wlen_e2: int = 1000   # Gopher: 10 chars
    symbol_ratio_pct: int = 10     # Gopher: 0.1
    alpha_word_pct: int = 80       # Gopher: 0.8
    min_stopwords: int = 2         # Gopher: 2
    stopwords: tuple = DEFAULT_STOPWORDS

    def __post_init__(self):
        for c in (self.id_col, self.text_col):
            ensure_identifier(c, "column", self.name)
        if self.min_words > self.max_words:
            raise ValueError(f"{self.name}: min_words > max_words")
        if self.min_mean_wlen_e2 > self.max_mean_wlen_e2:
            raise ValueError(f"{self.name}: mean-word-length bounds inverted")
        for p in (self.symbol_ratio_pct, self.alpha_word_pct):
            if not 0 <= p <= 100:
                raise ValueError(f"{self.name}: pct thresholds must be 0..100")


def _measure_exprs(cfg: GopherRulesConfig, dialect: str) -> list:
    """Integer measures over the token array ``w`` — same surface text
    in both dialects except for the handful of renamed builtins."""
    if dialect == "spark":
        size, filt, contains = "size", "filter", "array_contains(array({lst}), t)"
        regex = "t rlike '[a-z]'"
    else:
        size, filt, contains = "len", "list_filter", "list_contains([{lst}], t)"
        regex = "regexp_matches(t, '[a-z]')"
    sw = ", ".join(f"'{w}'" for w in cfg.stopwords)
    return [
        f"{size}(w) AS n_words",
        # total token chars; x100 mean computed downstream
        # both forms are 0 on empty token lists (textstats' pattern)
        f"aggregate(w, 0, (acc, t) -> acc + length(t)) AS sum_wlen"
        if dialect == "spark" else
        "list_reduce(list_prepend(0, list_transform(w, t -> length(t))), "
        "(acc, x) -> acc + x) AS sum_wlen",
        f"{size}({filt}(w, t -> t LIKE '%#%' OR t LIKE '%...%')) "
        f"AS n_symbol_words",
        f"{size}({filt}(w, t -> {regex})) AS n_alpha_words",
        f"{size}({filt}(w, t -> {contains.format(lst=sw)})) AS n_stop",
    ]


def _verdict_exprs(cfg: GopherRulesConfig) -> list:
    """Rule booleans from the integer measures — cross-multiplied
    thresholds, valid verbatim in Spark SQL and DuckDB."""
    return [
        f"n_words BETWEEN {cfg.min_words} AND {cfg.max_words} "
        f"AS pass_word_count",
        f"(sum_wlen * 100) BETWEEN n_words * {cfg.min_mean_wlen_e2} "
        f"AND n_words * {cfg.max_mean_wlen_e2} AS pass_mean_word_len",
        f"n_symbol_words * 100 <= n_words * {cfg.symbol_ratio_pct} "
        f"AS pass_symbol_ratio",
        f"n_alpha_words * 100 >= n_words * {cfg.alpha_word_pct} "
        f"AS pass_alpha_words",
        f"n_stop >= {cfg.min_stopwords} AS pass_stopwords",
    ]


_RULE_COLS = ("pass_word_count", "pass_mean_word_len",
              "pass_symbol_ratio", "pass_alpha_words", "pass_stopwords")


def _final_exprs(cfg: GopherRulesConfig, dialect: str,
                 carry: tuple = ()) -> list:
    # integer division — NOT '/', which is double division in Spark and
    # would reintroduce the engine-specific rounding the fixed-point
    # contract exists to avoid (CAST(DOUBLE) truncates in Spark but
    # rounds in DuckDB)
    idiv = " div " if dialect == "spark" else " // "
    mean = (f"CAST(CASE WHEN n_words = 0 THEN 0 "
            f"ELSE (sum_wlen * 100){idiv}n_words END AS BIGINT)")
    return ([cfg.id_col, *carry, "n_words",
             f"{mean} AS mean_wlen_e2",
             "n_symbol_words", "n_alpha_words", "n_stop"]
            + list(_RULE_COLS)
            + [" AND ".join(_RULE_COLS) + " AS keep"])


def gopher_rules_frame(docs: DataFrame, cfg: GopherRulesConfig,
                       carry: tuple = ()) -> DataFrame:
    """Rule-table projection over an arbitrary DataFrame — the single
    implementation the batch builder and the streaming gate
    (streaming/curation.py) share, so the two paths cannot drift
    (stateless scan-stage exprs run unchanged in a micro-batch plan).
    ``carry``: extra columns passed through (e.g. a stream's event-time
    column)."""
    w = docs.selectExpr(cfg.id_col, *carry,
                        f"{spark_tokens(cfg.text_col)} AS w")
    meas = w.selectExpr(cfg.id_col, *carry, *_measure_exprs(cfg, "spark"))
    # two selects so rule exprs reference measure aliases; Catalyst
    # collapses them into one scan-stage projection
    verd = meas.selectExpr(cfg.id_col, *carry, "n_words", "sum_wlen",
                           "n_symbol_words", "n_alpha_words", "n_stop",
                           *_verdict_exprs(cfg))
    return verd.selectExpr(*_final_exprs(cfg, "spark", carry=carry))


def build_gopher_rules(spark, reg: Registry, cfg: GopherRulesConfig,
                       g: GlobalConfig = DEFAULT) -> DataFrame:
    return gopher_rules_frame(reg.load(spark, cfg.source), cfg)


def gopher_rules_oracle(b: SqlBuilder, reg: Registry,
                        cfg: GopherRulesConfig,
                        g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w "
              f"FROM {src}")
    meas = b.cte(
        f"{cfg.name}__m",
        f"SELECT {cfg.id_col}, "
        + ", ".join(_measure_exprs(cfg, "duckdb")) + f" FROM {w}")
    verd = b.cte(
        f"{cfg.name}__v",
        f"SELECT {cfg.id_col}, n_words, sum_wlen, n_symbol_words, "
        f"n_alpha_words, n_stop, "
        + ", ".join(_verdict_exprs(cfg)) + f" FROM {meas}")
    return b.cte(
        cfg.name,
        "SELECT " + ", ".join(_final_exprs(cfg, "duckdb")) + f" FROM {verd}")
