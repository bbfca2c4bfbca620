"""Document scrubbing operators: repetition signals and PII redaction.

- ``repetition`` : Gopher-style within-document repetition metrics
  (Rae et al. 2021 §A1.1 — "repetition signals" used as quality
  filters): distinct-token ratio, fraction of bigram instances whose
  bigram repeats, the most-frequent-bigram share, and the unigram Gini
  diversity ``1 - sum(cnt^2)/n^2`` — computed in exact BIGINT sums
  before one double division, so it is bit-reproducible cross-engine
  where an entropy (log-based) variant would not be.
- ``pii_redact`` : C4-style pattern scrubbing (Raffel et al. 2020 §2.2
  removed lines with blocklisted content; modern pipelines redact
  in place): per-pattern match counts over the original text plus the
  fully redacted text.

Both are pure Column expressions / one skew-free shuffle:

- repetition explodes bigrams and (for the Gini branch) tokens,
  aggregating on (doc_id, gram) / (doc_id, tok) then (doc_id) — every
  shuffle keys on doc_id, so at 100 TB the volume is O(bigram + token
  instances) with map-side partial aggregation; the array-level
  features (counts, distinct ratio) never leave the scan stage.
- pii_redact is zero-shuffle: regexp_count + a regexp_replace chain in
  the scan stage (whole-stage codegen; no UDF).

Determinism contract: regex patterns must avoid backslash escapes and
quotes so the SAME literal pattern text is valid and equivalent under
Java regex (Spark) and RE2 (DuckDB) — character classes like ``[0-9]``
instead of ``\\d``, ``[.]`` instead of an escaped dot, no word
boundaries, no lookaround. ``PORTABLE_PII_PATTERNS`` follows that
contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder
from .textprep import (spark_tokens, duck_tokens, spark_shingles,
                       duck_shingles)


# ---------------------------------------------------------- repetition --

@dataclass(frozen=True)
class RepetitionConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    ngram: int = 2            # repetition n-gram size (Gopher uses 2..4)
    flag_threshold: float = 0.5   # dup_ngram_fraction above => repetitive


def build_repetition(spark, reg: Registry, cfg: RepetitionConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    w = df.selectExpr(cfg.id_col, f"{spark_tokens(cfg.text_col)} AS w")
    base = w.selectExpr(
        cfg.id_col, "size(w) AS n_tokens",
        "size(array_distinct(w)) AS n_distinct")
    grams = w.selectExpr(
        cfg.id_col,
        f"explode({spark_shingles('w', cfg.ngram)}) AS gram")
    per_gram = grams.groupBy(cfg.id_col, "gram").agg(
        F.count(F.lit(1)).alias("cnt"))
    per_doc = per_gram.groupBy(cfg.id_col).agg(
        F.sum("cnt").alias("total_grams"),
        F.sum(F.expr("CASE WHEN cnt > 1 THEN cnt ELSE 0 END"))
         .alias("dup_instances"),
        F.max("cnt").alias("max_cnt"))
    # unigram Gini diversity: BIGINT sums are exact and order-free, so
    # no FP-accumulation divergence is possible before the one division
    toks = w.selectExpr(cfg.id_col, "explode(w) AS tok")
    per_tok = (toks.groupBy(cfg.id_col, "tok")
               .agg(F.count(F.lit(1)).alias("tc")))
    # sum(tc) would equal n_tokens from `base` — only sum(tc^2) is new
    gini = per_tok.groupBy(cfg.id_col).agg(
        F.expr("CAST(sum(tc * tc) AS BIGINT)").alias("__sumsq"))
    # left joins keep docs too short to produce a single n-gram/token
    joined = (base.join(per_doc, on=cfg.id_col, how="left")
              .join(gini, on=cfg.id_col, how="left"))
    return joined.selectExpr(
        cfg.id_col, "n_tokens",
        "round(n_distinct / cast(greatest(n_tokens, 1) AS DOUBLE), 6) "
        "AS distinct_token_ratio",
        "round(coalesce(dup_instances, 0) "
        "/ cast(greatest(coalesce(total_grams, 0), 1) AS DOUBLE), 6) "
        "AS dup_ngram_fraction",
        "round(coalesce(max_cnt, 0) "
        "/ cast(greatest(coalesce(total_grams, 0), 1) AS DOUBLE), 6) "
        "AS top_ngram_share",
        f"(coalesce(dup_instances, 0) "
        f"/ cast(greatest(coalesce(total_grams, 0), 1) AS DOUBLE)"
        f" > {cfg.flag_threshold}) AS is_repetitive",
        # NULL text -> NULL (convention); zero tokens -> 0.0 (no
        # diversity) — NOT 1.0, which a missed left join would yield
        # and which would rank empty docs above every real one
        "CASE WHEN n_tokens IS NULL THEN CAST(NULL AS DOUBLE) "
        "WHEN __sumsq IS NULL THEN CAST(0.0 AS DOUBLE) "
        "ELSE round(1 - __sumsq / CAST(CAST(n_tokens AS BIGINT) "
        "* n_tokens AS DOUBLE), 6) END AS gini_diversity")


def repetition_oracle(b: SqlBuilder, reg: Registry, cfg: RepetitionConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {cfg.id_col}, {duck_tokens(cfg.text_col)} AS w "
              f"FROM {src}")
    base = b.cte(f"{cfg.name}__base",
                 f"SELECT {cfg.id_col}, len(w) AS n_tokens, "
                 f"len(list_distinct(w)) AS n_distinct FROM {w}")
    grams = b.cte(f"{cfg.name}__grams",
                  f"SELECT {cfg.id_col}, "
                  f"UNNEST({duck_shingles('w', cfg.ngram)}) AS gram FROM {w}")
    per_gram = b.cte(f"{cfg.name}__pg",
                     f"SELECT {cfg.id_col}, gram, count(*) AS cnt "
                     f"FROM {grams} GROUP BY {cfg.id_col}, gram")
    per_doc = b.cte(
        f"{cfg.name}__pd",
        f"SELECT {cfg.id_col}, sum(cnt) AS total_grams, "
        f"sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_instances, "
        f"max(cnt) AS max_cnt FROM {per_gram} GROUP BY {cfg.id_col}")
    toks = b.cte(f"{cfg.name}__tok",
                 f"SELECT {cfg.id_col}, UNNEST(w) AS tok FROM {w}")
    per_tok = b.cte(f"{cfg.name}__pt",
                    f"SELECT {cfg.id_col}, tok, count(*) AS tc "
                    f"FROM {toks} GROUP BY {cfg.id_col}, tok")
    gini = b.cte(f"{cfg.name}__gini",
                 f"SELECT {cfg.id_col}, "
                 f"CAST(sum(tc * tc) AS BIGINT) AS __sumsq "
                 f"FROM {per_tok} GROUP BY {cfg.id_col}")
    return b.cte(
        cfg.name,
        f"SELECT b.{cfg.id_col}, b.n_tokens, "
        f"round(b.n_distinct / CAST(greatest(b.n_tokens, 1) AS DOUBLE), 6) "
        f"AS distinct_token_ratio, "
        f"round(coalesce(d.dup_instances, 0) "
        f"/ CAST(greatest(coalesce(d.total_grams, 0), 1) AS DOUBLE), 6) "
        f"AS dup_ngram_fraction, "
        f"round(coalesce(d.max_cnt, 0) "
        f"/ CAST(greatest(coalesce(d.total_grams, 0), 1) AS DOUBLE), 6) "
        f"AS top_ngram_share, "
        f"(coalesce(d.dup_instances, 0) "
        f"/ CAST(greatest(coalesce(d.total_grams, 0), 1) AS DOUBLE)"
        f" > {cfg.flag_threshold}) AS is_repetitive, "
        f"CASE WHEN b.n_tokens IS NULL THEN CAST(NULL AS DOUBLE) "
        f"WHEN gi.__sumsq IS NULL THEN CAST(0.0 AS DOUBLE) "
        f"ELSE round(1 - gi.__sumsq / CAST(CAST(b.n_tokens AS BIGINT) "
        f"* b.n_tokens AS DOUBLE), 6) END AS gini_diversity "
        f"FROM {base} b LEFT JOIN {per_doc} d "
        f"ON b.{cfg.id_col} = d.{cfg.id_col} "
        f"LEFT JOIN {gini} gi ON b.{cfg.id_col} = gi.{cfg.id_col}")


# ---------------------------------------------------------- pii_redact --

# (label, pattern, replacement) — patterns obey the portability contract
# in the module docstring (no backslashes, no quotes, no lookaround).
PORTABLE_PII_PATTERNS = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
     "<EMAIL>"),
    ("ipv4", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
     "<IP>"),
    ("phone", "[+][0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3}[- ][0-9]{2,4}",
     "<PHONE>"),
)


@dataclass(frozen=True)
class PiiRedactConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    # SQL expression for the text to scrub — must evaluate identically
    # in both dialects (plain column name, or a concat/CAST
    # composition). NULL caveat: Spark's concat returns NULL when ANY
    # argument is NULL while DuckDB's concat skips NULL arguments, so
    # concat compositions over nullable columns must coalesce them
    # (e.g. concat(coalesce(text, ''), ...)) or the engine and oracle
    # diverge on NULL-text rows.
    text_expr: str = "text"
    patterns: tuple = PORTABLE_PII_PATTERNS


def _pii_checks(cfg: PiiRedactConfig) -> None:
    import re as _re

    for label, pat, repl in cfg.patterns:
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", label):
            raise ValueError(
                f"{cfg.name}: label {label!r} must be an identifier — it "
                f"becomes the n_{{label}} column name in both dialects")
        if "\\" in pat or "'" in pat:
            raise ValueError(
                f"{cfg.name}: pattern {label!r} violates the portability "
                f"contract (backslash/quote in {pat!r}) — Java regex and "
                f"RE2 disagree on literal escaping")
        if "\\" in repl or "'" in repl:
            raise ValueError(
                f"{cfg.name}: replacement for {label!r} violates the "
                f"portability contract (backslash/quote in {repl!r}) — "
                f"it is interpolated into a SQL string literal")


def _redact_chain(cfg: PiiRedactConfig, dialect: str) -> str:
    expr = "txt"
    for _label, pat, repl in cfg.patterns:
        flags = ", 'g'" if dialect == "duck" else ""
        expr = f"regexp_replace({expr}, '{pat}', '{repl}'{flags})"
    return expr


def build_pii_redact(spark, reg: Registry, cfg: PiiRedactConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    """Per-pattern counts are measured INDEPENDENTLY over the original
    text, while redaction applies the patterns as a sequential chain —
    overlapping matches (an IPv4-shaped string inside an email) are
    counted once per pattern but redacted only by the first pattern to
    consume them, so ``n_pii_total`` can exceed the number of ``<...>``
    markers in ``redacted``. Counts answer "what did we detect",
    redaction answers "what is left" — both engines agree on both."""
    _pii_checks(cfg)
    df = reg.load(spark, cfg.source)
    t = df.selectExpr(cfg.id_col, f"({cfg.text_expr}) AS txt")
    counts = [
        f"size(regexp_extract_all(txt, '{pat}', 0)) AS n_{label}"
        for label, pat, _ in cfg.patterns]
    total = " + ".join(f"n_{label}" for label, _, _ in cfg.patterns)
    return (t.selectExpr(cfg.id_col, "txt", *counts)
            .selectExpr(cfg.id_col,
                        *[f"n_{label}" for label, _, _ in cfg.patterns],
                        f"({total}) AS n_pii_total",
                        f"({total}) = 0 AS pii_free",
                        f"{_redact_chain(cfg, 'spark')} AS redacted"))


def pii_redact_oracle(b: SqlBuilder, reg: Registry, cfg: PiiRedactConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    _pii_checks(cfg)
    src = reg.duckdb_relation(cfg.source)
    t = b.cte(f"{cfg.name}__t",
              f"SELECT {cfg.id_col}, ({cfg.text_expr}) AS txt FROM {src}")
    counts = ", ".join(
        f"len(regexp_extract_all(txt, '{pat}')) AS n_{label}"
        for label, pat, _ in cfg.patterns)
    c = b.cte(f"{cfg.name}__c",
              f"SELECT {cfg.id_col}, txt, {counts} FROM {t}")
    total = " + ".join(f"n_{label}" for label, _, _ in cfg.patterns)
    cols = ", ".join(f"n_{label}" for label, _, _ in cfg.patterns)
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, {cols}, ({total}) AS n_pii_total, "
        f"({total}) = 0 AS pii_free, "
        f"{_redact_chain(cfg, 'duck')} AS redacted FROM {c}")
