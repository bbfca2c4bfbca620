"""C4-style line-level text cleaning (Raffel et al. 2020 §2.2): split
a document into lines, keep only lines that look like prose — at least
``min_words`` words and (optionally) terminal punctuation — and
re-assemble the survivors. The canonical first-pass web-text filter:
boilerplate (menus, buttons, cookie banners) arrives as short
unterminated lines, and dropping them line-wise preserves the good
prose a whole-document gate would throw away.

Dual-dialect note: the newline character is produced by ``char(10)``
in Spark SQL and ``chr(10)`` in DuckDB — the ONLY expression fragment
the two dialects spell differently, isolated in ``_nl``. Everything
else (split, array filter/join, size/len) maps 1:1.

Scale design (100 TB): pure scan-stage array work — split, a
higher-order filter over the line array, array_join back; zero
shuffles, zero UDFs. Line arrays live only inside the projection
(never exploded), so memory is bounded by the document size the scan
already pays.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class LineCleanConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    # SQL expression for the text to clean — same portability contract
    # (and NULL-concat caveat) as PiiRedactConfig.text_expr
    text_expr: str = "text"
    min_words: int = 3
    require_terminal_punct: bool = True
    terminal_chars: str = ".!?\""

    def __post_init__(self):
        if self.min_words < 1:
            raise ValueError(f"{self.name}: min_words must be >= 1")
        if "'" in self.terminal_chars or "\\" in self.terminal_chars:
            raise ValueError(
                f"{self.name}: terminal_chars violates the portability "
                f"contract (quote/backslash)")


def _nl(dialect: str) -> str:
    return "char(10)" if dialect == "spark" else "chr(10)"


def _keep_pred(cfg: LineCleanConfig, dialect: str) -> str:
    """Per-line keep predicate over lambda var ``l`` — shared shape,
    dialect-specific size/contains spellings."""
    size = "size" if dialect == "spark" else "len"
    split = "split" if dialect == "spark" else "string_split"
    filt = "filter" if dialect == "spark" else "list_filter"
    words = f"{size}({filt}({split}(l, ' '), w -> w <> ''))"
    pred = f"{words} >= {cfg.min_words}"
    if cfg.require_terminal_punct:
        tc = f"contains('{cfg.terminal_chars}', right(rtrim(l), 1))"
        pred = f"({pred}) AND rtrim(l) <> '' AND {tc}"
    return pred


def _exprs(cfg: LineCleanConfig, dialect: str) -> dict:
    split = "split" if dialect == "spark" else "string_split"
    filt = "filter" if dialect == "spark" else "list_filter"
    join = "array_join" if dialect == "spark" else "array_to_string"
    size = "size" if dialect == "spark" else "len"
    nl = _nl(dialect)
    lines = f"{split}(({cfg.text_expr}), {nl})"
    kept = f"{filt}({lines}, l -> {_keep_pred(cfg, dialect)})"
    # empty-vs-NULL contract: a document whose every line is dropped
    # cleans to the EMPTY string; NULL text stays NULL. Spark's
    # array_join(empty) is already '' but DuckDB's array_to_string
    # (empty) is NULL, so the CASE pins both engines to the contract.
    joined = (f"CASE WHEN ({cfg.text_expr}) IS NULL THEN NULL "
              f"ELSE coalesce({join}({kept}, {nl}), '') END")
    return {
        "n_lines": f"{size}({lines})",
        "n_kept_lines": f"{size}({kept})",
        "cleaned_text": joined,
    }


def build_line_clean(spark, reg: Registry, cfg: LineCleanConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    e = _exprs(cfg, "spark")
    return df.selectExpr(
        cfg.id_col,
        f"{e['n_lines']} AS n_lines",
        f"{e['n_kept_lines']} AS n_kept_lines",
        f"{e['cleaned_text']} AS cleaned_text")


def line_clean_oracle(b: SqlBuilder, reg: Registry, cfg: LineCleanConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    e = _exprs(cfg, "duck")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, {e['n_lines']} AS n_lines, "
        f"{e['n_kept_lines']} AS n_kept_lines, "
        f"{e['cleaned_text']} AS cleaned_text FROM {src}")


# ------------------------------------------------------ text normalize --

@dataclass(frozen=True)
class TextNormalizeConfig:
    """Canonical text normalization for dedup preprocessing: lowercase,
    fold every non-alphanumeric run to a single space, trim — the
    standard pre-shingle normalization (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" normalizes case and
    punctuation before suffix-array matching) so trivial formatting
    variants hash identically.

    Output carries the normalized text plus its md5, char and token
    counts — downstream exact-dedup runs on norm_md5 instead of the
    raw-text hash.

    ASCII contract: the fold class is [a-z0-9]; both engines' regex
    engines agree on it byte-for-byte (locale-dependent classes like
    \\w are deliberately avoided — Java and RE2 disagree on unicode
    word characters).

    Scale design (100 TB): pure scan-stage projection — zero
    exchanges, zero joins (pinned in tests/test_plan_quality.py)."""

    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"

    def __post_init__(self):
        from ..context import ensure_identifier
        for c in (self.id_col, self.text_col):
            ensure_identifier(c, "column", self.name)


_NORM_SPARK = ("trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' '))")
_NORM_DUCK = ("trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))")


def build_text_normalize(spark, reg: Registry, cfg: TextNormalizeConfig,
                         g: GlobalConfig = DEFAULT) -> DataFrame:
    norm = _NORM_SPARK.format(col=cfg.text_col)
    return reg.load(spark, cfg.source).selectExpr(
        cfg.id_col,
        f"{norm} AS norm_text",
        f"md5({norm}) AS norm_md5",
        f"length({norm}) AS n_norm_chars",
        f"size(filter(split({norm}, ' '), x -> x <> '')) AS n_norm_tokens")


def text_normalize_oracle(b: SqlBuilder, reg: Registry,
                          cfg: TextNormalizeConfig,
                          g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    norm = _NORM_DUCK.format(col=cfg.text_col)
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, {norm} AS norm_text, "
        f"md5({norm}) AS norm_md5, "
        f"CAST(length({norm}) AS INT) AS n_norm_chars, "
        f"CAST(len(list_filter(string_split({norm}, ' '), "
        f"x -> x <> '')) AS INT) AS n_norm_tokens FROM {src}")
