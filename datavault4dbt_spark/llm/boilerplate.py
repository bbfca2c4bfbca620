"""Global line-frequency boilerplate removal: drop lines that recur
across many DOCUMENTS — the cross-corpus complement of
``llm/lineclean.py``'s per-document C4 rules. CCNet (Wenzek et al.
2020) dedups at the line/paragraph level across shards exactly because
web boilerplate (cookie banners, nav menus, footers) is near-identical
across millions of pages while appearing perfectly "prose-like" to
per-document rules; RefinedWeb's line-wise corrections are the same
shape. A line is boilerplate iff its normalized form occurs in at
least ``min_docs`` DISTINCT documents (distinct — a line repeated
inside one document is repetition, owned by ``llm/scrub.py``, not
boilerplate). Lines shorter than ``min_chars`` after normalization are
never candidates: one-word lines collide by chance and removing them
guts legitimate prose.

Output per document: (doc_id, n_lines, n_boiler_lines, cleaned_len,
cleaned_text) where ``cleaned_text`` is the in-order newline-join of
surviving lines. EVERY occurrence of a boilerplate line is removed,
including the first — unlike dedup's first-occurrence-wins, boilerplate
is noise wherever it appears (the CCNet policy). Documents with NULL
text emit no row (the ``doc_chunks`` contract).

Scale design (100 TB): the line explode is scan-stage generate+project;
the census is ONE map-side-combined groupBy on md5(normalized line)
(uniform key; approx_count-style partial aggregation collapses hot
lines before the shuffle, and count(DISTINCT doc) expands to the
standard two-phase plan); only signatures meeting ``min_docs`` survive
into the join side — the boilerplate minority — so the equi-join back
is AQE-broadcast when small and a uniform md5 shuffle when not; the
reassembly shuffles once on doc_id. Same shape as chunk-scrub, which
is the point: chunk-scrub removes *later copies* of long duplicated
passages, this removes *every copy* of short mass-repeated lines.

Reference anchor: none (the reference is a Data Vault loader); this
extends the build brief's training-data-pipeline surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class BoilerplateConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    # SQL expression for the text — same portability contract as
    # LineCleanConfig.text_expr (the fixture plants newline structure
    # with the same expression the line-clean fixture uses)
    text_expr: str = "text"
    min_docs: int = 2        # distinct-document floor for boilerplate
    min_chars: int = 5       # normalized lines shorter than this never match
    normalize: bool = True   # lower(trim(line)) before matching

    def __post_init__(self):
        ensure_identifier(self.id_col, "column", self.name)
        if self.min_docs < 2:
            raise ValueError(
                f"{self.name}: min_docs must be >= 2 (a 1-doc 'census' "
                f"would delete every candidate line)")
        if self.min_chars < 1:
            raise ValueError(f"{self.name}: min_chars must be >= 1")


def _nl(dialect: str) -> str:
    return "char(10)" if dialect == "spark" else "chr(10)"


def _lines_arr(cfg: BoilerplateConfig, dialect: str) -> str:
    split = "split" if dialect == "spark" else "string_split"
    return f"{split}(({cfg.text_expr}), {_nl(dialect)})"


def _norm(cfg: BoilerplateConfig, col: str) -> str:
    return f"lower(trim({col}))" if cfg.normalize else col


def build_boilerplate_removal(spark, reg: Registry,
                              cfg: BoilerplateConfig,
                              g: GlobalConfig = DEFAULT) -> DataFrame:
    docs = reg.load(spark, cfg.source)
    arr = _lines_arr(cfg, "spark")
    lines = (docs.filter(F.expr(f"({cfg.text_expr}) IS NOT NULL"))
             .selectExpr(cfg.id_col, f"{arr} AS __lines")
             .selectExpr(cfg.id_col,
                         "posexplode(__lines) AS (line_no, line)"))
    cand = (lines
            .withColumn("__n", F.expr(_norm(cfg, "line")))
            .filter(F.length("__n") >= cfg.min_chars)
            .select(cfg.id_col, "line_no", F.unhex(F.md5("__n")).alias("sig")))
    boiler = (cand.groupBy("sig")
              .agg(F.countDistinct(cfg.id_col).alias("n_docs"))
              .filter(F.col("n_docs") >= cfg.min_docs)
              .select("sig"))
    removals = (cand.join(boiler, "sig")
                .select(cfg.id_col, "line_no",
                        F.lit(True).alias("__boiler")))
    out = (lines.join(removals, [cfg.id_col, "line_no"], "left")
           .groupBy(cfg.id_col)
           .agg(F.count(F.lit(1)).cast("int").alias("n_lines"),
                F.sum(F.when(F.col("__boiler"), 1).otherwise(0))
                .cast("int").alias("n_boiler_lines"),
                F.collect_list(
                    F.when(F.col("__boiler").isNull(),
                           F.struct("line_no", "line"))).alias("__kept")))
    return (out.withColumn(
                "cleaned_text",
                F.expr("array_join(transform(array_sort(__kept), "
                       "x -> x.line), char(10))"))
            .select(cfg.id_col, "n_lines", "n_boiler_lines",
                    F.length("cleaned_text").cast("int")
                    .alias("cleaned_len"),
                    "cleaned_text"))


def boilerplate_removal_oracle(b: SqlBuilder, reg: Registry,
                               cfg: BoilerplateConfig,
                               g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    arr = _lines_arr(cfg, "duckdb")
    base = b.cte(f"{cfg.name}__b",
                 f"SELECT {cfg.id_col}, {arr} AS ls FROM {src} "
                 f"WHERE ({cfg.text_expr}) IS NOT NULL")
    lines = b.cte(
        f"{cfg.name}__l",
        f"SELECT {cfg.id_col}, CAST(i AS INT) AS line_no, "
        f"ls[CAST(i AS INT) + 1] AS line "
        f"FROM {base}, UNNEST(range(0, len(ls))) AS t(i)")
    cand = b.cte(
        f"{cfg.name}__c",
        f"SELECT {cfg.id_col}, line_no, "
        f"md5({_norm(cfg, 'line')}) AS sig FROM {lines} "
        f"WHERE length({_norm(cfg, 'line')}) >= {cfg.min_chars}")
    boiler = b.cte(
        f"{cfg.name}__bp",
        f"SELECT sig FROM {cand} "
        f"GROUP BY sig HAVING count(DISTINCT {cfg.id_col}) >= "
        f"{cfg.min_docs}")
    rem = b.cte(
        f"{cfg.name}__rm",
        f"SELECT c.{cfg.id_col}, c.line_no, true AS boiler "
        f"FROM {cand} c JOIN {boiler} USING (sig)")
    return b.cte(
        cfg.name,
        f"SELECT l.{cfg.id_col}, CAST(count(*) AS INT) AS n_lines, "
        f"CAST(count(r.boiler) AS INT) AS n_boiler_lines, "
        f"CAST(length(coalesce(string_agg(l.line, chr(10) "
        f"ORDER BY l.line_no) FILTER (WHERE r.boiler IS NULL), "
        f"'')) AS INT) AS cleaned_len, "
        f"coalesce(string_agg(l.line, chr(10) ORDER BY l.line_no) "
        f"FILTER (WHERE r.boiler IS NULL), '') AS cleaned_text "
        f"FROM {lines} l LEFT JOIN {rem} r "
        f"ON l.{cfg.id_col} = r.{cfg.id_col} AND l.line_no = r.line_no "
        f"GROUP BY l.{cfg.id_col}")
