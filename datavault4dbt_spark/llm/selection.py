"""Corpus selection operators: choosing WHICH rows survive curation.

- ``canonical_selection`` : one canonical survivor per duplicate group
  — the step after connected-components dedup (``dedup.dup_groups``)
  in every production pipeline: instead of blindly keeping the lowest
  doc_id, keep the HIGHEST-QUALITY member of each group (Penedo et al.
  2023, RefinedWeb §3.4 keep-best heuristic), ties broken by doc_id so
  reruns and both engines agree.
- ``stratified_split`` : deterministic train/validation/test assignment
  with per-stratum fractions. Same salted-md5 uniform as
  ``sampling.dataset_mix`` (NOT rand()): a document's split is a pure
  function of (salt, id), so adding data never reassigns existing
  documents — the property that keeps eval sets stable across corpus
  versions.
- ``source_cap`` : keep at most N documents per source, best-quality
  first — the per-domain cap crawl pipelines apply so no single domain
  dominates the corpus (C4 keeps heuristics per-page, Gopher/Dolma cap
  per-domain).

Scale design (100 TB): canonical_selection joins on the uniform id
column and windows over duplicate GROUPS (small by construction).
stratified_split is zero-shuffle — hash + CASE live in the scan stage.
source_cap's naive form (one window partition per source) puts a whole
domain on one reducer — a real skew hazard when one domain is 10% of
the corpus — so it runs the standard salted two-stage top-k: rank
within (source, id % n_salts) sub-partitions first (bounded size),
keep each sub-partition's top N, then rank the <= N * n_salts
survivors per source exactly. Any global top-N row ranks <= N inside
its own salt slice (subset ranks never exceed superset ranks), so the
two-stage result equals the single-window result row-for-row — the
DuckDB oracle runs the single window and the driver hash-compare
certifies the equivalence.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F, Window

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder
from .sampling import _u01

_ident = ensure_identifier


# -------------------------------------------------- canonical_selection --

@dataclass(frozen=True)
class CanonicalConfig:
    name: str
    groups_entity: str = "dedup_groups"      # (doc_id, group_id, group_size)
    quality_entity: str = "text_quality"     # (doc_id, ..., quality_score)
    id_col: str = "doc_id"

    def __post_init__(self):
        _ident(self.id_col, "id_col", self.name)


def build_canonical_selection(spark, reg: Registry, cfg: CanonicalConfig,
                              g: GlobalConfig = DEFAULT) -> DataFrame:
    grp = reg.load(spark, cfg.groups_entity) \
        .select(cfg.id_col, "group_id", "group_size")
    q = reg.load(spark, cfg.quality_entity) \
        .select(cfg.id_col, "quality_score")
    w = Window.partitionBy("group_id").orderBy(
        F.col("quality_score").desc(), F.col(cfg.id_col).asc())
    return (grp.join(q, cfg.id_col)
            .withColumn("cap_rank", F.row_number().over(w))
            .select(cfg.id_col, "group_id", "group_size", "quality_score",
                    (F.col("cap_rank") == 1).alias("is_canonical"))
            )


def canonical_selection_oracle(b: SqlBuilder, reg: Registry,
                               cfg: CanonicalConfig,
                               g: GlobalConfig = DEFAULT) -> str:
    grp = reg.duckdb_relation(cfg.groups_entity)
    q = reg.duckdb_relation(cfg.quality_entity)
    ranked = b.cte(
        f"{cfg.name}__r",
        f"SELECT g.{cfg.id_col}, g.group_id, g.group_size, "
        f"q.quality_score, "
        f"row_number() OVER (PARTITION BY g.group_id "
        f"ORDER BY q.quality_score DESC, g.{cfg.id_col} ASC) AS rn "
        f"FROM {grp} g JOIN {q} q ON g.{cfg.id_col} = q.{cfg.id_col}")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, group_id, group_size, quality_score, "
        f"rn = 1 AS is_canonical FROM {ranked}")


# ---------------------------------------------------- stratified_split --

@dataclass(frozen=True)
class StratifiedSplitConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    strata_col: str = "lang"
    # (stratum, train_frac, val_frac); test gets the remainder.
    fractions: tuple = (("en", 0.8, 0.1),)
    default_train: float = 0.9
    default_val: float = 0.05
    salt: str = "split"

    def __post_init__(self):
        _ident(self.id_col, "id_col", self.name)
        _ident(self.strata_col, "strata_col", self.name)
        for s, tr, va in self.fractions:
            if "'" in s or "\\" in s:
                raise ValueError(
                    f"{self.name}: stratum {s!r} violates the "
                    f"portability contract (quote/backslash)")
            if not (0.0 <= tr and 0.0 <= va and tr + va <= 1.0):
                raise ValueError(
                    f"{self.name}: fractions for {s!r} must satisfy "
                    f"0 <= train, 0 <= val, train + val <= 1")
        if not (0.0 <= self.default_train and 0.0 <= self.default_val
                and self.default_train + self.default_val <= 1.0):
            raise ValueError(f"{self.name}: default fractions invalid")


def _frac_case(cfg: StratifiedSplitConfig, pick: int, default: float) -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN CAST({(tr, va)[pick]} AS DOUBLE)"
        for s, tr, va in cfg.fractions)
    return f"CASE {cfg.strata_col} {whens} ELSE CAST({default} AS DOUBLE) END"


def _split_exprs(cfg: StratifiedSplitConfig) -> tuple:
    u = _u01(cfg.id_col, cfg.salt)
    train = _frac_case(cfg, 0, cfg.default_train)
    val = _frac_case(cfg, 1, cfg.default_val)
    split = (f"CASE WHEN {u} < {train} THEN 'train' "
             f"WHEN {u} < {train} + {val} THEN 'validation' "
             f"ELSE 'test' END")
    return u, split


def build_stratified_split(spark, reg: Registry,
                           cfg: StratifiedSplitConfig,
                           g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    u, split = _split_exprs(cfg)
    return df.selectExpr(cfg.id_col, cfg.strata_col,
                         f"round({u}, 6) AS u_split",
                         f"{split} AS split")


def stratified_split_oracle(b: SqlBuilder, reg: Registry,
                            cfg: StratifiedSplitConfig,
                            g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    u, split = _split_exprs(cfg)
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, {cfg.strata_col}, "
        f"round({u}, 6) AS u_split, {split} AS split FROM {src}")


# --------------------------------------------------------- source_cap --

@dataclass(frozen=True)
class SourceCapConfig:
    name: str
    source: str = "documents"
    quality_entity: str = "text_quality"
    id_col: str = "doc_id"
    source_col: str = "source"
    cap: int = 50
    # Sub-partitions per source in the skew-safe first pass. The value
    # only changes intermediate sizes, never the result; size it so
    # (docs-in-largest-source / n_salts) fits one reducer comfortably.
    n_salts: int = 16

    def __post_init__(self):
        _ident(self.id_col, "id_col", self.name)
        _ident(self.source_col, "source_col", self.name)
        if self.cap < 1 or self.n_salts < 1:
            raise ValueError(f"{self.name}: cap and n_salts must be >= 1")


def build_source_cap(spark, reg: Registry, cfg: SourceCapConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    docs = reg.load(spark, cfg.source).select(cfg.id_col, cfg.source_col)
    q = reg.load(spark, cfg.quality_entity) \
        .select(cfg.id_col, "quality_score")
    joined = docs.join(q, cfg.id_col)
    order = (F.col("quality_score").desc(), F.col(cfg.id_col).asc())
    # Pass 1 (skew-safe): rank inside (source, id % n_salts) slices and
    # keep each slice's top `cap` — bounds every window partition at
    # (source size / n_salts) regardless of domain skew.
    w1 = Window.partitionBy(
        cfg.source_col,
        F.pmod(F.col(cfg.id_col), F.lit(cfg.n_salts))).orderBy(*order)
    survivors = (joined.withColumn("rn1", F.row_number().over(w1))
                 .filter(F.col("rn1") <= cfg.cap).drop("rn1"))
    # Pass 2 (exact): <= cap * n_salts rows per source remain; the
    # final window is small by construction.
    w2 = Window.partitionBy(cfg.source_col).orderBy(*order)
    return (survivors.withColumn("cap_rank", F.row_number().over(w2))
            .filter(F.col("cap_rank") <= cfg.cap)
            .select(cfg.id_col, cfg.source_col, "quality_score",
                    "cap_rank"))


def source_cap_oracle(b: SqlBuilder, reg: Registry, cfg: SourceCapConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    """Single-window top-N — the semantic spec the salted two-stage
    Spark plan must reproduce row-for-row."""
    docs = reg.duckdb_relation(cfg.source)
    q = reg.duckdb_relation(cfg.quality_entity)
    ranked = b.cte(
        f"{cfg.name}__r",
        f"SELECT d.{cfg.id_col}, d.{cfg.source_col}, q.quality_score, "
        f"row_number() OVER (PARTITION BY d.{cfg.source_col} "
        f"ORDER BY q.quality_score DESC, d.{cfg.id_col} ASC) AS cap_rank "
        f"FROM {docs} d JOIN {q} q ON d.{cfg.id_col} = q.{cfg.id_col}")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, {cfg.source_col}, quality_score, cap_rank "
        f"FROM {ranked} WHERE cap_rank <= {cfg.cap}")


# ---------------------------------------------------- quantile gate --

@dataclass(frozen=True)
class QuantileGateConfig:
    """Per-stratum percentile outlier gate: flag rows whose integer
    value falls outside the stratum's [p_lo, p_hi] percentile bounds —
    the winsorization/trim step every corpus runs on document length
    before mixing (a 2-character doc and a 10 MB doc are both noise,
    but "too long" is a per-language property, so the bounds are
    per-stratum). Type-1 (lower) order statistics over exact integer
    comparisons — the GroupedQuantilesConfig contract — so both
    engines agree bit-for-bit.

    Scale design (100 TB): ONE map-side-combined (stratum, value)
    histogram groupBy; cumulative + conditional-min windows over the
    BOUNDED histogram (distinct values per stratum, never the corpus);
    the per-stratum bounds table (one row per stratum) joins back
    broadcast. The corpus is scanned twice (histogram + gate) — fusing
    to one scan would need the corpus through the quantile window,
    which is exactly the shape this operator exists to avoid."""

    name: str
    source: str = "documents"
    stratum_col: str = "lang"
    id_col: str = "doc_id"
    value_col: str = "n_chars"
    p_lo: int = 5               # percentile, 0..100
    p_hi: int = 95

    def __post_init__(self):
        for c in (self.stratum_col, self.id_col, self.value_col):
            ensure_identifier(c, "column", self.name)
        if not (0 <= self.p_lo < self.p_hi <= 100):
            raise ValueError(
                f"{self.name}: need 0 <= p_lo < p_hi <= 100")


def _bounds_frame(df: DataFrame, cfg: QuantileGateConfig) -> DataFrame:
    grp, val = cfg.stratum_col, cfg.value_col
    hist = (df.filter(F.col(val).isNotNull())
            .groupBy(grp, val).agg(F.count(F.lit(1)).alias("c")))
    w = (Window.partitionBy(grp).orderBy(F.asc(val))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.select(
        grp, val,
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(grp)).alias("n"))
    return cum.groupBy(grp).agg(
        F.min(F.expr(f"CASE WHEN cum * 100 >= {cfg.p_lo} * n "
                     f"THEN {val} END")).alias("q_lo"),
        F.min(F.expr(f"CASE WHEN cum * 100 >= {cfg.p_hi} * n "
                     f"THEN {val} END")).alias("q_hi"))


def build_quantile_gate(spark, reg: Registry, cfg: QuantileGateConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    bounds = _bounds_frame(df, cfg)
    grp, val = cfg.stratum_col, cfg.value_col
    return (df.select(cfg.id_col, grp, val)
            .join(F.broadcast(bounds), [grp])
            .select(cfg.id_col, grp, F.col(val),
                    "q_lo", "q_hi",
                    (~F.col(val).between(F.col("q_lo"), F.col("q_hi")))
                    .alias("is_outlier")))


def quantile_gate_oracle(b: SqlBuilder, reg: Registry,
                         cfg: QuantileGateConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    grp, val = cfg.stratum_col, cfg.value_col
    hist = b.cte(f"{cfg.name}__h",
                 f"SELECT {grp}, {val}, count(*) AS c FROM {src} "
                 f"WHERE {val} IS NOT NULL GROUP BY {grp}, {val}")
    cum = b.cte(
        f"{cfg.name}__c",
        f"SELECT {grp}, {val}, "
        f"sum(c) OVER (PARTITION BY {grp} ORDER BY {val} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
        f"sum(c) OVER (PARTITION BY {grp}) AS n FROM {hist}")
    bounds = b.cte(
        f"{cfg.name}__b",
        f"SELECT {grp}, "
        f"min(CASE WHEN cum * 100 >= {cfg.p_lo} * n THEN {val} END) "
        f"AS q_lo, "
        f"min(CASE WHEN cum * 100 >= {cfg.p_hi} * n THEN {val} END) "
        f"AS q_hi FROM {cum} GROUP BY {grp}")
    return b.cte(
        cfg.name,
        f"SELECT s.{cfg.id_col}, s.{grp}, s.{val}, b.q_lo, b.q_hi, "
        f"NOT (s.{val} BETWEEN b.q_lo AND b.q_hi) AS is_outlier "
        f"FROM {src} s JOIN {bounds} b USING ({grp})")


# ------------------------------------------------------ percentile rank --

@dataclass(frozen=True)
class PercentileRankConfig:
    """Per-stratum integer percentile rank: each row's value mapped to
    its rank position within the stratum as ppm of the rank range —
    the cross-source score calibration step (a raw quality score of
    0.7 means different things in different sources; mixing decisions
    compare percentile positions instead, the CCNet §4.2 move of
    bucketing by per-language ppl rank rather than raw perplexity).

    ``pr_ppm = (rank - 1) * 1e6 div max(n - 1, 1)`` with SQL RANK()
    (ties share the lower bound — deterministic without an id
    tie-break, so equal values calibrate equally) and n the stratum
    size; a 1-row stratum maps to 0. Integer-exact in both engines.

    Scale design (100 TB): ONE stratum-keyed exchange feeds the rank
    window and the stratum-count window (same partitioning — no second
    shuffle, pinned in tests/test_plan_quality.py); output is
    corpus-sized but the state per reducer is one sort, no census
    join-back."""

    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    stratum_col: str = "lang"
    value_expr: str = "n_chars"

    def __post_init__(self):
        from ..context import ensure_identifier
        for c in (self.id_col, self.stratum_col):
            ensure_identifier(c, "column", self.name)


def build_percentile_rank(spark, reg: Registry, cfg: PercentileRankConfig,
                          g: GlobalConfig = DEFAULT) -> DataFrame:
    s = cfg.stratum_col
    src = reg.load(spark, cfg.source).selectExpr(
        cfg.id_col, s, f"CAST(({cfg.value_expr}) AS BIGINT) AS value")
    wr = Window.partitionBy(s).orderBy(F.asc("value"))
    wn = Window.partitionBy(s)
    return src.select(
        cfg.id_col, s, "value",
        F.rank().over(wr).alias("rnk"),
        F.count(F.lit(1)).over(wn).alias("n")
    ).selectExpr(
        cfg.id_col, s, "value", "rnk", "n",
        "((rnk - 1) * 1000000) div greatest(n - 1, 1) AS pr_ppm")


def percentile_rank_oracle(b: SqlBuilder, reg: Registry,
                           cfg: PercentileRankConfig,
                           g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    s = cfg.stratum_col
    marked = b.cte(
        f"{cfg.name}__m",
        f"SELECT {cfg.id_col}, {s}, "
        f"CAST(({cfg.value_expr}) AS BIGINT) AS value, "
        f"rank() OVER (PARTITION BY {s} ORDER BY "
        f"CAST(({cfg.value_expr}) AS BIGINT)) AS rnk, "
        f"count(*) OVER (PARTITION BY {s}) AS n "
        f"FROM {src}")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, {s}, value, rnk, n, "
        f"((rnk - 1) * 1000000) // greatest(n - 1, 1) AS pr_ppm "
        f"FROM {marked}")


# --------------------------------------------------------------- k-fold --

@dataclass(frozen=True)
class KFoldConfig:
    """Deterministic stratified k-fold assignment: every document gets
    a fold from its salted 48-bit hash (stable under corpus growth —
    adding documents never moves existing ones between folds, the
    stratified-split contract), plus the per-(stratum, fold) census a
    cross-validation harness consumes to verify balance. The standard
    CV-fold / multi-epoch-shard assignment step.

    Scale design (100 TB): the fold is a scan-stage expression; the
    only exchange is the census groupBy on the bounded
    (stratum, fold) level, joined back AQE-decided (broadcast in
    practice — strata x k rows).
    """

    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    strata_col: str = "lang"
    k: int = 5
    salt: str = "kfold"

    def __post_init__(self):
        _ident(self.id_col, "id_col", self.name)
        _ident(self.strata_col, "strata_col", self.name)
        if self.k < 2:
            raise ValueError(f"{self.name}: k must be >= 2")
        if "'" in self.salt or "\\" in self.salt:
            raise ValueError(f"{self.name}: salt must not contain "
                             f"quotes or backslashes")


def build_kfold(spark, reg: Registry, cfg: KFoldConfig,
                g: GlobalConfig = DEFAULT) -> DataFrame:
    from .sampling import _shuffle_key

    assigned = reg.load(spark, cfg.source).selectExpr(
        cfg.id_col, cfg.strata_col,
        f"CAST({_shuffle_key(cfg.id_col, cfg.salt)} % {cfg.k} AS INT) "
        f"AS fold")
    census = (assigned.groupBy(cfg.strata_col, "fold")
              .agg(F.count(F.lit(1)).alias("n_fold_docs")))
    return assigned.join(census, [cfg.strata_col, "fold"]).select(
        cfg.id_col, cfg.strata_col, "fold", "n_fold_docs")


def kfold_oracle(b: SqlBuilder, reg: Registry, cfg: KFoldConfig,
                 g: GlobalConfig = DEFAULT) -> str:
    from .sampling import _shuffle_key

    src = reg.duckdb_relation(cfg.source)
    assigned = b.cte(
        f"{cfg.name}__a",
        f"SELECT {cfg.id_col}, {cfg.strata_col}, "
        f"CAST({_shuffle_key(cfg.id_col, cfg.salt)} % {cfg.k} AS INT) "
        f"AS fold FROM {src}")
    census = b.cte(
        f"{cfg.name}__c",
        f"SELECT {cfg.strata_col}, fold, count(*) AS n_fold_docs "
        f"FROM {assigned} GROUP BY {cfg.strata_col}, fold")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, a.{cfg.strata_col}, a.fold, n_fold_docs "
        f"FROM {assigned} a JOIN {census} c "
        f"USING ({cfg.strata_col}, fold)")
