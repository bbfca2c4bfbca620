"""Dataset profiling: the "data card" pass every training-data
pipeline runs before committing compute — per-column volume, null
share, distinct cardinality and (for portably-rendered types) value
range, as ROWS so downstream checks can join/diff profiles across
snapshots (Gebru et al. 2021, "Datasheets for Datasets" lineage;
operationally the pre-flight sanity check before a 100 TB job).

Exact counts only — approx_count_distinct/HLL sketches are
engine-specific and would break the cross-engine parity contract; at
100 TB the exact distinct per column is one Expand + partial-agg pass
(Spark's multi-distinct rewrite), still a single scan of the table.
An approximate mode is deliberately not offered: a profile that
cannot be reproduced bit-for-bit on a second engine is not a
verification artifact.

Scale design: ONE aggregation over the source (all per-column
expressions in the same agg — one scan, map-side combined), unpivoted
to rows with stack/UNION in a zero-cost projection. min/max are
emitted only for columns whose string rendering is
dialect-identical (strings, integers): doubles and timestamps render
differently across engines and stay out of the profile's value
columns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry
from ..plans.sqlbuild import SqlBuilder


# column -> is the min/max STRING rendering portable across engines?
_PORTABLE_MINMAX = {"string", "bigint", "int", "integer", "smallint",
                    "tinyint", "varchar", "long", "boolean"}


@dataclass(frozen=True)
class ProfileConfig:
    """``columns``: (name, type) pairs of the columns to profile —
    explicit, not inferred, so the profile is a declared contract (a
    column silently vanishing from the source fails the build instead
    of vanishing from the profile)."""

    name: str
    source: str = "documents"
    columns: tuple = (("doc_id", "bigint"), ("text", "string"),
                      ("lang", "string"), ("source", "string"),
                      ("n_chars", "bigint"))

    def __post_init__(self):
        if not self.columns:
            raise ValueError(f"{self.name}: columns must be non-empty")
        # Same portability contract as sampling._mix_checks (round-6
        # advice): each name is interpolated into stack()/SELECT SQL as
        # both an identifier and a quoted literal in two dialects, so
        # anything beyond a plain identifier is rejected up front.
        import re as _re
        for c, _typ in self.columns:
            if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c):
                raise ValueError(
                    f"{self.name}: column {c!r} must be a plain "
                    f"identifier — it is interpolated into both "
                    f"dialects' SQL")


def _minmax_ok(typ: str) -> bool:
    return typ.lower() in _PORTABLE_MINMAX


def build_dataset_profile(spark, reg: Registry, cfg: ProfileConfig,
                          g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, typ in cfg.columns:
        aggs += [F.count(c).alias(f"__nn_{c}"),
                 F.countDistinct(c).alias(f"__nd_{c}")]
        if _minmax_ok(typ):
            aggs += [F.min(c).cast("string").alias(f"__min_{c}"),
                     F.max(c).cast("string").alias(f"__max_{c}")]
    wide = df.agg(*aggs)
    rows = []
    for c, typ in cfg.columns:
        mn = f"__min_{c}" if _minmax_ok(typ) else "CAST(NULL AS STRING)"
        mx = f"__max_{c}" if _minmax_ok(typ) else "CAST(NULL AS STRING)"
        rows.append(
            f"'{c}', __n, __n - __nn_{c}, __nd_{c}, {mn}, {mx}")
    return wide.selectExpr(
        f"stack({len(rows)}, {', '.join(rows)}) AS "
        f"(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)")


def dataset_profile_oracle(b: SqlBuilder, reg: Registry,
                           cfg: ProfileConfig,
                           g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    aggs = ["count(*) AS __n"]
    for c, typ in cfg.columns:
        aggs += [f"count({c}) AS __nn_{c}",
                 f"count(DISTINCT {c}) AS __nd_{c}"]
        if _minmax_ok(typ):
            aggs += [f"CAST(min({c}) AS VARCHAR) AS __min_{c}",
                     f"CAST(max({c}) AS VARCHAR) AS __max_{c}"]
    wide = b.cte(f"{cfg.name}__w",
                 f"SELECT {', '.join(aggs)} FROM {src}")
    selects = []
    for c, typ in cfg.columns:
        mn = f"__min_{c}" if _minmax_ok(typ) else "CAST(NULL AS VARCHAR)"
        mx = f"__max_{c}" if _minmax_ok(typ) else "CAST(NULL AS VARCHAR)"
        selects.append(
            f"SELECT '{c}' AS col_name, __n AS n_rows, "
            f"__n - __nn_{c} AS n_nulls, __nd_{c} AS n_distinct, "
            f"{mn} AS min_value, {mx} AS max_value FROM {wide}")
    return b.cte(cfg.name, "\nUNION ALL\n".join(selects))


# --------------------------------------------------------- heavy_hitters --

@dataclass(frozen=True)
class HeavyHittersConfig:
    """Top-k values per column by frequency with ppm share — the
    key-skew card. At cluster scale this is the table an operator reads
    BEFORE keying a join or aggregation: a value holding >> 1/parallelism
    of the rows is the shuffle straggler, and NULL-as-hot-key is the
    classic cause (folded in as the '<NULL>' sentinel so it ranks like
    any other value).

    Scale design (100 TB): one branch per column, each a
    column-pruned scan (parquet reads ONLY that column) into a
    map-side-combined groupBy and an ``ORDER BY cnt LIMIT k`` that
    Catalyst compiles to TakeOrderedAndProject — per-partition bounded
    heaps, no full sort of the census (pinned in
    tests/test_plan_quality.py). The corpus-wide row total is a 1-row
    broadcast; the rank window runs over the (n_cols x k)-row result.
    A single-scan stack/explode variant was rejected: it widens every
    scan to all profiled columns and forces one (col, value) shuffle of
    the fattest census instead of n prunable ones.

    ``columns`` must be portably-rendered types (strings/integers —
    the ProfileConfig contract): values surface as strings in both
    engines."""

    name: str
    source: str
    columns: tuple
    k: int = 10

    def __post_init__(self):
        if not self.columns:
            raise ValueError(f"{self.name}: columns must be non-empty")
        if len(set(self.columns)) != len(self.columns):
            raise ValueError(f"{self.name}: duplicate columns")
        if self.k < 1:
            raise ValueError(f"{self.name}: k must be >= 1")
        from ..context import ensure_identifier
        for c in self.columns:
            ensure_identifier(c, "column", self.name)


_NULL_SENTINEL = "<NULL>"


def build_heavy_hitters(spark, reg: Registry, cfg: HeavyHittersConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    from functools import reduce
    from pyspark.sql import Window

    src = reg.load(spark, cfg.source)
    total = src.agg(F.count(F.lit(1)).alias("__total"))
    parts = []
    for c in cfg.columns:
        census = (src.select(
            F.coalesce(F.col(c).cast("string"),
                       F.lit(_NULL_SENTINEL)).alias("value"))
            .groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("value")).limit(cfg.k)
            .select(F.lit(c).alias("col_name"), "value", "cnt"))
        parts.append(census)
    un = reduce(lambda a, b: a.unionByName(b), parts)
    w = Window.partitionBy("col_name").orderBy(F.desc("cnt"),
                                               F.asc("value"))
    return (un.crossJoin(F.broadcast(total))
            .select("col_name", "value", "cnt",
                    F.expr("(cnt * 1000000) div __total").alias("share_ppm"),
                    F.row_number().over(w).cast("int").alias("rnk")))


def heavy_hitters_oracle(b: SqlBuilder, reg: Registry,
                         cfg: HeavyHittersConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    tot = b.cte(f"{cfg.name}__t",
                f"SELECT count(*) AS __total FROM {src}")
    selects = []
    for c in cfg.columns:
        cen = b.cte(
            f"{cfg.name}__c_{c}",
            f"SELECT coalesce(CAST({c} AS VARCHAR), '{_NULL_SENTINEL}') "
            f"AS value, count(*) AS cnt FROM {src} GROUP BY 1 "
            f"ORDER BY cnt DESC, value LIMIT {cfg.k}")
        selects.append(f"SELECT '{c}' AS col_name, value, cnt FROM {cen}")
    un = b.cte(f"{cfg.name}__u", "\nUNION ALL\n".join(selects))
    return b.cte(
        cfg.name,
        f"SELECT col_name, value, cnt, "
        f"(cnt * 1000000) // __total AS share_ppm, "
        f"CAST(row_number() OVER (PARTITION BY col_name "
        f"ORDER BY cnt DESC, value) AS INT) AS rnk FROM {un}, {tot}")


# ------------------------------------------------------------- histogram --

@dataclass(frozen=True)
class HistogramConfig:
    """Fixed-width integer histogram of a column — the distribution
    card (document-length / token-count shape, the first plot of any
    corpus report). Bin bounds derive from the observed [min, max] via
    exact integer arithmetic (width = (hi - lo) div n_bins + 1), so
    both engines bucket identically — no DOUBLE bin edges, no
    width_bucket dialect drift. NULLs are excluded (the data card's
    n_nulls already counts them).

    Scale design (100 TB): the [min, max] probe is one scalar
    aggregation (driver-side literal, the HWM-probe pattern —
    parquet footer min/max statistics answer it without a full scan
    when the column is sorted); the histogram itself is a scan-stage
    integer projection into ONE map-side-combined groupBy of at most
    n_bins rows. share_ppm divides by the broadcast 1-row total."""

    name: str
    source: str
    value_col: str
    n_bins: int = 10

    def __post_init__(self):
        if self.n_bins < 1:
            raise ValueError(f"{self.name}: n_bins must be >= 1")
        from ..context import ensure_identifier
        ensure_identifier(self.value_col, "column", self.name)


def build_histogram(spark, reg: Registry, cfg: HistogramConfig,
                    g: GlobalConfig = DEFAULT) -> DataFrame:
    src = reg.load(spark, cfg.source)
    v = cfg.value_col
    vals = src.filter(F.col(v).isNotNull())
    lo, hi = vals.agg(F.min(v), F.max(v)).collect()[0]
    if lo is None:
        return spark.createDataFrame(
            [], "bin int, bin_lo bigint, bin_hi bigint, cnt bigint, "
                "share_ppm bigint")
    lo, hi = int(lo), int(hi)
    width = (hi - lo) // cfg.n_bins + 1
    total = vals.agg(F.count(F.lit(1)).alias("__total"))
    hist = (vals.selectExpr(f"CAST(({v} - {lo}) div {width} AS INT) AS bin")
            .groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")))
    return (hist.crossJoin(F.broadcast(total))
            .selectExpr("bin",
                        f"CAST({lo} + bin * {width} AS BIGINT) AS bin_lo",
                        f"CAST({lo} + (bin + 1) * {width} - 1 AS BIGINT) "
                        f"AS bin_hi",
                        "cnt",
                        "(cnt * 1000000) div __total AS share_ppm"))


def histogram_oracle(b: SqlBuilder, reg: Registry, cfg: HistogramConfig,
                     g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    v = cfg.value_col
    bounds = b.cte(
        f"{cfg.name}__b",
        f"SELECT CAST(min({v}) AS BIGINT) AS lo, "
        f"(CAST(max({v}) AS BIGINT) - CAST(min({v}) AS BIGINT)) "
        f"// {cfg.n_bins} + 1 AS width, "
        f"count({v}) AS __total FROM {src} WHERE {v} IS NOT NULL")
    hist = b.cte(
        f"{cfg.name}__h",
        f"SELECT CAST(({v} - lo) // width AS INT) AS bin, "
        f"count(*) AS cnt FROM {src}, {bounds} "
        f"WHERE {v} IS NOT NULL GROUP BY 1")
    return b.cte(
        cfg.name,
        f"SELECT bin, CAST(lo + bin * width AS BIGINT) AS bin_lo, "
        f"CAST(lo + (bin + 1) * width - 1 AS BIGINT) AS bin_hi, cnt, "
        f"(cnt * 1000000) // __total AS share_ppm FROM {hist}, {bounds}")


# ------------------------------------------------------ grouped_quantiles --

@dataclass(frozen=True)
class GroupedQuantilesConfig:
    """Exact per-group quartiles of an integer column — the
    distribution half of the data card (length/token-count profiles
    per source or language). Type-1 (lower) order statistics:
    ``q_k = min v with cum(v) * 4 >= k * n`` — pure integer
    comparisons, so both engines agree bit-for-bit; no interpolation,
    no DOUBLE.

    Scale design (100 TB): same shape as the CCNet cutoff derivation
    (llm/lm.py) — ONE map-side-combined histogram groupBy
    (group, value), an ascending cumulative window over the BOUNDED
    histogram (distinct values per group, never the corpus), and all
    three quartiles from one conditional-min aggregation. The naive
    percentile_disc-per-group window over raw rows would funnel each
    group's corpus through one reducer; the histogram form never
    does. NULL values are excluded from n (SQL aggregate convention);
    all-NULL groups emit NULL quartiles."""

    name: str
    source: str = "documents"
    group_col: str = "source"
    value_col: str = "n_chars"

    def __post_init__(self):
        from ..context import ensure_identifier
        for c in (self.group_col, self.value_col):
            ensure_identifier(c, "column", self.name)


_QUARTILE_AGGS = (
    ("q25", "cum * 4 >= n"),
    ("q50", "cum * 2 >= n"),
    ("q75", "cum * 4 >= 3 * n"),
)


def build_grouped_quantiles(spark, reg: Registry,
                            cfg: GroupedQuantilesConfig,
                            g: GlobalConfig = DEFAULT) -> DataFrame:
    from pyspark.sql import Window

    df = reg.load(spark, cfg.source)
    grp, val = cfg.group_col, cfg.value_col
    hist = (df.filter(F.col(val).isNotNull())
            .groupBy(grp, val).agg(F.count(F.lit(1)).alias("c")))
    w = (Window.partitionBy(grp).orderBy(F.asc(val))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.select(
        grp, val,
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(grp)).alias("n"))
    # conditional MIN over the ascending histogram: the smallest value
    # whose cumulative count crosses the quartile boundary
    aggs = [F.min(F.expr(f"CASE WHEN {pred} THEN {val} END")).alias(a)
            for a, pred in _QUARTILE_AGGS]
    return (cum.groupBy(grp)
            .agg(F.max("n").alias("n_rows"),
                 F.min(val).alias("v_min"),
                 F.max(val).alias("v_max"),
                 *aggs)
            .selectExpr(grp, "n_rows", "v_min", "q25", "q50", "q75",
                        "v_max"))


def grouped_quantiles_oracle(b: SqlBuilder, reg: Registry,
                             cfg: GroupedQuantilesConfig,
                             g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    grp, val = cfg.group_col, cfg.value_col
    hist = b.cte(f"{cfg.name}__h",
                 f"SELECT {grp}, {val}, count(*) AS c FROM {src} "
                 f"WHERE {val} IS NOT NULL GROUP BY {grp}, {val}")
    cum = b.cte(
        f"{cfg.name}__c",
        f"SELECT {grp}, {val}, "
        f"sum(c) OVER (PARTITION BY {grp} ORDER BY {val} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
        f"sum(c) OVER (PARTITION BY {grp}) AS n FROM {hist}")
    qsel = ", ".join(
        f"min(CASE WHEN {pred} THEN {val} END) AS {a}"
        for a, pred in _QUARTILE_AGGS)
    return b.cte(
        cfg.name,
        f"SELECT {grp}, CAST(max(n) AS BIGINT) AS n_rows, "
        f"min({val}) AS v_min, {qsel}, max({val}) AS v_max "
        f"FROM {cum} GROUP BY {grp}")


# ------------------------------------------------- sufficient stats --

@dataclass(frozen=True)
class SufficientStatsConfig:
    """Per-group sufficient statistics for (x, y): n, sum(x), sum(y),
    sum(x^2), sum(y^2), sum(x*y) — the exact integer census from which
    mean, variance, covariance, correlation and an OLS fit are all
    pure downstream arithmetic. The engine's contract (profile.py
    header) forbids DOUBLE aggregates in verified outputs — this is
    the verifiable way to ship second-moment statistics: the moments
    are exact integers, the floating-point division happens once,
    client-side, deterministically.

    Unit contract: ``x_expr``/``y_expr`` must be integer-valued SQL
    (the caller picks units — cents, counts, rounded dollars) sized so
    every sum fits BIGINT (|expr| <= ~1e6 over ~1e6-row groups keeps
    sum(x^2) under 2^63). Under Spark's ANSI mode an overflow fails
    the job loudly instead of wrapping; the DuckDB oracle sums in
    HUGEINT and casts back, so a silent Spark wrap would hash-mismatch
    anyway — two independent overflow nets.

    Scale design (100 TB): scan-stage integer projection into ONE
    map-side-combined groupBy; six aggregates share the single
    exchange."""

    name: str
    source: str
    group_col: str
    x_expr: str
    y_expr: str

    def __post_init__(self):
        from ..context import ensure_identifier
        ensure_identifier(self.group_col, "column", self.name)


_MOMENTS = (("n", "count(*)"),
            ("sum_x", "sum(__x)"), ("sum_y", "sum(__y)"),
            ("sum_xx", "sum(__x * __x)"), ("sum_yy", "sum(__y * __y)"),
            ("sum_xy", "sum(__x * __y)"))


def build_sufficient_stats(spark, reg: Registry,
                           cfg: SufficientStatsConfig,
                           g: GlobalConfig = DEFAULT) -> DataFrame:
    src = reg.load(spark, cfg.source)
    proj = src.selectExpr(
        cfg.group_col,
        f"CAST(({cfg.x_expr}) AS BIGINT) AS __x",
        f"CAST(({cfg.y_expr}) AS BIGINT) AS __y")
    return proj.groupBy(cfg.group_col).agg(
        *[F.expr(sql).alias(a) for a, sql in _MOMENTS])


def sufficient_stats_oracle(b: SqlBuilder, reg: Registry,
                            cfg: SufficientStatsConfig,
                            g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    proj = b.cte(
        f"{cfg.name}__p",
        f"SELECT {cfg.group_col}, "
        f"CAST(({cfg.x_expr}) AS BIGINT) AS __x, "
        f"CAST(({cfg.y_expr}) AS BIGINT) AS __y FROM {src}")
    moments = ", ".join(f"CAST({sql} AS BIGINT) AS {a}"
                        for a, sql in _MOMENTS)
    return b.cte(cfg.name,
                 f"SELECT {cfg.group_col}, {moments} FROM {proj} "
                 f"GROUP BY {cfg.group_col}")


# --------------------------------------------------------- trending top-k --

@dataclass(frozen=True)
class TrendingConfig:
    """Top-k values per time bucket — the 'trending' census (top
    domains per crawl day, top error codes per hour): the
    heavy-hitter card sliced by epoch-aligned time buckets so drift
    and burst onset are visible, not averaged away.

    Buckets are integer epoch-day/hour (epoch-micros div width), the
    cohort-retention contract, so both engines bucket identically;
    ranking ties break on the value string.

    Scale design (100 TB): ONE map-side-combined (bucket, value)
    census; the per-bucket rank-and-cut compiles to a partial+final
    WindowGroupLimit pair (bounded per-partition heaps BEFORE the
    bucket exchange — the grouped-vocab plan shape, pinned in
    tests/test_plan_quality.py). Output is k rows per bucket, never
    census-sized."""

    name: str
    source: str = "events"
    ts_col: str = "ts"
    value_col: str = "event_type"
    bucket_seconds: int = 86_400
    k: int = 3

    def __post_init__(self):
        from ..context import ensure_identifier
        for c in (self.ts_col, self.value_col):
            ensure_identifier(c, "column", self.name)
        if self.bucket_seconds < 1 or self.k < 1:
            raise ValueError(
                f"{self.name}: bucket_seconds and k must be >= 1")


def build_trending_topk(spark, reg: Registry, cfg: TrendingConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    from pyspark.sql import Window

    width_us = cfg.bucket_seconds * 1_000_000
    census = (reg.load(spark, cfg.source)
              .selectExpr(
                  f"unix_micros(CAST({cfg.ts_col} AS TIMESTAMP)) "
                  f"div {width_us} AS bucket",
                  f"{cfg.value_col} AS value")
              .groupBy("bucket", "value")
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("bucket").orderBy(F.desc("cnt"),
                                             F.asc("value"))
    return (census.select("bucket", "value", "cnt",
                          F.row_number().over(w).cast("int").alias("rnk"))
            .filter(F.col("rnk") <= cfg.k))


def trending_topk_oracle(b: SqlBuilder, reg: Registry,
                         cfg: TrendingConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    width_us = cfg.bucket_seconds * 1_000_000
    census = b.cte(
        f"{cfg.name}__c",
        f"SELECT epoch_us(CAST({cfg.ts_col} AS TIMESTAMP)) "
        f"// {width_us} AS bucket, {cfg.value_col} AS value, "
        f"count(*) AS cnt FROM {src} GROUP BY 1, 2")
    return b.cte(
        cfg.name,
        f"SELECT bucket, value, cnt, rnk FROM ("
        f"SELECT bucket, value, cnt, "
        f"CAST(row_number() OVER (PARTITION BY bucket "
        f"ORDER BY cnt DESC, value) AS INT) AS rnk FROM {census}) "
        f"WHERE rnk <= {cfg.k}")


# -------------------------------------------------------- profile drift --

@dataclass(frozen=True)
class ProfileDriftConfig:
    """Schema/stats drift report between two slices of one source —
    the monitor a daily ingest runs against yesterday's batch before
    training consumes today's (null-ratio shifts, distinct-count
    collapse, min/max range changes are the classic upstream-breakage
    signatures).

    ``split_expr`` is a SQL boolean valid in both dialects: TRUE rows
    form slice A, FALSE rows slice B (typically two batch-id ranges).
    Exactness: all counts are exact; null ratios compare in integer
    ppm (BIGINT div); min/max render through the same portable-type
    contract as the data-card profile.

    Scale design (100 TB): ONE pass — every per-slice statistic is a
    conditional aggregate in a single agg (the dataset_profile shape;
    no second scan, no join between slices); the stacked per-column
    report is columns-sized. Caveat shared with dataset_profile: the
    2 x columns COUNT(DISTINCT ...) aggregates plan as one Expand
    (row multiplier = number of distinct aggs) before the partial
    aggregation — the standard Spark shape for exact multi-distinct;
    swap n_distinct for approx_count_distinct when an estimate is
    acceptable and the Expand dominates.
    """

    name: str
    source: str = "documents"
    split_expr: str = "doc_id % 3 = 0"
    columns: tuple = (("doc_id", "bigint"), ("lang", "string"),
                      ("source", "string"), ("n_chars", "bigint"))
    null_drift_ppm: int = 10_000    # flag when null ratio shifts > 1%

    def __post_init__(self):
        if not self.columns:
            raise ValueError(f"{self.name}: columns must be non-empty")
        if self.null_drift_ppm < 0:
            raise ValueError(f"{self.name}: null_drift_ppm must be >= 0")
        import re as _re
        for c, _typ in self.columns:
            if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c):
                raise ValueError(
                    f"{self.name}: column {c!r} must be a plain "
                    f"identifier — it is interpolated into both "
                    f"dialects' SQL")


def _drift_aggs(cfg: ProfileDriftConfig, distinct_kw: str) -> list:
    """Conditional per-slice aggregates — expression text valid in
    both dialects (CASE WHEN filters; COUNT/MIN/MAX/DISTINCT agree)."""
    s = f"({cfg.split_expr})"
    aggs = [f"count(CASE WHEN {s} THEN 1 END) AS __n_a",
            f"count(CASE WHEN NOT {s} THEN 1 END) AS __n_b"]
    for c, typ in cfg.columns:
        for tag, pred in (("a", s), ("b", f"NOT {s}")):
            aggs += [
                f"count(CASE WHEN {pred} THEN {c} END) AS __nn_{tag}_{c}",
                f"count({distinct_kw} CASE WHEN {pred} THEN {c} END) "
                f"AS __nd_{tag}_{c}"]
            if _minmax_ok(typ):
                aggs += [
                    f"CAST(min(CASE WHEN {pred} THEN {c} END) AS STRING)"
                    f" AS __min_{tag}_{c}",
                    f"CAST(max(CASE WHEN {pred} THEN {c} END) AS STRING)"
                    f" AS __max_{tag}_{c}"]
    return aggs


def _drift_row(cfg: ProfileDriftConfig, c: str, typ: str,
               dialect: str) -> str:
    idiv = " div " if dialect == "spark" else " // "
    cells = {}
    for tag in ("a", "b"):
        cells[f"nulls_{tag}"] = f"(__n_{tag} - __nn_{tag}_{c})"
        cells[f"ppm_{tag}"] = (
            f"(CASE WHEN __n_{tag} > 0 THEN "
            f"((__n_{tag} - __nn_{tag}_{c}) * 1000000){idiv}__n_{tag} "
            f"END)")
        if _minmax_ok(typ):
            cells[f"min_{tag}"] = f"__min_{tag}_{c}"
            cells[f"max_{tag}"] = f"__max_{tag}_{c}"
        else:
            cells[f"min_{tag}"] = "CAST(NULL AS STRING)"
            cells[f"max_{tag}"] = "CAST(NULL AS STRING)"
    null_drift = (f"(abs({cells['ppm_a']} - {cells['ppm_b']}) "
                  f"> {cfg.null_drift_ppm})")
    mm = (f"(({cells['min_a']} IS DISTINCT FROM {cells['min_b']}) OR "
          f"({cells['max_a']} IS DISTINCT FROM {cells['max_b']}))")
    return (f"'{c}', __n_a, __n_b, {cells['nulls_a']}, "
            f"{cells['nulls_b']}, __nd_a_{c}, __nd_b_{c}, "
            f"{cells['ppm_a']}, {cells['ppm_b']}, {cells['min_a']}, "
            f"{cells['max_a']}, {cells['min_b']}, {cells['max_b']}, "
            f"{null_drift}, {mm}")


_DRIFT_COLS = ("col_name, n_rows_a, n_rows_b, n_nulls_a, n_nulls_b, "
               "n_distinct_a, n_distinct_b, null_ppm_a, null_ppm_b, "
               "min_a, max_a, min_b, max_b, null_drift, minmax_changed")


def build_profile_drift(spark, reg: Registry, cfg: ProfileDriftConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    wide = df.selectExpr("*").agg(
        *[F.expr(a) for a in _drift_aggs(cfg, "DISTINCT")])
    rows = [_drift_row(cfg, c, typ, "spark") for c, typ in cfg.columns]
    return wide.selectExpr(
        f"stack({len(rows)}, {', '.join(rows)}) AS ({_DRIFT_COLS})")


def profile_drift_oracle(b: SqlBuilder, reg: Registry,
                         cfg: ProfileDriftConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    wide = b.cte(f"{cfg.name}__w",
                 f"SELECT {', '.join(_drift_aggs(cfg, 'DISTINCT'))} "
                 f"FROM {src}")
    selects = [
        f"SELECT {_drift_row(cfg, c, typ, 'duck')} FROM {wide}"
        for c, typ in cfg.columns]
    named = ", ".join(_DRIFT_COLS.split(", "))
    return b.cte(
        cfg.name,
        f"SELECT * FROM (\n" + "\nUNION ALL\n".join(selects) +
        f"\n) AS d({named})")
