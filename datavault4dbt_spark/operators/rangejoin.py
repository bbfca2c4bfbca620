"""Interval (range) join: match each point-in-time row to every
interval row whose [start, end) contains it — with NO equi-key
required.

The second time-series join the build brief names beside as-of. Spark
executes a raw ``l.ts >= r.start AND l.ts < r.end`` join as a
broadcast-nested-loop (or worse, a cartesian) — quadratic row visits
even when each point matches a handful of intervals. This is the
standard binning decomposition (the same idea behind Databricks'
range-join hint, re-expressed in open DataFrame ops):

1. pick a ``bin_seconds`` granularity; every point belongs to exactly
   one epoch-aligned bin;
2. explode each interval to the bins it overlaps
   (``sequence(floor(start/bin), floor((end - 1us)/bin))`` — a
   scan-stage generate, rows ~= interval_len / bin);
3. equi-join points to exploded intervals on (optional key +) bin,
   then apply the exact containment predicate.

Because a point lives in ONE bin and an interval appears ONCE per
covered bin, every qualifying (point, interval) pair meets exactly
once — no distinct pass. Cost: one hash shuffle each side on
(key, bin); bin choice trades explode factor against join selectivity
(bin ~ median interval length is the usual rule). Degenerate
zero-length intervals (start == end, empty [start, end)) explode to
zero bins and match nothing, matching the half-open semantics.

Oracle: DuckDB runs the raw inequality join (its optimizer plans an
IEJoin — an independent algorithm), so the driver hash-compare
certifies the binned decomposition row for row.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class IntervalJoinConfig:
    name: str
    points_entity: str = "events"
    intervals_entity: str = "control_snap_v0"
    ts_col: str = "ts"
    start_col: str = "sdts"
    # "" = derive: end = start + interval_seconds (spine-style tables
    # that carry only a start column)
    end_col: str = ""
    interval_seconds: int = 86400
    key_col: str = ""               # "" = unkeyed (pure temporal join)
    bin_seconds: int = 86400
    point_cols: tuple = ("event_id", "user_id", "ts")
    interval_cols: tuple = ("sdts",)
    how: str = "inner"              # or "left" (points without a match)

    def __post_init__(self):
        for c in (self.ts_col, self.start_col, *self.point_cols,
                  *self.interval_cols):
            _ident(c, self.name)
        for c in (self.end_col, self.key_col):
            if c:
                _ident(c, self.name)
        if self.bin_seconds < 1:
            raise ValueError(f"{self.name}: bin_seconds must be >= 1")
        if not self.end_col and self.interval_seconds < 1:
            raise ValueError(
                f"{self.name}: interval_seconds must be >= 1 when "
                f"end_col is derived")
        if self.how not in ("inner", "left"):
            raise ValueError(f"{self.name}: how must be inner or left")
        overlap = set(self.point_cols) & set(self.interval_cols)
        if overlap:
            raise ValueError(
                f"{self.name}: point/interval output columns collide: "
                f"{sorted(overlap)}")


def _ident(name: str, owner: str) -> None:
    ensure_identifier(name, "column", owner)


def _end_expr(cfg: IntervalJoinConfig, prefix: str = "") -> str:
    if cfg.end_col:
        return f"{prefix}{cfg.end_col}"
    return (f"{prefix}{cfg.start_col} + "
            f"INTERVAL {cfg.interval_seconds} SECOND")


def build_interval_join(spark, reg: Registry, cfg: IntervalJoinConfig,
                        g: GlobalConfig = DEFAULT) -> DataFrame:
    pts = (reg.load(spark, cfg.points_entity)
           .withColumn(cfg.ts_col, F.col(cfg.ts_col).cast("timestamp")))
    ivs = reg.load(spark, cfg.intervals_entity)
    b = cfg.bin_seconds

    pt_cols = [c for c in cfg.point_cols]
    # both sides are plan-aliased so the join condition and the final
    # projection use QUALIFIED names: a key_col that also appears in
    # point_cols/interval_cols (both sides then carry the name) would
    # otherwise make the bare-string select AMBIGUOUS_REFERENCE
    # (round-7 advice, medium)
    pts = pts.select(
        *pt_cols, *( [F.col(cfg.key_col)] if cfg.key_col
                     and cfg.key_col not in pt_cols else []),
        F.expr(f"CAST(floor(unix_micros({cfg.ts_col}) / 1e6 / {b}) "
               f"AS BIGINT)").alias("__bin")).alias("__pts")

    end = _end_expr(cfg)
    # bins covered by [start, end): last bin holds end - 1 microsecond
    # (sequence() is inclusive); an empty interval yields start > last
    # -> raises in sequence, so guard with a filter first
    ivs = (ivs.filter(F.expr(f"{end} > {cfg.start_col}"))
           .select(*cfg.interval_cols,
                   *( [F.col(cfg.key_col)] if cfg.key_col
                      and cfg.key_col not in cfg.interval_cols else []),
                   F.col(cfg.start_col).alias("__start"),
                   F.expr(end).alias("__end"),
                   F.expr(
                       f"explode(sequence("
                       f"CAST(floor(unix_micros({cfg.start_col}) / 1e6 "
                       f"/ {b}) AS BIGINT), "
                       f"CAST(floor((unix_micros({end}) - 1) / 1e6 "
                       f"/ {b}) AS BIGINT)))").alias("__bin"))
           .alias("__ivs"))

    on = [F.col("__pts.__bin") == F.col("__ivs.__bin")]
    if cfg.key_col:
        on.append(F.col(f"__pts.{cfg.key_col}")
                  == F.col(f"__ivs.{cfg.key_col}"))
    on += [F.col(f"__pts.{cfg.ts_col}") >= F.col("__ivs.__start"),
           F.col(f"__pts.{cfg.ts_col}") < F.col("__ivs.__end")]
    joined = pts.join(ivs, reduce(lambda a, c: a & c, on), cfg.how)
    return joined.select(
        *[F.col(f"__pts.{c}").alias(c) for c in pt_cols],
        *[F.col(f"__ivs.{c}").alias(c) for c in cfg.interval_cols])


def interval_join_oracle(b: SqlBuilder, reg: Registry,
                         cfg: IntervalJoinConfig,
                         g: GlobalConfig = DEFAULT) -> str:
    pts = reg.duckdb_relation(cfg.points_entity)
    ivs = reg.duckdb_relation(cfg.intervals_entity)
    end = _end_expr(cfg, "i.")
    key = (f"AND p.{cfg.key_col} = i.{cfg.key_col} "
           if cfg.key_col else "")
    sel = ([f"p.{c}" for c in cfg.point_cols]
           + [f"i.{c}" for c in cfg.interval_cols])
    join = "JOIN" if cfg.how == "inner" else "LEFT JOIN"
    return b.cte(
        cfg.name,
        f"SELECT {', '.join(sel)} FROM {pts} p {join} {ivs} i "
        f"ON p.{cfg.ts_col} >= i.{cfg.start_col} "
        f"AND p.{cfg.ts_col} < {end} {key}")
