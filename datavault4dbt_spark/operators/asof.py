"""As-of join: attach the latest right-side row at-or-before (or
strictly before) each left row's timestamp, per key.

The classic time-series operator Spark's join surface lacks (DuckDB,
Postgres range joins, and kdb each ship one natively; the build brief
names it explicitly). A naive formulation — equi-join on key plus a
``r.ts <= l.ts`` residual, then max-per-left — explodes to one row per
(left, earlier-right) pair before reducing: quadratic per key on long
histories. This implementation is the scalable union-window form:

1. tag right rows and left rows, union them by name (right columns
   prefixed, null on left rows);
2. ONE shuffle: window over (key) ordered by (ts, side) where the side
   bit encodes the mode — inclusive mode sorts a right row BEFORE a
   left row at the same timestamp (it matches), strict mode after (it
   does not);
3. each left row reads ``last_value(ignoreNulls)`` of ONE struct
   packing the right timestamp and every value column over the
   unbounded-preceding frame — the latest eligible right row,
   atomically — then non-left rows are dropped. Packing matters:
   per-column lasts would skip a genuinely-NULL value on the latest
   right row and resurrect an OLDER row's value while the attached
   timestamp still reported the latest row (column-mixed output,
   diverging from SQL ASOF semantics).

Cost is one hash shuffle on the key and a single sorted pass per
partition, independent of history length per left row. Skewed keys
behave like any window (one key's history on one reducer); histories
are bounded by retention in practice.

Contract: right rows must be unique per (key, ts) — with duplicates
"the latest right row" is ill-defined and engines may disagree on
which duplicate wins (DuckDB's native ASOF JOIN, the oracle here,
makes the same assumption).

Oracle: DuckDB's native ``ASOF LEFT JOIN`` (inclusive: ``l.ts >=
r.ts``; strict: ``l.ts > r.ts``) — an independent engine-native
implementation of the same semantics, so the driver's hash compare
certifies the union-window plan against it row for row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class AsofJoinConfig:
    name: str
    left_entity: str = "events"
    right_entity: str = "events"
    key_col: str = "user_id"
    ts_col: str = "ts"
    # SQL predicate applied to the right side in BOTH dialects (same
    # portability contract as the stage/text_expr knobs); "" = none.
    right_filter: str = "event_type = 'click'"
    # right columns attached to each left row as asof_<col>; the right
    # timestamp itself always rides along as asof_<ts_col>.
    value_cols: tuple = ("value",)
    # left columns carried through (() = all left columns).
    left_cols: tuple = ()
    strict: bool = False   # False: match at-or-before; True: strictly before
    # max staleness in NANOSECONDS (pandas merge_asof's `tolerance`):
    # a latest-eligible right row older than this yields NO match
    # (NULL asof_* columns), never a fallback to an even older row.
    # 0 = unbounded. ts_col must be a TIMESTAMP (cast numeric epochs
    # upstream — the registry's events loader already does); the gate
    # compares at microsecond precision, so tolerances truncate to
    # whole microseconds.
    tolerance_nanos: int = 0

    def __post_init__(self):
        if self.tolerance_nanos < 0:
            raise ValueError(f"{self.name}: tolerance_nanos must be >= 0")
        for c in (self.key_col, self.ts_col, *self.value_cols,
                  *self.left_cols):
            ensure_identifier(c, "column", self.name)
        if self.ts_col in self.value_cols:
            raise ValueError(
                f"{self.name}: the right timestamp already rides along "
                f"as asof_{self.ts_col}; drop it from value_cols")
        if self.key_col in self.value_cols:
            raise ValueError(
                f"{self.name}: key_col in value_cols would emit a "
                f"duplicate column in the oracle CTE (and asof_"
                f"{self.key_col} always equals the left key anyway)")


def build_asof_join(spark, reg: Registry, cfg: AsofJoinConfig,
                    g: GlobalConfig = DEFAULT) -> DataFrame:
    return asof_join_frames(reg.load(spark, cfg.left_entity),
                            reg.load(spark, cfg.right_entity), cfg)


def asof_join_frames(left: DataFrame, right: DataFrame,
                     cfg: AsofJoinConfig) -> DataFrame:
    """Frame-level core (no registry): shared by the batch operator and
    the streaming stream-static twin so the two cannot drift."""
    if cfg.right_filter:
        right = right.filter(cfg.right_filter)
    # NULL-key/NULL-ts right rows can never match under the SQL
    # comparison semantics the oracle runs (NULL = / >= never true),
    # but in the union-window they WOULD sort into a partition (NULL
    # keys group; NULL ts sorts first = "earliest state") and leak
    # into every left row without an earlier real match — drop them so
    # both formulations agree.
    right = right.filter(F.col(cfg.key_col).isNotNull()
                         & F.col(cfg.ts_col).isNotNull())

    left_cols = list(cfg.left_cols) or [
        c for c in left.columns]
    # side bit: rows sort (ts, __side) ascending, so inclusive mode
    # gives right rows the SMALLER side value (visible to a same-ts
    # left row's preceding frame) and strict mode the larger.
    r_side, l_side = (0, 1) if not cfg.strict else (1, 0)
    tagged_r = right.select(
        F.col(cfg.key_col), F.col(cfg.ts_col),
        F.lit(r_side).alias("__side"),
        # one struct = one atomic right row: last(ignorenulls) must
        # pick the timestamp and ALL values from the SAME row even
        # when some value column is NULL on the latest row
        F.struct(
            F.col(cfg.ts_col).alias(f"asof_{cfg.ts_col}"),
            *[F.col(c).alias(f"asof_{c}") for c in cfg.value_cols]
        ).alias("__r"))
    tagged_l = left.select(
        F.col(cfg.key_col), F.col(cfg.ts_col),
        F.lit(l_side).alias("__side"),
        *[F.col(c) for c in left_cols
          if c not in (cfg.key_col, cfg.ts_col)],
        F.lit(True).alias("__is_left"))
    u = tagged_r.unionByName(tagged_l, allowMissingColumns=True)

    w = (Window.partitionBy(cfg.key_col)
         .orderBy(cfg.ts_col, "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out_cols = ([cfg.key_col, cfg.ts_col]
                + [c for c in left_cols
                   if c not in (cfg.key_col, cfg.ts_col)])
    matched = (u.select(*out_cols, "__is_left",
                        F.last("__r", ignorenulls=True).over(w)
                        .alias("__latest"))
               .filter(F.col("__is_left")))
    if cfg.tolerance_nanos:
        # staleness gate AFTER the window: the latest eligible row
        # either lies within tolerance or there is no match at all —
        # never a fallback to an older row (pandas merge_asof rule).
        # Scan-stage predicate; the window/shuffle shape is unchanged.
        ats = f"__latest.asof_{cfg.ts_col}"
        fresh = (f"unix_micros(CAST({cfg.ts_col} AS TIMESTAMP)) - "
                 f"unix_micros(CAST({ats} AS TIMESTAMP)) <= "
                 f"{cfg.tolerance_nanos // 1000}")
        matched = matched.withColumn(
            "__latest",
            F.expr(f"CASE WHEN __latest IS NOT NULL AND {fresh} "
                   f"THEN __latest END"))
    return matched.select(
        *out_cols,
        *[F.col("__latest").getField(f"asof_{c}").alias(f"asof_{c}")
          for c in (cfg.ts_col, *cfg.value_cols)])


def asof_join_oracle(b: SqlBuilder, reg: Registry, cfg: AsofJoinConfig,
                     g: GlobalConfig = DEFAULT) -> str:
    left = reg.duckdb_relation(cfg.left_entity)
    right = reg.duckdb_relation(cfg.right_entity)
    rf = f"WHERE {cfg.right_filter}" if cfg.right_filter else ""
    r = b.cte(f"{cfg.name}__r",
              f"SELECT {cfg.key_col}, {cfg.ts_col}, "
              f"{', '.join(cfg.value_cols) or '1 AS __one'} "
              f"FROM {right} {rf}")
    cmp_op = ">" if cfg.strict else ">="
    left_cols = list(cfg.left_cols) or None
    if left_cols is None:
        # mirror the Spark side: all left columns pass through
        lsel = "l.*"
    else:
        lsel = ", ".join(
            f"l.{c}" for c in
            ([cfg.key_col, cfg.ts_col]
             + [c for c in left_cols
                if c not in (cfg.key_col, cfg.ts_col)]))
    rsel = ", ".join(f"r.{c} AS asof_{c}"
                     for c in (cfg.ts_col, *cfg.value_cols))
    raw = b.cte(
        f"{cfg.name}__asof" if cfg.tolerance_nanos else cfg.name,
        f"SELECT {lsel}, {rsel} FROM {left} l "
        f"ASOF LEFT JOIN {r} r ON l.{cfg.key_col} = r.{cfg.key_col} "
        f"AND l.{cfg.ts_col} {cmp_op} r.{cfg.ts_col}")
    if not cfg.tolerance_nanos:
        return raw
    # DuckDB's ASOF ON clause admits exactly one inequality, so the
    # staleness gate wraps the result: NULL out matches older than the
    # tolerance. epoch_ns requires the TIMESTAMP ts the config
    # contract demands (numeric epochs cast upstream, both engines).
    fresh = (f"asof_{cfg.ts_col} IS NOT NULL AND "
             f"epoch_ns({cfg.ts_col}) - epoch_ns(asof_{cfg.ts_col}) "
             f"<= {cfg.tolerance_nanos}")
    if left_cols is None:
        keep = f"* EXCLUDE ({', '.join(f'asof_{c}' for c in (cfg.ts_col, *cfg.value_cols))})"
    else:
        keep = ", ".join(
            [cfg.key_col, cfg.ts_col]
            + [c for c in left_cols
               if c not in (cfg.key_col, cfg.ts_col)])
    gated = ", ".join(
        f"CASE WHEN {fresh} THEN asof_{c} END AS asof_{c}"
        for c in (cfg.ts_col, *cfg.value_cols))
    return b.cte(cfg.name, f"SELECT {keep}, {gated} FROM {raw}")
