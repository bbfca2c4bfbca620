"""Event-stream analytics in batch: gap sessionization and hopping
(sliding) window aggregation.

Beyond-reference event-table operators (the reference models events
only as non-historized satellite payloads). Both are the batch twins
of the streaming surface — ``streaming.stateful`` runs the SAME
session semantics per micro-batch with state-store timeouts, and a
hopping aggregation is what ``groupBy(window(...))`` computes on a
stream — so pipeline logic can move between batch backfill and live
streams without reimplementation.

- ``sessionize``: a session ends after ``gap_seconds`` of user
  inactivity. Boundary detection is the classic gaps-and-islands
  window pair: LAG flags gap-starts, a running sum numbers sessions
  (``session_seq`` = 1..n per user, deterministic), then one groupBy
  folds per-session stats. ONE shuffle total: the window pair shares
  the user-id partitioning and the (user, session) groupBy is
  satisfied by it (pinned in test_plan_quality).
- ``hopping_agg``: overlapping windows of ``width_seconds`` sliding
  every ``hop_seconds`` (width % hop == 0), epoch-aligned — built on
  Spark's native ``F.window``, which generates each row's
  width/hop containing windows in the scan stage; the only shuffle is
  the final (window, group) aggregation with map-side combine.

Value sums fold as exact integer cents (``round(value * 100)``):
double summation is shuffle-order dependent and not bit-reproducible
across engines, so the engine's oracle-gate convention (profile.py,
curation.py) is integer-exact aggregates only.

Oracle: the same LAG/SUM windows in DuckDB; for hopping windows,
``generate_series(0, width/hop - 1)`` reconstructs each event's
containing epoch-aligned window starts — an independent formulation of
F.window's generation rule.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder

_ident = ensure_identifier


# ---------------------------------------------------------- sessionize --

@dataclass(frozen=True)
class SessionizeConfig:
    name: str
    source: str = "events"
    user_col: str = "user_id"
    ts_col: str = "ts"
    value_col: str = "value"
    gap_seconds: int = 3600

    def __post_init__(self):
        for c in (self.user_col, self.ts_col, self.value_col):
            _ident(c, "column", self.name)
        if self.gap_seconds < 1:
            raise ValueError(f"{self.name}: gap_seconds must be >= 1")


def mark_sessions(events: DataFrame, gap_seconds: int,
                  user_col: str = "user_id",
                  ts_col: str = "ts") -> DataFrame:
    """Gap-start detection + running session number (``session_seq``,
    1-based per user). Shared by the batch operator and the streaming
    twin's batch-parity tests so the two cannot drift."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    marked = events.withColumn(
        "__new", (prev.isNull()
                  | (F.col(ts_col).cast("double") - prev.cast("double")
                     > gap_seconds)).cast("int"))
    return marked.withColumn(
        "session_seq", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0))).drop("__new")


def build_sessionize(spark, reg: Registry, cfg: SessionizeConfig,
                     g: GlobalConfig = DEFAULT) -> DataFrame:
    # cast first: a session without the nanosAsLong static conf reads
    # the events timestamp as TIMESTAMP_NTZ, which the gap arithmetic's
    # double cast rejects (UTC session tz makes the cast value-exact)
    ev = (reg.load(spark, cfg.source)
          .select(cfg.user_col, cfg.ts_col, cfg.value_col)
          .withColumn(cfg.ts_col, F.col(cfg.ts_col).cast("timestamp")))
    sess = mark_sessions(ev, cfg.gap_seconds, cfg.user_col, cfg.ts_col)
    return (sess.groupBy(cfg.user_col, "session_seq")
            .agg(F.min(cfg.ts_col).alias("session_start"),
                 F.max(cfg.ts_col).alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.expr(
                     f"CAST(round({cfg.value_col} * 100) AS BIGINT)"))
                 .alias("sum_value_cents")))


def sessionize_oracle(b: SqlBuilder, reg: Registry, cfg: SessionizeConfig,
                      g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    u, t, v = cfg.user_col, cfg.ts_col, cfg.value_col
    marked = b.cte(
        f"{cfg.name}__m",
        f"SELECT {u}, {t}, {v}, CASE WHEN LAG({t}) OVER w IS NULL OR "
        f"epoch({t}) - epoch(LAG({t}) OVER w) > {cfg.gap_seconds} "
        f"THEN 1 ELSE 0 END AS nw FROM {src} "
        f"WINDOW w AS (PARTITION BY {u} ORDER BY {t})")
    sid = b.cte(
        f"{cfg.name}__s",
        f"SELECT {u}, {t}, {v}, SUM(nw) OVER (PARTITION BY {u} "
        f"ORDER BY {t} ROWS UNBOUNDED PRECEDING) AS session_seq "
        f"FROM {marked}")
    # outer CASTs: DuckDB SUM over integers returns HUGEINT, which
    # pandas renders as float64 ('655.0' vs Spark's '655') and breaks
    # the driver's value hash — same contract as roll_sum_cents below
    return b.cte(
        cfg.name,
        f"SELECT {u}, CAST(session_seq AS BIGINT) AS session_seq, "
        f"min({t}) AS session_start, "
        f"max({t}) AS session_end, count(*) AS n_events, "
        f"CAST(SUM(CAST(round({v} * 100) AS BIGINT)) AS BIGINT) "
        f"AS sum_value_cents "
        f"FROM {sid} GROUP BY {u}, session_seq")


# --------------------------------------------------------- hopping_agg --

@dataclass(frozen=True)
class HoppingAggConfig:
    name: str
    source: str = "events"
    ts_col: str = "ts"
    group_col: str = "event_type"
    value_col: str = "value"
    width_seconds: int = 3600
    hop_seconds: int = 900

    def __post_init__(self):
        for c in (self.ts_col, self.group_col, self.value_col):
            _ident(c, "column", self.name)
        if self.width_seconds < 1 or self.hop_seconds < 1:
            raise ValueError(f"{self.name}: window sizes must be >= 1")
        if self.width_seconds % self.hop_seconds:
            raise ValueError(
                f"{self.name}: width_seconds must be a multiple of "
                f"hop_seconds (every event then sits in exactly "
                f"width/hop windows — the epoch-aligned F.window rule "
                f"the oracle reconstructs)")


def build_hopping_agg(spark, reg: Registry, cfg: HoppingAggConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    ev = (reg.load(spark, cfg.source)
          .select(cfg.ts_col, cfg.group_col, cfg.value_col)
          .withColumn(cfg.ts_col, F.col(cfg.ts_col).cast("timestamp")))
    win = F.window(F.col(cfg.ts_col), f"{cfg.width_seconds} seconds",
                   f"{cfg.hop_seconds} seconds")
    return (ev.groupBy(win.alias("w"), cfg.group_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.expr(
                     f"CAST(round({cfg.value_col} * 100) AS BIGINT)"))
                 .alias("sum_value_cents"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    cfg.group_col, "n_events", "sum_value_cents"))


def hopping_agg_oracle(b: SqlBuilder, reg: Registry, cfg: HoppingAggConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    t, gcol, v = cfg.ts_col, cfg.group_col, cfg.value_col
    n = cfg.width_seconds // cfg.hop_seconds
    hop = cfg.hop_seconds
    # the i-th containing window (i = 0..n-1) starts at
    # floor(epoch/hop)*hop - i*hop; all n are valid when width % hop
    # == 0 and the timestamp is non-negative epoch. Pure interval
    # arithmetic off the epoch origin keeps the result a plain
    # (zoneless) TIMESTAMP — to_timestamp() would mint a TIMESTAMPTZ
    # whose rendering depends on the session zone.
    exploded = b.cte(
        f"{cfg.name}__x",
        f"SELECT TIMESTAMP '1970-01-01 00:00:00' + "
        f"((CAST(floor(epoch({t}) / {hop}) AS BIGINT) - i.i) * {hop}) "
        f"* INTERVAL 1 SECOND AS window_start, {gcol}, {v} "
        f"FROM {src} CROSS JOIN range(0, {n}) AS i(i)")
    return b.cte(
        cfg.name,
        f"SELECT window_start, "
        f"window_start + INTERVAL {cfg.width_seconds} SECOND "
        f"AS window_end, {gcol}, count(*) AS n_events, "
        f"CAST(SUM(CAST(round({v} * 100) AS BIGINT)) AS BIGINT) "
        f"AS sum_value_cents "
        f"FROM {exploded} GROUP BY 1, 2, 3")


# -------------------------------------------------------------- funnel --

@dataclass(frozen=True)
class FunnelConfig:
    """First-touch funnel analysis: per user, the timestamp at which
    each ordered step first completes (a step counts only STRICTLY
    after the previous step's first completion), plus the reached
    depth — the product-analytics query every event warehouse runs
    (conversion funnels; cf. window-function funnel formulations in
    ClickHouse/BigQuery practice).

    Scale design (100 TB): ONE hash shuffle on the user — every step
    is a whole-partition conditional MIN chained over the same window
    partitioning, so Catalyst reuses a single exchange+sort for all k
    Window nodes, and the final per-user collapse reuses the same
    partitioning (no second shuffle). No state machine, no UDF, no
    per-user single-reducer beyond the user partition itself (user
    histories are retention-bounded)."""

    name: str
    source: str = "events"
    user_col: str = "user_id"
    ts_col: str = "ts"
    type_col: str = "event_type"
    steps: tuple = ("view", "click", "purchase")

    def __post_init__(self):
        for c in (self.user_col, self.ts_col, self.type_col):
            _ident(c, "column", self.name)
        if not 1 <= len(self.steps) <= 8:
            raise ValueError(f"{self.name}: 1..8 steps")
        for s in self.steps:
            if "'" in s or "\\" in s:
                raise ValueError(
                    f"{self.name}: step {s!r} violates the portability "
                    f"contract (it becomes a SQL string literal in "
                    f"both dialects)")


def funnel_frame(ev: DataFrame, cfg: FunnelConfig) -> DataFrame:
    """Frame-level core (no registry): shared by the batch operator and
    the stateful-streaming twin's batch reference so the two cannot
    drift."""
    ev = ev.select(cfg.user_col, cfg.ts_col, cfg.type_col)
    w = (Window.partitionBy(cfg.user_col)
         .rowsBetween(Window.unboundedPreceding,
                      Window.unboundedFollowing))
    t, ty = cfg.ts_col, cfg.type_col
    cur = ev
    for i, step in enumerate(cfg.steps, start=1):
        prev = f" AND {t} > step{i - 1}_ts" if i > 1 else ""
        cur = cur.withColumn(
            f"step{i}_ts",
            F.min(F.expr(f"CASE WHEN {ty} = '{step}'{prev} "
                         f"THEN {t} END")).over(w))
    depth = " + ".join(
        f"CASE WHEN step{i}_ts IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(1, len(cfg.steps) + 1))
    # every row in a user's partition carries identical step columns:
    # the collapse reuses the window's hash partitioning (no shuffle)
    return (cur.groupBy(cfg.user_col)
            .agg(*[F.min(f"step{i}_ts").alias(f"step{i}_ts")
                   for i in range(1, len(cfg.steps) + 1)])
            .selectExpr(cfg.user_col,
                        *[f"step{i}_ts"
                          for i in range(1, len(cfg.steps) + 1)],
                        f"CAST({depth} AS INT) AS depth"))


def build_funnel(spark, reg: Registry, cfg: FunnelConfig,
                 g: GlobalConfig = DEFAULT) -> DataFrame:
    return funnel_frame(reg.load(spark, cfg.source), cfg)


def funnel_oracle(b: SqlBuilder, reg: Registry, cfg: FunnelConfig,
                  g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    u, t, ty = cfg.user_col, cfg.ts_col, cfg.type_col
    cur = b.cte(f"{cfg.name}__e",
                f"SELECT {u}, {t}, {ty} FROM {src}")
    for i, step in enumerate(cfg.steps, start=1):
        prev = f" AND {t} > step{i - 1}_ts" if i > 1 else ""
        cur = b.cte(
            f"{cfg.name}__s{i}",
            f"SELECT *, min(CASE WHEN {ty} = '{step}'{prev} "
            f"THEN {t} END) OVER (PARTITION BY {u}) AS step{i}_ts "
            f"FROM {cur}")
    cols = ", ".join(f"min(step{i}_ts) AS step{i}_ts"
                     for i in range(1, len(cfg.steps) + 1))
    depth = " + ".join(
        f"CASE WHEN min(step{i}_ts) IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(1, len(cfg.steps) + 1))
    return b.cte(cfg.name,
                 f"SELECT {u}, {cols}, CAST({depth} AS INT) AS depth "
                 f"FROM {cur} GROUP BY {u}")


# ----------------------------------------------------- cohort retention --

@dataclass(frozen=True)
class CohortRetentionConfig:
    """Cohort retention matrix: users grouped by their first-activity
    day (the cohort), counted on each later active day as an offset
    from the cohort day — the (cohort_day, offset_day, n_users) long
    form every retention chart pivots from. Days are epoch-day
    integers (pure integer division of the epoch-microsecond value),
    so both engines bucket identically with no date-rendering or
    timezone surface.

    Scale design (100 TB): first-activity and the distinct activity
    set are two aggregations over the SAME user-keyed shuffle; the
    cohort join is user-keyed equi (AQE picks broadcast when a cohort
    table fits); the final (cohort, offset) rollup is map-side
    combined. No windows, no per-day reducers."""

    name: str
    source: str = "events"
    user_col: str = "user_id"
    ts_col: str = "ts"

    def __post_init__(self):
        for c in (self.user_col, self.ts_col):
            _ident(c, "column", self.name)


_DAY_US = 86_400_000_000


def build_cohort_retention(spark, reg: Registry,
                           cfg: CohortRetentionConfig,
                           g: GlobalConfig = DEFAULT) -> DataFrame:
    u, t = cfg.user_col, cfg.ts_col
    ev = reg.load(spark, cfg.source).selectExpr(
        u, f"unix_micros(CAST({t} AS TIMESTAMP)) div {_DAY_US} AS day")
    active = ev.distinct()
    cohort = active.groupBy(u).agg(F.min("day").alias("cohort_day"))
    return (active.join(cohort, [u])
            .selectExpr(u, "cohort_day",
                        "day - cohort_day AS offset_day")
            .groupBy("cohort_day", "offset_day")
            .agg(F.countDistinct(u).alias("n_users")))


def cohort_retention_oracle(b: SqlBuilder, reg: Registry,
                            cfg: CohortRetentionConfig,
                            g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    u, t = cfg.user_col, cfg.ts_col
    active = b.cte(f"{cfg.name}__a",
                   f"SELECT DISTINCT {u}, "
                   f"epoch_us(CAST({t} AS TIMESTAMP)) // {_DAY_US} AS day "
                   f"FROM {src}")
    cohort = b.cte(f"{cfg.name}__c",
                   f"SELECT {u}, min(day) AS cohort_day FROM {active} "
                   f"GROUP BY {u}")
    return b.cte(
        cfg.name,
        f"SELECT c.cohort_day, a.day - c.cohort_day AS offset_day, "
        f"count(DISTINCT a.{u}) AS n_users "
        f"FROM {active} a JOIN {cohort} c USING ({u}) "
        f"GROUP BY c.cohort_day, a.day - c.cohort_day")


# -------------------------------------------------------- transitions --

@dataclass(frozen=True)
class TransitionMatrixConfig:
    """First-order event transition census (the Markov chain table):
    for each user's time-ordered stream, count (event, next event)
    pairs and row-normalize per from-state in ppm — the navigation /
    behavior-flow matrix product analytics derives funnels and
    anomaly baselines from. A user's final event transitions to the
    '<END>' absorbing state, so every event contributes exactly one
    transition and the per-from totals equal the event-type census.

    Determinism: the stream orders by (ts, id) — the id tie-break
    makes simultaneous events (duplicate timestamps are routine in
    real streams) order identically in both engines.

    Scale design (100 TB): ONE user-keyed exchange feeds the LEAD
    window (pinned in tests/test_plan_quality.py); the pair census is
    a map-side-combined groupBy on (from, to) — at most n_types^2 + 1
    rows out; the per-from normalization windows over that bounded
    census, never the corpus.
    """

    name: str
    source: str = "events"
    user_col: str = "user_id"
    ts_col: str = "ts"
    id_col: str = "event_id"
    type_col: str = "event_type"

    def __post_init__(self):
        for c in (self.user_col, self.ts_col, self.id_col, self.type_col):
            _ident(c, "column", self.name)


_END_STATE = "<END>"


def build_transition_matrix(spark, reg: Registry,
                            cfg: TransitionMatrixConfig,
                            g: GlobalConfig = DEFAULT) -> DataFrame:
    u, t, i, e = cfg.user_col, cfg.ts_col, cfg.id_col, cfg.type_col
    ev = reg.load(spark, cfg.source).select(u, t, i, e)
    w = Window.partitionBy(u).orderBy(F.asc(t), F.asc(i))
    pairs = ev.select(
        F.col(e).alias("from_event"),
        F.coalesce(F.lead(e).over(w), F.lit(_END_STATE)).alias("to_event"))
    census = (pairs.groupBy("from_event", "to_event")
              .agg(F.count(F.lit(1)).alias("n_transitions")))
    wf = Window.partitionBy("from_event")
    return census.select(
        "from_event", "to_event", "n_transitions",
        F.sum("n_transitions").over(wf).alias("from_total"),
        F.expr("(n_transitions * 1000000) div "
               "sum(n_transitions) OVER (PARTITION BY from_event)")
        .alias("p_ppm"))


def transition_matrix_oracle(b: SqlBuilder, reg: Registry,
                             cfg: TransitionMatrixConfig,
                             g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    u, t, i, e = cfg.user_col, cfg.ts_col, cfg.id_col, cfg.type_col
    pairs = b.cte(
        f"{cfg.name}__p",
        f"SELECT {e} AS from_event, "
        f"coalesce(lead({e}) OVER (PARTITION BY {u} "
        f"ORDER BY {t}, {i}), '{_END_STATE}') AS to_event FROM {src}")
    census = b.cte(
        f"{cfg.name}__c",
        f"SELECT from_event, to_event, count(*) AS n_transitions "
        f"FROM {pairs} GROUP BY from_event, to_event")
    return b.cte(
        cfg.name,
        f"SELECT from_event, to_event, n_transitions, "
        f"CAST(sum(n_transitions) OVER (PARTITION BY from_event) "
        f"AS BIGINT) AS from_total, "
        f"CAST((n_transitions * 1000000) // "
        f"sum(n_transitions) OVER (PARTITION BY from_event) AS BIGINT) "
        f"AS p_ppm "
        f"FROM {census}")


# ------------------------------------------------------------- gap fill --

@dataclass(frozen=True)
class LocfConfig:
    """Last-observation-carried-forward gap fill: per key in time
    order, a NULL observation takes the latest earlier non-NULL value
    (the sensor/price-series repair every time-series mart runs before
    aggregating; TimescaleDB calls it locf()). Leading NULLs (no
    earlier observation) stay NULL. ``value_expr`` is a SQL expression
    valid in both dialects — the observed value, NULL where missing.

    Determinism: (ts, id) ordering, the transition-matrix contract.

    Scale design (100 TB): ONE key-partitioned exchange; the fill is a
    single ``last(value, ignorenulls) OVER (... ROWS UNBOUNDED
    PRECEDING)`` running frame — no self-join, no per-gap probing. The
    is_filled flag is a scan-stage comparison on the same window
    output."""

    name: str
    source: str = "events"
    key_col: str = "user_id"
    ts_col: str = "ts"
    id_col: str = "event_id"
    value_expr: str = "value"
    out_col: str = "value_filled"

    def __post_init__(self):
        for c in (self.key_col, self.ts_col, self.id_col, self.out_col):
            _ident(c, "column", self.name)


def build_locf(spark, reg: Registry, cfg: LocfConfig,
               g: GlobalConfig = DEFAULT) -> DataFrame:
    k, t, i = cfg.key_col, cfg.ts_col, cfg.id_col
    src = reg.load(spark, cfg.source).selectExpr(
        k, t, i, f"({cfg.value_expr}) AS __obs")
    w = (Window.partitionBy(k).orderBy(F.asc(t), F.asc(i))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = F.last("__obs", ignorenulls=True).over(w)
    return src.select(
        k, t, i,
        filled.alias(cfg.out_col),
        (F.col("__obs").isNull() & filled.isNotNull()).alias("is_filled"))


def locf_oracle(b: SqlBuilder, reg: Registry, cfg: LocfConfig,
                g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    k, t, i = cfg.key_col, cfg.ts_col, cfg.id_col
    obs = b.cte(f"{cfg.name}__o",
                f"SELECT {k}, {t}, {i}, ({cfg.value_expr}) AS __obs "
                f"FROM {src}")
    win = (f"OVER (PARTITION BY {k} ORDER BY {t}, {i} "
           f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    return b.cte(
        cfg.name,
        f"SELECT {k}, {t}, {i}, "
        f"last_value(__obs IGNORE NULLS) {win} AS {cfg.out_col}, "
        f"(__obs IS NULL AND last_value(__obs IGNORE NULLS) {win} "
        f"IS NOT NULL) AS is_filled FROM {obs}")


# ---------------------------------------------------------- rolling agg --

@dataclass(frozen=True)
class RollingAggConfig:
    """Per-key rolling aggregates over the last ``n_rows`` observations
    (current row inclusive): running count, exact-cents sum, min and
    max — the trailing-window feature block (moving averages, burst
    detection, rate limits) every event/time-series pipeline computes.
    Row-count frames, not time frames: deterministic under duplicate
    timestamps via the (ts, id) tie-break, and both engines implement
    ROWS BETWEEN identically (RANGE frames over timestamps differ in
    type coercion across dialects).

    The mean stays OUT of the output: cents-sum and count are exact
    integers (the engine's cross-verification convention) and the mean
    is their pure function downstream.

    Scale design (100 TB): ONE key-partitioned exchange feeds all four
    frame aggregates (same window spec -> one Window operator, pinned
    in tests/test_plan_quality.py); a bounded ROWS frame holds at most
    n_rows values per evaluation, so memory is O(n_rows) regardless of
    key history length."""

    name: str
    source: str = "events"
    key_col: str = "user_id"
    ts_col: str = "ts"
    id_col: str = "event_id"
    value_expr: str = "value"
    n_rows: int = 5

    def __post_init__(self):
        for c in (self.key_col, self.ts_col, self.id_col):
            _ident(c, "column", self.name)
        if self.n_rows < 1:
            raise ValueError(f"{self.name}: n_rows must be >= 1")


def build_rolling_agg(spark, reg: Registry, cfg: RollingAggConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    k, t, i = cfg.key_col, cfg.ts_col, cfg.id_col
    src = reg.load(spark, cfg.source).selectExpr(
        k, t, i,
        f"CAST(round(({cfg.value_expr}) * 100) AS BIGINT) AS __cents")
    w = (Window.partitionBy(k).orderBy(F.asc(t), F.asc(i))
         .rowsBetween(-(cfg.n_rows - 1), Window.currentRow))
    return src.select(
        k, t, i,
        F.count(F.lit(1)).over(w).alias("roll_n"),
        F.sum("__cents").over(w).alias("roll_sum_cents"),
        F.min("__cents").over(w).alias("roll_min_cents"),
        F.max("__cents").over(w).alias("roll_max_cents"))


def rolling_agg_oracle(b: SqlBuilder, reg: Registry, cfg: RollingAggConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    k, t, i = cfg.key_col, cfg.ts_col, cfg.id_col
    obs = b.cte(
        f"{cfg.name}__o",
        f"SELECT {k}, {t}, {i}, "
        f"CAST(round(({cfg.value_expr}) * 100) AS BIGINT) AS __cents "
        f"FROM {src}")
    win = (f"OVER (PARTITION BY {k} ORDER BY {t}, {i} ROWS BETWEEN "
           f"{cfg.n_rows - 1} PRECEDING AND CURRENT ROW)")
    return b.cte(
        cfg.name,
        f"SELECT {k}, {t}, {i}, "
        f"count(*) {win} AS roll_n, "
        f"CAST(sum(__cents) {win} AS BIGINT) AS roll_sum_cents, "
        f"min(__cents) {win} AS roll_min_cents, "
        f"max(__cents) {win} AS roll_max_cents FROM {obs}")


# ------------------------------------------------------------- OHLC bars --

@dataclass(frozen=True)
class OhlcBarsConfig:
    """Open/high/low/close time bars: per (group, fixed-width time
    bucket), the first and last observed value in (ts, id) order plus
    the extremes, count and exact-cents sum — the candlestick /
    downsampling primitive every time-series store ships (TimescaleDB
    ``time_bucket`` + ``first``/``last``, kdb+ bar queries). Bars are
    epoch-aligned integer buckets (epoch-micros div width), so both
    engines bucket identically; ``bar_start`` surfaces as a timestamp
    reconstructed from the bucket number.

    Values fold as exact integer cents (the rolling_agg contract);
    open/close are deterministic under duplicate timestamps via the
    (ts, id) tie-break.

    Scale design (100 TB): ONE map-side-combined aggregate — open and
    close ride as min/max over the lexicographic (ts, id, cents)
    struct, so the whole bar is a single HashAggregate pair with NO
    sort windows (pinned in tests/test_plan_quality.py). The partials
    are MERGEABLE (``ohlc_merge``): the streaming twin
    (streaming/ohlc.py) combines per-micro-batch partials into the
    identical bars, so backfill and live feed cannot drift. Bars are
    census-sized output (groups x time-range/width), never
    corpus-sized. The oracle formulates open/close independently
    (row_number marks), cross-checking the struct-extremum identity."""

    name: str
    source: str = "events"
    group_col: str = "event_type"
    ts_col: str = "ts"
    id_col: str = "event_id"
    value_expr: str = "value"
    bar_seconds: int = 3600

    def __post_init__(self):
        for c in (self.group_col, self.ts_col, self.id_col):
            _ident(c, "column", self.name)
        if self.bar_seconds < 1:
            raise ValueError(f"{self.name}: bar_seconds must be >= 1")


def ohlc_partial(df: DataFrame, cfg: OhlcBarsConfig) -> DataFrame:
    """Per-(group, bar) MERGEABLE partial: counts/sums/extremes plus
    the open/close carried as lexicographic-extremum (ts, id, cents)
    structs. ``df`` must carry (group_col, ts, id, bar, __cents)."""
    gc, t, i = cfg.group_col, cfg.ts_col, cfg.id_col
    key = F.struct(F.col(t).alias("__t"), F.col(i).alias("__i"),
                   F.col("__cents").alias("__c"))
    return df.groupBy(gc, "bar").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__cents").alias("sum_cents"),
        F.min("__cents").alias("low_cents"),
        F.max("__cents").alias("high_cents"),
        F.min(key).alias("__open_s"),
        F.max(key).alias("__close_s"))


def ohlc_merge(partials: DataFrame, cfg: OhlcBarsConfig) -> DataFrame:
    """Combine partials (same shape as :func:`ohlc_partial` output)."""
    return partials.groupBy(cfg.group_col, "bar").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("low_cents").alias("low_cents"),
        F.max("high_cents").alias("high_cents"),
        F.min("__open_s").alias("__open_s"),
        F.max("__close_s").alias("__close_s"))


def ohlc_finalize(partial: DataFrame, cfg: OhlcBarsConfig) -> DataFrame:
    width_us = cfg.bar_seconds * 1_000_000
    return partial.select(
        cfg.group_col, "bar", "n_events", "sum_cents",
        "low_cents", "high_cents",
        F.col("__open_s.__c").alias("open_cents"),
        F.col("__close_s.__c").alias("close_cents"),
        F.expr(f"timestamp_micros(bar * {width_us})").alias("bar_start"))


def _ohlc_input(df: DataFrame, cfg: OhlcBarsConfig) -> DataFrame:
    width_us = cfg.bar_seconds * 1_000_000
    return df.selectExpr(
        cfg.group_col, cfg.ts_col, cfg.id_col,
        f"unix_micros(CAST({cfg.ts_col} AS TIMESTAMP)) div {width_us} "
        f"AS bar",
        f"CAST(round(({cfg.value_expr}) * 100) AS BIGINT) AS __cents")


def build_ohlc_bars(spark, reg: Registry, cfg: OhlcBarsConfig,
                    g: GlobalConfig = DEFAULT) -> DataFrame:
    src = _ohlc_input(reg.load(spark, cfg.source), cfg)
    return ohlc_finalize(ohlc_partial(src, cfg), cfg)


def ohlc_bars_oracle(b: SqlBuilder, reg: Registry, cfg: OhlcBarsConfig,
                     g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    gc, t, i = cfg.group_col, cfg.ts_col, cfg.id_col
    width_us = cfg.bar_seconds * 1_000_000
    obs = b.cte(
        f"{cfg.name}__o",
        f"SELECT {gc}, {t}, {i}, "
        f"epoch_us(CAST({t} AS TIMESTAMP)) // {width_us} AS bar, "
        f"CAST(round(({cfg.value_expr}) * 100) AS BIGINT) AS __cents "
        f"FROM {src}")
    marked = b.cte(
        f"{cfg.name}__m",
        f"SELECT {gc}, bar, __cents, "
        f"row_number() OVER (PARTITION BY {gc}, bar "
        f"ORDER BY {t}, {i}) AS __rn_a, "
        f"row_number() OVER (PARTITION BY {gc}, bar "
        f"ORDER BY {t} DESC, {i} DESC) AS __rn_d FROM {obs}")
    return b.cte(
        cfg.name,
        f"SELECT {gc}, bar, count(*) AS n_events, "
        f"CAST(sum(__cents) AS BIGINT) AS sum_cents, "
        f"min(__cents) AS low_cents, max(__cents) AS high_cents, "
        f"max(CASE WHEN __rn_a = 1 THEN __cents END) AS open_cents, "
        f"max(CASE WHEN __rn_d = 1 THEN __cents END) AS close_cents, "
        f"make_timestamp(bar * {width_us}) AS bar_start "
        f"FROM {marked} GROUP BY {gc}, bar")


# ------------------------------------------------------- attribution --

@dataclass(frozen=True)
class AttributionConfig:
    """Last-touch attribution: each conversion event is credited to the
    most recent PRECEDING non-conversion event of the same user — the
    marketing-attribution primitive (GA4 calls the model "last click").
    Conversions with no earlier touch surface with NULL attribution
    (the direct-traffic bucket); ``lag_us`` is the integer microsecond
    gap between touch and conversion.

    Determinism: (ts, id) stream order, the transition-matrix
    contract; a conversion at the exact timestamp of a touch orders by
    id, and the frame excludes the current row.

    Scale design (100 TB): ONE user-keyed exchange; the credited touch
    is a single ``last(CASE..., ignorenulls) OVER (ROWS UNBOUNDED
    PRECEDING .. 1 PRECEDING)`` running frame — no self-join, no as-of
    probe (the same running-frame shape as locf)."""

    name: str
    source: str = "events"
    user_col: str = "user_id"
    ts_col: str = "ts"
    id_col: str = "event_id"
    type_col: str = "event_type"
    conversion_type: str = "purchase"

    def __post_init__(self):
        for c in (self.user_col, self.ts_col, self.id_col, self.type_col):
            _ident(c, "column", self.name)
        if "'" in self.conversion_type:
            raise ValueError(f"{self.name}: conversion_type must not "
                             f"contain quotes")


def build_attribution(spark, reg: Registry, cfg: AttributionConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    u, t, i, e = cfg.user_col, cfg.ts_col, cfg.id_col, cfg.type_col
    src = reg.load(spark, cfg.source).select(u, t, i, e)
    w = (Window.partitionBy(u).orderBy(F.asc(t), F.asc(i))
         .rowsBetween(Window.unboundedPreceding, -1))
    is_touch = F.col(e) != F.lit(cfg.conversion_type)
    touch_type = F.last(F.when(is_touch, F.col(e)),
                        ignorenulls=True).over(w)
    touch_ts = F.last(F.when(is_touch, F.col(t)),
                      ignorenulls=True).over(w)
    return (src.select(
        u, t, i, e,
        touch_type.alias("touch_type"),
        touch_ts.alias("touch_ts"))
        .filter(F.col(e) == F.lit(cfg.conversion_type))
        .selectExpr(i, u, t, "touch_type", "touch_ts",
                    f"unix_micros(CAST({t} AS TIMESTAMP)) - "
                    f"unix_micros(CAST(touch_ts AS TIMESTAMP)) AS lag_us"))


def attribution_oracle(b: SqlBuilder, reg: Registry,
                       cfg: AttributionConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    u, t, i, e = cfg.user_col, cfg.ts_col, cfg.id_col, cfg.type_col
    win = (f"OVER (PARTITION BY {u} ORDER BY {t}, {i} "
           f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)")
    conv = f"'{cfg.conversion_type}'"
    marked = b.cte(
        f"{cfg.name}__m",
        f"SELECT {u}, {t}, {i}, {e}, "
        f"last_value(CASE WHEN {e} <> {conv} THEN {e} END IGNORE NULLS) "
        f"{win} AS touch_type, "
        f"last_value(CASE WHEN {e} <> {conv} THEN {t} END IGNORE NULLS) "
        f"{win} AS touch_ts FROM {src}")
    return b.cte(
        cfg.name,
        f"SELECT {i}, {u}, {t}, touch_type, touch_ts, "
        f"epoch_us(CAST({t} AS TIMESTAMP)) - "
        f"epoch_us(CAST(touch_ts AS TIMESTAMP)) AS lag_us "
        f"FROM {marked} WHERE {e} = {conv}")


# ------------------------------------------------------ conversion paths --

@dataclass(frozen=True)
class ConversionPathConfig:
    """Multi-touch conversion paths: for each conversion event, the
    ordered sequence of the user's preceding touch types, truncated to
    the most recent ``max_touches`` — the path-to-conversion table
    behind every journey/Sankey report and the input to data-driven
    (Shapley/Markov) attribution models. Completes the family:
    event_funnel (declared steps), events_last_touch (single credit),
    event_transitions (first-order hops).

    Determinism: (ts, id) stream order; conversions are excluded from
    paths (a purchase is not a touch); the path string joins with '>'
    (touch types must not contain it — validated).

    Scale design (100 TB): the touch history is assembled WITHOUT any
    unbounded list accumulation (r9 verdict: a running ``collect_list``
    frame grows O(touches) state per row — quadratic list cells for a
    10^5-touch power user). Instead: one user-keyed window computes a
    running O(1) COUNT of prior touches (``cnt`` at conversions, the
    touch's own ordinal at touches); each conversion then explodes into
    its <= ``max_touches`` needed ordinals and equi-joins the touch
    level on (user, ordinal). Per-row window state is a single counter;
    join fan-out is conversions x max_touches, never the full history.
    The two window branches share one exchange subtree (ReusedExchange
    dedupes the identical scan->exchange below the filters)."""

    name: str
    source: str = "events"
    user_col: str = "user_id"
    ts_col: str = "ts"
    id_col: str = "event_id"
    type_col: str = "event_type"
    conversion_type: str = "purchase"
    max_touches: int = 5

    def __post_init__(self):
        for c in (self.user_col, self.ts_col, self.id_col, self.type_col):
            _ident(c, "column", self.name)
        if "'" in self.conversion_type or ">" in self.conversion_type:
            raise ValueError(f"{self.name}: conversion_type must not "
                             f"contain quotes or '>'")
        if self.max_touches < 1:
            raise ValueError(f"{self.name}: max_touches must be >= 1")


def build_conversion_paths(spark, reg: Registry,
                           cfg: ConversionPathConfig,
                           g: GlobalConfig = DEFAULT) -> DataFrame:
    u, t, i, e = cfg.user_col, cfg.ts_col, cfg.id_col, cfg.type_col
    src = reg.load(spark, cfg.source).select(u, t, i, e)
    w = (Window.partitionBy(u).orderBy(F.asc(t), F.asc(i))
         .rowsBetween(Window.unboundedPreceding, -1))
    conv = F.lit(cfg.conversion_type)
    n = cfg.max_touches
    # running count of PRIOR touches: O(1) window state (incremental
    # aggregate over an unbounded-preceding frame), never a list
    cnt = F.count(F.when(F.col(e) != conv, F.lit(1))).over(w)
    base = src.select(u, t, i, e, cnt.alias("__cnt"))
    # touch level: ordinal = prior-touch count + 1
    touches = (base.filter(F.col(e) != conv)
               .select(F.col(u), (F.col("__cnt") + 1).alias("__tidx"),
                       F.col(e).alias("__ttype")))
    # conversion level: full history length is the counter itself;
    # each conversion needs only ordinals (cnt-n+1 .. cnt)
    convs = (base.filter(F.col(e) == conv)
             .select(i, u, t, F.col("__cnt")
                     .cast("int").alias("n_touches")))
    need = convs.select(
        i, u, t, "n_touches",
        F.explode_outer(F.when(
            F.col("n_touches") > 0,
            F.sequence(
                F.greatest(F.col("n_touches") - (n - 1), F.lit(1))
                .cast("long"),
                F.col("n_touches").cast("long")))).alias("__tidx"))
    joined = need.join(touches, [u, "__tidx"], "left")
    # zero-touch conversions carry a NULL __ttype row: the when() guard
    # keeps them out of the list, array_join on [] yields '' (the
    # direct-conversion contract)
    return (joined.groupBy(i, u, t, "n_touches")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.when(
                        F.col("__ttype").isNotNull(),
                        F.struct(F.col("__tidx").alias("o"),
                                 F.col("__ttype").alias("v"))))),
                    lambda s: s["v"]),
                ">").alias("path"))
            .select(i, u, t, "n_touches", "path"))


def conversion_paths_oracle(b: SqlBuilder, reg: Registry,
                            cfg: ConversionPathConfig,
                            g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    u, t, i, e = cfg.user_col, cfg.ts_col, cfg.id_col, cfg.type_col
    conv = f"'{cfg.conversion_type}'"
    n = cfg.max_touches
    marked = b.cte(
        f"{cfg.name}__m",
        f"SELECT {u}, {t}, {i}, {e}, "
        # an empty frame aggregates to NULL in DuckDB (Spark's
        # collect_list yields []) — coalesce to the empty list
        f"list_filter(coalesce(list(CASE WHEN {e} <> {conv} "
        f"THEN {e} END) "
        f"OVER (PARTITION BY {u} ORDER BY {t}, {i} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), []), "
        f"x -> x IS NOT NULL) AS __touches FROM {src}")
    return b.cte(
        cfg.name,
        f"SELECT {i}, {u}, {t}, "
        f"CAST(len(__touches) AS INT) AS n_touches, "
        # array_to_string on an empty list is NULL in DuckDB; Spark's
        # array_join gives '' — coalesce to the Spark contract
        f"coalesce(array_to_string(__touches["
        f"greatest(len(__touches) - {n - 1}, 1):"
        f"greatest(len(__touches) - {n - 1}, 1) + {n - 1}], '>'), '') "
        f"AS path "
        f"FROM {marked} WHERE {e} = {conv}")


# -------------------------------------------------------- active users --

@dataclass(frozen=True)
class ActiveUsersConfig:
    """Daily + rolling-window distinct active users (DAU / WAU-style):
    for every day with activity, the exact count of distinct users
    active that day and within the trailing ``window_days`` — the
    engagement table every product/ops dashboard leads with. Exact
    counts, not HLL sketches (the dataset-profile contract: a number
    that cannot be reproduced on a second engine is not a verification
    artifact).

    A rolling DISTINCT cannot ride a window frame (distinct does not
    decompose); the exact formulation reduces the corpus to the
    distinct (day, user) level ONCE, then fans each pair out to the
    ``window_days`` trailing days it contributes to — bounded
    ``window_days``x growth of the PAIR level (already
    corpus-compressed), never of the raw events. Days with zero
    activity are absent (their trailing window is still observable
    from neighboring rows; emitting them would need a spine join the
    caller can do).

    Scale design (100 TB): one exchange for the (day, user) distinct,
    one for the fanned-out (window-end-day, user) distinct, one
    map-side-combined count per day — all census-level after the first
    reduction. ``window_days`` is validated small (<= 92).

    Determinism: epoch-day integer buckets (the cohort-retention
    contract)."""

    name: str
    source: str = "events"
    user_col: str = "user_id"
    ts_col: str = "ts"
    window_days: int = 7

    def __post_init__(self):
        for c in (self.user_col, self.ts_col):
            _ident(c, "column", self.name)
        if not 1 <= self.window_days <= 92:
            raise ValueError(
                f"{self.name}: window_days must be in [1, 92] — the "
                f"fan-out is window_days x the (day, user) level")


def build_active_users(spark, reg: Registry, cfg: ActiveUsersConfig,
                       g: GlobalConfig = DEFAULT) -> DataFrame:
    u, t = cfg.user_col, cfg.ts_col
    pairs = (reg.load(spark, cfg.source)
             .selectExpr(
                 u,
                 f"unix_micros(CAST({t} AS TIMESTAMP)) div {_DAY_US} "
                 f"AS day")
             .distinct())
    dau = pairs.groupBy("day").agg(
        F.countDistinct(u).alias("dau"))
    w = cfg.window_days
    rolling = (pairs.selectExpr(
        u, f"explode(sequence(day, day + {w - 1})) AS day")
        .distinct()
        .groupBy("day")
        .agg(F.countDistinct(u).alias("rolling_au")))
    # inner join: only days with same-day activity surface (see doc)
    return dau.join(rolling, "day", "inner").select(
        "day", "dau", "rolling_au")


def active_users_oracle(b: SqlBuilder, reg: Registry,
                        cfg: ActiveUsersConfig,
                        g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    u, t = cfg.user_col, cfg.ts_col
    w = cfg.window_days
    pairs = b.cte(
        f"{cfg.name}__p",
        f"SELECT DISTINCT {u}, "
        f"epoch_us(CAST({t} AS TIMESTAMP)) // {_DAY_US} AS day "
        f"FROM {src}")
    dau = b.cte(f"{cfg.name}__d",
                f"SELECT day, count(DISTINCT {u}) AS dau FROM {pairs} "
                f"GROUP BY day")
    rolling = b.cte(
        f"{cfg.name}__r",
        f"SELECT day + o.o AS day, count(DISTINCT {u}) AS rolling_au "
        f"FROM {pairs}, (SELECT unnest(generate_series(0, {w - 1})) "
        f"AS o) o GROUP BY day + o.o")
    return b.cte(
        cfg.name,
        f"SELECT d.day, d.dau, r.rolling_au "
        f"FROM {dau} d JOIN {rolling} r USING (day)")
