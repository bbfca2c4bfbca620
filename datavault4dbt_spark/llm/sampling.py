"""Corpus sampling operators: weighted dataset mixing and sequence
packing.

- ``dataset_mix`` : deterministic weighted stratified sampling — the
  "mix web 30% / code 50% / books 100%" step of assembling a training
  corpus (Gao et al. 2020, The Pile §1; every modern data recipe).
  Each document draws a uniform u in [0, 1) from md5 of its id (a
  salted hash, NOT rand() — reruns and both engines agree bit-for-bit)
  and survives iff u < weight(stratum).
- ``sequence_packing`` : pack documents into fixed token-budget bins
  (context-window packing for LLM training). Documents are streamed in
  id order within ``n_shards`` deterministic shards; a document starts
  in the bin numbered by the tokens accumulated before it
  (``floor(prefix_sum_before / budget)``), so bins fill greedily and
  may overflow by at most one document — the standard scalable
  approximation of first-fit (exact greedy is inherently sequential).

Scale design (100 TB): dataset_mix is zero-shuffle — hash, weight
lookup and filter all live in the scan stage, so it composes with
partition pruning and runs at scan speed. sequence_packing's only
shuffle is the per-shard prefix-sum window; shards bound the window's
partition size (n_shards ~ cluster parallelism), so no single reducer
ever sees the whole corpus, and the final per-bin aggregation keys on
(shard, bin) with map-side combine.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder
from .textprep import spark_tokens, duck_tokens, spark_nibble


def _u01(id_col: str, salt: str) -> str:
    """Uniform [0, 1) from the first 16 bits of md5(salt:id) — the
    expression text is valid and equivalent in Spark SQL and DuckDB
    (md5/substr/instr/CAST all agree)."""
    h = f"md5(concat('{salt}:', CAST({id_col} AS STRING)))"
    u16 = "0"
    for i in range(1, 5):
        u16 = f"({u16} * 16 + {spark_nibble(f'substr({h}, {i}, 1)')})"
    # CAST, not a 65536.0 literal: Spark parses x.0 literals as DECIMAL
    # and int/DECIMAL division truncates to scale 7 before rounding
    # (0.7447815 -> 0.744782), while DuckDB reads the same literal as
    # DOUBLE (0.744781494 -> 0.744781)
    return f"({u16} / CAST(65536 AS DOUBLE))"


# --------------------------------------------------------- dataset_mix --

@dataclass(frozen=True)
class DatasetMixConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    strata_col: str = "lang"
    weights: tuple = (("en", 0.9), ("de", 0.6), ("es", 0.3))
    default_weight: float = 0.1
    salt: str = "mix"


def _mix_checks(cfg: DatasetMixConfig) -> None:
    """Portability contract (mirrors scrub._pii_checks): strata values
    and the strata column are interpolated into SQL text that must
    parse identically in Spark SQL and DuckDB, so quotes/backslashes
    are rejected up front instead of producing divergent SQL."""
    import re as _re

    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", cfg.strata_col):
        raise ValueError(
            f"{cfg.name}: strata_col {cfg.strata_col!r} must be a plain "
            f"identifier — it is interpolated into both dialects' SQL")
    for s, w in cfg.weights:
        if "'" in s or "\\" in s:
            raise ValueError(
                f"{cfg.name}: stratum {s!r} violates the portability "
                f"contract (quote/backslash) — it becomes a SQL string "
                f"literal in both dialects")
        if not 0.0 <= float(w) <= 1.0:
            raise ValueError(
                f"{cfg.name}: weight for {s!r} must be in [0, 1], got {w}")


def _weight_case(cfg: DatasetMixConfig) -> str:
    _mix_checks(cfg)
    whens = " ".join(f"WHEN '{s}' THEN CAST({w} AS DOUBLE)"
                     for s, w in cfg.weights)
    return (f"CASE {cfg.strata_col} {whens} "
            f"ELSE CAST({cfg.default_weight} AS DOUBLE) END")


def build_dataset_mix(spark, reg: Registry, cfg: DatasetMixConfig,
                      g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    u = _u01(cfg.id_col, cfg.salt)
    return (df.selectExpr(cfg.id_col, cfg.strata_col,
                          f"{u} AS u_sample",
                          f"{_weight_case(cfg)} AS sample_weight")
            .filter("u_sample < sample_weight")
            .selectExpr(cfg.id_col, cfg.strata_col,
                        "round(u_sample, 6) AS u_sample", "sample_weight"))


def dataset_mix_oracle(b: SqlBuilder, reg: Registry, cfg: DatasetMixConfig,
                       g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    u = _u01(cfg.id_col, cfg.salt)
    t = b.cte(f"{cfg.name}__u",
              f"SELECT {cfg.id_col}, {cfg.strata_col}, {u} AS u_sample, "
              f"{_weight_case(cfg)} AS sample_weight FROM {src}")
    return b.cte(cfg.name,
                 f"SELECT {cfg.id_col}, {cfg.strata_col}, "
                 f"round(u_sample, 6) AS u_sample, sample_weight "
                 f"FROM {t} WHERE u_sample < sample_weight")


# ----------------------------------------------------- sequence_packing --

def _shard_expr(id_col: str, n_shards: int) -> str:
    """Deterministic non-negative shard — identical text in both
    dialects; shared by the bin rollup and the manifest so the two
    views CANNOT diverge."""
    return f"((({id_col}) % {n_shards}) + {n_shards}) % {n_shards}"


def _bin_expr(budget: int) -> str:
    """Bin from the tokens accumulated before the document (column
    ``cum`` = inclusive prefix sum, ``n_tok`` = this doc) — shared by
    both packing views and both dialects."""
    return (f"CAST(floor((cum - n_tok) / CAST({budget} AS DOUBLE)) "
            f"AS BIGINT)")


def _spark_cum(df, id_col: str, text_col: str, budget: int,
               n_shards: int):
    t = df.selectExpr(id_col, f"{_shard_expr(id_col, n_shards)} AS shard",
                      f"size({spark_tokens(text_col)}) AS n_tok")
    return t.selectExpr(
        id_col, "shard", "n_tok",
        f"sum(n_tok) OVER (PARTITION BY shard ORDER BY {id_col} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum")


def _duck_cum(b: SqlBuilder, src: str, name: str, id_col: str,
              text_col: str, n_shards: int) -> str:
    t = b.cte(f"{name}__t",
              f"SELECT {id_col}, {_shard_expr(id_col, n_shards)} AS shard, "
              f"len({duck_tokens(text_col)}) AS n_tok FROM {src}")
    return b.cte(
        f"{name}__cum",
        f"SELECT {id_col}, shard, n_tok, "
        f"sum(n_tok) OVER (PARTITION BY shard ORDER BY {id_col} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
        f"FROM {t}")


@dataclass(frozen=True)
class SequencePackingConfig:
    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    budget: int = 256        # tokens per bin (context window)
    n_shards: int = 8        # independent packing streams


def build_sequence_packing(spark, reg: Registry, cfg: SequencePackingConfig,
                           g: GlobalConfig = DEFAULT) -> DataFrame:
    cum = _spark_cum(reg.load(spark, cfg.source), cfg.id_col, cfg.text_col,
                     cfg.budget, cfg.n_shards)
    binned = cum.selectExpr(
        cfg.id_col, "shard", "n_tok",
        f"{_bin_expr(cfg.budget)} AS bin")
    return (binned.groupBy("shard", "bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.expr("CAST(sum(n_tok) AS BIGINT)").alias("bin_tokens"),
                 F.min(cfg.id_col).alias("first_doc"))
            .selectExpr("shard", "bin", "n_docs", "bin_tokens", "first_doc",
                        f"bin_tokens >= {cfg.budget} AS is_full"))


def sequence_packing_oracle(b: SqlBuilder, reg: Registry,
                            cfg: SequencePackingConfig,
                            g: GlobalConfig = DEFAULT) -> str:
    cum = _duck_cum(b, reg.duckdb_relation(cfg.source), cfg.name,
                    cfg.id_col, cfg.text_col, cfg.n_shards)
    binned = b.cte(
        f"{cfg.name}__bin",
        f"SELECT {cfg.id_col}, shard, n_tok, "
        f"{_bin_expr(cfg.budget)} AS bin "
        f"FROM {cum}")
    agg = b.cte(
        f"{cfg.name}__agg",
        f"SELECT shard, bin, count(*) AS n_docs, "
        f"CAST(sum(n_tok) AS BIGINT) AS bin_tokens, "
        f"min({cfg.id_col}) AS first_doc "
        f"FROM {binned} GROUP BY shard, bin")
    return b.cte(
        cfg.name,
        f"SELECT shard, bin, n_docs, bin_tokens, first_doc, "
        f"bin_tokens >= {cfg.budget} AS is_full FROM {agg}")


# ---------------------------------------------------- packing_manifest --

@dataclass(frozen=True)
class PackingManifestConfig:
    """Per-document packing assignments — the artifact a training data
    loader actually consumes (which context-window bin each document
    lands in, and at what token offset), where ``sequence_packing``
    reports the per-bin rollup. Same boundary-assignment rule, same
    shards; the two views are consistent by construction."""

    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    text_col: str = "text"
    budget: int = 256
    n_shards: int = 8


def build_packing_manifest(spark, reg: Registry, cfg: PackingManifestConfig,
                           g: GlobalConfig = DEFAULT) -> DataFrame:
    """``stream_offset_tokens`` is the document's start in the shard's
    token stream; ``bin_offset_tokens`` is its start WITHIN the
    assigned bin (stream offset minus the bin's base) — the position a
    loader writes the document at inside the context window."""
    cum = _spark_cum(reg.load(spark, cfg.source), cfg.id_col, cfg.text_col,
                     cfg.budget, cfg.n_shards)
    return (cum.selectExpr(
                cfg.id_col, "shard", "n_tok",
                "cum - n_tok AS stream_offset_tokens",
                f"{_bin_expr(cfg.budget)} AS bin")
            .selectExpr(cfg.id_col, "shard", "n_tok", "bin",
                        "stream_offset_tokens",
                        f"stream_offset_tokens - bin * {cfg.budget} "
                        f"AS bin_offset_tokens"))


def packing_manifest_oracle(b: SqlBuilder, reg: Registry,
                            cfg: PackingManifestConfig,
                            g: GlobalConfig = DEFAULT) -> str:
    cum = _duck_cum(b, reg.duckdb_relation(cfg.source), cfg.name,
                    cfg.id_col, cfg.text_col, cfg.n_shards)
    off = b.cte(
        f"{cfg.name}__off",
        f"SELECT {cfg.id_col}, shard, n_tok, "
        f"CAST(cum - n_tok AS BIGINT) AS stream_offset_tokens, "
        f"{_bin_expr(cfg.budget)} AS bin FROM {cum}")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, shard, n_tok, bin, stream_offset_tokens, "
        f"stream_offset_tokens - bin * {cfg.budget} AS bin_offset_tokens "
        f"FROM {off}")


# -------------------------------------------------------- corpus_shuffle --

@dataclass(frozen=True)
class CorpusShuffleConfig:
    """Deterministic seeded global shuffle + sharding: every document
    gets a 48-bit key from ``md5(salt:id)``, a shard (``key %
    n_shards``), and its position within the shard's key order — the
    reproducible data-ordering step before writing training shards
    (the same examples land in the same shard at the same offset on
    every rerun, so a training run is replayable from any step; cf.
    the deterministic shuffles of T5/GPT data pipelines).

    Scale design (100 TB): the key is scan-stage integer arithmetic
    over md5 nibbles (no DOUBLE, no rand()); the only shuffle IS the
    shuffle — one hash exchange on ``shard`` with a per-shard sort for
    ``row_number`` (exactly the exchange a shard writer pays anyway;
    n_shards scales with the cluster so no reducer sees more than
    corpus/n_shards rows). Shard skew is bounded by the 48-bit hash's
    uniformity."""

    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    n_shards: int = 8
    salt: str = "shuffle"

    def __post_init__(self):
        if self.n_shards < 1:
            raise ValueError(f"{self.name}: n_shards must be >= 1")
        if "'" in self.salt or "\\" in self.salt:
            raise ValueError(f"{self.name}: salt must not contain "
                             f"quotes/backslashes (SQL literal)")


def _shuffle_key(id_col: str, salt: str) -> str:
    """48-bit BIGINT from the first 12 md5 nibbles — exact integer in
    both dialects (no DOUBLE forms; 48 bits < 2^53 keeps every
    intermediate product inside BIGINT)."""
    h = f"md5(concat('{salt}:', CAST({id_col} AS STRING)))"
    key = "CAST(0 AS BIGINT)"
    for i in range(1, 13):
        key = f"({key} * 16 + {spark_nibble(f'substr({h}, {i}, 1)')})"
    return key


def build_corpus_shuffle(spark, reg: Registry, cfg: CorpusShuffleConfig,
                         g: GlobalConfig = DEFAULT) -> DataFrame:
    from pyspark.sql import Window

    df = reg.load(spark, cfg.source)
    keyed = df.selectExpr(
        cfg.id_col,
        f"{_shuffle_key(cfg.id_col, cfg.salt)} AS shuffle_key")
    keyed = keyed.selectExpr(
        cfg.id_col, "shuffle_key",
        f"CAST(shuffle_key % {cfg.n_shards} AS INT) AS shard")
    w = (Window.partitionBy("shard")
         .orderBy(F.asc("shuffle_key"), F.asc(cfg.id_col)))
    return keyed.select(
        cfg.id_col, "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
        "shuffle_key")


def corpus_shuffle_oracle(b: SqlBuilder, reg: Registry,
                          cfg: CorpusShuffleConfig,
                          g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    keyed = b.cte(
        f"{cfg.name}__k",
        f"SELECT {cfg.id_col}, "
        f"{_shuffle_key(cfg.id_col, cfg.salt)} AS shuffle_key "
        f"FROM {src}")
    sharded = b.cte(
        f"{cfg.name}__s",
        f"SELECT {cfg.id_col}, shuffle_key, "
        f"CAST(shuffle_key % {cfg.n_shards} AS INT) AS shard "
        f"FROM {keyed}")
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, shard, "
        f"CAST(row_number() OVER (PARTITION BY shard "
        f"ORDER BY shuffle_key, {cfg.id_col}) AS BIGINT) AS pos, "
        f"shuffle_key FROM {sharded}")


# ----------------------------------------------------- temperature_mix --

_ALPHA_EXPRS = {
    # exactly-computable alpha surface: each form is a chain of
    # IEEE-754 correctly-rounded ops (division, sqrt), so the Spark
    # plan and the DuckDB oracle produce bit-identical DOUBLEs before
    # the fixed-point floor. Arbitrary pow(x, a) is a libm call with
    # engine-specific rounding and is deliberately NOT offered.
    "1": "({p})",
    "0.5": "sqrt({p})",
    "0.25": "sqrt(sqrt({p}))",
}


@dataclass(frozen=True)
class TemperatureMixConfig:
    """Temperature-based stratum rebalancing (XLM-R / mT5 alpha
    sampling): sample documents so the kept corpus' stratum shares
    follow ``p_s^alpha`` (normalized) instead of the natural ``p_s`` —
    the standard fix for high-resource strata drowning out the tail.
    ``budget_ppm`` is the overall keep fraction; a stratum whose
    boosted rate exceeds 1 is capped — a sampling gate can only keep.
    When the boosted strata must genuinely GAIN mass, use the
    repeat-expansion twin ``TemperatureResampleConfig`` below, which
    emits full copies instead of capping.

    Fixed-point contract: stratum weights are floored to parts-per-1e9
    immediately after the sqrt chain, so normalization, the rate
    formula and the keep decision are pure BIGINT arithmetic —
    order-independent and identical in both engines. Rates are ppm;
    a stratum with q*budget under 1 ppm rounds to rate 0 and drops.

    Scale design (100 TB): stratum stats are one map-side-combined
    groupBy (strata-count rows); the rate table is strata-sized and
    broadcast back; the keep decision is the same scan-stage salted
    md5 draw as dataset_mix — zero corpus-wide shuffles."""

    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    strata_col: str = "source"
    alpha: str = "0.5"
    budget_ppm: int = 1_000_000
    salt: str = "temp"
    # rate for documents whose stratum has NO row in the rate table —
    # only reachable on the STREAMING path (a stratum newer than the
    # nightly rate refresh, or a NULL stratum; the batch builder
    # derives rates from the same corpus it gates, so every stratum is
    # covered). Default keeps everything from unknown strata (the
    # conservative choice: tomorrow's rates resample them) rather than
    # silently dropping a brand-new source.
    unknown_rate_ppm: int = 1_000_000

    def __post_init__(self):
        if self.alpha not in _ALPHA_EXPRS:
            raise ValueError(
                f"{self.name}: alpha must be one of "
                f"{sorted(_ALPHA_EXPRS)} (exactly-computable surface)")
        for v, what in ((self.budget_ppm, "budget_ppm"),
                        (self.unknown_rate_ppm, "unknown_rate_ppm")):
            if not 0 <= v <= 1_000_000:
                raise ValueError(f"{self.name}: {what} must be 0..1e6")
        if "'" in self.salt or "\\" in self.salt:
            raise ValueError(f"{self.name}: salt must not contain "
                             f"quotes/backslashes (SQL literal)")


def _u16(id_col: str, salt: str) -> str:
    """Raw 16-bit draw (integer, no division) — the keep decision
    compares it cross-multiplied against the ppm rate. BIGINT seed:
    the cross-multiplication (* 1e6) overflows INT32 under ANSI."""
    h = f"md5(concat('{salt}:', CAST({id_col} AS STRING)))"
    u16 = "CAST(0 AS BIGINT)"
    for i in range(1, 5):
        u16 = f"({u16} * 16 + {spark_nibble(f'substr({h}, {i}, 1)')})"
    return u16


def _rate_exprs(cfg) -> tuple:
    """(w_ppb expr over (n_s, n_total), rate_ppm expr over
    (w_ppb, z, n_s, n_total)) — valid verbatim in both dialects.

    The rate cap is ``max_repeats * 1e6`` ppm: 1e6 for the sampling
    gate (TemperatureMixConfig has no max_repeats — a gate can only
    keep), higher for the repeat-expansion resampler, whose rate > 1e6
    means "emit full copies"."""
    cap = int(getattr(cfg, "max_repeats", 1)) * 1_000_000
    p = f"(CAST(n_s AS DOUBLE) / CAST(n_total AS DOUBLE))"
    w = _ALPHA_EXPRS[cfg.alpha].format(p=p)
    w_ppb = (f"CAST(floor({w} * 1000000000) AS BIGINT)")
    # q_ppm = normalized weight; rate = budget * q / p, all integer:
    # ((q_ppm * budget_ppm) div 1e6) <= 1e6, * n_total stays in BIGINT
    # for corpora under ~9e12 tiles of the ppm grid
    rate = (f"least(CAST({cap} AS BIGINT), "
            f"((((w_ppb * 1000000) {{idiv}} z) * {cfg.budget_ppm}) "
            f"{{idiv}} 1000000) * n_total {{idiv}} n_s)")
    return w_ppb, rate


def temperature_rates_frame(df: DataFrame,
                            cfg: TemperatureMixConfig) -> DataFrame:
    """Per-stratum ppm rate table from a corpus frame — the static
    side the streaming gate broadcasts (streaming/curation.py),
    shared with the batch builder so the two paths cannot drift."""
    stats = (df.groupBy(cfg.strata_col)
             .agg(F.count(F.lit(1)).alias("n_s")))
    tot = stats.agg(F.sum("n_s").alias("n_total"))
    w_ppb, rate = _rate_exprs(cfg)
    w = (stats.crossJoin(F.broadcast(tot))
         .selectExpr(cfg.strata_col, "n_s", "n_total",
                     f"{w_ppb} AS w_ppb"))
    z = w.agg(F.sum("w_ppb").alias("z"))
    return (w.crossJoin(F.broadcast(z))
            .selectExpr(cfg.strata_col,
                        f"{rate.format(idiv=' div ')} AS rate_ppm"))


def temperature_gate_frame(docs: DataFrame, rates: DataFrame,
                           cfg: TemperatureMixConfig) -> DataFrame:
    """Keep decision against a precomputed rate table: broadcast join
    + the scan-stage salted-md5 draw. Stateless, so it runs unchanged
    inside a streaming micro-batch plan. LEFT join: a stratum with no
    rate row (streaming only — new source since the last rate refresh)
    gates at ``unknown_rate_ppm`` instead of silently vanishing."""
    u = _u16(cfg.id_col, cfg.salt)
    return (docs.join(F.broadcast(rates), [cfg.strata_col], "left")
            .selectExpr(cfg.id_col, cfg.strata_col,
                        f"coalesce(rate_ppm, {cfg.unknown_rate_ppm}) "
                        f"AS rate_ppm")
            .filter(F.expr(f"({u}) * 1000000 < rate_ppm * 65536")))


def build_temperature_mix(spark, reg: Registry, cfg: TemperatureMixConfig,
                          g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    return temperature_gate_frame(df, temperature_rates_frame(df, cfg),
                                  cfg)


def temperature_mix_oracle(b: SqlBuilder, reg: Registry,
                           cfg: TemperatureMixConfig,
                           g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    w_ppb, rate = _rate_exprs(cfg)
    stats = b.cte(f"{cfg.name}__s",
                  f"SELECT {cfg.strata_col}, count(*) AS n_s "
                  f"FROM {src} GROUP BY {cfg.strata_col}")
    # DuckDB's sum(BIGINT) widens to HUGEINT: CAST back so the integer
    # arithmetic (and the emitted rate's type) matches the Spark plan
    tot = b.cte(f"{cfg.name}__t",
                f"SELECT CAST(sum(n_s) AS BIGINT) AS n_total FROM {stats}")
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {cfg.strata_col}, n_s, n_total, {w_ppb} AS w_ppb "
              f"FROM {stats}, {tot}")
    z = b.cte(f"{cfg.name}__z",
              f"SELECT CAST(sum(w_ppb) AS BIGINT) AS z FROM {w}")
    rates = b.cte(
        f"{cfg.name}__r",
        f"SELECT {cfg.strata_col}, "
        f"{rate.format(idiv=' // ')} AS rate_ppm FROM {w}, {z}")
    u = _u16(f"d.{cfg.id_col}", cfg.salt)
    # LEFT + coalesce mirrors temperature_gate_frame: a NULL stratum
    # never equality-matches its rate row, so it gates at
    # unknown_rate_ppm in both engines
    return b.cte(
        cfg.name,
        f"SELECT d.{cfg.id_col}, d.{cfg.strata_col}, "
        f"coalesce(r.rate_ppm, {cfg.unknown_rate_ppm}) AS rate_ppm "
        f"FROM {src} d LEFT JOIN {rates} r "
        f"ON d.{cfg.strata_col} = r.{cfg.strata_col} "
        f"WHERE ({u}) * 1000000 < "
        f"coalesce(r.rate_ppm, {cfg.unknown_rate_ppm}) * 65536")


# ------------------------------------------------ temperature_resample --

@dataclass(frozen=True)
class TemperatureResampleConfig:
    """Temperature rebalancing WITH up-sampling (the real XLM-R / mT5
    alpha sampler): a stratum whose boosted rate exceeds 1 is not
    capped — its documents are REPEATED. Each document emits
    ``floor(rate)`` full copies plus one more with probability
    ``frac(rate)`` (the salted-md5 draw), so the expected stratum sizes
    follow ``p_s^alpha`` exactly and low-resource strata genuinely gain
    epochs — the operator a multilingual 100 TB mix needs where the
    sampling gate (TemperatureMixConfig) can only keep (its docstring
    documents that deviation; this closes it, round-8 advice #2).

    Output grain: one row per EMITTED COPY — (id, stratum, rate_ppm,
    repeat_idx 1..copies). Documents whose stratum rate rounds below
    their draw emit nothing. ``max_repeats`` bounds the full copies per
    document (the "max epochs per source" cap real recipes carry —
    Muennighoff 2023 finds ~4 repeat epochs retain most value), and
    caps the explode fan-out so no scan row can amplify unboundedly.

    Fixed-point contract: same ppm/ppb integer pipeline as the gate
    (shared ``_rate_exprs``), so both engines agree bit-for-bit.

    Scale design (100 TB): rates come from the same strata-sized
    map-side-combined census + broadcast as the gate; the copy count is
    scan-stage integer arithmetic; the explode multiplies rows AT THE
    SCAN with bounded fan-out (<= max_repeats + 1) and no shuffle —
    the output streams straight to the shard writer."""

    name: str
    source: str = "documents"
    id_col: str = "doc_id"
    strata_col: str = "source"
    alpha: str = "0.5"
    budget_ppm: int = 1_000_000
    salt: str = "tempr"
    max_repeats: int = 8

    def __post_init__(self):
        if self.alpha not in _ALPHA_EXPRS:
            raise ValueError(
                f"{self.name}: alpha must be one of "
                f"{sorted(_ALPHA_EXPRS)} (exactly-computable surface)")
        if not 0 <= self.budget_ppm <= 1_000_000:
            raise ValueError(f"{self.name}: budget_ppm must be 0..1e6")
        if self.max_repeats < 1:
            raise ValueError(f"{self.name}: max_repeats must be >= 1")
        if "'" in self.salt or "\\" in self.salt:
            raise ValueError(f"{self.name}: salt must not contain "
                             f"quotes/backslashes (SQL literal)")


def _copies_expr(cfg: TemperatureResampleConfig, id_col: str,
                 idiv: str) -> str:
    """Emitted-copy count over a joined ``rate_ppm`` column: the whole
    part plus a fractional salted draw — pure BIGINT, identical text in
    both dialects (modulo the integer-division spelling)."""
    u = _u16(id_col, cfg.salt)
    return (f"CAST((rate_ppm{idiv}1000000) + "
            f"(CASE WHEN ({u}) * 1000000 < (rate_ppm % 1000000) * 65536 "
            f"THEN 1 ELSE 0 END) AS BIGINT)")


def build_temperature_resample(spark, reg: Registry,
                               cfg: TemperatureResampleConfig,
                               g: GlobalConfig = DEFAULT) -> DataFrame:
    df = reg.load(spark, cfg.source)
    rates = temperature_rates_frame(df, cfg)
    # inner join: the rates derive from the same corpus being expanded,
    # so every stratum (incl. NULL-free by groupBy semantics) has a row;
    # a NULL stratum draws no rate and emits nothing in BOTH engines
    # (equality join drops NULL keys either way)
    t = (df.join(F.broadcast(rates), [cfg.strata_col], "inner")
         .selectExpr(cfg.id_col, cfg.strata_col, "rate_ppm",
                     f"{_copies_expr(cfg, cfg.id_col, ' div ')} AS copies"))
    return (t.filter("copies >= 1")
            .selectExpr(cfg.id_col, cfg.strata_col, "rate_ppm",
                        "explode(sequence(CAST(1 AS BIGINT), copies)) "
                        "AS repeat_idx"))


def temperature_resample_oracle(b: SqlBuilder, reg: Registry,
                                cfg: TemperatureResampleConfig,
                                g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    w_ppb, rate = _rate_exprs(cfg)
    stats = b.cte(f"{cfg.name}__s",
                  f"SELECT {cfg.strata_col}, count(*) AS n_s "
                  f"FROM {src} GROUP BY {cfg.strata_col}")
    tot = b.cte(f"{cfg.name}__t",
                f"SELECT CAST(sum(n_s) AS BIGINT) AS n_total FROM {stats}")
    w = b.cte(f"{cfg.name}__w",
              f"SELECT {cfg.strata_col}, n_s, n_total, {w_ppb} AS w_ppb "
              f"FROM {stats}, {tot}")
    z = b.cte(f"{cfg.name}__z",
              f"SELECT CAST(sum(w_ppb) AS BIGINT) AS z FROM {w}")
    rates = b.cte(
        f"{cfg.name}__r",
        f"SELECT {cfg.strata_col}, "
        f"{rate.format(idiv=' // ')} AS rate_ppm FROM {w}, {z}")
    joined = b.cte(
        f"{cfg.name}__j",
        f"SELECT d.{cfg.id_col}, d.{cfg.strata_col}, r.rate_ppm, "
        f"{_copies_expr(cfg, f'd.{cfg.id_col}', ' // ')} AS copies "
        f"FROM {src} d JOIN {rates} r "
        f"ON d.{cfg.strata_col} = r.{cfg.strata_col}")
    # generate_series(1, copies) is the explode(sequence(...)) twin —
    # empty for copies = 0, so the filter only mirrors the Spark plan
    return b.cte(
        cfg.name,
        f"SELECT {cfg.id_col}, {cfg.strata_col}, rate_ppm, "
        f"CAST(u.repeat_idx AS BIGINT) AS repeat_idx "
        f"FROM {joined}, "
        f"UNNEST(generate_series(CAST(1 AS BIGINT), copies)) "
        f"AS u(repeat_idx) WHERE copies >= 1")


# ------------------------------------------------- exact-size sample --

@dataclass(frozen=True)
class ExactSampleConfig:
    """Exactly-n-per-stratum deterministic sample: rank each stratum's
    rows by a salted 48-bit hash key and keep the first n — the
    fixed-BUDGET counterpart of the rate-based gates above (an eval
    slice of exactly 10k docs per language; a labeling batch of
    exactly n per source). Changing the salt draws an independent
    sample; growing the corpus only perturbs ranks near the cut.

    Scale design (100 TB): the rank-and-cut compiles to a
    partial+final WindowGroupLimit pair (per-partition bounded heaps
    of n rows BEFORE the stratum exchange — Spark's grouped
    TakeOrdered, pinned in tests/test_plan_quality.py), so the
    stratum shuffle moves at most n rows per input partition, never
    the corpus. The hash key is the corpus-shuffle key: exact integer
    md5 nibbles, no rand(), bit-identical across engines and reruns."""

    name: str
    source: str = "documents"
    stratum_col: str = "lang"
    id_col: str = "doc_id"
    n_per_stratum: int = 100
    salt: str = "exact_sample"

    def __post_init__(self):
        for c in (self.stratum_col, self.id_col):
            ensure_identifier(c, "column", self.name)
        if self.n_per_stratum < 1:
            raise ValueError(f"{self.name}: n_per_stratum must be >= 1")
        if not re.fullmatch(r"[A-Za-z0-9_.-]+", self.salt):
            raise ValueError(f"{self.name}: salt must be a plain token")


def build_exact_sample(spark, reg: Registry, cfg: ExactSampleConfig,
                       g: GlobalConfig = DEFAULT) -> DataFrame:
    from pyspark.sql import Window

    df = reg.load(spark, cfg.source)
    keyed = df.selectExpr(
        cfg.id_col, cfg.stratum_col,
        f"{_shuffle_key(cfg.id_col, cfg.salt)} AS __k")
    w = (Window.partitionBy(cfg.stratum_col)
         .orderBy(F.asc("__k"), F.asc(cfg.id_col)))
    return (keyed
            .withColumn("sample_rank", F.row_number().over(w).cast("int"))
            .filter(F.col("sample_rank") <= cfg.n_per_stratum)
            .select(cfg.id_col, cfg.stratum_col, "sample_rank"))


def exact_sample_oracle(b: SqlBuilder, reg: Registry,
                        cfg: ExactSampleConfig,
                        g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    keyed = b.cte(
        f"{cfg.name}__k",
        f"SELECT {cfg.id_col}, {cfg.stratum_col}, "
        f"{_shuffle_key(cfg.id_col, cfg.salt)} AS __k FROM {src}")
    ranked = b.cte(
        f"{cfg.name}__r",
        f"SELECT {cfg.id_col}, {cfg.stratum_col}, "
        f"CAST(row_number() OVER (PARTITION BY {cfg.stratum_col} "
        f"ORDER BY __k, {cfg.id_col}) AS INT) AS sample_rank "
        f"FROM {keyed}")
    return b.cte(
        cfg.name,
        f"SELECT * FROM {ranked} "
        f"WHERE sample_rank <= {cfg.n_per_stratum}")


# ------------------------------------------------- proportional sample --

@dataclass(frozen=True)
class ProportionalSampleConfig:
    """Exact-total proportional stratified sample: draw EXACTLY
    ``total_n`` rows overall, allocated across strata in proportion to
    their sizes by the largest-remainder (Hamilton) method — the
    apportionment rule that makes per-stratum quotas sum exactly to
    the declared budget with no float rounding drift. The fixed-TOTAL
    counterpart of exact_sample's fixed-per-stratum cut (an eval set
    of exactly 10k docs mirroring the corpus language mix).

    Allocation: base_i = (N * c_i) div T, remainder r_i = (N * c_i)
    mod T; the N - sum(base_i) leftover seats go to the largest r_i
    (ties: stratum value ascending). Pure BIGINT arithmetic — both
    engines agree bit-for-bit (N * c_i must fit BIGINT: fine for any
    real budget). For N <= T every allocation fits its stratum by
    construction; a degenerate N > T caps at the stratum size.

    Scale design (100 TB): the allocation derives from the stratum
    census (one map-side-combined groupBy, window over the tiny
    census) and joins back BROADCAST; the per-stratum rank-cut first
    applies the STATIC bound rank <= N — which compiles to a
    partial+final WindowGroupLimit pair (bounded heaps before the
    stratum exchange) — and only then the dynamic per-stratum quota,
    so the shuffle never moves more than N rows per stratum. Salted
    48-bit hash ranks, the exact_sample determinism contract."""

    name: str
    source: str = "documents"
    stratum_col: str = "lang"
    id_col: str = "doc_id"
    total_n: int = 100
    salt: str = "proportional_sample"

    def __post_init__(self):
        for c in (self.stratum_col, self.id_col):
            ensure_identifier(c, "column", self.name)
        if self.total_n < 1:
            raise ValueError(f"{self.name}: total_n must be >= 1")
        if not re.fullmatch(r"[A-Za-z0-9_.-]+", self.salt):
            raise ValueError(f"{self.name}: salt must be a plain token")


def build_proportional_sample(spark, reg: Registry,
                              cfg: ProportionalSampleConfig,
                              g: GlobalConfig = DEFAULT) -> DataFrame:
    from pyspark.sql import Window

    s, i, n = cfg.stratum_col, cfg.id_col, cfg.total_n
    df = reg.load(spark, cfg.source)
    census = df.groupBy(s).agg(F.count(F.lit(1)).alias("__c"))
    wt = Window.partitionBy()
    wr = Window.partitionBy().orderBy(
        F.desc("__rem"), F.asc(s))
    alloc = (census
             .withColumn("__t", F.sum("__c").over(wt))
             .selectExpr(s, "__c",
                         f"({n} * __c) div __t AS __base",
                         f"({n} * __c) % __t AS __rem",
                         f"{n} - sum(({n} * __c) div __t) OVER () "
                         f"AS __extra")
             .withColumn("__seat", F.row_number().over(wr))
             .selectExpr(
                 s,
                 "CAST(least(__base + CASE WHEN __seat <= __extra "
                 "THEN 1 ELSE 0 END, __c) AS BIGINT) AS n_alloc"))
    keyed = df.selectExpr(
        i, s, f"{_shuffle_key(i, cfg.salt)} AS __k")
    w = Window.partitionBy(s).orderBy(F.asc("__k"), F.asc(i))
    ranked = (keyed
              .withColumn("sample_rank",
                          F.row_number().over(w).cast("int"))
              .filter(F.col("sample_rank") <= n))    # static cut first
    return (ranked.join(F.broadcast(alloc), s, "inner")
            .filter(F.col("sample_rank") <= F.col("n_alloc"))
            .select(i, s, "sample_rank", "n_alloc"))


def proportional_sample_oracle(b: SqlBuilder, reg: Registry,
                               cfg: ProportionalSampleConfig,
                               g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    s, i, n = cfg.stratum_col, cfg.id_col, cfg.total_n
    census = b.cte(f"{cfg.name}__c",
                   f"SELECT {s}, count(*) AS __c FROM {src} GROUP BY {s}")
    quota = b.cte(
        f"{cfg.name}__q",
        f"SELECT {s}, __c, ({n} * __c) // sum(__c) OVER () AS __base, "
        f"({n} * __c) % sum(__c) OVER () AS __rem FROM {census}")
    alloc = b.cte(
        f"{cfg.name}__a",
        f"SELECT {s}, least(__base + CASE WHEN __seat <= __extra "
        f"THEN 1 ELSE 0 END, __c) AS n_alloc FROM ("
        f"SELECT {s}, __c, __base, "
        f"{n} - sum(__base) OVER () AS __extra, "
        f"row_number() OVER (ORDER BY __rem DESC, {s}) AS __seat "
        f"FROM {quota})")
    keyed = b.cte(
        f"{cfg.name}__k",
        f"SELECT {i}, {s}, {_shuffle_key(i, cfg.salt)} AS __k "
        f"FROM {src}")
    ranked = b.cte(
        f"{cfg.name}__r",
        f"SELECT {i}, {s}, CAST(row_number() OVER ("
        f"PARTITION BY {s} ORDER BY __k, {i}) AS INT) AS sample_rank "
        f"FROM {keyed}")
    return b.cte(
        cfg.name,
        f"SELECT {i}, {s}, sample_rank, CAST(n_alloc AS BIGINT) "
        f"AS n_alloc FROM {ranked} JOIN {alloc} USING ({s}) "
        f"WHERE sample_rank <= n_alloc")
