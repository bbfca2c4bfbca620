"""Tukey-fence outlier gate: flag rows whose integer value falls
outside [q25 - 1.5*IQR, q75 + 1.5*IQR] of their group — the standard
robust numeric-quality gate (Tukey 1977 box-plot fences; the
data-cleaning step every feature pipeline runs before training).

Exactness: quartiles are type-1 order statistics from the bounded
histogram (the llm/profile.py GroupedQuantiles core — pure integer
comparisons, no interpolation), and the 1.5 factor is cleared by
doubling: ``2*x < 5*q25 - 3*q75`` / ``2*x > 5*q75 - 3*q25`` — all
BIGINT, both engines agree bit-for-bit. A z-score gate was rejected:
the cross-multiplied second-moment comparison overflows BIGINT past
~10^5 rows x 10^5-unit values, and DECIMAL(38) products round in both
engines; the fence form has no such cliff (values only ever scale by
5).

Scale design (100 TB): ONE map-side-combined histogram groupBy
(group, value); the cumulative window runs over the BOUNDED histogram
(distinct values per group, never the corpus); the per-group fence
table is census-sized and joins back AQE-decided (broadcast in
practice). NULL values are excluded from the histogram and carry a
NULL verdict (SQL comparison semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder

_FENCE = ("(2 * v < 5 * q25 - 3 * q75) OR (2 * v > 5 * q75 - 3 * q25)")


@dataclass(frozen=True)
class TukeyOutlierConfig:
    name: str
    source: str = "events"
    group_col: str = "event_type"
    id_cols: tuple = ("event_id",)
    # integer-valued SQL expression (the exact-cents contract), valid
    # in BOTH dialects
    value_expr: str = "CAST(round(value * 100) AS BIGINT)"

    def __post_init__(self):
        for c in (self.group_col, *self.id_cols):
            ensure_identifier(c, "column", self.name)
        if not self.id_cols:
            raise ValueError(f"{self.name}: id_cols must be non-empty")


def build_tukey_outliers(spark, reg: Registry, cfg: TukeyOutlierConfig,
                         g: GlobalConfig = DEFAULT) -> DataFrame:
    grp = cfg.group_col
    base = reg.load(spark, cfg.source).selectExpr(
        *cfg.id_cols, grp, f"({cfg.value_expr}) AS v")
    hist = (base.filter(F.col("v").isNotNull())
            .groupBy(grp, "v").agg(F.count(F.lit(1)).alias("c")))
    w = (Window.partitionBy(grp).orderBy(F.asc("v"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.select(
        grp, "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(grp)).alias("n"))
    fences = (cum.groupBy(grp).agg(
        F.min(F.expr("CASE WHEN cum * 4 >= n THEN v END")).alias("q25"),
        F.min(F.expr("CASE WHEN cum * 4 >= 3 * n THEN v END"))
        .alias("q75")))
    return (base.join(fences, grp)
            .selectExpr(*cfg.id_cols, grp, "v AS value_units",
                        "q25", "q75",
                        f"({_FENCE}) AS is_outlier"))


def tukey_outliers_oracle(b: SqlBuilder, reg: Registry,
                          cfg: TukeyOutlierConfig,
                          g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    grp = cfg.group_col
    ids = ", ".join(cfg.id_cols)
    base = b.cte(f"{cfg.name}__b",
                 f"SELECT {ids}, {grp}, ({cfg.value_expr}) AS v "
                 f"FROM {src}")
    hist = b.cte(f"{cfg.name}__h",
                 f"SELECT {grp}, v, count(*) AS c FROM {base} "
                 f"WHERE v IS NOT NULL GROUP BY {grp}, v")
    cum = b.cte(
        f"{cfg.name}__c",
        f"SELECT {grp}, v, "
        f"sum(c) OVER (PARTITION BY {grp} ORDER BY v "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
        f"sum(c) OVER (PARTITION BY {grp}) AS n FROM {hist}")
    fences = b.cte(
        f"{cfg.name}__f",
        f"SELECT {grp}, "
        f"min(CASE WHEN cum * 4 >= n THEN v END) AS q25, "
        f"min(CASE WHEN cum * 4 >= 3 * n THEN v END) AS q75 "
        f"FROM {cum} GROUP BY {grp}")
    return b.cte(
        cfg.name,
        f"SELECT {ids}, b.{grp}, v AS value_units, q25, q75, "
        f"({_FENCE}) AS is_outlier "
        f"FROM {base} b JOIN {fences} f USING ({grp})")
