"""Skew mitigation: salted joins and two-stage aggregation.

The vault path is skew-free by construction (every shuffle keys on an
md5 hashkey), but user-side training-data joins are not: joining
documents by domain, grouping by language, joining events by a hot
user. AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) covers
sort-merge joins at runtime; these helpers cover the cases AQE cannot
rewrite — hash aggregations over hot keys, and joins where the planner
must be told up front because one side needs replication.

- ``salted_join(left, right, keys, n_salts)``: the classic salt —
  every LEFT row gets a salt in [0, n_salts); the RIGHT side is
  replicated ``n_salts``× with one copy per salt; the join adds the
  salt to the equi-keys, so a hot key's rows spread over ``n_salts``
  reducers instead of one. Join RESULTS are salt-independent (each
  left row matches exactly the right copy carrying its salt), so the
  salt needs no determinism guarantee — only the partitioning changes.
  Valid for ``inner`` and ``left`` joins: replication would duplicate
  right-side rows that miss entirely under ``right``/``full``/semi/anti
  semantics, so those are rejected.

- ``salted_aggregate(df, keys, aggs, n_salts)``: two-stage aggregation
  for algebraic functions (sum/count/min/max): partial-aggregate on
  (keys + salt) — the hot key's load spreads over ``n_salts`` partial
  groups — then merge on keys alone. The merge input is one row per
  (key, salt), so the second shuffle is tiny regardless of skew.

Sizing: ``n_salts`` ~ the ratio of the hottest key's row count to a
comfortable per-reducer row count; oversalting only costs right-side
replication (join) or ``n_salts`` extra rows per key (aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "__dv_salt"


def salted_join(left: DataFrame, right: DataFrame, keys,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, not {how!r}: right-side "
            f"replication breaks right/full/semi/anti semantics")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    keys = list(keys)
    for k in keys:
        if k == _SALT:
            raise ValueError(f"join key collides with {_SALT}")
    # monotonically_increasing_id is partition-local and cheap; salt
    # values need no cross-run stability (results are salt-independent)
    l = left.withColumn(
        _SALT, (F.monotonically_increasing_id() % n_salts).cast("int"))
    r = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return l.join(r, on=keys + [_SALT], how=how).drop(_SALT)


def salted_aggregate(df: DataFrame, keys, aggs: dict,
                     n_salts: int = 8) -> DataFrame:
    """``aggs``: output_name -> (input_col, fn) with fn in
    sum/count/min/max. count counts non-null inputs (use a never-null
    column or a literal-backed column for COUNT(*) semantics)."""
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    part_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (_col, fn) in aggs.items():
        if fn not in part_fn:
            raise ValueError(f"{name}: {fn!r} is not algebraic "
                             f"(expected one of {sorted(part_fn)})")
    keys = list(keys)
    salted = df.withColumn(
        _SALT, (F.monotonically_increasing_id() % n_salts).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[part_fn[fn](c).alias(name) for name, (c, fn) in aggs.items()])
    return partial.groupBy(*keys).agg(
        *[merge_fn[fn](name).alias(name) for name, (_c, fn) in aggs.items()])
