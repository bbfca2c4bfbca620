"""Market-basket co-occurrence: frequent item pairs within baskets,
with apriori item pruning and a basket-size cap.

The association-mining census (Agrawal & Srikant 1994, apriori): for
every pair of items appearing together in at least ``min_pair_support``
baskets, emit the pair count plus both items' individual supports and
the corpus basket total — the full 2x2 contingency row from which
lift/confidence/chi-square are pure scalar functions (kept out of the
output: they are DOUBLE-valued and derivable, the sufficient-stats
contract of llm/profile.py's second-moment census).

Beyond-reference operator (the reference models links between hubs but
has no affinity/co-occurrence surface).

Scale design (100 TB): the corpus reduces to the DISTINCT (basket,
item) level first and is persisted once for its three consumers (item
census, pair side, basket total). Apriori prune: items below
``min_item_support`` distinct baskets cannot be in a frequent pair
(downward closure), so they are semi-joined out BEFORE the quadratic
stage — AQE picks broadcast when the frequent-item census fits. The
pair stage is an equi self-join on the basket key; a declared
``max_basket_size`` census-filter drops pathological baskets wholesale
(the linkage.py hot-block guard: one 100k-item basket is 5e9 pairs),
applied to ONE join side only — the equi join on the basket key drops
the other side for free. The cap is measured on the POST-apriori
frequent-item count of the basket (a raw 100k-item basket whose items
are all infrequent pairs nothing): frequent-item basket size is
exactly the quantity that bounds pair volume, so pair volume is
bounded by sum(min(frequent_size, cap)^2). Everything downstream of
the pair groupBy is census-sized.

Determinism: pairs ordered item_a < item_b; supports are counted on
the UNCAPPED distinct level (raw per-item support), pair counts over
the capped baskets; all-integer output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..context import GlobalConfig, DEFAULT, Registry, ensure_identifier
from ..plans.sqlbuild import SqlBuilder


@dataclass(frozen=True)
class CooccurrenceConfig:
    name: str
    source: str = "lineitem"
    basket_col: str = "l_orderkey"
    item_col: str = "l_partkey"
    min_item_support: int = 2
    min_pair_support: int = 2
    max_basket_size: int = 1000

    def __post_init__(self):
        if self.min_item_support < 1:
            raise ValueError(f"{self.name}: min_item_support must be >= 1")
        if self.min_pair_support < 1:
            raise ValueError(f"{self.name}: min_pair_support must be >= 1")
        if self.max_basket_size < 2:
            raise ValueError(
                f"{self.name}: max_basket_size must be >= 2 "
                f"(a 1-item basket can never pair)")
        for c in (self.basket_col, self.item_col):
            ensure_identifier(c, "column", self.name)


def build_cooccurrence(spark, reg: Registry, cfg: CooccurrenceConfig,
                       g: GlobalConfig = DEFAULT) -> DataFrame:
    bcol, icol = cfg.basket_col, cfg.item_col
    items = (reg.load(spark, cfg.source)
             .select(F.col(bcol).alias("b"), F.col(icol).alias("i"))
             .distinct()
             # persisted for its three consumers, released by Spark's
             # LRU eviction with the session's other op caches (the
             # returned frame is lazy, so an eager unpersist here would
             # defeat the cache; bench.py clearCache()s between
             # queries) — the ngram_jaccard/overlap pattern
             .persist())
    counts = items.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))
    freq = counts.filter(F.col("n_i") >= cfg.min_item_support).select("i")
    fi = items.join(freq, "i", "inner")
    # Pair generation by group-and-explode instead of the equi
    # self-join on the basket key (guide §2.4 "remove shuffles
    # outright"): ONE exchange of fi (groupBy b) replaces the join's
    # two fi sides (broadcast locally, two SMJ exchanges at scale), and
    # the i<j pairs are generated map-side from the sorted item array.
    # Identical results: (b, i) is DISTINCT, so sort_array yields a
    # strictly increasing array (pairs are exactly i<j once each), and
    # the former one-sided basket cap already meant "no pairs at all
    # from an oversized basket" (the equi join drops the uncapped side
    # for free — see the oracle, which keeps the join formulation).
    # The size filter runs BEFORE explosion, so a pathological basket
    # costs one array row, never its quadratic pairs.
    baskets = (fi.groupBy("b")
               .agg(F.sort_array(F.collect_list("i")).alias("__items"))
               .filter(F.size("__items") <= cfg.max_basket_size))
    pairs = (baskets.select(F.explode(F.expr(
                 "flatten(transform(__items, (x, k) -> "
                 "transform(slice(__items, k + 2, size(__items)), "
                 "y -> struct(x AS item_a, y AS item_b))))")).alias("p"))
             .select("p.item_a", "p.item_b")
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("n_pair"))
             .filter(F.col("n_pair") >= cfg.min_pair_support))
    total = items.agg(
        F.countDistinct("b").alias("n_baskets_total"))
    ca = F.broadcast(counts.selectExpr("i AS item_a", "n_i AS n_a"))
    cb = F.broadcast(counts.selectExpr("i AS item_b", "n_i AS n_b"))
    return (pairs.join(ca, "item_a").join(cb, "item_b")
            .crossJoin(F.broadcast(total))
            .select("item_a", "item_b", "n_a", "n_b", "n_pair",
                    "n_baskets_total"))


def cooccurrence_oracle(b: SqlBuilder, reg: Registry,
                        cfg: CooccurrenceConfig,
                        g: GlobalConfig = DEFAULT) -> str:
    src = reg.duckdb_relation(cfg.source)
    bcol, icol = cfg.basket_col, cfg.item_col
    items = b.cte(f"{cfg.name}__it",
                  f"SELECT DISTINCT {bcol} AS b, {icol} AS i FROM {src}")
    counts = b.cte(f"{cfg.name}__c",
                   f"SELECT i, count(*) AS n_i FROM {items} GROUP BY i")
    fi = b.cte(f"{cfg.name}__f",
               f"SELECT b, i FROM {items} WHERE i IN ("
               f"SELECT i FROM {counts} "
               f"WHERE n_i >= {cfg.min_item_support})")
    capped = b.cte(f"{cfg.name}__k",
                   f"SELECT b, i FROM {fi} WHERE b IN ("
                   f"SELECT b FROM {fi} GROUP BY b "
                   f"HAVING count(*) <= {cfg.max_basket_size})")
    pairs = b.cte(f"{cfg.name}__p",
                  f"SELECT a.i AS item_a, x.i AS item_b, "
                  f"count(*) AS n_pair "
                  f"FROM {capped} a JOIN {fi} x "
                  f"ON a.b = x.b AND a.i < x.i GROUP BY 1, 2 "
                  f"HAVING count(*) >= {cfg.min_pair_support}")
    total = b.cte(f"{cfg.name}__t",
                  f"SELECT count(DISTINCT b) AS n_baskets_total "
                  f"FROM {items}")
    return b.cte(
        cfg.name,
        f"SELECT item_a, item_b, ca.n_i AS n_a, cb.n_i AS n_b, "
        f"n_pair, n_baskets_total "
        f"FROM {pairs} JOIN {counts} ca ON ca.i = item_a "
        f"JOIN {counts} cb ON cb.i = item_b, {total}")
