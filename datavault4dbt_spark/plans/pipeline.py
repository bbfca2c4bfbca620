"""Pipeline runner: materialize a whole declared Data Vault in
dependency order — the engine's equivalent of ``dbt run``.

The reference relies on dbt's DAG scheduler to order models and on
incremental materializations to append (SURVEY §3). Here the DAG comes
from each entity's declared dependencies; each run() pass:

1. topologically sorts the declared entities,
2. builds each entity's plan against the *stored* versions of its
   dependencies (stages are recomputed views by default, like the
   reference's view materialization),
3. incremental entities anti-join against their stored target and
   append records_to_insert (insert-only),
4. views (sat_v1 & co.) are re-registered, never materialized.

Scale notes: per-entity writes are independent jobs, so a scheduler can
run DAG-parallel branches concurrently; all incremental pruning (HWM +
anti-join) happens inside each entity's plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..context import GlobalConfig, DEFAULT, Registry
from .incremental import ParquetStore


@dataclass(frozen=True)
class EntityDecl:
    """One declared entity: how to build it and what it depends on."""

    name: str
    build: callable          # (spark, reg, cfg, g, target=...) -> DataFrame
    cfg: object
    deps: tuple = ()
    materialize: str = "incremental"  # 'incremental' | 'table' | 'view'
    keys: tuple = ()         # anti-join keys for incremental appends


def topo_sort(decls: dict) -> list:
    seen, order = set(), []

    def visit(n, path=()):
        if n in seen or n not in decls:
            return
        if n in path:
            raise ValueError(f"dependency cycle at {n}")
        for d in decls[n].deps:
            visit(d, path + (n,))
        seen.add(n)
        order.append(n)
    for n in decls:
        visit(n)
    return order


def run_pipeline(spark, decls: dict, store: ParquetStore,
                 base_registry: Registry, g: GlobalConfig = DEFAULT,
                 count_rows: bool = True) -> dict:
    """One load run over every declared entity; returns rows appended
    per entity. Safe to re-run: incremental entities insert nothing new
    on replay (idempotent anti-join append).

    ``count_rows=False`` skips the per-entity row counts (returns None
    per entity): the count is a second action, and even with the
    persist below it costs a cache pass — a 100 TB scheduled load that
    doesn't surface counts shouldn't pay it.
    """
    reg = base_registry
    counts = {}
    for name in topo_sort(decls):
        d = decls[name]
        if d.materialize == "view":
            # register the plan; consumers recompute it (dbt view).
            # _invalidate, not just re-register: a re-run would otherwise
            # serve the PREVIOUS run's cached view plan, whose scan
            # snapshot points at files an overwrite has since deleted
            # (FileNotFound) or misses rows this run appends (silent).
            reg._invalidate(name)
            reg.spark_loaders[name] = (
                lambda spark, d=d: d.build(spark, reg, d.cfg, g))
            counts[name] = None
            continue
        target = store.read(name) if store.exists(name) else None
        if d.materialize == "incremental" and target is not None:
            new = d.build(spark, reg, d.cfg, g, target=target)
        else:
            new = d.build(spark, reg, d.cfg, g)
        n = None
        if count_rows:
            # count + write are two actions over the same delta plan:
            # persist the delta (bounded: records_to_insert, not the
            # table) so the plan executes once, not twice
            new = new.persist()
            n = new.count()
        if target is not None and d.materialize == "table":
            store.overwrite(name, new)
        else:
            store.append(name, new)
        if count_rows:
            new.unpersist()
        counts[name] = n
        # downstream entities read the STORED table, not the plan
        # (_invalidate also unpersists any cached copy of the old plan);
        # going through store.read keeps the pipeline storage-agnostic
        # (ParquetStore and DeltaStore plug in identically)
        reg._invalidate(name)
        reg.spark_loaders[name] = (
            lambda spark, s=store, n=name: s.read(n))
    return counts
