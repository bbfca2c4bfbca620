"""Tiny CTE composer for oracle (DuckDB) SQL generation.

Entity oracle generators append named CTEs and a final SELECT; nested
entities (hub over stage, PIT over sats) compose by merging builders.
"""

from __future__ import annotations


class SqlBuilder:
    def __init__(self):
        self._ctes: list[tuple[str, str]] = []
        self._names: set[str] = set()
        self._recursive = False

    def cte(self, name: str, select_sql: str, recursive: bool = False) -> str:
        """Add a CTE; returns the name. Idempotent per name.

        ``recursive=True`` marks the WHOLE with-clause RECURSIVE (SQL
        puts the keyword on the clause, not the individual CTE; DuckDB
        accepts non-recursive CTEs under WITH RECURSIVE unchanged)."""
        if recursive:
            self._recursive = True
        if name in self._names:
            return name
        self._names.add(name)
        self._ctes.append((name, select_sql))
        return name

    def has(self, name: str) -> bool:
        return name in self._names

    def merge(self, other: "SqlBuilder"):
        for name, sql in other._ctes:
            self.cte(name, sql)
        self._recursive = self._recursive or other._recursive

    def render(self, final_select: str) -> str:
        if not self._ctes:
            return final_select
        parts = ",\n".join(f"{n} AS (\n{s}\n)" for n, s in self._ctes)
        kw = "WITH RECURSIVE" if self._recursive else "WITH"
        return f"{kw} {parts}\nSELECT * FROM ({final_select})"
