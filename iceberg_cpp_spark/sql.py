"""Thin SQL entry point: ``IceSqlEngine(spark, catalog).sql("SELECT
... FROM ice.db.tbl")`` — the last user-facing API gap vs what a Spark
user expects of a table format (VERDICT r13 task 8; the reference's
surface is a C++ API with no SQL front end at all).

Deliberately THIN: catalog identifiers (``<catalog>.<ns...>.<name>``)
are resolved through the catalog to engine scans or spec views,
registered as Spark temp views, the query text is rewritten to those
bindings, and the rest — joins, CTEs, windows, the whole SQL surface —
is ``spark.sql``. Nothing re-implements SQL; the engine contributes
exactly what Spark cannot know: snapshot resolution, schema evolution,
delete-file application, partition/metrics pruning (all inside the
IceTable scan the temp view wraps) and view-spec SQL resolution.

Scale shape: a binding is one ``TableScan.to_df()`` DataFrame — the
same lazy, pruned, distributed plan every other entry point gets; the
rewrite itself is O(query text). Identifiers inside string literals
are left untouched (literals are masked before matching).
"""

from __future__ import annotations

import re
from typing import Optional

# <catalog>.<part>(.<part>)+ — at least catalog.ns.name; parts after
# the catalog prefix form the identifier (namespace levels + name)
_IDENT = re.compile(
    r"\b(?P<cat>[A-Za-z_]\w*)\.(?P<rest>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)+)")
# single- and double-quoted SQL literals (with '' escapes); masked so a
# path like 'ice.db.t' inside a string never binds
_LITERAL = re.compile(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"")


class IceSqlEngine:
    """SQL over catalog tables and views.

    >>> eng = IceSqlEngine(spark, catalog)           # prefix "ice"
    >>> eng.sql("SELECT count(*) AS n FROM ice.db.orders").show()
    """

    _MAX_VIEW_DEPTH = 10

    def __init__(self, spark, catalog, catalog_name: str = "ice"):
        self.spark = spark
        self.catalog = catalog
        self.catalog_name = catalog_name

    def sql(self, query: str):
        """Resolve ``<catalog_name>.`` identifiers and run the query.
        Returns the Spark DataFrame (lazy, as spark.sql does)."""
        return self._sql(query, depth=0)

    # -- internals ---------------------------------------------------------
    def _sql(self, query: str, depth: int):
        if depth > self._MAX_VIEW_DEPTH:
            raise ValueError(
                f"view nesting exceeds {self._MAX_VIEW_DEPTH} "
                "(circular view definition?)")
        masked, lits = self._mask(query)
        out = masked
        bound: dict[str, str] = {}
        # right-to-left so span replacement never shifts earlier matches
        for m in reversed(list(_IDENT.finditer(masked))):
            if m.group("cat") != self.catalog_name:
                continue
            ident = m.group("rest")
            view = bound.get(ident)
            if view is None:
                view = self._bind(ident, depth)
                bound[ident] = view
            out = out[:m.start()] + view + out[m.end():]
        return self.spark.sql(self._unmask(out, lits))

    def _bind(self, ident: str, depth: int) -> str:
        """Resolve one catalog identifier to a temp-view name: tables
        become IceTable scans (snapshot/schema/delete resolution all
        engine-side); spec views resolve their CURRENT version's SQL
        recursively (it may reference catalog identifiers itself)."""
        safe = ident.replace(".", "_")
        name = f"__ice_sql_{safe}"
        if self.catalog.table_exists(ident):
            t = self.catalog.load_table(ident, spark=self.spark)
            t.scan().to_df().createOrReplaceTempView(name)
            return name
        if hasattr(self.catalog, "view_exists") \
                and self.catalog.view_exists(ident):
            v = self.catalog.load_view(ident)
            version = v.metadata.current_version()
            rep = next((r for r in version.representations
                        if r.dialect == "spark"),
                       version.representations[0]
                       if version.representations else None)
            if rep is None:
                raise ValueError(f"view {ident!r} has no SQL representation")
            self._sql(rep.sql, depth + 1).createOrReplaceTempView(name)
            return name
        raise ValueError(
            f"no such table or view in catalog "
            f"{self.catalog_name!r}: {ident!r}")

    @staticmethod
    def _mask(query: str) -> tuple[str, list[str]]:
        lits: list[str] = []

        def stash(m: "re.Match") -> str:
            lits.append(m.group(0))
            return f"\x00{len(lits) - 1}\x00"

        return _LITERAL.sub(stash, query), lits

    @staticmethod
    def _unmask(query: str, lits: list[str]) -> str:
        return re.sub(r"\x00(\d+)\x00",
                      lambda m: lits[int(m.group(1))], query)


def sql(spark, catalog, query: str, catalog_name: str = "ice"):
    """One-shot convenience: ``sql(spark, cat, "SELECT ... FROM
    ice.db.t")`` without holding an engine object."""
    return IceSqlEngine(spark, catalog, catalog_name).sql(query)
