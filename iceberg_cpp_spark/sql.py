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
IceTable scan the temp view wraps), view-spec SQL resolution, and time
travel — ``FROM ice.db.t VERSION AS OF <snapshot_id>`` or
``TIMESTAMP AS OF '<ts>'`` (FOR SYSTEM_VERSION / FOR SYSTEM_TIME
spellings accepted) binds the scan to the historical snapshot.

Scale shape: a binding is one ``TableScan.to_df()`` DataFrame — the
same lazy, pruned, distributed plan every other entry point gets; the
rewrite itself is O(query text). Identifiers inside string literals
are left untouched (literals are masked before matching).
"""

from __future__ import annotations

import re
from typing import Optional

# <catalog>.<part>(.<part>)+ — at least catalog.ns.name; parts after
# the catalog prefix form the identifier (namespace levels + name).
# An optional time-travel clause binds the identifier to a historical
# snapshot: `VERSION AS OF <snapshot_id>` / `TIMESTAMP AS OF '<ts>'`
# (with the usual FOR SYSTEM_VERSION / FOR SYSTEM_TIME spellings); the
# timestamp literal appears MASKED (\\x00N\\x00) because literals are
# stashed before matching.
_IDENT = re.compile(
    r"\b(?P<cat>[A-Za-z_]\w*)\.(?P<rest>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)+)"
    r"(?:\s+(?:for\s+)?(?:system_version|version)\s+as\s+of\s+"
    r"(?P<ver>\d+)"
    r"|\s+(?:for\s+)?(?:system_time|timestamp)\s+as\s+of\s+"
    r"(?P<ts>\x00\d+\x00))?",
    re.I)
# single- and double-quoted SQL literals (with '' escapes); masked so a
# path like 'ice.db.t' inside a string never binds
_LITERAL = re.compile(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"")
# write statements against a catalog table: INSERT INTO appends,
# INSERT OVERWRITE replaces; the body (SELECT/VALUES/CTE) resolves
# through the same read path
_INSERT = re.compile(
    r"^\s*insert\s+(?P<mode>into|overwrite)\s+(?:table\s+)?"
    r"(?P<cat>[A-Za-z_]\w*)\.(?P<rest>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)+)"
    r"\s+(?P<body>.+)$", re.I | re.S)


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
        Reads return the Spark DataFrame (lazy, as spark.sql does).
        ``INSERT INTO <cat>.<ns>.<tbl> <select|values>`` appends and
        ``INSERT OVERWRITE`` replaces — one engine snapshot each; both
        return an empty ``num_affected_rows``-shaped frame (DML result
        convention; counting would force an extra job)."""
        m = _INSERT.match(query.strip().rstrip(";"))
        if m and m.group("cat") == self.catalog_name:
            return self._insert(m.group("rest"), m.group("mode").lower(),
                                m.group("body"))
        return self._sql(query, depth=0)

    def _insert(self, ident: str, mode: str, body: str):
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from iceberg_cpp_spark.core.types import to_spark_schema

        if not self.catalog.table_exists(ident):
            raise ValueError(
                f"INSERT target is not a table in catalog "
                f"{self.catalog_name!r}: {ident!r}")
        t = self.catalog.load_table(ident, spark=self.spark)
        df = self._sql(body, depth=0)
        tgt = to_spark_schema(t.schema())
        if len(df.columns) != len(tgt.fields):
            raise ValueError(
                f"INSERT column count {len(df.columns)} != table "
                f"{ident!r} column count {len(tgt.fields)}")
        # Spark INSERT semantics: positional with casts to the target
        aligned = df.select(
            *[F.col(c).cast(f.dataType).alias(f.name)
              for c, f in zip(df.columns, tgt.fields)])
        if mode == "into":
            t.append(aligned)
        else:
            t.overwrite(aligned)
        return self.spark.createDataFrame(
            [], T.StructType([T.StructField("num_affected_rows",
                                            T.LongType())]))

    # -- internals ---------------------------------------------------------
    def _sql(self, query: str, depth: int):
        if depth > self._MAX_VIEW_DEPTH:
            raise ValueError(
                f"view nesting exceeds {self._MAX_VIEW_DEPTH} "
                "(circular view definition?)")
        masked, lits = self._mask(query)
        out = masked
        bound: dict[tuple, str] = {}
        # right-to-left so span replacement never shifts earlier matches
        for m in reversed(list(_IDENT.finditer(masked))):
            if m.group("cat") != self.catalog_name:
                continue
            ident = m.group("rest")
            ver = int(m.group("ver")) if m.group("ver") else None
            ts = (self._unmask(m.group("ts"), lits)
                  if m.group("ts") else None)
            key = (ident, ver, ts)
            view = bound.get(key)
            if view is None:
                view = self._bind(ident, depth, snapshot_id=ver,
                                  as_of=ts)
                bound[key] = view
            out = out[:m.start()] + view + out[m.end():]
        return self.spark.sql(self._unmask(out, lits))

    def _bind(self, ident: str, depth: int,
              snapshot_id: Optional[int] = None,
              as_of: Optional[str] = None) -> str:
        """Resolve one catalog identifier to a temp-view name: tables
        become IceTable scans (snapshot/schema/delete resolution all
        engine-side — time travel binds the scan to the named snapshot
        or the snapshot current AS OF the timestamp); spec views resolve
        their CURRENT version's SQL recursively (it may reference
        catalog identifiers itself)."""
        safe = ident.replace(".", "_")
        name = f"__ice_sql_{safe}"
        if snapshot_id is not None:
            name += f"_v{snapshot_id}"
        elif as_of is not None:
            name += f"_t{abs(hash(as_of)) % 10**8}"
        if self.catalog.table_exists(ident):
            t = self.catalog.load_table(ident, spark=self.spark)
            scan = t.scan(snapshot_id=snapshot_id)
            if as_of is not None:
                scan = scan.as_of(self._parse_ts_ms(as_of))
            scan.to_df().createOrReplaceTempView(name)
            return name
        if snapshot_id is not None or as_of is not None:
            raise ValueError(
                f"time travel applies to tables; {ident!r} is not a "
                f"table in catalog {self.catalog_name!r}")
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
    def _parse_ts_ms(lit: str) -> int:
        """``TIMESTAMP AS OF`` literal → epoch millis. The quoted
        string parses as ISO (date or timestamp), interpreted as UTC
        when it carries no zone — snapshot timestamps are UTC epoch
        millis, so the comparison is zone-stable."""
        from datetime import datetime, timezone

        s = lit.strip().strip("'\"").replace("''", "'")
        try:
            dt = datetime.fromisoformat(s)
        except ValueError as e:
            raise ValueError(
                f"cannot parse TIMESTAMP AS OF literal {lit!r}: {e}"
            ) from None
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)

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
