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

r14 adds the write statements: ``INSERT INTO / INSERT OVERWRITE``,
``DELETE FROM ... WHERE``, ``UPDATE ... SET ... WHERE``, ``MERGE INTO
... USING ... ON ... WHEN [NOT] MATCHED THEN UPDATE SET * | DELETE |
INSERT *``, ``CREATE TABLE ... AS SELECT`` and ``DROP TABLE``. WHERE
clauses parse through :mod:`plans.sql_parser` into the engine
Expression DSL — NOT into a Spark Column — so a SQL delete prunes
files/partitions exactly like the Python API; SET values are full
Spark scalar expressions (Spark's parser owns them); each statement
maps onto the corresponding IceTable mutation (one commit per
statement, CAS + retry semantics unchanged).

r15 widens the surface: MERGE clause predicates and column-level
actions (``WHEN MATCHED AND s.op = 'D' THEN DELETE``, ``UPDATE SET
col = expr``, ``INSERT (cols) VALUES (exprs)`` — the CDC-upsert
shape); transaction-scoped statements (``eng.sql(stmt, txn=txn)``
composes DML on a ``new_transaction()`` working copy into ONE CAS);
``DESCRIBE EXTENDED`` / ``SHOW CREATE TABLE`` / ``SHOW
TBLPROPERTIES``; ``TRUNCATE TABLE``; ``CREATE/DROP NAMESPACE`` and
``DROP TABLE ... PURGE``; schema/spec/sort evolution DDL (``ALTER
COLUMN ... TYPE`` promotions, ``ADD/DROP PARTITION FIELD``, ``WRITE
ORDERED BY``, ``SET IDENTIFIER FIELDS``, ``SET DEFAULT``);
branch-suffixed targets (``ice.db.t.branch_<name>`` DML/reads + CALL
fast_forward publish); keyed subquery DML (``DELETE/UPDATE ... WHERE
col IN (SELECT ...)`` on the merge semi-join plane); SQL comments
stripped safely (never bind, never hide a clause); backtick-quoted
identifier parts; injective per-statement temp-view names dropped on
resolve; ``SHOW PARTITIONS`` / ``SHOW VIEWS``; the metadata/import
procedures ``ancestors_of``, ``add_files`` (register existing files,
no rewrite), ``register_table`` (point the catalog at an existing
metadata JSON), ``create_changelog_view`` (CDC rows between
snapshots as a queryable session view), ``snapshot`` (zero-copy
clone via ``IceTable.snapshot_to`` — shared data files, gc-guarded),
``compute_table_stats`` and ``compute_partition_stats``; multi-table
atomic SQL — ``eng.sql(stmt, txn=MultiTableTransaction(catalog))``
composes DML on SEVERAL tables into one REST CommitTransaction (all
tables move or none do; txn reads see enrolled tables' pending
chains).

r16: ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET col =
expr | DELETE`` (the Spark 3.4+ full-sync leg; expressions see the
target only, ``BY TARGET`` accepted on the insert leg); the MERGE
source-cardinality rule enforced (duplicate ON keys raise before any
rewrite); ``CALL ice.system.migrate`` (in-place conversion of a
path-based parquet/ORC directory — files unmoved, Iceberg metadata
grows beside them, identifier preserved); nested-field DDL (``ALTER
TABLE ... ADD COLUMN addr.zip long``, dotted RENAME/DROP COLUMN).

Scale shape: a binding is one ``TableScan.to_df()`` DataFrame — the
same lazy, pruned, distributed plan every other entry point gets; the
rewrite itself is O(query text). Identifiers inside string literals
are left untouched (literals are masked before matching).
"""

from __future__ import annotations

import os
import re
from typing import Optional

# one identifier part: a plain name or a backtick-quoted part (quoted
# parts pass through to the catalog verbatim — dashes, reserved words)
_PART = r"(?:[A-Za-z_]\w*|`[^`]+`)"
# <catalog>.<part>(.<part>)+ — at least catalog.ns.name; parts after
# the catalog prefix form the identifier (namespace levels + name).
# An optional time-travel clause binds the identifier to a historical
# snapshot: `VERSION AS OF <snapshot_id>` / `TIMESTAMP AS OF '<ts>'`
# (with the usual FOR SYSTEM_VERSION / FOR SYSTEM_TIME spellings); the
# timestamp literal appears MASKED (\\x00N\\x00) because literals are
# stashed before matching.
_IDENT = re.compile(
    r"\b(?P<cat>[A-Za-z_]\w*)\." + rf"(?P<rest>{_PART}(?:\.{_PART})+)"
    r"(?:\s+(?:for\s+)?(?:system_version|version)\s+as\s+of\s+"
    r"(?P<ver>\d+|\x00\d+\x00)"
    r"|\s+(?:for\s+)?(?:system_time|timestamp)\s+as\s+of\s+"
    r"(?P<ts>\x00\d+\x00)"
    r"|\s+changes\s+(?:between\s+(?P<cfrom>\d+)\s+and\s+(?P<cto>\d+)"
    r"|since\s+(?P<csince>\d+)))?",
    re.I)
# write statements against a catalog table: INSERT INTO appends,
# INSERT OVERWRITE replaces; the body (SELECT/VALUES/CTE) resolves
# through the same read path
_INSERT = re.compile(
    r"^\s*insert\s+(?P<mode>into|overwrite)\s+(?:table\s+)?"
    r"(?P<cat>[A-Za-z_]\w*)\." + rf"(?P<rest>{_PART}(?:\.{_PART})+)"
    # optional named-column list: strictly an identifier list, so a
    # parenthesized subquery body never matches it
    r"(?:\s*\((?P<cols>\s*[A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*\s*)\))?"
    r"\s+(?P<body>.+)$", re.I | re.S)
# row-level DML / DDL (all matched against MASKED text, so literals
# containing keywords never split a clause). The WHERE body parses
# through plans.sql_parser into the engine Expression DSL — that is
# what keeps SQL deletes on the pruned metadata plane.
_IDENT_TAIL = (r"(?P<cat>[A-Za-z_]\w*)\."
               + rf"(?P<rest>{_PART}(?:\.{_PART})+)")
_DELETE = re.compile(
    r"^\s*delete\s+from\s+" + _IDENT_TAIL +
    r"(?:\s+where\s+(?P<pred>.+))?\s*$", re.I | re.S)
_UPDATE = re.compile(
    r"^\s*update\s+" + _IDENT_TAIL + r"\s+set\s+(?P<set>.+?)"
    r"(?:\s+where\s+(?P<pred>.+))?\s*$", re.I | re.S)
_MERGE_HEAD = re.compile(
    r"^\s*merge\s+into\s+" + _IDENT_TAIL +
    r"(?:\s+(?:as\s+)?(?P<tal>[A-Za-z_]\w*))?\s+using\s+", re.I)
_MERGE_WHEN_HEAD = re.compile(
    r"^\s*when\s+(?P<not>not\s+)?matched"
    r"(?:\s+by\s+(?P<by>source|target)\b)?", re.I)
_MERGE_INSERT_ACT = re.compile(
    r"^insert\s*\((?P<cols>[^()]*)\)\s*values\s*\((?P<vals>.+)\)\s*$",
    re.I | re.S)
_ON_EQ = re.compile(
    r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*"
    r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$")
_CTAS = re.compile(
    r"^\s*create\s+(?P<orr>or\s+replace\s+)?table\s+"
    r"(?P<ine>if\s+not\s+exists\s+)?" + _IDENT_TAIL +
    r"(?:\s*\((?P<coldefs>[^()]*(?:\([^()]*\)[^()]*)*)\))?"
    r"(?:\s+using\s+(?P<using>[A-Za-z_]\w*))?"
    r"(?:\s+partitioned\s+by\s*"
    r"\((?P<parts>[^()]*(?:\([^()]*\)[^()]*)*)\))?"
    r"(?:\s+as\s+(?P<body>.+))?\s*$", re.I | re.S)
# PARTITIONED BY entries use the Iceberg DDL spelling: col,
# years/months/days/hours(col), bucket(N, col), truncate(W, col)
_PART_FIELD = re.compile(
    r"^\s*(?:(?P<col>[A-Za-z_]\w*)"
    r"|(?P<tfn>years?|months?|days?|hours?)\s*\(\s*"
    r"(?P<tcol>[A-Za-z_]\w*)\s*\)"
    r"|(?P<nfn>bucket|truncate)\s*\(\s*(?P<n>\d+)\s*,\s*"
    r"(?P<ncol>[A-Za-z_]\w*)\s*\))\s*$", re.I)
_DROP = re.compile(
    r"^\s*drop\s+table\s+(?P<ie>if\s+exists\s+)?" + _IDENT_TAIL +
    r"(?P<purge>\s+purge)?\s*$", re.I)
_TRUNCATE = re.compile(
    r"^\s*truncate\s+table\s+" + _IDENT_TAIL + r"\s*$", re.I)
_CVIEW = re.compile(
    r"^\s*create\s+(?P<rep>or\s+replace\s+)?view\s+" + _IDENT_TAIL +
    r"\s+as\s+(?P<body>.+)$", re.I | re.S)
_DROP_VIEW = re.compile(
    r"^\s*drop\s+view\s+(?P<ie>if\s+exists\s+)?" + _IDENT_TAIL +
    r"\s*$", re.I)
_CREATE_NS = re.compile(
    r"^\s*create\s+namespace\s+(?P<ine>if\s+not\s+exists\s+)?"
    r"(?P<cat>[A-Za-z_]\w*)\." + rf"(?P<ns>{_PART}(?:\.{_PART})*)"
    r"\s*$", re.I)
_DROP_NS = re.compile(
    r"^\s*drop\s+namespace\s+(?P<ie>if\s+exists\s+)?"
    r"(?P<cat>[A-Za-z_]\w*)\." + rf"(?P<ns>{_PART}(?:\.{_PART})*)"
    r"\s*$", re.I)
_SHOW_TABLES = re.compile(
    r"^\s*show\s+tables\s+in\s+(?P<cat>[A-Za-z_]\w*)"
    r"(?:\.(?P<ns>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*))?\s*$", re.I)
_SHOW_NS = re.compile(
    r"^\s*show\s+namespaces\s+in\s+(?P<cat>[A-Za-z_]\w*)"
    r"(?:\.(?P<ns>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*))?\s*$", re.I)
_SHOW_PROPS = re.compile(
    r"^\s*show\s+tblproperties\s+" + _IDENT_TAIL + r"\s*$", re.I)
_DESCRIBE = re.compile(
    r"^\s*describe\s+(?:table\s+)?(?P<ext>extended\s+)?"
    + _IDENT_TAIL + r"\s*$", re.I)
_SHOW_CREATE = re.compile(
    r"^\s*show\s+create\s+table\s+" + _IDENT_TAIL + r"\s*$", re.I)
_SHOW_PARTS = re.compile(
    r"^\s*show\s+partitions\s+" + _IDENT_TAIL + r"\s*$", re.I)
_SHOW_VIEWS = re.compile(
    r"^\s*show\s+views\s+in\s+(?P<cat>[A-Za-z_]\w*)"
    r"(?:\.(?P<ns>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*))?\s*$", re.I)
_ALTER = re.compile(
    r"^\s*alter\s+table\s+" + _IDENT_TAIL + r"\s+(?P<body>.+)$",
    re.I | re.S)
# CALL <catalog>.system.<procedure>(named => args) — the Spark-Iceberg
# stored-procedure convention for maintenance operations
_CALL = re.compile(
    r"^\s*call\s+(?P<cat>[A-Za-z_]\w*)\.system\.(?P<proc>[A-Za-z_]\w*)"
    r"\s*\((?P<args>.*)\)\s*$", re.I | re.S)
# SQL type spellings accepted by ALTER TABLE ADD COLUMN, normalized to
# Iceberg type names (types.type_from_json owns the rest: decimal(p,s))
_SQL_TYPE_ALIASES = {
    "bigint": "long", "integer": "int", "smallint": "int",
    "tinyint": "int", "varchar": "string", "text": "string",
    "real": "float", "bool": "boolean", "timestamp_ntz": "timestamp",
    "timestamp_ltz": "timestamptz",
}
# suffixes of `<table>.<metadata table>` (Iceberg's SQL convention)
_META_TABLES = ("files", "manifests", "partitions", "snapshots",
                "refs", "history", "entries", "all_files",
                "all_manifests", "all_entries", "metadata_log_entries",
                "position_deletes")


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
        # per-statement stack of temp views created by _bind; the
        # public sql() drops them once the statement resolves (Spark
        # analyzes eagerly — the returned DataFrame's plan holds the
        # resolved relations, not the view names), so repeated
        # eng.sql() calls never grow the session catalog
        self._created_views: list[list[str]] = []
        # transaction scope of the statement being executed (sql(txn=))
        self._active_txn = None

    def sql(self, query: str, txn=None):
        """Resolve ``<catalog_name>.`` identifiers and run the query.
        Reads return the Spark DataFrame (lazy, as spark.sql does).
        Write statements — INSERT INTO/OVERWRITE, DELETE FROM,
        UPDATE ... SET, MERGE INTO, CREATE TABLE AS SELECT, DROP
        TABLE, ALTER TABLE, CALL <cat>.system.<proc> — map onto the
        corresponding IceTable mutation (one snapshot + CAS each) and
        return an empty ``num_affected_rows``-shaped frame (DML result
        convention; counting would force an extra job) or a small
        procedure-result frame. SHOW TABLES / SHOW NAMESPACES /
        DESCRIBE return metadata frames.

        ``txn``: a ``new_transaction()`` handle scopes the statement to
        the transaction's working copy — DML against the transaction's
        table accumulates on the pending chain (published as ONE CAS by
        ``txn.commit()``, exactly like the Python mutators), reads of
        that table see the pending chain, and statements that cannot
        compose into one table CAS (DDL, CALL procedures, DML on other
        tables) refuse loudly."""
        # one mask/unmask round-trip strips comments (literals restore
        # verbatim) so `-- note` / `/* note */` text can never bind an
        # identifier, hide a clause, or defeat the statement match
        masked0, lits0 = self._mask(query)
        q = self._unmask(masked0, lits0).strip().rstrip(";").strip()
        created: list[str] = []
        self._created_views.append(created)
        prev_txn, self._active_txn = self._active_txn, txn
        try:
            m = _INSERT.match(q)
            if m and m.group("cat") == self.catalog_name:
                return self._insert(self._clean_ident(m.group("rest")),
                                    m.group("mode").lower(),
                                    m.group("body"), cols=m.group("cols"))
            out = self._dml(q)
            if out is not None:
                return out
            return self._sql(q, depth=0)
        finally:
            self._active_txn = prev_txn
            self._created_views.pop()
            for v in created:
                try:
                    self.spark.catalog.dropTempView(v)
                except Exception:
                    pass

    def _no_txn(self, stmt: str) -> None:
        """Statements that cannot compose into the transaction's single
        table CAS refuse loudly rather than silently escaping it."""
        if self._active_txn is not None:
            raise ValueError(
                f"{stmt} cannot run inside a table transaction (it "
                "does not compose into the transaction's single "
                "metadata CAS); run it outside txn scope")

    def _txn_table(self, ident: str, stmt: str):
        """The transaction's working table when ``ident`` names it;
        raises when the statement targets a DIFFERENT table (a write
        outside the transaction would silently break its atomicity).
        A :class:`MultiTableTransaction` accepts ANY table of the
        catalog — each target joins the atomic batch on first use."""
        from iceberg_cpp_spark.transaction import MultiTableTransaction

        txn = self._active_txn
        if isinstance(txn, MultiTableTransaction):
            if not self.catalog.table_exists(ident):
                raise ValueError(
                    f"{stmt} target is not a table in catalog "
                    f"{self.catalog_name!r}: {ident!r}")
            return txn.table(ident, spark=self.spark)
        tid = getattr(txn.base, "identifier", None)
        if tid != ident:
            raise ValueError(
                f"transaction is bound to table {tid!r}; {stmt} "
                f"targets {ident!r} — one transaction composes writes "
                "to ONE table")
        return txn.table()

    def _dml(self, q: str):
        """Row-level DML / DDL against catalog tables. Returns None
        when ``q`` is not one of the handled statements (the caller
        falls through to the read path). All clause splitting happens
        on MASKED text so keywords inside string literals are inert;
        the captured pieces unmask before use."""
        masked, lits = self._mask(q)

        m = _DELETE.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._delete(m, lits)
        m = _UPDATE.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._update(m, lits)
        m = _MERGE_HEAD.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._merge(m, masked, lits)
        m = _CTAS.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._ctas(m, lits)
        m = _DROP.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._drop(m)
        m = _TRUNCATE.match(masked)
        if m and m.group("cat") == self.catalog_name:
            # TRUNCATE = unconditional row delete: ONE metadata-plane
            # snapshot (no file is read or rewritten), history kept —
            # time travel to the pre-truncate snapshot still works.
            # Composes into a transaction like any delete.
            from iceberg_cpp_spark.plans import expressions as ex

            ident, branch = self._split_branch(
                self._clean_ident(m.group("rest")))
            t = self._load(ident, "TRUNCATE TABLE")
            kw = {"branch": branch} if branch else {}
            t.delete_where(ex.ALWAYS_TRUE, **kw)
            return self._dml_result()
        m = _CVIEW.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._create_view(m, lits)
        m = _DROP_VIEW.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._drop_view(m)
        m = _CREATE_NS.match(masked)
        if m and m.group("cat") == self.catalog_name:
            self._no_txn("CREATE NAMESPACE")
            ns = self._clean_ident(m.group("ns"))
            if self.catalog.namespace_exists(ns):
                if m.group("ine"):
                    return self._dml_result()
                raise ValueError(
                    f"namespace already exists: {ns!r} "
                    "(use IF NOT EXISTS)")
            self.catalog.create_namespace(ns)
            return self._dml_result()
        m = _DROP_NS.match(masked)
        if m and m.group("cat") == self.catalog_name:
            self._no_txn("DROP NAMESPACE")
            ns = self._clean_ident(m.group("ns"))
            if not self.catalog.namespace_exists(ns):
                if m.group("ie"):
                    return self._dml_result()
                raise ValueError(f"no such namespace: {ns!r}")
            self.catalog.drop_namespace(ns)
            return self._dml_result()
        m = _SHOW_TABLES.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._show_tables(m.group("ns"))
        m = _SHOW_NS.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._show_namespaces(m.group("ns") or "")
        m = _SHOW_PROPS.match(masked)
        if m and m.group("cat") == self.catalog_name:
            from pyspark.sql import types as T

            t = self._load(self._clean_ident(m.group("rest")),
                           "SHOW TBLPROPERTIES")
            return self.spark.createDataFrame(
                sorted(t.properties().items()),
                T.StructType([
                    T.StructField("key", T.StringType(), False),
                    T.StructField("value", T.StringType(), False)]))
        m = _SHOW_CREATE.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._show_create(self._clean_ident(m.group("rest")))
        m = _SHOW_PARTS.match(masked)
        if m and m.group("cat") == self.catalog_name:
            # the `partitions` metadata table shape (typed partition
            # struct + per-partition rollups); rides the uncollected
            # plan plane, so a 10^6-file table answers without driver
            # FileScanTasks
            t = self._load(self._clean_ident(m.group("rest")),
                           "SHOW PARTITIONS")
            return t.partitions_df()
        m = _SHOW_VIEWS.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._show_views(m.group("ns"))
        m = _DESCRIBE.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._describe(self._clean_ident(m.group("rest")),
                                  extended=bool(m.group("ext")))
        m = _ALTER.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._alter(self._clean_ident(m.group("rest")), m.group("body"), lits)
        m = _CALL.match(masked)
        if m and m.group("cat") == self.catalog_name:
            return self._call(m.group("proc").lower(),
                              m.group("args"), lits)
        return None

    # -- ALTER TABLE ---------------------------------------------------------
    def _alter(self, ident: str, body: str, lits: list):
        from iceberg_cpp_spark.core.types import type_from_json

        t = self._load(ident, "ALTER TABLE")
        b = body.strip()
        # column names may be DOTTED paths (r16 nested-field DDL:
        # ADD COLUMN addr.zip long / RENAME COLUMN addr.zip TO postal /
        # DROP COLUMN addr.zip)
        _colpath = r"[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*"
        if m := re.match(rf"^add\s+column\s+(?P<name>{_colpath})\s+"
                         r"(?P<type>.+?)\s*$", b, re.I | re.S):
            t.add_column(m.group("name"),
                         self._parse_col_type(
                             m.group("type"),
                             self._subtree_id_counter(t, 1)))
            return self._dml_result()
        if m := re.match(rf"^rename\s+column\s+(?P<old>{_colpath})\s+"
                         r"to\s+(?P<new>[A-Za-z_]\w*)\s*$", b, re.I):
            t.rename_column(m.group("old"), m.group("new"))
            return self._dml_result()
        if m := re.match(rf"^drop\s+column\s+(?P<name>{_colpath})\s*$",
                         b, re.I):
            t.drop_column(m.group("name"))
            return self._dml_result()
        if m := re.match(r"^replace\s+columns\s*"
                         r"\((?P<defs>[^()]*(?:\([^()]*\)[^()]*)*)\)"
                         r"\s*$", b, re.I | re.S):
            cols = []
            for piece in self._split_coldefs(m.group("defs")):
                cm = re.match(r"^\s*([A-Za-z_]\w*)\s+(.+?)"
                              r"(?:\s+(?P<nn>not\s+null))?\s*$",
                              piece, re.I | re.S)
                if cm is None:
                    raise ValueError(
                        f"cannot parse column definition: "
                        f"{self._unmask(piece, lits)!r}")
                cols.append((cm.group(1), cm.group(2),
                             bool(cm.group("nn"))))
            ctr = self._subtree_id_counter(t, len(cols))
            t.replace_columns([
                (n, self._parse_col_type(ty, ctr), req)
                for n, ty, req in cols])
            return self._dml_result()
        if m := re.match(rf"^alter\s+column\s+(?P<name>{_colpath})\s+"
                         r"type\s+(?P<type>.+?)\s*$", b, re.I | re.S):
            # the promotion lattice is primitive-only; the shared
            # parser still gives nested spellings a clear refusal
            t.update_column_type(m.group("name"),
                                 self._parse_col_type(m.group("type")))
            return self._dml_result()
        if m := re.match(rf"^alter\s+column\s+(?P<name>{_colpath})\s+"
                         r"drop\s+not\s+null\s*$", b, re.I):
            t.make_column_optional(m.group("name"))
            return self._dml_result()
        if re.match(rf"^alter\s+column\s+{_colpath}\s+set\s+not\s+null"
                    r"\s*$", b, re.I):
            raise ValueError(
                "ALTER COLUMN ... SET NOT NULL is not allowed: "
                "optional -> required would claim existing rows are "
                "non-null without checking them (Iceberg forbids it); "
                "validate with expectations and rewrite instead")
        if m := re.match(rf"^alter\s+column\s+(?P<name>{_colpath})\s+"
                         r"set\s+default\s+(?P<val>.+?)\s*$",
                         b, re.I | re.S):
            t.update_column_default(
                m.group("name"), self._sql_literal(m.group("val"), lits))
            return self._dml_result()
        if m := re.match(rf"^alter\s+column\s+(?P<name>{_colpath})\s+"
                         r"drop\s+default\s*$", b, re.I):
            t.update_column_default(m.group("name"), None)
            return self._dml_result()
        if m := re.match(r"^set\s+identifier\s+fields\s+(?P<cols>.+?)\s*$",
                         b, re.I | re.S):
            names = [c.strip() for c in m.group("cols").split(",")]
            for n in names:
                if not re.fullmatch(r"[A-Za-z_]\w*", n):
                    raise ValueError(
                        f"bad identifier field name: {n!r}")
            t.set_identifier_fields(names)
            return self._dml_result()
        if re.match(r"^drop\s+identifier\s+fields\s*$", b, re.I):
            t.set_identifier_fields([])
            return self._dml_result()
        if m := re.match(r"^set\s+tblproperties\s*\((?P<kv>.*)\)\s*$",
                         b, re.I | re.S):
            t.update_properties(self._prop_pairs(m.group("kv"), lits))
            return self._dml_result()
        if m := re.match(r"^unset\s+tblproperties\s*\((?P<ks>.*)\)\s*$",
                         b, re.I | re.S):
            keys = [self._str_lit(k, lits)
                    for k in self._split_top(m.group("ks"))]
            t.update_properties(removals=keys)
            return self._dml_result()
        if m := re.match(r"^rename\s+to\s+(?P<cat>[A-Za-z_]\w*)\."
                         r"(?P<rest>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)+)\s*$",
                         b, re.I):
            if m.group("cat") != self.catalog_name:
                raise ValueError(
                    "RENAME TO must stay inside catalog "
                    f"{self.catalog_name!r}")
            self._no_txn("ALTER TABLE ... RENAME TO")
            self.catalog.rename_table(ident, self._clean_ident(m.group("rest")))
            return self._dml_result()
        if m := re.match(r"^create\s+(?P<kind>branch|tag)\s+"
                         r"(?P<name>[A-Za-z_]\w*)"
                         r"(?:\s+as\s+of\s+version\s+(?P<ver>\d+))?\s*$",
                         b, re.I):
            sid = int(m.group("ver")) if m.group("ver") else None
            if m.group("kind").lower() == "branch":
                t.create_branch(m.group("name"), snapshot_id=sid)
            else:
                t.create_tag(m.group("name"), snapshot_id=sid)
            return self._dml_result()
        if m := re.match(r"^drop\s+(?:branch|tag)\s+"
                         r"(?P<name>[A-Za-z_]\w*)\s*$", b, re.I):
            t.remove_ref(m.group("name"))
            return self._dml_result()
        if m := re.match(r"^add\s+partition\s+field\s+(?P<f>.+)$",
                         b, re.I | re.S):
            # partition evolution (metadata-only; existing files keep
            # their spec, scans prune per spec_id)
            f, tf, name = self._part_entry(m.group("f").strip(),
                                           t.schema())
            from iceberg_cpp_spark.core.metadata import PartitionField

            spec = t.spec()
            if any(pf.source_id == f.field_id
                   and str(pf.transform) == str(tf)
                   for pf in spec.fields):
                raise ValueError(
                    f"partition field already exists: "
                    f"{m.group('f').strip()!r}")
            if any(pf.name == name for pf in spec.fields):
                # bucket(4, k) and bucket(8, k) both derive 'k_bucket'
                # — two same-named fields make an invalid spec whose
                # failure would otherwise surface at the NEXT append
                raise ValueError(
                    f"partition field name collision: {name!r} is "
                    "already a field of the current spec")
            t.update_spec(list(spec.fields) + [PartitionField(
                source_id=f.field_id, field_id=0, name=name,
                transform=tf)])
            return self._dml_result()
        if m := re.match(r"^drop\s+partition\s+field\s+(?P<f>.+)$",
                         b, re.I | re.S):
            f, tf, _name = self._part_entry(m.group("f").strip(),
                                            t.schema())
            spec = t.spec()
            keep = [pf for pf in spec.fields
                    if not (pf.source_id == f.field_id
                            and str(pf.transform) == str(tf))]
            if len(keep) == len(spec.fields):
                raise ValueError(
                    f"no such partition field: {m.group('f').strip()!r}")
            t.update_spec(keep)
            return self._dml_result()
        if re.match(r"^write\s+unordered\s*$", b, re.I):
            t.replace_sort_order([])
            return self._dml_result()
        if m := re.match(r"^write\s+ordered\s+by\s+(?P<list>.+)$",
                         b, re.I | re.S):
            t.replace_sort_order(
                self._sort_fields(m.group("list"), t.schema()))
            return self._dml_result()
        raise ValueError(
            f"unsupported ALTER TABLE clause: "
            f"{self._unmask(b, lits)!r} (supported: ADD COLUMN, "
            "RENAME COLUMN ... TO, DROP COLUMN, REPLACE COLUMNS, "
            "ALTER COLUMN ... TYPE "
            "| DROP NOT NULL | SET/DROP DEFAULT, SET/UNSET "
            "TBLPROPERTIES, RENAME TO, CREATE/DROP BRANCH|TAG, "
            "ADD/DROP PARTITION FIELD, SET/DROP IDENTIFIER FIELDS, "
            "WRITE ORDERED BY / UNORDERED)")

    def _sort_fields(self, text: str, schema) -> list:
        """``WRITE ORDERED BY`` list → SortFields. Each entry is a
        partition-transform spelling or bare column, with optional
        ASC|DESC and NULLS FIRST|LAST (Iceberg defaults: ASC → NULLS
        FIRST, DESC → NULLS LAST)."""
        from iceberg_cpp_spark.core.metadata import SortField

        out = []
        for piece in self._split_top(text):
            sm = re.match(
                r"^\s*(?P<term>.+?)(?:\s+(?P<dir>asc|desc))?"
                r"(?:\s+nulls\s+(?P<n>first|last))?\s*$",
                piece, re.I | re.S)
            if sm is None:
                raise ValueError(
                    f"cannot parse WRITE ORDERED BY entry: {piece!r}")
            f, tf, _name = self._part_entry(sm.group("term").strip(),
                                            schema)
            direction = (sm.group("dir") or "asc").lower()
            nulls = (sm.group("n") or
                     ("first" if direction == "asc" else "last")).lower()
            out.append(SortField(
                source_id=f.field_id, transform=tf,
                direction=direction, null_order=f"nulls-{nulls}"))
        return out

    def _prop_pairs(self, kv: str, lits: list) -> dict:
        out = {}
        for piece in self._split_top(kv):
            pm = re.match(r"^\s*(\x00\d+\x00)\s*=\s*(\x00\d+\x00)\s*$",
                          piece)
            if pm is None:
                raise ValueError(
                    f"TBLPROPERTIES takes 'key' = 'value' pairs; got "
                    f"{self._unmask(piece, lits)!r}")
            out[self._str_lit(pm.group(1), lits)] = \
                self._str_lit(pm.group(2), lits)
        return out

    def _str_lit(self, token: str, lits: list) -> str:
        s = self._unmask(token.strip(), lits).strip()
        if len(s) < 2 or s[0] not in "'\"" or s[-1] != s[0]:
            raise ValueError(f"expected a quoted string, got {s!r}")
        return s[1:-1].replace("''", "'")

    def _sql_literal(self, token: str, lits: list):
        """A plain SQL literal (masked text): quoted string, integer,
        float, TRUE/FALSE, or NULL."""
        v = token.strip()
        if re.fullmatch(r"\x00\d+\x00", v):
            return self._str_lit(v, lits)
        low = v.lower()
        if low == "null":
            return None
        if low in ("true", "false"):
            return low == "true"
        if re.fullmatch(r"-?\d+", v):
            return int(v)
        if re.fullmatch(r"-?\d+\.\d+", v):
            return float(v)
        raise ValueError(
            f"expected a literal (string/number/bool/NULL), got "
            f"{self._unmask(v, lits)!r}")

    # -- CALL <catalog>.system.<proc>(...) -----------------------------------
    def _call(self, proc: str, args_text: str, lits: list):
        from pyspark.sql import types as T

        kwargs = self._call_args(args_text, lits)

        def require(key: str):
            if key not in kwargs:
                raise ValueError(f"CALL {proc} needs {key} => ...")
            return kwargs.pop(key)

        if proc == "register_table":
            # the one procedure whose table must NOT exist yet: point
            # the catalog at an existing metadata JSON (catalog move /
            # disaster recovery; metadata-only, no data touched)
            return self._call_register_table(require, kwargs)
        if proc == "snapshot":
            # zero-copy clone: table => the NEW table (must not
            # exist), source_table => the existing one
            return self._call_snapshot(require, kwargs)
        if proc == "migrate":
            # in-place conversion of a path-based parquet/orc/avro
            # table: files stay where they are, the Iceberg metadata
            # grows next to them, the identifier is the new table
            return self._call_migrate(require, kwargs)
        ident = kwargs.pop("table", None)
        if ident is None:
            raise ValueError(
                f"CALL {proc} needs a table => 'ns.name' argument")
        t = self._load(ident, f"CALL {proc}")

        def snap_frame(t2) -> "object":
            s = t2.current_snapshot()
            return self.spark.createDataFrame(
                [(s.snapshot_id if s else None,)],
                T.StructType([T.StructField("current_snapshot_id",
                                            T.LongType())]))

        if proc == "expire_snapshots":
            before = len(t.snapshots())
            t2 = t.expire_snapshots(
                older_than_ms=kwargs.pop("older_than_ms", None),
                keep_last=int(kwargs.pop("retain_last", 1)))
            self._no_extra(proc, kwargs)
            return self.spark.createDataFrame(
                [(before - len(t2.snapshots()),)],
                T.StructType([T.StructField("deleted_snapshots_count",
                                            T.LongType(), False)]))
        if proc == "remove_orphan_files":
            removed = t.remove_orphan_files(
                older_than_ms=kwargs.pop("older_than_ms", None),
                dry_run=bool(kwargs.pop("dry_run", False)))
            self._no_extra(proc, kwargs)
            return self.spark.createDataFrame(
                [(p,) for p in removed] or [],
                T.StructType([T.StructField("orphan_file_location",
                                            T.StringType(), False)]))
        if proc == "rewrite_data_files":
            zo = kwargs.pop("zorder_by", None)
            tfc = kwargs.pop("target_file_count", None)
            tfs = kwargs.pop("target_file_size_bytes", None)
            wh = kwargs.pop("where", None)
            self._no_extra(proc, kwargs)
            expr = None
            if wh is not None:
                # same restricted predicate grammar as SQL DELETE —
                # the filter selects FILES via pruning, so only
                # prunable shapes make sense here
                from iceberg_cpp_spark.plans.sql_parser import \
                    parse_predicate
                expr = parse_predicate(str(wh))
            return snap_frame(t.rewrite_data_files(
                target_file_count=int(tfc) if tfc is not None else None,
                target_file_size_bytes=(int(tfs) if tfs is not None
                                        else None),
                zorder_by=([c.strip() for c in zo.split(",")]
                           if zo else None),
                where=expr))
        if proc == "rewrite_manifests":
            self._no_extra(proc, kwargs)
            return snap_frame(t.rewrite_manifests())
        if proc == "rewrite_position_deletes":
            self._no_extra(proc, kwargs)
            return snap_frame(t.rewrite_position_deletes())
        if proc == "rewrite_equality_deletes":
            self._no_extra(proc, kwargs)
            return snap_frame(t.rewrite_equality_deletes())
        if proc == "rollback_to_snapshot":
            sid = require("snapshot_id")
            self._no_extra(proc, kwargs)
            return snap_frame(t.rollback_to(int(sid)))
        if proc == "rollback_to_timestamp":
            # latest snapshot committed AT OR BEFORE the timestamp
            # (Spark-Iceberg semantics); metadata-only
            ts = require("timestamp")
            self._no_extra(proc, kwargs)
            ms = (int(ts) if isinstance(ts, int)
                  else self._parse_ts_ms(str(ts)))
            # candidates come from main's ANCESTRY (Spark-Iceberg
            # SnapshotUtil semantics): a staged/WAP/branch snapshot or
            # previously rolled-back lineage must never win max() and
            # fail the ancestor-checked rollback
            cands = [s for s in t._ancestry("main")
                     if s.timestamp_ms <= ms]
            if not cands:
                raise ValueError(
                    f"no snapshot at or before {ts!r}")
            target = max(cands, key=lambda s: s.timestamp_ms)
            return snap_frame(t.rollback_to(target.snapshot_id))
        if proc == "set_current_snapshot":
            sid = require("snapshot_id")
            self._no_extra(proc, kwargs)
            return snap_frame(t.set_current_snapshot(int(sid)))
        if proc == "cherrypick_snapshot":
            sid = require("snapshot_id")
            self._no_extra(proc, kwargs)
            return snap_frame(t.cherry_pick(int(sid)))
        if proc == "publish_wap":
            wap = require("wap_id")
            self._no_extra(proc, kwargs)
            return snap_frame(t.publish_wap(str(wap)))
        if proc == "fast_forward":
            br, to = str(require("branch")), str(require("to"))
            self._no_extra(proc, kwargs)
            prev = t.metadata.ref(br)
            t2 = t.fast_forward(br, to)
            return self.spark.createDataFrame(
                [(br, prev.snapshot_id if prev else None,
                  t2.metadata.ref(br).snapshot_id)],
                T.StructType([
                    T.StructField("branch_updated", T.StringType(),
                                  False),
                    T.StructField("previous_ref", T.LongType()),
                    T.StructField("updated_ref", T.LongType(), False)]))
        if proc == "ancestors_of":
            # metadata-only parent-chain walk (the Spark-Iceberg
            # ancestors_of shape: newest first)
            sid = kwargs.pop("snapshot_id", None)
            self._no_extra(proc, kwargs)
            cur = (t.metadata.snapshot_by_id(int(sid))
                   if sid is not None else t.current_snapshot())
            if sid is not None and cur is None:
                raise ValueError(f"snapshot not found: {sid}")
            rows = []
            while cur is not None:
                rows.append((cur.snapshot_id, cur.timestamp_ms))
                cur = (t.metadata.snapshot_by_id(cur.parent_snapshot_id)
                       if cur.parent_snapshot_id is not None else None)
            return self.spark.createDataFrame(
                rows, T.StructType([
                    T.StructField("snapshot_id", T.LongType(), False),
                    T.StructField("timestamp_ms", T.LongType(),
                                  False)]))
        if proc == "add_files":
            # register existing files without rewriting them. source
            # is a directory or glob; the listing is a driver glob
            # (metadata scale — one path string per file), while the
            # format sniff + footer harvest distribute past the
            # add_files executor threshold (2048 paths).
            src = str(require("source"))
            self._no_extra(proc, kwargs)
            paths = self._list_source_files(src, "add_files")
            t.add_files(paths)
            return self.spark.createDataFrame(
                [(len(paths),)], T.StructType([
                    T.StructField("added_files_count", T.LongType(),
                                  False)]))
        if proc == "compute_table_stats":
            # NDV statistics into a Puffin file, registered on the
            # current snapshot (SetStatistics); one aggregation job
            self._no_extra(proc, kwargs)
            t2 = t.compute_statistics()
            entry = t2.metadata.statistics[-1]
            return self.spark.createDataFrame(
                [(entry["statistics-path"],)], T.StructType([
                    T.StructField("statistics_file", T.StringType(),
                                  False)]))
        if proc == "compute_partition_stats":
            # per-partition rollups from manifest metadata only
            self._no_extra(proc, kwargs)
            t2 = t.compute_partition_statistics()
            entry = t2.metadata.partition_statistics[-1]
            return self.spark.createDataFrame(
                [(entry["statistics-path"],)], T.StructType([
                    T.StructField("statistics_file", T.StringType(),
                                  False)]))
        if proc == "create_changelog_view":
            # the Spark-Iceberg CDC entry point: change rows between
            # two snapshots, registered as a session temp view the
            # caller queries with plain SQL. The view OUTLIVES the
            # statement (user-facing; not auto-dropped like the
            # engine's internal binding views).
            from iceberg_cpp_spark.streaming.changelog import changes

            name = kwargs.pop("changelog_view", None) or \
                f"{ident.rsplit('.', 1)[-1]}_changes"
            start = kwargs.pop("start_snapshot_id", None)
            end = kwargs.pop("end_snapshot_id", None)
            net = bool(kwargs.pop("net_changes", False))
            self._no_extra(proc, kwargs)
            df = changes(
                t, from_snapshot_id=(int(start) if start is not None
                                     else None),
                to_snapshot_id=int(end) if end is not None else None,
                net=net)
            df.createOrReplaceTempView(name)
            return self.spark.createDataFrame(
                [(name,)], T.StructType([
                    T.StructField("changelog_view", T.StringType(),
                                  False)]))
        raise ValueError(
            f"unknown procedure: {self.catalog_name}.system.{proc} "
            "(supported: expire_snapshots, remove_orphan_files, "
            "rewrite_data_files, rewrite_manifests, "
            "rewrite_position_deletes, rewrite_equality_deletes, "
            "rollback_to_snapshot, cherrypick_snapshot, publish_wap, "
            "fast_forward, ancestors_of, add_files, "
            "create_changelog_view, register_table, snapshot, migrate, "
            "compute_table_stats, compute_partition_stats, "
            "rollback_to_timestamp, set_current_snapshot)")

    def _call_snapshot(self, require, kwargs: dict):
        from pyspark.sql import types as T

        self._no_txn("CALL snapshot")
        src_ident = self._clean_ident(str(require("source_table")))
        dst_ident = self._clean_ident(str(require("table")))
        location = kwargs.pop("location", None)
        self._no_extra("snapshot", kwargs)
        if not self.catalog.table_exists(src_ident):
            raise ValueError(
                f"CALL snapshot source_table does not exist: "
                f"{src_ident!r}")
        src = self.catalog.load_table(src_ident, spark=self.spark)
        clone = src.snapshot_to(self.catalog, dst_ident,
                                location=(str(location)
                                          if location else None))
        s = clone.current_snapshot()
        files = int(s.summary.get("total-data-files", 0)) if s else 0
        return self.spark.createDataFrame(
            [(files,)], T.StructType([
                T.StructField("imported_files_count", T.LongType(),
                              False)]))

    def _call_register_table(self, require, kwargs: dict):
        from pyspark.sql import types as T

        self._no_txn("CALL register_table")
        ident = self._clean_ident(str(require("table")))
        mloc = str(require("metadata_file"))
        self._no_extra("register_table", kwargs)
        if self.catalog.table_exists(ident):
            raise ValueError(
                f"CALL register_table target already exists: {ident!r}")
        # validate BEFORE registering: a pointer-store catalog (e.g.
        # InMemory) does not read the file, and registering a dead
        # pointer would leave a permanently poisoned entry ('already
        # exists' on the retry with the corrected path)
        from iceberg_cpp_spark.core.metadata import read_table_metadata
        try:
            read_table_metadata(mloc)
        except Exception as exc:
            raise ValueError(
                f"CALL register_table cannot read metadata_file "
                f"{mloc!r}: {exc}") from exc
        self.catalog.register_table(ident, mloc)
        t = self.catalog.load_table(ident, spark=self.spark)
        s = t.current_snapshot()
        summary = dict(s.summary or {}) if s else {}

        def _n(key):
            v = summary.get(key)
            return int(v) if v is not None else None

        return self.spark.createDataFrame(
            [(s.snapshot_id if s else None, _n("total-records"),
              _n("total-data-files"))],
            T.StructType([
                T.StructField("current_snapshot_id", T.LongType()),
                T.StructField("total_records_count", T.LongType()),
                T.StructField("total_data_files_count", T.LongType())]))

    @staticmethod
    def _list_source_files(src: str, proc: str) -> list[str]:
        """Files under a source directory or glob, excluding hidden
        path components below the source root ('_'/'.' prefixes, the
        Hadoop/Iceberg convention): a crashed write's
        _temporary/.../part-*.parquet must never register as data."""
        import glob as _glob

        pattern = (os.path.join(src, "**", "*")
                   if os.path.isdir(src) else src)
        # the hidden check applies below the source ROOT: the
        # directory itself, or a glob's static prefix (everything
        # before the first wildcard)
        root = (src if os.path.isdir(src)
                else os.path.dirname(src.split("*", 1)[0])
                or os.sep)

        def _hidden(p: str) -> bool:
            rel = os.path.relpath(p, root)
            return any(part.startswith(("_", "."))
                       for part in rel.split(os.sep))

        paths = sorted(
            p for p in _glob.glob(pattern, recursive=True)
            if os.path.isfile(p) and not _hidden(p))
        if not paths:
            raise ValueError(
                f"CALL {proc} found no files under {src!r}")
        # Hive-partitioned layout guard (r17, VERDICT r16 item 1): a
        # key=value directory component means the files do NOT carry
        # the partition column — registering them by file schema alone
        # silently drops it (confirmed empirically in r16). Refuse
        # loudly, naming the columns, instead of converting a table
        # whose partition-column queries would break afterwards.
        hive_cols: set[str] = set()
        for p in paths:
            for part in os.path.relpath(p, root).split(os.sep)[:-1]:
                if "=" in part:
                    hive_cols.add(part.split("=", 1)[0])
        if hive_cols:
            raise ValueError(
                f"CALL {proc}: source {src!r} is a Hive-partitioned "
                f"layout (key=value directories); the partition "
                f"column(s) {sorted(hive_cols)} live in the paths, not "
                "the files, and would be silently dropped by "
                "registration. Rewrite the source unpartitioned "
                "(spark.read.parquet(src).write.parquet(flat)) or "
                "CREATE the Iceberg table and INSERT INTO it instead")
        return paths

    def _call_migrate(self, require, kwargs: dict):
        """``CALL ice.system.migrate(table => 'db.t', source =>
        '/path')`` — the Spark-Iceberg migrate shape: convert a
        path-based table to Iceberg IN PLACE. The data files are
        registered (add_files: format sniff + executor footer harvest
        + name mapping), never moved or rewritten, and the table's
        location defaults to the source directory itself so the
        metadata grows alongside the data. Refuses if the identifier
        already exists or the sniffer finds an unreadable file (the
        add_files refusals) — a refusal never leaves a partial table
        behind (the catalog entry is dropped on failure)."""
        from pyspark.sql import types as T

        from iceberg_cpp_spark.core.types import schema_from_spark

        self._no_txn("CALL migrate")
        ident = self._clean_ident(str(require("table")))
        src = str(require("source"))
        location = kwargs.pop("location", None)
        self._no_extra("migrate", kwargs)
        if self.catalog.table_exists(ident):
            raise ValueError(
                f"CALL migrate target already exists: {ident!r}")
        if not os.path.isdir(src) and "*" not in src:
            raise ValueError(
                f"CALL migrate source must be a directory or glob: "
                f"{src!r}")
        paths = self._list_source_files(src, "migrate")
        pq_paths = [p for p in paths if p.endswith(".parquet")]
        orc_paths = [p for p in paths if p.endswith(".orc")]
        if pq_paths:
            # schema from the files themselves (mergeSchema so a column
            # added over the directory's lifetime isn't silently
            # dropped); add_files harvests per-file metrics after
            schema = schema_from_spark(
                self.spark.read.option("mergeSchema", "true")
                .parquet(*pq_paths).schema)
        elif orc_paths:
            schema = schema_from_spark(
                self.spark.read.orc(*orc_paths).schema)
        else:
            raise ValueError(
                "CALL migrate needs parquet or ORC files to infer the "
                "schema from; for other layouts CREATE TABLE with an "
                "explicit schema and CALL add_files")
        loc = str(location) if location else (
            src if os.path.isdir(src) else os.path.dirname(
                src.split("*", 1)[0]))
        meta_dir = os.path.join(loc, "metadata")
        if os.path.exists(meta_dir):
            # a previous (possibly failed) migrate or an existing
            # Iceberg table — creating over it would mix chains, and
            # the failure cleanup below must only ever delete a
            # metadata dir THIS call created
            raise ValueError(
                f"CALL migrate: {meta_dir!r} already exists — the "
                "location already carries table metadata; remove it "
                "or register_table/snapshot instead")
        self.catalog.create_table(ident, schema, location=loc,
                                  properties={"migrate.source": src})
        try:
            t = self.catalog.load_table(ident, spark=self.spark)
            t = t.add_files(paths)
        except Exception:
            # never leave a poisoned half-migrated entry OR a stray
            # metadata dir inside the source (a leftover
            # v1.metadata.json would be swept into the retry's
            # add_files listing and wedge it — review r16): the dir
            # was created by THIS call (checked above), so removing
            # it is safe
            import shutil as _shutil

            self.catalog.drop_table(ident)
            _shutil.rmtree(meta_dir, ignore_errors=True)
            raise
        s = t.current_snapshot()
        return self.spark.createDataFrame(
            [(len(paths),
              int(s.summary.get("total-records", 0)) if s else 0)],
            T.StructType([
                T.StructField("migrated_files_count", T.LongType(),
                              False),
                T.StructField("migrated_rows_count", T.LongType(),
                              False)]))

    @staticmethod
    def _no_extra(proc: str, kwargs: dict) -> None:
        if kwargs:
            raise ValueError(
                f"unknown argument(s) for {proc}: {sorted(kwargs)}")

    def _call_args(self, text: str, lits: list) -> dict:
        """``name => value`` pairs; values are quoted strings, numbers,
        or true/false."""
        out: dict = {}
        if not text.strip():
            return out
        for piece in self._split_top(text):
            pm = re.match(r"^\s*([A-Za-z_]\w*)\s*=>\s*(.+?)\s*$",
                          piece, re.S)
            if pm is None:
                raise ValueError(
                    f"CALL arguments are name => value; got "
                    f"{self._unmask(piece, lits)!r}")
            name, val = pm.group(1).lower(), pm.group(2)
            if re.fullmatch(r"\x00\d+\x00", val):
                out[name] = self._str_lit(val, lits)
            elif val.lower() in ("true", "false"):
                out[name] = val.lower() == "true"
            elif re.fullmatch(r"-?\d+", val):
                out[name] = int(val)
            elif re.fullmatch(r"-?\d+\.\d+", val):
                out[name] = float(val)
            else:
                raise ValueError(
                    f"cannot parse CALL argument value: "
                    f"{self._unmask(val, lits)!r}")
        return out

    def _show_tables(self, ns: Optional[str]):
        from pyspark.sql import types as T

        # list_tables returns fully-qualified identifiers; SHOW TABLES
        # reports the bare table name next to its namespace
        return self._show_idents(ns, self.catalog.list_tables,
                                 "tableName")

    def _show_views(self, ns: Optional[str]):
        lister = getattr(self.catalog, "list_views", None)
        if lister is None:
            raise ValueError(
                f"catalog {self.catalog_name!r} does not support views")
        return self._show_idents(ns, lister, "viewName")

    def _all_namespaces(self) -> list:
        """Every namespace including NESTED ones (list_namespaces is
        one level per call) — an unscoped SHOW TABLES/VIEWS must not
        silently omit a.b just because only 'a' is top-level."""
        # visited-set BFS: catalogs differ on whether list_namespaces
        # returns direct children (InMemory/FS) or all descendants
        # (Rest) — dedup keeps the walk correct and linear either way
        seen, stack = set(), [""]
        while stack:
            parent = stack.pop()
            for n in self.catalog.list_namespaces(parent) or []:
                if n not in seen:
                    seen.add(n)
                    stack.append(n)
        return sorted(seen)

    def _show_idents(self, ns: Optional[str], lister, col: str):
        from pyspark.sql import types as T

        namespaces = [ns] if ns else self._all_namespaces()
        rows = [(n, t.rsplit(".", 1)[-1]) for n in namespaces
                for t in sorted(lister(n))]
        return self.spark.createDataFrame(
            rows, T.StructType([
                T.StructField("namespace", T.StringType(), False),
                T.StructField(col, T.StringType(), False)]))

    def _show_namespaces(self, parent: str):
        from pyspark.sql import types as T

        rows = [(n,) for n in sorted(self.catalog.list_namespaces(parent))]
        return self.spark.createDataFrame(
            rows, T.StructType([
                T.StructField("namespace", T.StringType(), False)]))

    def _describe(self, ident: str, extended: bool = False):
        from pyspark.sql import types as T

        import json as _json

        t = self._load(ident, "DESCRIBE")
        # primitives print the Iceberg name; nested types print the
        # runnable SQL spelling (r16 — was the spec JSON)
        rows = [(f.name,
                 tj if isinstance(tj := f.field_type.to_json(), str)
                 else self._sql_type_ddl(f.field_type).lower(),
                 not f.required)
                for f in t.schema().fields]
        if extended:
            # the operator-facing metadata a migration engineer reads
            # first: spec (DDL transform spellings), sort order,
            # current snapshot, properties (VERDICT r14 task 8)
            md = t.metadata
            snap = t.current_snapshot()
            spec_ddl = self._spec_ddl(t.spec(), t.schema())
            so = t.sort_order()
            sort_ddl = ", ".join(
                f"{self._sort_field_ddl(f, t.schema())}"
                for f in so.fields) if not so.is_unsorted else ""
            rows += [
                ("", "", False),
                ("# Detailed Table Information", "", False),
                ("Format Version", str(md.format_version), False),
                ("Table UUID", str(md.table_uuid), False),
                ("Location", md.location, False),
                ("Current Snapshot ID",
                 str(snap.snapshot_id) if snap else "", False),
                ("Current Schema ID", str(md.current_schema_id), False),
                ("Partition Spec",
                 f"({spec_ddl})" if spec_ddl else "(unpartitioned)",
                 False),
                ("Sort Order", sort_ddl or "(unsorted)", False),
                ("Identifier Fields",
                 ", ".join(t.identifier_field_names()) or "(none)",
                 False),
                ("Snapshot Count", str(len(md.snapshots)), False),
                ("Properties", _json.dumps(t.properties(),
                                           sort_keys=True), False),
            ]
        return self.spark.createDataFrame(
            rows, T.StructType([
                T.StructField("col_name", T.StringType(), False),
                T.StructField("data_type", T.StringType(), False),
                T.StructField("nullable", T.BooleanType(), False)]))

    # Iceberg type name → SQL DDL spelling (inverse of
    # _SQL_TYPE_ALIASES; unlisted names upper-case through: DATE,
    # UUID, DECIMAL(p,s), FIXED[n], ...)
    _DDL_TYPES = {"long": "BIGINT", "timestamptz": "TIMESTAMP_LTZ"}

    def _sql_type_ddl(self, field_type) -> str:
        """Iceberg type → the SQL DDL spelling SHOW CREATE prints and
        _parse_col_type re-parses (r16: nested types render as
        STRUCT<name: TYPE [NOT NULL], ...> / ARRAY<> / MAP<,> instead
        of the spec JSON, so the statement stays runnable)."""
        from iceberg_cpp_spark.core import types as ity

        t = field_type
        if isinstance(t, ity.StructType):
            inner = ", ".join(
                f"{f.name}: {self._sql_type_ddl(f.field_type)}"
                + (" NOT NULL" if f.required else "")
                for f in t.fields)
            return f"STRUCT<{inner}>"
        if isinstance(t, ity.ListType):
            nn = " NOT NULL" if t.element_required else ""
            return f"ARRAY<{self._sql_type_ddl(t.element_type)}{nn}>"
        if isinstance(t, ity.MapType):
            nn = " NOT NULL" if t.value_required else ""
            return (f"MAP<{self._sql_type_ddl(t.key_type)}, "
                    f"{self._sql_type_ddl(t.value_type)}{nn}>")
        tj = t.to_json()
        return self._DDL_TYPES.get(tj, tj.upper())

    @staticmethod
    def _subtree_id_counter(t, reserve: int):
        """Fresh-ID counter for nested subtrees added by DDL: starts
        above BOTH the table's last_column_id and every id actually
        assigned anywhere in the schema (incl. list element / map
        key+value ids the name index never sees), leaving ``reserve``
        slots for the mutator's own sequential top-level ids
        (add_column takes last+1; replace_columns takes last+1..+N)."""
        from iceberg_cpp_spark.core.types import max_assigned_field_id

        base = max(t.metadata.last_column_id,
                   max_assigned_field_id(t.schema().fields))
        return iter(range(base + 1 + reserve, 10 ** 9))

    def _parse_col_type(self, text: str, counter=None):
        """SQL type spelling → IcebergType. Primitive and
        Iceberg-specific spellings (timestamptz, uuid, fixed[n],
        variant, geometry...) resolve through the alias map +
        type_from_json; nested spellings — ``struct<name: type [NOT
        NULL], ...>``, ``array<type [NOT NULL]>``, ``map<k, v [NOT
        NULL]>`` — parse recursively (leaves resolve through the same
        map, so Iceberg-only types nest too) with field IDs drawn from
        ``counter`` (callers pass a range above the table's
        last_column_id so new subtree IDs can never collide). The
        element/value NOT NULL spellings are this engine's extension —
        Spark's DDL has no element-nullability syntax — and are what
        SHOW CREATE emits, so required list elements / map values
        round-trip."""
        if counter is None:
            counter = iter(range(10_000, 1_000_000))
        return self._parse_type_rec(text, counter)

    def _parse_type_rec(self, text: str, counter):
        from iceberg_cpp_spark.core import types as ity
        from iceberg_cpp_spark.core.types import type_from_json

        s = text.strip()
        low = re.sub(r"\s+", "", s).lower()
        if low.startswith("struct<") and low.endswith(">"):
            inner = s[s.index("<") + 1:s.rindex(">")]
            fields = []
            for piece in self._split_coldefs(inner):
                fm = re.match(r"^\s*([A-Za-z_]\w*)\s*:\s*(.+?)"
                              r"(?:\s+(?P<nn>not\s+null))?\s*$",
                              piece, re.I | re.S)
                if fm is None:
                    raise ValueError(
                        f"cannot parse struct field: {piece.strip()!r}"
                        " (expected name: type [NOT NULL])")
                fid = next(counter)
                fields.append(ity.NestedField(
                    fid, fm.group(1),
                    self._parse_type_rec(fm.group(2), counter),
                    required=bool(fm.group("nn"))))
            return ity.StructType(fields)
        if low.startswith("array<") and low.endswith(">"):
            inner = s[s.index("<") + 1:s.rindex(">")]
            em = re.match(r"^(.+?)(?:\s+(?P<nn>not\s+null))?\s*$",
                          inner, re.I | re.S)
            eid = next(counter)
            return ity.ListType(
                eid, self._parse_type_rec(em.group(1), counter),
                element_required=bool(em.group("nn")))
        if low.startswith("map<") and low.endswith(">"):
            inner = s[s.index("<") + 1:s.rindex(">")]
            parts = self._split_coldefs(inner)
            if len(parts) != 2:
                raise ValueError(
                    f"map type needs exactly two type arguments: "
                    f"{s!r}")
            kid = next(counter)
            kt = self._parse_type_rec(parts[0], counter)
            vm = re.match(r"^(.+?)(?:\s+(?P<nn>not\s+null))?\s*$",
                          parts[1], re.I | re.S)
            vid = next(counter)
            return ity.MapType(
                kid, kt, vid,
                self._parse_type_rec(vm.group(1), counter),
                value_required=bool(vm.group("nn")))
        raw = _SQL_TYPE_ALIASES.get(low, low)
        try:
            return type_from_json(raw)
        except ValueError as exc:
            raise ValueError(
                f"cannot parse column type {s!r}: {exc}") from exc

    @staticmethod
    def _transform_ddl(transform, col: str) -> str:
        """spec transform → PARTITIONED BY DDL spelling (the inverse
        of _PART_FIELD): identity→col, bucket[N]→bucket(N, col),
        truncate[W]→truncate(W, col), year→years(col), ..."""
        s = str(transform)
        if s == "identity":
            return col
        if m := re.fullmatch(r"(bucket|truncate)\[(\d+)\]", s):
            return f"{m.group(1)}({m.group(2)}, {col})"
        if s in ("year", "month", "day", "hour"):
            return f"{s}s({col})"
        return f"{s}({col})"  # void / unknown: non-DDL, still readable

    def _spec_ddl(self, spec, schema) -> str:
        parts = []
        for f in spec.fields:
            src = schema.find_field_by_id(f.source_id)
            col = src.name if src is not None else f"<{f.source_id}>"
            parts.append(self._transform_ddl(f.transform, col))
        return ", ".join(parts)

    def _sort_field_ddl(self, f, schema) -> str:
        src = schema.find_field_by_id(f.source_id)
        col = src.name if src is not None else f"<{f.source_id}>"
        return (f"{self._transform_ddl(f.transform, col)} "
                f"{f.direction.upper()} "
                f"{f.null_order.upper().replace('-', ' ')}")

    def _show_create(self, ident: str):
        from pyspark.sql import types as T

        t = self._load(ident, "SHOW CREATE TABLE")
        cols = ",\n".join(
            f"  {f.name} {self._sql_type_ddl(f.field_type)}"
            + (" NOT NULL" if f.required else "")
            for f in t.schema().fields)
        stmt = (f"CREATE TABLE {self.catalog_name}.{ident} (\n{cols})\n"
                "USING iceberg")
        spec_ddl = self._spec_ddl(t.spec(), t.schema())
        if spec_ddl:
            stmt += f"\nPARTITIONED BY ({spec_ddl})"
        props = t.properties()
        if props:
            kv = ",\n".join(
                f"  '{k}' = '{v}'" for k, v in sorted(props.items()))
            stmt += f"\nTBLPROPERTIES (\n{kv})"
        return self.spark.createDataFrame(
            [(stmt,)], T.StructType([
                T.StructField("createtab_stmt", T.StringType(), False)]))

    def _dml_result(self):
        from pyspark.sql import types as T

        return self.spark.createDataFrame(
            [], T.StructType([T.StructField("num_affected_rows",
                                            T.LongType())]))

    def _load(self, ident: str, stmt: str):
        if self._active_txn is not None:
            return self._txn_table(ident, stmt)
        if not self.catalog.table_exists(ident):
            raise ValueError(
                f"{stmt} target is not a table in catalog "
                f"{self.catalog_name!r}: {ident!r}")
        return self.catalog.load_table(ident, spark=self.spark)

    def _split_branch(self, ident: str):
        """``<table>.branch_<name>`` (the Spark-Iceberg suffix
        convention) → (table ident, branch name) when the dotted name
        is not itself a table and its parent is. DML against the
        suffix commits to that branch; main is untouched (the WAP
        shape). Returns (ident, None) otherwise."""
        if "." in ident and not self.catalog.table_exists(ident):
            parent, last = ident.rsplit(".", 1)
            if last.startswith("branch_") and len(last) > 7 \
                    and self.catalog.table_exists(parent):
                br = last[len("branch_"):]
                t = self.catalog.load_table(parent, spark=self.spark)
                if t.metadata.ref(br) is None:
                    # a typo'd suffix must not silently CREATE a branch
                    # on write (CREATE BRANCH first)
                    raise ValueError(
                        f"no such branch on {parent!r}: {br!r}")
                return parent, br
        return ident, None

    def _where_expr(self, pred: Optional[str], lits: list):
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.plans.sql_parser import parse_predicate

        if pred is None:
            return ex.ALWAYS_TRUE
        return parse_predicate(self._unmask(pred, lits))

    # `col IN (SELECT ...)` — the keyed-delete shape; maps onto a
    # delete-only MERGE so discovery stays the key semi-join (the
    # general subquery predicate still refuses: not prunable)
    # prefix of the keyed-subquery DML shape; the shape check proper
    # lives in _in_subquery_keys (the '(' must close at the predicate's
    # END, so compound predicates fall through to the refusing parser)
    _IN_SUBQUERY_HEAD = re.compile(
        r"^\s*(?:(?P<qual>[A-Za-z_]\w*)\s*\.\s*)?(?P<col>[A-Za-z_]\w*)"
        r"\s+in\s*\(", re.I)

    def _in_subquery_keys(self, pred: Optional[str], lits: list,
                          ident: str, stmt: str):
        """``col IN (SELECT ...)`` as the WHOLE predicate → (col,
        deduped one-column keys DataFrame), else None (the caller's
        normal predicate parser — and its loud refusals — own
        everything else). A qualifier must name the target table; a
        nested column (``addr.zip``) or foreign qualifier falls
        through rather than silently binding a top-level column.
        Keys dedupe (MERGE cardinality) — SQL IN semantics are
        set-based anyway."""
        if pred is None:
            return None
        hm = self._IN_SUBQUERY_HEAD.match(pred)
        if hm is None:
            return None
        if hm.group("qual") is not None \
                and hm.group("qual") != ident.rsplit(".", 1)[-1]:
            return None
        i = hm.end() - 1  # at '('
        depth, j = 0, i
        for j in range(i, len(pred)):
            depth += (pred[j] == "(") - (pred[j] == ")")
            if depth == 0:
                break
        if depth != 0 or pred[j + 1:].strip():
            return None  # unbalanced or trailing text: not this shape
        sub = pred[i + 1:j]
        if not re.match(r"^\s*select\b", sub, re.I):
            return None
        keys = self._sql(self._unmask(sub, lits), depth=0)
        if len(keys.columns) != 1:
            raise ValueError(
                f"{stmt} ... IN (subquery) needs a one-column "
                f"subquery; got {len(keys.columns)} columns")
        return hm.group("col"), keys.toDF(hm.group("col")).distinct()

    def _delete(self, m: "re.Match", lits: list):
        ident, branch = self._split_branch(
            self._clean_ident(m.group("rest")))
        t = self._load(ident, "DELETE")
        kw = {"branch": branch} if branch else {}
        pred = m.group("pred")
        if (sq := self._in_subquery_keys(pred, lits, ident,
                                         "DELETE")) is not None:
            col, keys = sq
            t.merge_into(keys, on=[col], when_matched="delete",
                         when_not_matched=None, **kw)
            return self._dml_result()
        t.delete_where(self._where_expr(pred, lits), **kw)
        return self._dml_result()

    def _update(self, m: "re.Match", lits: list):
        from pyspark.sql import functions as F

        from iceberg_cpp_spark.core.types import to_spark_schema

        ident, branch = self._split_branch(
            self._clean_ident(m.group("rest")))
        t = self._load(ident, "UPDATE")
        # the VALUES are full Spark scalar expressions (arithmetic,
        # CASE, functions) — update_where applies them over the rewrite
        # frame, so Spark's parser is the right owner. F.expr defers
        # parsing until the Column is USED and a no-match update never
        # uses it — analyze eagerly against an EMPTY frame with the
        # table's columns (no job) so a typo is loud even when zero
        # files match
        chk = self.spark.createDataFrame([], to_spark_schema(t.schema()))
        raw: list[tuple[str, str]] = []  # (target col, MASKED value)
        for piece in self._split_top(m.group("set")):
            am = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+)$", piece, re.S)
            if am is None:
                raise ValueError(
                    f"cannot parse SET assignment: "
                    f"{self._unmask(piece, lits)!r}")
            chk.selectExpr(
                f"({self._unmask(am.group(2), lits)}) AS __chk")
            raw.append((am.group(1), am.group(2)))
        kw = {"branch": branch} if branch else {}
        pred = m.group("pred")
        if (sq := self._in_subquery_keys(pred, lits, ident,
                                         "UPDATE")) is not None:
            # keyed-update shape: update-only clause MERGE keeps
            # discovery on the key semi-join. Bare references to the
            # KEY column requalify to `t.` on the MASKED text (the
            # source frame carries the same-named key, which would
            # otherwise make the reference ambiguous in the join)
            from iceberg_cpp_spark.table import MatchedClause

            col, keys = sq
            requal = re.compile(
                rf"(?<![\w.]){re.escape(col)}(?![\w.(])")
            assignments = {
                name: self._unmask(requal.sub(f"t.{col}", mv), lits)
                for name, mv in raw}
            t.merge_into(
                keys, on=[col],
                when_matched=[MatchedClause("update",
                                            assignments=assignments)],
                when_not_matched=None, **kw)
            return self._dml_result()
        assignments = {name: F.expr(self._unmask(mv, lits))
                       for name, mv in raw}
        t.update_where(self._where_expr(pred, lits),
                       assignments, **kw)
        return self._dml_result()

    def _merge(self, m: "re.Match", masked: str, lits: list):
        ident, t_alias = self._clean_ident(m.group("rest")), m.group("tal")
        ident, branch = self._split_branch(ident)
        rest = masked[m.end():]
        # source: a parenthesized subquery or a table/view name
        src_name = None
        if rest.lstrip().startswith("("):
            rest = rest.lstrip()
            depth, i = 0, 0
            for i, ch in enumerate(rest):
                depth += (ch == "(") - (ch == ")")
                if depth == 0:
                    break
            if depth != 0:
                raise ValueError("unbalanced parens in MERGE source")
            src_text, rest = rest[1:i], rest[i + 1:]
        else:
            sm = re.match(r"\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)", rest)
            if sm is None:
                raise ValueError("cannot parse MERGE USING source")
            src_text, rest = f"SELECT * FROM {sm.group(1)}", rest[sm.end():]
            src_name = sm.group(1).rsplit(".", 1)[-1]
        am = re.match(r"\s*(?:as\s+)?([A-Za-z_]\w*)?\s*on\s+", rest, re.I)
        if am is None:
            raise ValueError("MERGE needs ON after the USING source")
        s_alias, rest = am.group(1) or src_name, rest[am.end():]
        # condition runs to the first depth-0 WHEN (masked text:
        # literals inert; a WHEN inside a parenthesized subexpression
        # never splits the clause)
        w = self._find_kw(rest, "when")
        if w is None:
            raise ValueError("MERGE needs at least one WHEN clause")
        cond, clauses = rest[:w[0]], rest[w[0]:]
        t_names = {a for a in (t_alias, ident.rsplit(".", 1)[-1]) if a}
        s_names = {s_alias} if s_alias else set()
        on = self._merge_on_keys(cond, t_names, s_names, lits)
        matched, not_matched, by_source = self._parse_merge_clauses(
            clauses, t_names, s_names, lits)
        t = self._load(ident, "MERGE")
        src_df = self._sql(self._unmask(src_text, lits), depth=0)
        kw = {"branch": branch} if branch else {}
        t.merge_into(src_df, on=on, when_matched=matched,
                     when_not_matched=not_matched,
                     when_not_matched_by_source=by_source or None, **kw)
        return self._dml_result()

    @staticmethod
    def _kw_positions(text: str, kw: str) -> list:
        """(start, end) pairs of the keyword at paren depth 0 AND
        outside any CASE ... END expression — so a clause condition or
        SET value may contain an unparenthesized CASE whose WHEN/THEN
        never split the MERGE clause structure. Runs on masked text
        (literals inert)."""
        out, depth, case_depth = [], 0, 0
        for m in re.finditer(r"[()]|\b(?:case|end|when|then)\b",
                             text, re.I):
            tok = m.group(0).lower()
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
            elif depth == 0:
                if tok == "case":
                    case_depth += 1
                elif tok == "end":
                    case_depth = max(0, case_depth - 1)
                elif tok == kw and case_depth == 0:
                    out.append((m.start(), m.end()))
        return out

    def _find_kw(self, text: str, kw: str):
        """First depth-0, CASE-free occurrence of the keyword, or
        None."""
        hits = self._kw_positions(text, kw)
        return hits[0] if hits else None

    def _parse_merge_clauses(self, text: str, t_names: set,
                             s_names: set, lits: list):
        """WHEN clause list → (MatchedClause list, NotMatchedClause
        list, NotMatchedBySourceClause list). Supported actions
        (Spark-Iceberg MERGE surface): ``UPDATE SET *`` / ``UPDATE SET
        col = expr, ...`` / ``DELETE`` on MATCHED, ``INSERT *`` /
        ``INSERT (cols) VALUES (exprs)`` on NOT MATCHED [BY TARGET],
        ``UPDATE SET col = expr`` / ``DELETE`` on NOT MATCHED BY SOURCE
        (the Spark 3.4+ full-sync leg; expressions see the target
        only); every clause takes an optional ``AND <condition>``.
        Clause ordering rules (first-wins, conditionless-last) are
        enforced by merge_into."""
        starts = [s for s, _e in self._kw_positions(text, "when")]
        if not starts or text[:starts[0]].strip():
            raise ValueError(
                f"unsupported MERGE clause: "
                f"{self._unmask(text, lits).strip()!r}")
        matched, not_matched, by_source = [], [], []
        for a, b in zip(starts, starts[1:] + [len(text)]):
            seg = text[a:b]
            hm = _MERGE_WHEN_HEAD.match(seg)
            if hm is None:
                raise ValueError(
                    f"unsupported MERGE clause: "
                    f"{self._unmask(seg, lits).strip()!r}")
            body = seg[hm.end():]
            th = self._find_kw(body, "then")
            if th is None:
                raise ValueError("MERGE WHEN clause needs THEN")
            cond_part, act = body[:th[0]].strip(), body[th[1]:].strip()
            is_not = bool(hm.group("not"))
            by = (hm.group("by") or "").lower()
            if by and not is_not:
                raise ValueError(
                    "WHEN MATCHED BY ... is not a MERGE clause; did "
                    "you mean WHEN NOT MATCHED BY SOURCE?")
            is_bs = is_not and by == "source"
            cond = None
            if cond_part:
                cm = re.match(r"^and\s+(?P<c>.+)$", cond_part,
                              re.I | re.S)
                if cm is None:
                    raise ValueError(
                        f"expected AND <condition> before THEN; got "
                        f"{self._unmask(cond_part, lits).strip()!r}")
                cond = self._requal(
                    cm.group("c"), t_names, s_names, lits,
                    allow_target=(not is_not) or is_bs,
                    allow_source=not is_bs)
            if is_bs:
                by_source.append(self._parse_by_source_action(
                    act, cond, t_names, s_names, lits))
            elif is_not:
                not_matched.append(self._parse_insert_action(
                    act, cond, t_names, s_names, lits))
            else:
                matched.append(self._parse_matched_action(
                    act, cond, t_names, s_names, lits))
        return matched, not_matched, by_source

    def _parse_matched_action(self, act: str, cond, t_names: set,
                              s_names: set, lits: list):
        from iceberg_cpp_spark.table import MatchedClause

        if re.fullmatch(r"delete", act, re.I):
            return MatchedClause("delete", condition=cond)
        if re.fullmatch(r"update\s+set\s+\*", act, re.I):
            return MatchedClause("update", condition=cond)
        um = re.match(r"^update\s+set\s+(?P<set>.+)$", act, re.I | re.S)
        if um is None:
            raise ValueError(
                "WHEN MATCHED supports UPDATE SET * | UPDATE SET col = "
                f"expr, ... | DELETE; got "
                f"{self._unmask(act, lits).strip()!r}")
        assignments: dict = {}
        for piece in self._split_top(um.group("set")):
            am = re.match(r"^\s*(?:([A-Za-z_]\w*)\s*\.\s*)?"
                          r"([A-Za-z_]\w*)\s*=\s*(.+)$", piece, re.S)
            if am is None:
                raise ValueError(
                    f"cannot parse SET assignment: "
                    f"{self._unmask(piece, lits).strip()!r}")
            qual, col, val = am.groups()
            if qual is not None and qual not in t_names:
                raise ValueError(
                    f"SET target must be a target column; got "
                    f"{qual}.{col}")
            if col in assignments:
                raise ValueError(f"duplicate SET target: {col!r}")
            assignments[col] = self._requal(val, t_names, s_names, lits)
        return MatchedClause("update", condition=cond,
                             assignments=assignments)

    def _parse_insert_action(self, act: str, cond, t_names: set,
                             s_names: set, lits: list):
        from iceberg_cpp_spark.table import NotMatchedClause

        if re.fullmatch(r"insert\s+\*", act, re.I):
            return NotMatchedClause(condition=cond)
        im = _MERGE_INSERT_ACT.match(act)
        if im is None:
            raise ValueError(
                "WHEN NOT MATCHED supports INSERT * | INSERT (cols) "
                f"VALUES (exprs); got "
                f"{self._unmask(act, lits).strip()!r}")
        cols = [c.strip() for c in im.group("cols").split(",")]
        vals = self._split_top(im.group("vals"))
        if len(cols) != len(vals):
            raise ValueError(
                f"INSERT lists {len(cols)} columns but "
                f"{len(vals)} values")
        values: dict = {}
        for c, v in zip(cols, vals):
            cm = re.match(r"^(?:([A-Za-z_]\w*)\s*\.\s*)?"
                          r"([A-Za-z_]\w*)$", c)
            if cm is None:
                raise ValueError(f"bad INSERT column name: {c!r}")
            qual, col = cm.groups()
            if qual is not None and qual not in t_names:
                raise ValueError(
                    f"INSERT column must be a target column; got "
                    f"{qual}.{col}")
            if col in values:
                raise ValueError(f"duplicate INSERT column: {col!r}")
            values[col] = self._requal(v, t_names, s_names, lits,
                                       allow_target=False)
        return NotMatchedClause(condition=cond, values=values)

    def _parse_by_source_action(self, act: str, cond, t_names: set,
                                s_names: set, lits: list):
        """``WHEN NOT MATCHED BY SOURCE THEN DELETE | UPDATE SET col =
        expr, ...`` — no SET * (there is no source row to copy) and no
        INSERT (the row already exists in the target)."""
        from iceberg_cpp_spark.table import NotMatchedBySourceClause

        if re.fullmatch(r"delete", act, re.I):
            return NotMatchedBySourceClause("delete", condition=cond)
        um = re.match(r"^update\s+set\s+(?P<set>.+)$", act, re.I | re.S)
        if um is None or re.fullmatch(r"update\s+set\s+\*", act, re.I):
            raise ValueError(
                "WHEN NOT MATCHED BY SOURCE supports UPDATE SET col = "
                "expr, ... | DELETE (no SET * — there is no source "
                f"row); got {self._unmask(act, lits).strip()!r}")
        assignments: dict = {}
        for piece in self._split_top(um.group("set")):
            am = re.match(r"^\s*(?:([A-Za-z_]\w*)\s*\.\s*)?"
                          r"([A-Za-z_]\w*)\s*=\s*(.+)$", piece, re.S)
            if am is None:
                raise ValueError(
                    f"cannot parse SET assignment: "
                    f"{self._unmask(piece, lits).strip()!r}")
            qual, col, val = am.groups()
            if qual is not None and qual not in t_names:
                raise ValueError(
                    f"SET target must be a target column; got "
                    f"{qual}.{col}")
            if col in assignments:
                raise ValueError(f"duplicate SET target: {col!r}")
            assignments[col] = self._requal(val, t_names, s_names,
                                            lits, allow_source=False)
        return NotMatchedBySourceClause("update", condition=cond,
                                        assignments=assignments)

    def _requal(self, text: str, t_names: set, s_names: set,
                lits: list, allow_target: bool = True,
                allow_source: bool = True) -> str:
        """Rewrite the statement's table aliases to merge_into's
        canonical ``t.`` / ``s.`` qualifiers — ONE pass, so swapped
        aliases (target aliased ``s``, source aliased ``t``) never
        double-rewrite. Unknown qualifiers pass through (struct field
        access, function namespaces). Returns the UNMASKED expression
        string merge_into evaluates."""
        def sub(mm):
            q = mm.group(1)
            if q in t_names:
                if not allow_target:
                    raise ValueError(
                        "WHEN NOT MATCHED expressions cannot reference "
                        f"the target ({q!r})")
                return "t."
            if q in s_names:
                if not allow_source:
                    raise ValueError(
                        "WHEN NOT MATCHED BY SOURCE expressions cannot "
                        f"reference the source ({q!r}) — there is no "
                        "source row for an unmatched target row")
                return "s."
            return mm.group(0)

        out = re.sub(r"\b([A-Za-z_]\w*)\s*\.", sub, text)
        return self._unmask(out, lits).strip()

    def _merge_on_keys(self, cond: str, t_names: set, s_names: set,
                       lits: list) -> list[str]:
        """ON must be an AND of ``t.k = s.k`` equalities with the SAME
        column name on both sides — that is merge_into's key contract
        (general ON conditions need a join, not an upsert). Each
        equality must compare the TARGET side to the SOURCE side —
        ``t.k = t.k`` is a degenerate no-op, not a key (ADVICE r14)."""
        def side(q: str) -> str:
            if q in t_names and q in s_names:
                raise ValueError(
                    f"MERGE ON qualifier {q!r} is ambiguous (matches "
                    "both target and source)")
            if q in t_names:
                return "t"
            if q in s_names:
                return "s"
            if not s_names:
                # subquery source without an alias: an unknown
                # qualifier can only mean the source
                return "s"
            raise ValueError(
                f"MERGE ON qualifier {q!r} matches neither the target "
                f"({sorted(t_names)}) nor the source "
                f"({sorted(s_names)})")

        keys = []
        for part in re.split(r"\band\b", cond, flags=re.I):
            em = _ON_EQ.match(part)
            if em is None:
                raise ValueError(
                    f"MERGE ON must be AND-ed `t.key = s.key` "
                    f"equalities; got {self._unmask(part, lits).strip()!r}")
            la, lc, ra, rc = em.groups()
            if lc != rc:
                raise ValueError(
                    f"MERGE ON compares different columns "
                    f"({lc!r} vs {rc!r}); merge keys must be the same "
                    "column name on both sides")
            if {side(la), side(ra)} != {"t", "s"}:
                raise ValueError(
                    "MERGE ON equality must compare the target to the "
                    f"source; got {la}.{lc} = {ra}.{rc}")
            keys.append(lc)
        return keys

    def _ctas(self, m: "re.Match", lits: list):
        self._no_txn("CREATE TABLE")
        from iceberg_cpp_spark.core import types as it
        from iceberg_cpp_spark.core.types import (schema_from_spark,
                                                  type_from_json)

        ident = self._clean_ident(m.group("rest"))
        if m.group("using") and m.group("using").lower() != "iceberg":
            raise ValueError(
                f"CREATE TABLE ... USING {m.group('using')!r}: this "
                "catalog only creates iceberg tables")
        coldefs, body = m.group("coldefs"), m.group("body")
        if (coldefs is None) == (body is None):
            raise ValueError(
                "CREATE TABLE takes a column list OR an AS SELECT "
                "body (exactly one)")
        if m.group("orr"):
            # RTAS: the one atomic schema+data replacement
            if m.group("ine"):
                raise ValueError(
                    "CREATE OR REPLACE and IF NOT EXISTS cannot be "
                    "combined")
            if body is None:
                raise ValueError(
                    "CREATE OR REPLACE TABLE needs an AS SELECT body "
                    "(replacing with an empty column list would drop "
                    "all data — DROP + CREATE states that intent)")
            if m.group("parts"):
                raise ValueError(
                    "CREATE OR REPLACE TABLE does not take PARTITIONED "
                    "BY (the existing table keeps its spec; evolve it "
                    "with ALTER TABLE ... ADD/DROP PARTITION FIELD)")
            if self.catalog.table_exists(ident):
                t = self._load(ident, "CREATE OR REPLACE TABLE")
                t.replace_as_select(
                    self._sql(self._unmask(body, lits), depth=0))
                return self._dml_result()
            # fall through: plain CTAS on a fresh identifier
        if self.catalog.table_exists(ident):
            if m.group("ine"):
                return self._dml_result()
            raise ValueError(
                f"CREATE TABLE target already exists: {ident!r} "
                "(use IF NOT EXISTS)")
        if coldefs is not None:
            pieces = self._split_coldefs(coldefs)
            # nested subtree ids live above the top-level range, the
            # schema_from_spark convention (r16: struct<>/array<>/map<>
            # column types parse through the shared type parser)
            ctr = iter(range(max(10_000, len(pieces) + 1), 1_000_000))
            fields = []
            for i, piece in enumerate(pieces):
                cm = re.match(
                    r"^\s*([A-Za-z_]\w*)\s+(.+?)"
                    r"(?:\s+(?P<nn>not\s+null))?\s*$",
                    piece, re.I | re.S)
                if cm is None:
                    raise ValueError(
                        f"cannot parse column definition: {piece!r}")
                fields.append(it.NestedField(
                    i + 1, cm.group(1),
                    self._parse_col_type(cm.group(2), ctr),
                    required=bool(cm.group("nn"))))
            schema = it.Schema(fields, schema_id=0)
            df = None
        else:
            df = self._sql(self._unmask(body, lits), depth=0)
            schema = schema_from_spark(df.schema)
        spec = (self._partition_spec(m.group("parts"), schema)
                if m.group("parts") else None)
        self.catalog.create_table(ident, schema, spec=spec)
        if df is not None:
            self.catalog.load_table(ident, spark=self.spark).append(df)
        return self._dml_result()

    def _part_entry(self, piece: str, schema):
        """One partition-field DDL entry (the Iceberg spelling: col,
        years/months/days/hours(col), bucket(N, col), truncate(W, col))
        → (source NestedField, Transform, derived field name)."""
        from iceberg_cpp_spark.functions import transforms as tr

        pm = _PART_FIELD.match(piece)
        if pm is None:
            raise ValueError(
                f"cannot parse partition field entry: {piece!r} "
                "(supported: col, years/months/days/hours(col), "
                "bucket(N, col), truncate(W, col))")
        if pm.group("col"):
            col, t, suffix = pm.group("col"), \
                tr.IdentityTransform(), None
        elif pm.group("tfn"):
            col = pm.group("tcol")
            base = pm.group("tfn").lower().rstrip("s")
            t = {"year": tr.YearTransform,
                 "month": tr.MonthTransform,
                 "day": tr.DayTransform,
                 "hour": tr.HourTransform}[base]()
            suffix = base
        else:
            col = pm.group("ncol")
            n = int(pm.group("n"))
            t = (tr.BucketTransform(n)
                 if pm.group("nfn").lower() == "bucket"
                 else tr.TruncateTransform(n))
            suffix = pm.group("nfn").lower()
        f = schema.find_field(col)
        if f is None:
            raise ValueError(
                f"partition field references unknown column: {col!r}")
        name = col if suffix is None else f"{col}_{suffix}"
        return f, t, name

    def _partition_spec(self, parts: str, schema):
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)

        fields = []
        for i, piece in enumerate(self._split_top(parts)):
            f, t, name = self._part_entry(piece, schema)
            fields.append(PartitionField(
                source_id=f.field_id, field_id=1000 + i, name=name,
                transform=t))
        return PartitionSpec(fields)

    def _drop(self, m: "re.Match"):
        self._no_txn("DROP TABLE")
        ident = self._clean_ident(m.group("rest"))
        if not self.catalog.table_exists(ident):
            if m.group("ie"):
                return self._dml_result()
            raise ValueError(f"no such table: {ident!r}")
        # PURGE also deletes the data directory (plain DROP keeps data,
        # the Iceberg/Spark convention)
        self.catalog.drop_table(ident, purge=bool(m.group("purge")))
        return self._dml_result()

    def _create_view(self, m: "re.Match", lits: list):
        self._no_txn("CREATE VIEW")
        from iceberg_cpp_spark.core.types import schema_from_spark

        ident = self._clean_ident(m.group("rest"))
        # the STORED SQL keeps its catalog identifiers — resolution
        # stays dynamic (the view tracks its sources' current state);
        # running the body once here only derives the declared schema
        body = self._unmask(m.group("body"), lits).strip()
        schema = schema_from_spark(self._sql(body, depth=0).schema)
        if hasattr(self.catalog, "view_exists") \
                and self.catalog.view_exists(ident):
            if not m.group("rep"):
                raise ValueError(
                    f"view already exists: {ident!r} "
                    "(use CREATE OR REPLACE VIEW)")
            self.catalog.load_view(ident).replace(body, schema=schema)
            return self._dml_result()
        self.catalog.create_view(ident, body, schema)
        return self._dml_result()

    def _drop_view(self, m: "re.Match"):
        self._no_txn("DROP VIEW")
        ident = self._clean_ident(m.group("rest"))
        exists = hasattr(self.catalog, "view_exists") \
            and self.catalog.view_exists(ident)
        if not exists:
            if m.group("ie"):
                return self._dml_result()
            raise ValueError(f"no such view: {ident!r}")
        self.catalog.drop_view(ident)
        return self._dml_result()

    @staticmethod
    def _split_coldefs(text: str) -> list[str]:
        """Split a column-definition list on commas outside BOTH parens
        and angle brackets — struct<a: int, b: string> / map<k, v>
        spellings carry commas _split_top would split on (in a coldef
        context '<' is only ever a generic bracket, never a
        comparison)."""
        out, paren, angle, start = [], 0, 0, 0
        for i, ch in enumerate(text):
            if ch == "(":
                paren += 1
            elif ch == ")":
                paren -= 1
            elif ch == "<":
                angle += 1
            elif ch == ">":
                angle = max(0, angle - 1)
            elif ch == "," and paren == 0 and angle == 0:
                out.append(text[start:i])
                start = i + 1
        out.append(text[start:])
        return out

    @staticmethod
    def _split_top(text: str) -> list[str]:
        """Split on commas at paren depth 0 (text is masked, so commas
        inside string literals are already inert)."""
        out, depth, start = [], 0, 0
        for i, ch in enumerate(text):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append(text[start:i])
                start = i + 1
        out.append(text[start:])
        return out

    def _insert(self, ident: str, mode: str, body: str,
                cols: Optional[str] = None):
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from iceberg_cpp_spark.core.types import to_spark_schema

        ident, branch = self._split_branch(ident)
        t = self._load(ident, "INSERT")
        df = self._sql(body, depth=0)
        tgt = to_spark_schema(t.schema())
        if cols is not None:
            # named-column INSERT: listed columns take the body's
            # values positionally; missing columns take the field's
            # write-default (v3) or NULL — required columns without a
            # default refuse
            names = [c.strip() for c in cols.split(",")]
            top = {f.name: f for f in t.schema().fields}
            if len(set(names)) != len(names):
                raise ValueError(f"duplicate INSERT column in {names}")
            for n in names:
                if n not in top:
                    raise ValueError(
                        f"INSERT column {n!r} not in table {ident!r}")
            if len(df.columns) != len(names):
                raise ValueError(
                    f"INSERT column list has {len(names)} names but "
                    f"the body produces {len(df.columns)} columns")
            by_name = dict(zip(names, df.columns))
            sel = []
            for sf, f in zip(tgt.fields, t.schema().fields):
                if f.name in by_name:
                    sel.append(F.col(by_name[f.name])
                               .cast(sf.dataType).alias(f.name))
                elif f.write_default is not None:
                    sel.append(F.lit(f.write_default)
                               .cast(sf.dataType).alias(f.name))
                elif f.required:
                    raise ValueError(
                        f"required column {f.name!r} missing from the "
                        "INSERT column list and has no write-default")
                else:
                    sel.append(F.lit(None).cast(sf.dataType)
                               .alias(f.name))
            aligned = df.select(*sel)
        else:
            if len(df.columns) != len(tgt.fields):
                raise ValueError(
                    f"INSERT column count {len(df.columns)} != table "
                    f"{ident!r} column count {len(tgt.fields)}")
            # Spark INSERT semantics: positional with casts
            aligned = df.select(
                *[F.col(c).cast(f.dataType).alias(f.name)
                  for c, f in zip(df.columns, tgt.fields)])
        kw = {"branch": branch} if branch else {}
        if mode == "into":
            t.append(aligned, **kw)
        else:
            # Spark's own switch governs INSERT OVERWRITE semantics:
            # static (default) replaces the whole table; dynamic
            # replaces only the partitions present in the data (r16 —
            # the idempotent-backfill shape; no-op difference on
            # unpartitioned tables)
            dyn = self.spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode",
                "static").lower() == "dynamic"
            if dyn:
                t.overwrite_partitions(aligned, **kw)
            else:
                t.overwrite(aligned, **kw)
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
            ident = self._clean_ident(m.group("rest"))
            ver = ref = None
            if vg := m.group("ver"):
                # a quoted VERSION AS OF literal names a branch/tag
                # (the Iceberg SQL convention); digits pin a snapshot
                ver = (int(vg) if vg.isdigit()
                       else None)
                if ver is None:
                    ref = self._str_lit(vg, lits)
            ts = (self._unmask(m.group("ts"), lits)
                  if m.group("ts") else None)
            chg = None
            if m.group("csince"):
                chg = (int(m.group("csince")), None)
            elif m.group("cfrom"):
                chg = (int(m.group("cfrom")), int(m.group("cto")))
            key = (ident, ver, ref, ts, chg)
            view = bound.get(key)
            if view is None:
                view = self._bind(ident, depth, snapshot_id=ver,
                                  ref=ref, as_of=ts, changes=chg)
                bound[key] = view
            out = out[:m.start()] + view + out[m.end():]
        return self.spark.sql(self._unmask(out, lits))

    def _bind(self, ident: str, depth: int,
              snapshot_id: Optional[int] = None,
              ref: Optional[str] = None,
              as_of: Optional[str] = None,
              changes: Optional[tuple] = None) -> str:
        """Resolve one catalog identifier to a temp-view name: tables
        become IceTable scans (snapshot/schema/delete resolution all
        engine-side — time travel binds the scan to the named snapshot
        or the snapshot current AS OF the timestamp; ``CHANGES SINCE
        <id>`` / ``CHANGES BETWEEN <id> AND <id>`` binds the CDC
        changelog rows for that snapshot range instead); spec views
        resolve their CURRENT version's SQL recursively (it may
        reference catalog identifiers itself)."""
        import hashlib

        # injective naming (ADVICE r14): the readable flattened prefix
        # can collide (`db.t.snapshots` vs `db.t_snapshots`, nested
        # namespaces) — a digest of the RAW identifier + time-travel
        # pin disambiguates, deterministic across processes
        raw = "|".join((ident, str(snapshot_id), str(ref), str(as_of),
                        str(changes)))
        digest = hashlib.sha1(raw.encode()).hexdigest()[:10]
        safe = re.sub(r"\W", "_", ident)
        name = f"__ice_sql_{safe}_{digest}"
        txn = self._active_txn
        if txn is not None:
            from iceberg_cpp_spark.transaction import \
                MultiTableTransaction

            pending = None
            if isinstance(txn, MultiTableTransaction):
                if txn._closed:
                    raise ValueError(
                        "multi-table transaction already committed or "
                        "abandoned")
                # only tables already ENROLLED bind their pending
                # chain; reading must not silently enroll a table
                if ident in txn._txns:
                    pending = txn._txns[ident].table()
            elif ident == getattr(txn.base, "identifier", None):
                pending = txn.table()
            if pending is not None:
                if (snapshot_id, ref, as_of, changes) != (None,) * 4:
                    raise ValueError(
                        "time travel / CHANGES cannot bind inside a "
                        "transaction scope (pending snapshots are not "
                        "addressable until commit)")
                # reads of the transaction's table see the PENDING chain
                self._register_view(pending.scan().to_df(), name)
                return name
        if self.catalog.table_exists(ident):
            t = self.catalog.load_table(ident, spark=self.spark)
            if changes is not None:
                from iceberg_cpp_spark.streaming.changelog import \
                    changes as table_changes

                self._register_view(
                    table_changes(t, from_snapshot_id=changes[0],
                                  to_snapshot_id=changes[1]), name)
                return name
            scan = t.scan(snapshot_id=snapshot_id)
            if ref is not None:
                if t.metadata.ref(ref) is None:
                    raise ValueError(
                        f"no such branch or tag on {ident!r}: {ref!r}")
                scan = scan.use_ref(ref)
            if as_of is not None:
                scan = scan.as_of(self._parse_ts_ms(as_of))
            self._register_view(scan.to_df(), name)
            return name
        if changes is not None:
            raise ValueError(
                f"CHANGES applies to tables; {ident!r} is not a "
                f"table in catalog {self.catalog_name!r}")
        if snapshot_id is not None or ref is not None \
                or as_of is not None:
            raise ValueError(
                f"time travel applies to tables; {ident!r} is not a "
                f"table in catalog {self.catalog_name!r}")
        # `<table>.branch_<name>` (Spark-Iceberg suffix convention):
        # read the branch head — the suffix twin of VERSION AS OF 'name'
        parent_b, br = self._split_branch(ident)
        if br is not None:
            t = self.catalog.load_table(parent_b, spark=self.spark)
            if t.metadata.ref(br) is None:
                raise ValueError(
                    f"no such branch on {parent_b!r}: {br!r}")
            self._register_view(t.scan().use_ref(br).to_df(), name)
            return name
        # `<table>.<metadata table>` (Iceberg SQL convention):
        # ice.db.t.snapshots / files / partitions / ... — only when no
        # real table shadows the dotted name (checked above)
        if "." in ident:
            # (time travel on a metadata table already raised above)
            parent, last = ident.rsplit(".", 1)
            if last.lower() in _META_TABLES \
                    and self.catalog.table_exists(parent):
                t = self.catalog.load_table(parent, spark=self.spark)
                self._register_view(
                    getattr(t, f"{last.lower()}_df")(), name)
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
            self._register_view(self._sql(rep.sql, depth + 1), name)
            return name
        raise ValueError(
            f"no such table or view in catalog "
            f"{self.catalog_name!r}: {ident!r}")

    def _register_view(self, df, name: str) -> None:
        """Create the binding temp view and record it on the current
        statement's cleanup list (dropped when sql() resolves)."""
        df.createOrReplaceTempView(name)
        if self._created_views:
            self._created_views[-1].append(name)

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
    def _clean_ident(rest: str) -> str:
        """Matched identifier text → catalog identifier: backtick
        quotes drop (quoted parts pass through verbatim — dashes,
        reserved words); a dot INSIDE a quoted part is refused (the
        catalog's dotted-string identifiers can't carry it)."""
        if "`" not in rest:
            return rest
        parts = []
        for p in re.findall(r"`[^`]+`|[A-Za-z_]\w*", rest):
            if p.startswith("`"):
                inner = p[1:-1]
                if "." in inner:
                    raise ValueError(
                        f"quoted identifier part cannot contain a dot "
                        f"(catalog identifiers are dot-separated): {p}")
                parts.append(inner)
            else:
                parts.append(p)
        return ".".join(parts)

    @staticmethod
    def _mask(query: str) -> tuple[str, list[str]]:
        """Stash string literals as ``\\x00N\\x00`` placeholders and
        BLANK OUT SQL comments (``-- line`` and nested ``/* block */``)
        so neither can bind an identifier or split a DML clause.
        Backtick-quoted identifier regions copy through atomically (a
        quote or ``--`` inside backticks is part of the name, not a
        literal or comment). One left-to-right scan — a quote inside a
        comment never opens a literal and a ``--`` inside a literal
        never opens a comment."""
        lits: list[str] = []
        out: list[str] = []
        i, n = 0, len(query)
        while i < n:
            ch = query[i]
            if ch in "'\"":
                j = i + 1
                closed = False
                while j < n:
                    if query[j] == ch:
                        if j + 1 < n and query[j + 1] == ch:
                            j += 2  # '' / "" escape
                            continue
                        closed = True
                        break
                    j += 1
                if not closed:
                    raise ValueError(
                        f"unterminated string literal starting at "
                        f"offset {i}: {query[i:i + 20]!r}...")
                lits.append(query[i:j + 1])
                out.append(f"\x00{len(lits) - 1}\x00")
                i = j + 1
            elif ch == "`":
                j = query.find("`", i + 1)
                if j == -1:
                    raise ValueError(
                        f"unterminated backtick identifier at offset "
                        f"{i}: {query[i:i + 20]!r}...")
                out.append(query[i:j + 1])
                i = j + 1
            elif ch == "-" and query.startswith("--", i):
                j = query.find("\n", i)
                out.append(" ")
                i = n if j == -1 else j  # keep the newline
            elif ch == "/" and query.startswith("/*", i):
                depth, j = 1, i + 2
                while j < n and depth:
                    if query.startswith("/*", j):
                        depth, j = depth + 1, j + 2
                    elif query.startswith("*/", j):
                        depth, j = depth - 1, j + 2
                    else:
                        j += 1
                if depth:
                    raise ValueError("unterminated /* comment in SQL")
                out.append(" ")
                i = j
            else:
                out.append(ch)
                i += 1
        return "".join(out), lits

    @staticmethod
    def _unmask(query: str, lits: list[str]) -> str:
        return re.sub(r"\x00(\d+)\x00",
                      lambda m: lits[int(m.group(1))], query)


def sql(spark, catalog, query: str, catalog_name: str = "ice"):
    """One-shot convenience: ``sql(spark, cat, "SELECT ... FROM
    ice.db.t")`` without holding an engine object."""
    return IceSqlEngine(spark, catalog, catalog_name).sql(query)
