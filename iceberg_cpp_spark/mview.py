"""Materialized views: a spec view plus an Iceberg storage table with
snapshot-based freshness tracking.

Follows the Iceberg materialized-view design direction (a VIEW whose
metadata points at a STORAGE TABLE and records, per source table, the
snapshot id the materialization was computed from): readers get
warehouse-speed scans of the storage table; ``refresh()`` recomputes
only when some source moved past its recorded snapshot — a no-op
refresh costs one metadata comparison, no jobs.

Refresh strategy: when the view SQL is a single-source GROUP BY over
distributive aggregates (COUNT/SUM/MIN/MAX, plus AVG decomposed into
(SUM, COUNT) partials stored in the storage table and divided back at
read time; an optional WHERE applies to the delta) and the source only
APPENDED since the last refresh, ``refresh()`` applies the INCREMENTAL
maintenance step — it scans ONLY the files added since the recorded
snapshot (streaming/incremental.py), re-runs the view SQL over that
delta to get per-group partials, and merges them into the storage
table with the aggregate's merge function (count/sum → SUM, min → MIN,
max → MAX). At 100 TB this is the difference between re-scanning the
corpus and reading one append. A history WITH deletes/overwrites can
still be maintained incrementally when every aggregate is RETRACTABLE
(COUNT/SUM/AVG partials — all merge by SUM — plus a COUNT(*) column to
detect dead groups): the CDC changelog supplies the insert/delete row
delta (cost tracks the CHANGED files), the delete side's partials
negate, and groups whose count reaches zero drop. MIN/MAX over a
deleting history (not retractable — the deleted value may have been
the extremum) takes a GROUP-TARGETED recompute instead: the
changelog's changed rows name the affected groups, whose keys push
into the source scan as a file-pruning predicate, so only those
groups re-aggregate. Everything else — multi-source SQL, joins,
HAVING/DISTINCT/windows, computed group keys through deletes,
rollbacks — falls back to the FULL recomputation
committed as one ``overwrite`` snapshot (always correct for any SQL). Staleness state lives in the view's properties
(``materialization.table``, ``refresh.<name>.snapshot-id``) so any
engine reading the view metadata can see how fresh the data is.
"""

from __future__ import annotations

import os
import re
import uuid
from contextlib import contextmanager
from typing import Optional

from iceberg_cpp_spark.core.types import Schema, schema_from_spark
from iceberg_cpp_spark.table import IceTable
from iceberg_cpp_spark.views import IceView

MATERIALIZATION_TABLE = "materialization.table"
_REFRESH_PREFIX = "refresh."


# ---------------------------------------------------------------------------
# Incremental-shape classifier: the restricted SQL grammar whose results
# can be maintained from an append-only delta. Anything it rejects takes
# the always-correct full-recompute path — never a wrong answer, only a
# slower one.
# ---------------------------------------------------------------------------

_REJECT = re.compile(
    r"\b(join|having|distinct|limit|union|intersect|except|over)\b|"
    r"\(\s*select\b", re.I)
_SHAPE = re.compile(
    r"^\s*select\s+(?P<items>.+?)\s+from\s+(?P<src>[A-Za-z_]\w*)\s*"
    r"(?:where\s+(?P<where>.+?)\s*)?"
    r"group\s+by\s+(?P<keys>.+?)\s*(?:order\s+by\s+(?P<order>.+?)\s*)?$",
    re.I | re.S)
_AGG_ITEM = re.compile(
    r"^(?P<fn>count|sum|min|max|avg)\s*\((?P<arg>[^()]*|\*)\)\s+as\s+"
    r"(?P<alias>[A-Za-z_]\w*)$", re.I | re.S)
_KEY_ITEM = re.compile(
    r"^(?P<expr>[A-Za-z_][\w.]*)(?:\s+as\s+(?P<alias>[A-Za-z_]\w*))?$",
    re.I)

# merge function per distributive aggregate: how two partials combine
_MERGE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def _split_top(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def classify_incremental(sql: str, source_names) -> Optional[dict]:
    """None unless ``sql`` is a single-source GROUP BY over
    COUNT/SUM/MIN/MAX/AVG (each aggregate aliased); otherwise
    ``{"source", "keys": [output key cols], "merge": {col: fn},
    "avg": {alias: arg}, "storage_sql": rewritten SQL or None}``.
    ORDER BY is tolerated (re-applied after the merge).

    AVG is not itself distributive, but decomposes into the (SUM,
    COUNT) pair which is: the plan stores ``<alias>__sum`` and
    ``<alias>__cnt`` partial columns in the storage table (via
    ``storage_sql``) and the read path divides them back. A WHERE
    clause is delta-safe for an append-only history — it simply
    applies to the delta before aggregation — so it is accepted.

    Every GROUP BY expression must surface as a select key item (by
    text or 1-based ordinal): otherwise the merged re-group by the
    OUTPUT keys alone would collapse groups the original SQL kept
    distinct (e.g. ``SELECT count(*) AS n FROM src GROUP BY k``)."""
    if _REJECT.search(sql):
        return None
    m = _SHAPE.match(sql.strip().rstrip(";"))
    if not m or m.group("src") not in source_names:
        return None
    # the incremental refresh rewrites only the FROM clause to point at
    # the delta view — a qualified reference like ``WHERE src.k > 2``
    # would keep reading the ORIGINAL binding, so any other occurrence
    # of the source name disqualifies the shape (full recompute)
    src = m.group("src")
    without_from = re.sub(rf"\bfrom\s+{re.escape(src)}\b", " ",
                          sql, flags=re.I)
    if re.search(rf"\b{re.escape(src)}\b", without_from, re.I):
        return None
    keys, merge, avgs, storage_items = [], {}, {}, []
    count_star: Optional[str] = None
    group_exprs = [e.strip().lower() for e in _split_top(m.group("keys"))]
    matched: set = set()
    for i, item in enumerate(_split_top(m.group("items"))):
        am = _AGG_ITEM.match(item)
        if am:
            fn, alias = am.group("fn").lower(), am.group("alias")
            if fn == "avg":
                arg = am.group("arg").strip()
                if arg == "*":
                    return None  # avg(*) isn't SQL
                avgs[alias] = arg
                for suffix, sfn in ((f"{alias}__sum", "sum"),
                                    (f"{alias}__cnt", "count")):
                    if suffix in merge:
                        return None  # partial-column name collision
                    merge[suffix] = "sum"
                    storage_items.append(f"{sfn}({arg}) AS {suffix}")
            else:
                if alias in merge:
                    return None
                merge[alias] = _MERGE[fn]
                storage_items.append(item)
                if (fn == "count" and am.group("arg").strip() == "*"
                        and count_star is None):
                    count_star = alias
            continue
        km = _KEY_ITEM.match(item)
        if not km:
            return None  # computed select item: full recompute
        alias = km.group("alias") or km.group("expr").split(".")[-1]
        # a bare select item must be one of the GROUP BY expressions
        # (or its 1-based position) — and collectively the key items
        # must COVER every GROUP BY expression
        hits = [j for j, g in enumerate(group_exprs)
                if g == km.group("expr").lower() or g == str(i + 1)]
        if not hits:
            return None
        matched.update(hits)
        keys.append(alias)
        storage_items.append(item)
    if not merge or len(matched) != len(group_exprs):
        return None
    storage_sql = None
    if avgs:
        # storage holds (sum, count) partials instead of the avg value;
        # ORDER BY is dropped (storage is a table — order isn't kept,
        # and the original clause may reference the avg alias)
        storage_sql = "SELECT " + ", ".join(storage_items)
        storage_sql += f" FROM {src}"
        if m.group("where"):
            storage_sql += f" WHERE {m.group('where')}"
        storage_sql += f" GROUP BY {m.group('keys')}"
    # retraction support: COUNT/SUM/AVG partials all merge by SUM, so a
    # DELETE-containing source history can be maintained by NEGATING the
    # deleted rows' partials — but only a COUNT(*) column can tell a
    # dead group (drop the row) from a zero-sum one (keep it); MIN/MAX
    # are not retractable (the deleted value may have BEEN the min)
    retractable = (count_star is not None
                   and all(fn == "sum" for fn in merge.values()))
    # group-targeted recompute (MIN/MAX through deletes) needs every
    # key to be a BARE source column so the affected-group predicate
    # can push into the source scan as a file-pruning filter
    key_cols = []
    for item in _split_top(m.group("items")):
        km = _KEY_ITEM.match(item)
        if km:
            expr = km.group("expr")
            key_cols.append(expr if "." not in expr else None)
    return {"source": m.group("src"), "keys": keys, "merge": merge,
            "avg": avgs, "storage_sql": storage_sql,
            "count_star": count_star, "retractable": retractable,
            "key_cols": key_cols,
            "order": (m.group("order") or "").strip() or None}


class IceMaterializedView:
    """Handle pairing the view metadata with its storage table."""

    def __init__(self, spark, view: IceView, sources: dict[str, IceTable]):
        self.spark = spark
        self.view = view
        self.sources = dict(sources)
        self.last_refresh_mode: Optional[str] = None
        # classification is a pure function of (SQL, source names), so
        # it is recomputed identically on load() — no persisted state.
        # When it carries AVG partials the storage table ALWAYS holds
        # the partial columns (even across full recomputes), so the
        # incremental merge and the read-path division stay valid.
        self._plan = (classify_incremental(view.sql_for("spark"),
                                           set(sources))
                      if len(sources) == 1 else None)

    def _storage_sql(self) -> str:
        """The SQL whose result the storage table holds: the view SQL,
        or its AVG→(SUM,COUNT)-partials rewrite when the plan has one."""
        if self._plan and self._plan["storage_sql"]:
            return self._plan["storage_sql"]
        return self.view.sql_for("spark")

    # -- lifecycle ----------------------------------------------------------
    @classmethod
    def create(cls, spark, location: str, sql: str,
               sources: dict[str, "IceTable"], dialect: str = "spark",
               properties: Optional[dict] = None) -> "IceMaterializedView":
        """Create the view + storage table and run the first refresh.
        ``sources``: name → IceTable for every table the SQL references;
        they register as temp views under those names (the same
        resolution contract as plain spec views)."""
        for name, t in sources.items():
            t.create_or_replace_view(name)
        schema = schema_from_spark(spark.sql(sql).schema)
        storage_loc = os.path.join(location, "storage")
        props = dict(properties or {})
        props[MATERIALIZATION_TABLE] = storage_loc
        view = IceView.create(location, sql, schema, dialect=dialect,
                              properties=props)
        mv = cls(spark, view, sources)
        # the storage table's schema follows the STORAGE SQL (AVG plans
        # store (sum, count) partials; the view schema keeps the
        # user-facing avg column)
        storage_schema = (
            schema if mv._storage_sql() == sql
            else schema_from_spark(spark.sql(mv._storage_sql()).schema))
        mv.storage = IceTable.create(spark, storage_loc, storage_schema)
        return mv.refresh()

    @classmethod
    def load(cls, spark, location: str,
             sources: dict[str, "IceTable"]) -> "IceMaterializedView":
        view = IceView.load(location)
        if MATERIALIZATION_TABLE not in view.metadata.properties:
            raise ValueError(f"not a materialized view: {location}")
        mv = cls(spark, view, sources)
        mv.storage = IceTable.load(
            spark, view.metadata.properties[MATERIALIZATION_TABLE])
        return mv

    # -- freshness ----------------------------------------------------------
    def _source_state(self) -> dict[str, str]:
        out = {}
        for name, t in sorted(self.sources.items()):
            t.refresh()
            snap = t.current_snapshot()
            out[name] = str(snap.snapshot_id if snap else 0)
        return out

    def is_fresh(self) -> bool:
        props = self.view.metadata.properties
        return all(
            props.get(f"{_REFRESH_PREFIX}{name}.snapshot-id") == sid
            for name, sid in self._source_state().items())

    def _appends_only(self, table: IceTable, from_sid: int,
                      to_sid: int) -> bool:
        """True iff every snapshot from ``to_sid`` back to (exclusive)
        ``from_sid`` is an append on the same ancestry line — the
        precondition for maintaining distributive aggregates from the
        added files alone."""
        md = table.metadata
        sid = to_sid
        while sid is not None and sid != from_sid:
            snap = md.snapshot_by_id(sid)
            if snap is None or (snap.operation or "") != "append":
                return False
            sid = snap.parent_snapshot_id
        return sid == from_sid

    @contextmanager
    def _delta_view(self):
        """A per-refresh UNIQUE delta view name, dropped when the
        refresh step resolves (ADVICE r14: the fixed `__mv_delta__`
        name accumulated in the session catalog and could collide
        across interleaved refreshes). spark.sql analyzes eagerly, so
        frames built against the name stay valid after the drop."""
        name = f"__mv_delta_{uuid.uuid4().hex[:10]}"
        try:
            yield name
        finally:
            try:
                self.spark.catalog.dropTempView(name)
            except Exception:
                pass

    def _refresh_incremental(self, plan: dict, from_sid: int,
                             to_sid: int) -> bool:
        """Apply the append delta to the storage table. Returns False
        when the delta shape can't be applied (caller falls back to
        full recompute)."""
        from pyspark.sql import functions as F

        from iceberg_cpp_spark.streaming.incremental import incremental_read

        src = self.sources[plan["source"]]
        delta = incremental_read(src, from_sid, to_sid)
        # run the view SQL against the DELTA under a private name (the
        # source's own temp-view binding is never touched)
        with self._delta_view() as delta_name:
            delta.createOrReplaceTempView(delta_name)
            sql = re.sub(rf"(\bfrom\s+){re.escape(plan['source'])}\b",
                         rf"\g<1>{delta_name}",
                         self._storage_sql(), flags=re.I)
            delta_agg = self.spark.sql(sql)
        current = self.storage.to_df()
        agg_cols = [
            getattr(F, fn)(c).alias(c)
            for c, fn in plan["merge"].items()]
        merged = (current.unionByName(delta_agg)
                  .groupBy(*plan["keys"]).agg(*agg_cols))
        # pin the storage schema: re-summed decimals widen their
        # precision; counts stay long — cast back to what the first
        # materialization declared
        merged = merged.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name)
              for f in current.schema.fields])
        self.storage = self.storage.overwrite(merged)
        return True

    def _refresh_retract(self, plan: dict, from_sid: int,
                         to_sid: int) -> bool:
        """Delete-containing history, retractable aggregates (all
        partials merge by SUM + a COUNT(*) column to detect dead
        groups): pull the INSERT/DELETE row delta from the CDC
        changelog — cost tracks the CHANGED files, not the corpus —
        aggregate each side with the storage SQL, NEGATE the delete
        side's partials, merge, and drop groups whose count reaches 0
        (a full recompute would not emit them). Returns False when the
        range isn't ancestry-connected (rollback in history): caller
        full-recomputes."""
        from pyspark.sql import functions as F

        from iceberg_cpp_spark.streaming.changelog import changes

        src = self.sources[plan["source"]]
        try:
            delta = changes(src, from_sid, to_sid)
        except ValueError:
            return False  # non-ancestor range (rollback/cherry-pick)
        meta_cols = ["_change_type", "_commit_snapshot_id",
                     "_change_ordinal"]
        sides = []
        with self._delta_view() as delta_name:
            sql_tpl = re.sub(
                rf"(\bfrom\s+){re.escape(plan['source'])}\b",
                rf"\g<1>{delta_name}", self._storage_sql(), flags=re.I)
            for kind, sign in (("insert", 1), ("delete", -1)):
                rows = (delta.filter(F.col("_change_type") == kind)
                        .drop(*meta_cols))
                rows.createOrReplaceTempView(delta_name)
                agg = self.spark.sql(sql_tpl)
                if sign < 0:
                    agg = agg.select(
                        *[(-F.col(c)).alias(c) if c in plan["merge"]
                          else F.col(c) for c in agg.columns])
                sides.append(agg)
        current = self.storage.to_df()
        agg_cols = [getattr(F, fn)(c).alias(c)
                    for c, fn in plan["merge"].items()]
        merged = (current.unionByName(sides[0]).unionByName(sides[1])
                  .groupBy(*plan["keys"]).agg(*agg_cols)
                  .filter(F.col(plan["count_star"]) > 0))
        merged = merged.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name)
              for f in current.schema.fields])
        self.storage = self.storage.overwrite(merged)
        return True

    def _refresh_retract_groups(self, plan: dict, from_sid: int,
                                to_sid: int) -> bool:
        """Non-retractable aggregates (MIN/MAX — the deleted value may
        have BEEN the min) over a deleting history: GROUP-TARGETED
        recompute instead of a full one (VERDICT r13 task 5). The CDC
        changelog yields the changed rows (cost tracks changed FILES);
        their group keys — bounded by the number of CHANGED groups —
        become a per-column IN predicate pushed into the source scan,
        so a source partitioned/clustered by the group key re-reads only
        the affected groups' files. Exact membership is re-imposed by a
        null-safe semi-join (the per-column IN is a superset for
        multi-key views). Affected groups' storage rows are replaced by
        the re-aggregation; groups left empty vanish, matching a full
        recompute. Requires every key to be a bare source column;
        key-less or computed-key shapes keep the full-recompute path.
        Returns False when the range isn't ancestry-connected."""
        from pyspark.sql import functions as F

        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.streaming.changelog import changes

        if not plan["keys"] or not all(plan["key_cols"]):
            return False
        src = self.sources[plan["source"]]
        try:
            delta = changes(src, from_sid, to_sid)
        except ValueError:
            return False  # non-ancestor range (rollback/cherry-pick)
        meta_cols = ["_change_type", "_commit_snapshot_id",
                     "_change_ordinal"]
        with self._delta_view() as delta_name:
            sql_tpl = re.sub(
                rf"(\bfrom\s+){re.escape(plan['source'])}\b",
                rf"\g<1>{delta_name}", self._storage_sql(), flags=re.I)
            delta.drop(*meta_cols).createOrReplaceTempView(delta_name)
            affected = (self.spark.sql(sql_tpl)
                        .select(*plan["keys"]).distinct())
            keys_rows = affected.collect()  # O(#changed groups)
            if not keys_rows:
                return True  # nothing changed under the WHERE clause
            flt = None
            for col, alias in zip(plan["key_cols"], plan["keys"]):
                vals = {r[alias] for r in keys_rows}
                non_null = [v for v in vals if v is not None]
                c = (ex.in_(ex.Reference(col), non_null)
                     if non_null else None)
                if len(non_null) != len(vals):
                    nc = ex.is_null(ex.Reference(col))
                    c = nc if c is None else ex.or_(c, nc)
                flt = c if flt is None else ex.and_(flt, c)
            scan_df = src.scan(filter=flt).to_df()
            scan_df.createOrReplaceTempView(delta_name)
            regrouped = self.spark.sql(sql_tpl)
        # collected keys → a fresh bounded frame (immune to the temp-view
        # rebind above), broadcast into both joins
        aff = self.spark.createDataFrame(
            keys_rows, affected.schema).distinct()
        for k in plan["keys"]:
            aff = aff.withColumnRenamed(k, f"__aff_{k}")
        cond = None
        for k in plan["keys"]:
            c = F.col(k).eqNullSafe(F.col(f"__aff_{k}"))
            cond = c if cond is None else cond & c
        regrouped = regrouped.join(F.broadcast(aff), cond, "left_semi")
        current = self.storage.to_df()
        kept = current.join(F.broadcast(aff), cond, "left_anti")
        merged = kept.unionByName(regrouped).select(
            *[F.col(f.name).cast(f.dataType).alias(f.name)
              for f in current.schema.fields])
        self.storage = self.storage.overwrite(merged)
        return True

    def refresh(self, force: bool = False) -> "IceMaterializedView":
        """Bring the storage table up to date when any source moved
        past its recorded snapshot (or ``force``); otherwise a
        metadata-only no-op. Incremental maintenance (scan ONLY the
        appended files, merge per-group partials) when the SQL is a
        single-source distributive GROUP BY and the source history
        since the last refresh is append-only; full recompute
        otherwise. One overwrite snapshot per actual refresh.
        ``last_refresh_mode`` records what ran ("noop" | "incremental"
        | "full")."""
        state = self._source_state()
        if not force and self.is_fresh():
            self.last_refresh_mode = "noop"
            return self
        mode = None
        plan = self._plan if not force else None
        if plan is not None:
            props = self.view.metadata.properties
            rec = props.get(f"{_REFRESH_PREFIX}{plan['source']}.snapshot-id")
            from_sid = int(rec) if rec and rec != "0" else None
            to_sid = int(state[plan["source"]])
            if from_sid is not None and to_sid:
                if self._appends_only(self.sources[plan["source"]],
                                      from_sid, to_sid):
                    if self._refresh_incremental(plan, from_sid, to_sid):
                        mode = "incremental"
                elif plan["retractable"]:
                    # deletes in the history: retractable aggregates
                    # maintain from the changelog's +/- row delta
                    if self._refresh_retract(plan, from_sid, to_sid):
                        mode = "incremental-retract"
                elif self._refresh_retract_groups(plan, from_sid, to_sid):
                    # MIN/MAX through deletes: recompute only the
                    # changed groups from the source (file-pruned scan)
                    mode = "incremental-retract-groups"
        if mode is None:
            for name, t in self.sources.items():
                t.create_or_replace_view(name)
            # full recompute runs the STORAGE SQL so an AVG plan's
            # partial columns survive forced / fallback recomputes
            result = self.spark.sql(self._storage_sql())
            self.storage = self.storage.overwrite(result)
            mode = "full"
        self.last_refresh_mode = mode
        self.view = self.view.update_properties({
            f"{_REFRESH_PREFIX}{name}.snapshot-id": sid
            for name, sid in state.items()})
        return self

    # -- reads ----------------------------------------------------------
    def to_df(self, allow_stale: bool = True):
        """The materialized result (storage-table scan — warehouse
        speed). ``allow_stale=False`` refreshes first when a source
        moved. For an AVG plan the storage table holds (sum, count)
        partials; the division back to the view's avg column happens
        here, cast to the view schema's declared type."""
        if not allow_stale and not self.is_fresh():
            self.refresh()
        df = self.storage.to_df()
        if self._plan and self._plan["avg"]:
            from pyspark.sql import functions as F

            from iceberg_cpp_spark.core.types import to_spark_type

            avgs = self._plan["avg"]
            cols = []
            for f in self.view.metadata.schema().fields:
                if f.name in avgs:
                    cols.append(
                        (F.col(f"{f.name}__sum") / F.col(f"{f.name}__cnt"))
                        .cast(to_spark_type(f.field_type)).alias(f.name))
                else:
                    cols.append(F.col(f.name))
            df = df.select(*cols)
        return df
