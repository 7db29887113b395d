"""Metadata-level scan pruning: inclusive projection of predicates onto
partition tuples, partition-summary filtering, and per-file metrics
(bounds/null-counts) evaluation.

This implements what the reference explicitly left TODO at
table_scan.cc:280 ("Apply filters to manifest files and data files") —
the data model for it exists there (PartitionFieldSummary bounds,
manifest_list.h:43-73; DataFile value/null/nan counts + lower/upper
bounds, manifest_entry.h:95-124), and the semantics follow the Iceberg
table spec's scan-planning section (inclusive projection + inclusive
metrics evaluation). Rows are only *excluded* when the evaluator proves
no row can match; any uncertainty keeps the file.

Evaluators are driver-side python over manifest rows (metadata scale),
mirroring where the reference would run them; the partition-tuple
filter is ALSO compiled to a Spark Column so manifest-entry DataFrames
can be pruned distributed when a table has many files.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.literals import from_bytes, to_comparable
from iceberg_cpp_spark.core.metadata import PartitionSpec
from iceberg_cpp_spark.plans import expressions as ex

ROWS_MIGHT_MATCH = True
ROWS_CANNOT_MATCH = False


# ---------------------------------------------------------------------------
# Inclusive projection: predicate on source columns → predicate on
# partition fields (spec "Scan Planning"; reference TODO table_scan.cc:280)
# ---------------------------------------------------------------------------

def project_to_partition(expr: ex.Expression, spec: PartitionSpec, schema: it.Schema,
                         case_sensitive: bool = True) -> ex.Expression:
    """Project a bound/unbound row filter to an expression over partition
    *values* (referenced by partition field name). Inclusive: the result
    may be weaker (match more) than the row filter, never stronger."""
    if isinstance(expr, (ex.UnboundPredicate, ex.And, ex.Or, ex.Not)):
        expr = expr.bind(schema, case_sensitive)
    return _project(expr, spec, schema)


def _project(expr: ex.Expression, spec: PartitionSpec, schema: it.Schema) -> ex.Expression:
    if isinstance(expr, (ex.TrueExp, ex.FalseExp)):
        return expr
    if isinstance(expr, ex.And):
        return ex.and_(_project(expr.left, spec, schema), _project(expr.right, spec, schema))
    if isinstance(expr, ex.Or):
        # inclusive projection of OR must stay OR; a non-projectable side
        # degrades the whole disjunct to always-true
        left = _project(expr.left, spec, schema)
        right = _project(expr.right, spec, schema)
        return ex.or_(left, right)
    if isinstance(expr, ex.Not):
        return ex.ALWAYS_TRUE  # inclusive: can't safely project negation
    if isinstance(expr, ex.BoundPredicate):
        parts = []
        for pf in spec.fields:
            if pf.source_id != expr.term.field_id:
                continue
            p = _project_predicate(expr, pf, schema)
            if p is not None:
                parts.append(p)
        if not parts:
            return ex.ALWAYS_TRUE
        return ex.and_(*parts)
    return ex.ALWAYS_TRUE


def _project_predicate(pred: ex.BoundPredicate, pf, schema: it.Schema) -> Optional[ex.Expression]:
    """One bound predicate through one partition field's transform →
    predicate keyed by partition field NAME (bound later against the
    manifest partition struct)."""
    from iceberg_cpp_spark.functions import transforms as tr

    t = pf.transform
    src_type = pred.term.bref.field_type if hasattr(pred.term, "bref") else pred.term.field_type
    op = pred.op

    if pred.term.transform is not None:
        # predicate already on a transform term: project only onto the
        # matching partition transform
        if str(pred.term.transform) != str(t):
            return None
        return _PartitionPredicate(op, pf.name, pred.literals)

    if isinstance(t, (tr.VoidTransform, tr.UnknownTransform)):
        # void: no information; unknown: carried but not evaluable —
        # either way the field is un-projectable (prune conservatively)
        return None
    if isinstance(t, tr.IdentityTransform):
        return _PartitionPredicate(op, pf.name, pred.literals)

    if op in (ex.Op.IS_NULL, ex.Op.NOT_NULL):
        # transforms are null-preserving: null source ⇔ null partition value
        return _PartitionPredicate(op, pf.name, None)
    if op in (ex.Op.IS_NAN, ex.Op.NOT_NAN):
        return None

    def tx(v):
        return t.pyvalue(_from_comparable(v, src_type), src_type)

    if op == ex.Op.EQ:
        return _PartitionPredicate(ex.Op.EQ, pf.name, [tx(pred.literal)])
    if op == ex.Op.IN:
        return _PartitionPredicate(ex.Op.IN, pf.name, sorted({tx(v) for v in pred.literals}, key=repr))
    if t.preserves_order:
        # x < v ⇒ T(x) <= T(v); x > v ⇒ T(x) >= T(v)   (monotonic T)
        if op in (ex.Op.LT, ex.Op.LT_EQ):
            return _PartitionPredicate(ex.Op.LT_EQ, pf.name, [tx(pred.literal)])
        if op in (ex.Op.GT, ex.Op.GT_EQ):
            return _PartitionPredicate(ex.Op.GT_EQ, pf.name, [tx(pred.literal)])
    if op == ex.Op.STARTS_WITH and isinstance(t, tr.TruncateTransform) \
            and isinstance(src_type, it.StringType):
        w = t.width
        prefix = pred.literal
        if len(prefix) >= w:
            return _PartitionPredicate(ex.Op.STARTS_WITH, pf.name, [prefix[:w]])
        return _PartitionPredicate(ex.Op.STARTS_WITH, pf.name, [prefix])
    return None


def _from_comparable(v: Any, src_type: it.IcebergType) -> Any:
    """Inverse of literals.to_comparable for transform input."""
    import datetime as dt

    if isinstance(src_type, it.DateType) and isinstance(v, int):
        return dt.date(1970, 1, 1) + dt.timedelta(days=v)
    return v


class _PartitionPredicate(ex.Expression):
    """Predicate over a partition field by name; compilable to a Spark
    Column over the manifest entries' ``partition`` struct and testable
    against a python partition dict."""

    def __init__(self, op: str, name: str, literals):
        self.op = op
        self.name = name
        self.literals = literals

    @property
    def literal(self):
        return self.literals[0] if self.literals else None

    def negate(self):
        return _PartitionPredicate(ex._NEGATIONS[self.op], self.name, self.literals)

    def test(self, partition: dict) -> bool:
        v = partition.get(self.name)
        op = self.op
        if op == ex.Op.IS_NULL:
            return v is None
        if op == ex.Op.NOT_NULL:
            return v is not None
        if v is None:
            return False
        v = _normalize(v)
        lits = [_normalize(x) for x in (self.literals or [])]
        if op == ex.Op.EQ:
            return v == lits[0]
        if op == ex.Op.NOT_EQ:
            return v != lits[0]
        if op == ex.Op.LT:
            return v < lits[0]
        if op == ex.Op.LT_EQ:
            return v <= lits[0]
        if op == ex.Op.GT:
            return v > lits[0]
        if op == ex.Op.GT_EQ:
            return v >= lits[0]
        if op == ex.Op.IN:
            return v in set(lits)
        if op == ex.Op.NOT_IN:
            return v not in set(lits)
        if op == ex.Op.STARTS_WITH:
            return str(v).startswith(str(lits[0]))
        if op == ex.Op.NOT_STARTS_WITH:
            return not str(v).startswith(str(lits[0]))
        raise ValueError(f"cannot test partition predicate op {op}")

    def spark_column(self, struct_col: str = "partition") -> Column:
        c = F.col(f"{struct_col}.`{self.name}`")
        op = self.op
        if op == ex.Op.IS_NULL:
            return c.isNull()
        if op == ex.Op.NOT_NULL:
            return c.isNotNull()
        if op == ex.Op.EQ:
            return c == F.lit(self.literal)
        if op == ex.Op.NOT_EQ:
            return c != F.lit(self.literal)
        if op == ex.Op.LT:
            return c < F.lit(self.literal)
        if op == ex.Op.LT_EQ:
            return c <= F.lit(self.literal)
        if op == ex.Op.GT:
            return c > F.lit(self.literal)
        if op == ex.Op.GT_EQ:
            return c >= F.lit(self.literal)
        if op == ex.Op.IN:
            return c.isin(list(self.literals))
        if op == ex.Op.NOT_IN:
            return ~c.isin(list(self.literals))
        if op == ex.Op.STARTS_WITH:
            return c.startswith(str(self.literal))
        if op == ex.Op.NOT_STARTS_WITH:
            return ~c.startswith(str(self.literal))
        raise ValueError(f"cannot compile partition predicate op {op}")

    def __repr__(self):
        return f"partition:{self.op}({self.name}, {self.literals!r})"


def evaluate_partition_expr(expr: ex.Expression, partition: dict) -> bool:
    """Evaluate a projected partition expression against one partition
    tuple (dict name→value). True = file might match."""
    if isinstance(expr, ex.TrueExp):
        return True
    if isinstance(expr, ex.FalseExp):
        return False
    if isinstance(expr, ex.And):
        return evaluate_partition_expr(expr.left, partition) and evaluate_partition_expr(expr.right, partition)
    if isinstance(expr, ex.Or):
        return evaluate_partition_expr(expr.left, partition) or evaluate_partition_expr(expr.right, partition)
    if isinstance(expr, _PartitionPredicate):
        return expr.test(partition)
    return True


def partition_expr_to_column(expr: ex.Expression, struct_col: str = "partition") -> Column:
    """Projected partition expression → Spark Column over manifest rows."""
    if isinstance(expr, ex.TrueExp):
        return F.lit(True)
    if isinstance(expr, ex.FalseExp):
        return F.lit(False)
    if isinstance(expr, ex.And):
        return partition_expr_to_column(expr.left, struct_col) & partition_expr_to_column(expr.right, struct_col)
    if isinstance(expr, ex.Or):
        return partition_expr_to_column(expr.left, struct_col) | partition_expr_to_column(expr.right, struct_col)
    if isinstance(expr, _PartitionPredicate):
        return expr.spark_column(struct_col)
    return F.lit(True)


def _normalize(v: Any) -> Any:
    import datetime as dt
    from decimal import Decimal

    if isinstance(v, dt.datetime):
        return to_comparable(v, it.TimestampType())
    if isinstance(v, dt.date):
        return (v - dt.date(1970, 1, 1)).days
    return v


# ---------------------------------------------------------------------------
# Manifest-level evaluator: projected partition expression vs a
# manifest-list row's PartitionFieldSummary bounds (manifest_list.h:43-73).
# Prunes whole manifests before their entries are ever read.
# ---------------------------------------------------------------------------

def evaluate_partition_summaries(expr: ex.Expression, spec, schema: it.Schema,
                                 summaries: list) -> bool:
    """True = manifest might contain matching files (inclusive). ``expr``
    is a projected partition expression (from project_to_partition);
    ``summaries`` is the manifest's PartitionFieldSummary list, positionally
    aligned with ``spec.fields``."""
    if not summaries:
        return ROWS_MIGHT_MATCH
    by_name: dict[str, tuple] = {}
    for i, pf in enumerate(spec.fields):
        if i >= len(summaries):
            break
        src = schema.find_field_by_id(pf.source_id)
        if src is None:
            continue
        rt = pf.transform.result_type(src.field_type)
        s = summaries[i]
        lo = to_comparable(from_bytes(s.lower_bound, rt), rt) if s.lower_bound is not None else None
        hi = to_comparable(from_bytes(s.upper_bound, rt), rt) if s.upper_bound is not None else None
        by_name[pf.name] = (s.contains_null, s.contains_nan, lo, hi)
    return _visit_summary(expr, by_name)


def _visit_summary(e: ex.Expression, by_name: dict) -> bool:
    if isinstance(e, ex.TrueExp):
        return ROWS_MIGHT_MATCH
    if isinstance(e, ex.FalseExp):
        return ROWS_CANNOT_MATCH
    if isinstance(e, ex.And):
        return _visit_summary(e.left, by_name) and _visit_summary(e.right, by_name)
    if isinstance(e, ex.Or):
        return _visit_summary(e.left, by_name) or _visit_summary(e.right, by_name)
    if not isinstance(e, _PartitionPredicate) or e.name not in by_name:
        return ROWS_MIGHT_MATCH
    contains_null, contains_nan, lo, hi = by_name[e.name]
    op = e.op
    if op == ex.Op.IS_NULL:
        return ROWS_MIGHT_MATCH if contains_null else ROWS_CANNOT_MATCH
    if op == ex.Op.NOT_NULL:
        # cannot-match only when the summary proves all values are null
        if lo is None and hi is None and contains_null:
            return ROWS_CANNOT_MATCH
        return ROWS_MIGHT_MATCH
    if lo is None or hi is None:
        return ROWS_MIGHT_MATCH
    lits = [_normalize(x) for x in (e.literals or [])]
    if op == ex.Op.EQ:
        return ROWS_CANNOT_MATCH if (lits[0] < lo or lits[0] > hi) else ROWS_MIGHT_MATCH
    if op == ex.Op.IN:
        return ROWS_CANNOT_MATCH if all(v < lo or v > hi for v in lits) else ROWS_MIGHT_MATCH
    if op == ex.Op.LT:
        return ROWS_CANNOT_MATCH if lo >= lits[0] else ROWS_MIGHT_MATCH
    if op == ex.Op.LT_EQ:
        return ROWS_CANNOT_MATCH if lo > lits[0] else ROWS_MIGHT_MATCH
    if op == ex.Op.GT:
        return ROWS_CANNOT_MATCH if hi <= lits[0] else ROWS_MIGHT_MATCH
    if op == ex.Op.GT_EQ:
        return ROWS_CANNOT_MATCH if hi < lits[0] else ROWS_MIGHT_MATCH
    if op == ex.Op.STARTS_WITH and isinstance(lo, str) and isinstance(hi, str):
        p = str(lits[0])
        if lo[: len(p)] > p or hi[: len(p)] < p:
            return ROWS_CANNOT_MATCH
    return ROWS_MIGHT_MATCH


# ---------------------------------------------------------------------------
# Inclusive metrics evaluator: per-file column stats vs row filter
# (spec scan planning; stats fields from manifest_entry.h:95-124)
# ---------------------------------------------------------------------------

def referenced_field_ids(e: ex.Expression) -> set:
    """Field ids a bound metrics expression actually consults — lets
    the distributed planner materialize ONLY those entries of the
    per-file stats maps instead of converting six full per-column maps
    per manifest row (the planning hot loop at 10^5 files)."""
    out: set = set()

    def walk(x) -> None:
        if isinstance(x, (ex.And, ex.Or)):
            walk(x.left)
            walk(x.right)
        elif isinstance(x, ex.Not):
            walk(x.child)
        elif isinstance(x, ex.BoundPredicate):
            if x.term.transform is None:
                out.add(x.term.field_id)

    walk(e)
    return out


@lru_cache(maxsize=64)
def _polygon_envelope(query_wkb: bytes) -> tuple:
    """Envelope of an exact WKB polygon literal, memoized by the
    literal bytes: parsed once per distinct polygon, not once per file
    evaluation (O(#files) re-parses otherwise)."""
    from iceberg_cpp_spark.core import geom

    return geom._query_envelope(geom.parse_query_polygons(query_wkb))


class InclusiveMetricsEvaluator:
    """Decides rows_might_match from a data file's column statistics:
    record_count, value_counts, null_value_counts, nan_value_counts,
    lower_bounds, upper_bounds (keyed by field id, bounds spec-encoded
    bytes decoded via literals.from_bytes)."""

    def __init__(self, schema: it.Schema, expr: ex.Expression, case_sensitive: bool = True):
        self.schema = schema
        self.expr = expr.bind(schema, case_sensitive) if isinstance(
            expr, (ex.UnboundPredicate, ex.And, ex.Or, ex.Not)
        ) else expr

    def eval(self, stats: dict) -> bool:
        if stats.get("record_count") == 0:
            return ROWS_CANNOT_MATCH
        return self._visit(self.expr, stats)

    def _visit(self, e: ex.Expression, st: dict) -> bool:
        if isinstance(e, ex.TrueExp):
            return ROWS_MIGHT_MATCH
        if isinstance(e, ex.FalseExp):
            return ROWS_CANNOT_MATCH
        if isinstance(e, ex.And):
            return self._visit(e.left, st) and self._visit(e.right, st)
        if isinstance(e, ex.Or):
            return self._visit(e.left, st) or self._visit(e.right, st)
        if isinstance(e, ex.BoundPredicate):
            return self._pred(e, st)
        return ROWS_MIGHT_MATCH

    def _pred(self, p: ex.BoundPredicate, st: dict) -> bool:
        if p.term.transform is not None:
            return ROWS_MIGHT_MATCH  # no stats for transformed values
        fid = p.term.field_id
        t = p.term.field_type
        nulls = _mget(st, "null_value_counts", fid)
        values = _mget(st, "value_counts", fid)
        nans = _mget(st, "nan_value_counts", fid)
        lower = _bound(st, "lower_bounds", fid, t)
        upper = _bound(st, "upper_bounds", fid, t)
        op = p.op

        def all_null() -> bool:
            return values is not None and nulls is not None and values == nulls

        if op == ex.Op.IS_NULL:
            return ROWS_CANNOT_MATCH if nulls == 0 else ROWS_MIGHT_MATCH
        if op == ex.Op.NOT_NULL:
            return ROWS_CANNOT_MATCH if all_null() else ROWS_MIGHT_MATCH
        if op == ex.Op.IS_NAN:
            return ROWS_CANNOT_MATCH if nans == 0 else ROWS_MIGHT_MATCH
        if op == ex.Op.NOT_NAN:
            return ROWS_CANNOT_MATCH if (nans is not None and values is not None and nans == values) else ROWS_MIGHT_MATCH
        if all_null():
            return ROWS_CANNOT_MATCH
        v = p.literal
        if op in (ex.Op.ST_INTERSECTS, ex.Op.ST_DISJOINT):
            # geo bounds are WKB points (lower=(xmin,ymin),
            # upper=(xmax,ymax); geography x may wrap the antimeridian)
            if lower is None or upper is None:
                return ROWS_MIGHT_MATCH
            from iceberg_cpp_spark.core import wkb

            exact = isinstance(v, (bytes, bytearray))
            if exact:
                # exact polygon literal: prune with its envelope — a
                # file box disjoint from the envelope is disjoint from
                # the polygon inside it. Memoized by the literal bytes:
                # this evaluator runs once PER FILE (and per manifest
                # row in the mapInPandas fallback), and the polygon
                # never changes within a scan.
                v = _polygon_envelope(bytes(v))
            hit = wkb.file_bounds_intersect(lower, upper, v)
            if op == ex.Op.ST_INTERSECTS:
                # file box disjoint from query box → no row intersects
                return ROWS_MIGHT_MATCH if hit else ROWS_CANNOT_MATCH
            if exact:
                # a file box inside the polygon's ENVELOPE may still
                # miss the polygon itself — never prune exact disjoint
                return ROWS_MIGHT_MATCH
            # ST_DISJOINT: only an entirely-contained file box (every
            # row envelope inside the query box → every row intersects)
            # can be pruned; wrapped geography boxes stay conservative
            lx, ly = wkb.parse_point(lower)
            ux, uy = wkb.parse_point(upper)
            xmin, ymin, xmax, ymax = v
            contained = (lx <= ux and xmin <= lx and ux <= xmax
                         and ymin <= ly and uy <= ymax)
            return ROWS_CANNOT_MATCH if contained else ROWS_MIGHT_MATCH
        if op == ex.Op.LT:
            if lower is not None and not _is_nan(lower) and lower >= v:
                return ROWS_CANNOT_MATCH
        elif op == ex.Op.LT_EQ:
            if lower is not None and not _is_nan(lower) and lower > v:
                return ROWS_CANNOT_MATCH
        elif op == ex.Op.GT:
            if upper is not None and not _is_nan(upper) and upper <= v:
                return ROWS_CANNOT_MATCH
        elif op == ex.Op.GT_EQ:
            if upper is not None and not _is_nan(upper) and upper < v:
                return ROWS_CANNOT_MATCH
        elif op == ex.Op.EQ:
            if lower is not None and not _is_nan(lower) and lower > v:
                return ROWS_CANNOT_MATCH
            if upper is not None and not _is_nan(upper) and upper < v:
                return ROWS_CANNOT_MATCH
        elif op == ex.Op.IN:
            vals = p.literals
            if lower is not None and not _is_nan(lower) and all(lower > x for x in vals):
                return ROWS_CANNOT_MATCH
            if upper is not None and not _is_nan(upper) and all(upper < x for x in vals):
                return ROWS_CANNOT_MATCH
        elif op == ex.Op.STARTS_WITH:
            prefix = str(v)
            if lower is not None and isinstance(lower, str):
                lo = lower[: len(prefix)]
                if lo > prefix:
                    return ROWS_CANNOT_MATCH
            if upper is not None and isinstance(upper, str):
                up = upper[: len(prefix)]
                if up < prefix:
                    return ROWS_CANNOT_MATCH
        # NOT_EQ / NOT_IN / NOT_STARTS_WITH can't exclude via inclusive bounds
        return ROWS_MIGHT_MATCH


# types whose comparable form is a plain number — the set the batch
# (vectorized) metrics evaluator handles; everything else falls back to
# the scalar per-row path
_NUMERIC_COMPARABLE = (
    "IntegerType", "LongType", "FloatType", "DoubleType",
    "DateType", "TimeType", "TimestampType", "TimestampTzType",
)

_VEC_OPS = {ex.Op.IS_NULL, ex.Op.NOT_NULL, ex.Op.IS_NAN, ex.Op.NOT_NAN,
            ex.Op.LT, ex.Op.LT_EQ, ex.Op.GT, ex.Op.GT_EQ, ex.Op.EQ,
            ex.Op.IN, ex.Op.NOT_EQ, ex.Op.NOT_IN}


def _vectorizable(e: ex.Expression) -> bool:
    if isinstance(e, (ex.TrueExp, ex.FalseExp)):
        return True
    if isinstance(e, (ex.And, ex.Or)):
        return _vectorizable(e.left) and _vectorizable(e.right)
    if isinstance(e, ex.BoundPredicate):
        if e.term.transform is not None:
            return False
        if e.op not in _VEC_OPS:
            return False
        return type(e.term.field_type).__name__ in _NUMERIC_COMPARABLE
    return False


class _BatchStats:
    """Lazily-decoded per-field stat arrays for one pandas batch of
    manifest rows (maps arrive as dicts or arrow lists of (k, v))."""

    def __init__(self, batch):
        import numpy as np

        self.b = batch
        self.n = len(batch)
        self.np = np
        self._cache: dict = {}

    def _extract(self, key: str, fid: int) -> list:
        out = []
        for m in self.b[key]:
            if m is None:
                out.append(None)
                continue
            items = m.items() if isinstance(m, dict) else m
            v = None
            for k, x in items:
                if int(k) == fid:
                    v = x
                    break
            out.append(v)
        return out

    def counts(self, key: str, fid: int):
        """(float64 values, present mask) for a counts map column."""
        ck = (key, fid)
        if ck not in self._cache:
            np = self.np
            raw = self._extract(key, fid)
            present = np.array([v is not None for v in raw])
            vals = np.array([float(v) if v is not None else 0.0
                             for v in raw])
            self._cache[ck] = (vals, present)
        return self._cache[ck]

    def bounds(self, key: str, fid: int, t):
        """(float64 comparable values, usable mask) for a bounds column;
        missing OR NaN bounds are both 'unusable' (exactly the scalar
        evaluator's `is not None and not _is_nan` guard). float64 holds
        int64 bounds beyond 2^53 only approximately — so int-typed
        comparisons run on an int64 array instead."""
        ck = (key, fid, "b")
        if ck not in self._cache:
            np = self.np
            decoded = []
            for v in self._extract(key, fid):
                if v is None:
                    decoded.append(None)
                    continue
                d = to_comparable(
                    from_bytes(bytes(v), t)
                    if isinstance(v, (bytes, bytearray)) else v, t)
                decoded.append(None if _is_nan(d) else d)
            usable = np.array([d is not None for d in decoded])
            if type(t).__name__ in ("FloatType", "DoubleType"):
                vals = np.array([float(d) if d is not None else 0.0
                                 for d in decoded])
            else:
                vals = np.array([int(d) if d is not None else 0
                                 for d in decoded], dtype=np.int64)
            self._cache[ck] = (vals, usable)
        return self._cache[ck]


def batch_metrics_keep(expr: ex.Expression, batch, n: int):
    """Vectorized InclusiveMetricsEvaluator over a whole manifest-row
    batch: returns a bool keep-array, or None when the expression isn't
    fully vectorizable (caller falls back to the scalar per-row path).
    Semantics mirror InclusiveMetricsEvaluator exactly and are pinned
    equal by tests/test_expressions.py::TestBatchMetricsEvaluator."""
    import numpy as np

    if not _vectorizable(expr):
        return None
    st = _BatchStats(batch)

    def visit(e) -> "np.ndarray":
        if isinstance(e, ex.TrueExp):
            return np.ones(n, dtype=bool)
        if isinstance(e, ex.FalseExp):
            return np.zeros(n, dtype=bool)
        if isinstance(e, ex.And):
            return visit(e.left) & visit(e.right)
        if isinstance(e, ex.Or):
            return visit(e.left) | visit(e.right)
        return _pred_vec(e, st, np, n)

    keep = visit(expr)
    rc = np.asarray(batch["record_count"].to_numpy(dtype="float64"))
    return keep & (rc != 0)


def _pred_vec(p: ex.BoundPredicate, st: "_BatchStats", np, n: int):
    fid = p.term.field_id
    t = p.term.field_type
    nulls, nulls_p = st.counts("null_value_counts", fid)
    values, values_p = st.counts("value_counts", fid)
    op = p.op
    if op == ex.Op.IS_NULL:
        return ~(nulls_p & (nulls == 0))
    all_null = values_p & nulls_p & (values == nulls)
    if op == ex.Op.NOT_NULL:
        return ~all_null
    if op in (ex.Op.IS_NAN, ex.Op.NOT_NAN):
        nans, nans_p = st.counts("nan_value_counts", fid)
        if op == ex.Op.IS_NAN:
            return ~(nans_p & (nans == 0))
        return ~(nans_p & values_p & (nans == values))
    keep = ~all_null
    if op in (ex.Op.NOT_EQ, ex.Op.NOT_IN):
        return keep  # inclusive bounds can't exclude inequality
    lits = [to_comparable(x, t) for x in (p.literals or [])]
    if not lits:
        return keep  # no literal to compare (defensive; folded at bind)
    lower, lower_u = st.bounds("lower_bounds", fid, t)
    upper, upper_u = st.bounds("upper_bounds", fid, t)
    cannot = np.zeros(n, dtype=bool)
    if op == ex.Op.LT:
        cannot = lower_u & (lower >= lits[0])
    elif op == ex.Op.LT_EQ:
        cannot = lower_u & (lower > lits[0])
    elif op == ex.Op.GT:
        cannot = upper_u & (upper <= lits[0])
    elif op == ex.Op.GT_EQ:
        cannot = upper_u & (upper < lits[0])
    elif op == ex.Op.EQ:
        cannot = (lower_u & (lower > lits[0])) | (upper_u & (upper < lits[0]))
    elif op == ex.Op.IN:
        cannot = (lower_u & (lower > max(lits))) | (upper_u & (upper < min(lits)))
    return keep & ~cannot


def _mget(st: dict, key: str, fid: int):
    m = st.get(key)
    if m is None:
        return None
    return m.get(fid, m.get(str(fid)))


def _bound(st: dict, key: str, fid: int, t: it.IcebergType):
    raw = _mget(st, key, fid)
    if raw is None:
        return None
    if isinstance(raw, (bytes, bytearray)):
        return to_comparable(from_bytes(bytes(raw), t), t)
    return to_comparable(raw, t)


def _is_nan(v: Any) -> bool:
    return isinstance(v, float) and math.isnan(v)
