"""Boolean expression / predicate DSL with binding and folding.

Capability parity with the reference's expression DSL:
``Expression`` op set (expression/expression.h:38-62 — 23 ops),
True/False singletons (expression.h:88-125), And/Or/Not with
``negate()`` De Morgan (expression.h:131-222, expression.cc:55-100),
short-circuit factory folding (expressions.h:43-93, expressions.cc:
29-44), terms (``NamedReference``/``BoundReference``/transform terms —
term.h:124-257), and the binding pipeline with literal casting, range
sentinels and IN-list simplification (predicate.cc:60-283).

Two compilers hang off a bound expression:
* ``spark_compiler.to_spark_column`` — data-plane filter (a Spark
  ``Column``; Catalyst then does BooleanSimplification / OptimizeIn /
  pushdown — the rewrites the reference hand-rolls);
* ``pruning.InclusiveProjection`` — metadata-plane predicate on
  partition tuples, the planning capability the reference left TODO
  (table_scan.cc:280).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional, Sequence, Union

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.literals import ABOVE_MAX, BELOW_MIN, cast as literal_cast, to_comparable
from iceberg_cpp_spark.functions import transforms as tr


# ---------------------------------------------------------------------------
# Operations (expression.h:38-62)
# ---------------------------------------------------------------------------

class Op:
    TRUE = "true"
    FALSE = "false"
    IS_NULL = "is_null"
    NOT_NULL = "not_null"
    IS_NAN = "is_nan"
    NOT_NAN = "not_nan"
    LT = "lt"
    LT_EQ = "lt_eq"
    GT = "gt"
    GT_EQ = "gt_eq"
    EQ = "eq"
    NOT_EQ = "not_eq"
    IN = "in"
    NOT_IN = "not_in"
    NOT = "not"
    AND = "and"
    OR = "or"
    STARTS_WITH = "starts_with"
    NOT_STARTS_WITH = "not_starts_with"
    # v3 geospatial (envelope semantics; literal = (xmin,ymin,xmax,ymax))
    ST_INTERSECTS = "st_intersects"
    ST_DISJOINT = "st_disjoint"


_NEGATIONS = {
    Op.IS_NULL: Op.NOT_NULL,
    Op.NOT_NULL: Op.IS_NULL,
    Op.IS_NAN: Op.NOT_NAN,
    Op.NOT_NAN: Op.IS_NAN,
    Op.LT: Op.GT_EQ,
    Op.LT_EQ: Op.GT,
    Op.GT: Op.LT_EQ,
    Op.GT_EQ: Op.LT,
    Op.EQ: Op.NOT_EQ,
    Op.NOT_EQ: Op.EQ,
    Op.IN: Op.NOT_IN,
    Op.NOT_IN: Op.IN,
    Op.STARTS_WITH: Op.NOT_STARTS_WITH,
    Op.NOT_STARTS_WITH: Op.STARTS_WITH,
    Op.ST_INTERSECTS: Op.ST_DISJOINT,
    Op.ST_DISJOINT: Op.ST_INTERSECTS,
}

_GEO_OPS = (Op.ST_INTERSECTS, Op.ST_DISJOINT)


class Expression:
    op: str = ""

    def negate(self) -> "Expression":
        raise NotImplementedError

    def bind(self, schema: it.Schema, case_sensitive: bool = True) -> "Expression":
        return self

    def __and__(self, other: "Expression") -> "Expression":
        return and_(self, other)

    def __or__(self, other: "Expression") -> "Expression":
        return or_(self, other)

    def __invert__(self) -> "Expression":
        return not_(self)


class TrueExp(Expression):
    op = Op.TRUE

    def negate(self):
        return ALWAYS_FALSE

    def __repr__(self):
        return "true"


class FalseExp(Expression):
    op = Op.FALSE

    def negate(self):
        return ALWAYS_TRUE

    def __repr__(self):
        return "false"


ALWAYS_TRUE = TrueExp()
ALWAYS_FALSE = FalseExp()


class And(Expression):
    op = Op.AND

    def __init__(self, left: Expression, right: Expression):
        self.left = left
        self.right = right

    def negate(self):  # De Morgan (expression.cc:55-100)
        return Or(self.left.negate(), self.right.negate())

    def bind(self, schema, case_sensitive=True):
        return and_(self.left.bind(schema, case_sensitive), self.right.bind(schema, case_sensitive))

    def __repr__(self):
        return f"({self.left!r} and {self.right!r})"


class Or(Expression):
    op = Op.OR

    def __init__(self, left: Expression, right: Expression):
        self.left = left
        self.right = right

    def negate(self):
        return And(self.left.negate(), self.right.negate())

    def bind(self, schema, case_sensitive=True):
        return or_(self.left.bind(schema, case_sensitive), self.right.bind(schema, case_sensitive))

    def __repr__(self):
        return f"({self.left!r} or {self.right!r})"


class Not(Expression):
    op = Op.NOT

    def __init__(self, child: Expression):
        self.child = child

    def negate(self):
        return self.child

    def bind(self, schema, case_sensitive=True):
        return self.child.bind(schema, case_sensitive).negate()

    def __repr__(self):
        return f"(not {self.child!r})"


# ---------------------------------------------------------------------------
# Terms (term.h:124-257)
# ---------------------------------------------------------------------------

class Reference:
    """Unbound named column reference (NamedReference, term.h:124)."""

    def __init__(self, name: str):
        self.name = name

    def bind(self, schema: it.Schema, case_sensitive: bool = True) -> "BoundReference":
        f = schema.find_field(self.name, case_sensitive)
        if f is None:
            raise ValueError(f"cannot bind reference, column not found: {self.name}")
        if isinstance(f.field_type, it.VariantType):
            raise ValueError(
                f"cannot bind predicate to variant column {self.name!r}: "
                "v3 variant has no comparable literal form — filter on "
                "an extracted (shredded) column instead")
        full_name = schema.name_of(f.field_id) or self.name
        return BoundReference(f, full_name)

    def __repr__(self):
        return f"ref({self.name})"


class BoundReference:
    def __init__(self, field: it.NestedField, full_name: str):
        self.field = field
        self.full_name = full_name

    @property
    def field_id(self) -> int:
        return self.field.field_id

    @property
    def field_type(self) -> it.IcebergType:
        return self.field.field_type

    @property
    def transform(self) -> Optional[tr.Transform]:
        return None

    def __repr__(self):
        return f"bound_ref({self.full_name}#{self.field_id})"


class VariantGetTerm:
    """Unbound ``variant_get(column, path, type)`` term — predicates on
    an extracted (shredded) variant path. Binds against the VARIANT
    column (bypassing the no-total-order fence, since the extraction
    has a declared primitive type) to a synthetic field id derived
    deterministically from (source fid, path, type) — the id the
    write-side shredder records bounds under (core/shredding.py), so
    the metrics evaluator prunes files like any real column."""

    def __init__(self, name: str, path: str, type_name: str):
        from iceberg_cpp_spark.core.shredding import _TYPES

        self.name = name
        self.path = path
        self.type_name = type_name.lower()
        if self.type_name not in _TYPES:
            raise ValueError(
                f"unsupported variant_get type {type_name!r} "
                f"(one of {sorted(_TYPES)})")
        if not path.startswith("$"):
            raise ValueError(f"variant path must start with '$': {path!r}")

    def bind(self, schema: it.Schema,
             case_sensitive: bool = True) -> "BoundVariantGetTerm":
        from iceberg_cpp_spark.core.shredding import _TYPES, shred_field_id

        f = schema.find_field(self.name, case_sensitive)
        if f is None:
            raise ValueError(
                f"cannot bind variant_get, column not found: {self.name}")
        if not isinstance(f.field_type, it.VariantType):
            raise ValueError(
                f"variant_get requires a variant column, "
                f"{self.name!r} is {f.field_type!r}")
        fid = shred_field_id(f.field_id, self.path, self.type_name)
        synthetic = it.NestedField(fid, f"{self.name}[{self.path}]",
                                   _TYPES[self.type_name], required=False)
        return BoundVariantGetTerm(synthetic, self.name, self.path,
                                   self.type_name)

    def __repr__(self):
        return f"variant_get({self.name}, {self.path}, {self.type_name})"


class BoundVariantGetTerm:
    def __init__(self, field: it.NestedField, source_name: str,
                 path: str, type_name: str):
        self.field = field
        self.source_name = source_name
        self.path = path
        self.type_name = type_name

    @property
    def field_id(self) -> int:
        return self.field.field_id

    @property
    def field_type(self) -> it.IcebergType:
        return self.field.field_type

    @property
    def full_name(self) -> str:
        return self.field.name

    @property
    def transform(self) -> None:
        return None

    def __repr__(self):
        return f"bound_variant_get({self.source_name}{self.path}#{self.field_id})"


def variant_get(name, path: str, type_name: str) -> VariantGetTerm:
    """Term factory: ``ex.lt(ex.variant_get("payload", "$.k", "long"),
    100)`` — prunable when the table declares the matching shred path
    (write.variant.shred.payload), correct either way."""
    if isinstance(name, Reference):
        name = name.name
    return VariantGetTerm(name, path, type_name)


class TransformTerm:
    """Unbound transform-of-column term, e.g. Equal(bucket(16, 'id'), 5)
    (UnboundTransform, term.h:196)."""

    def __init__(self, transform: tr.Transform, ref: Reference):
        self.transform = transform
        self.ref = ref

    def bind(self, schema: it.Schema, case_sensitive: bool = True) -> "BoundTransformTerm":
        bref = self.ref.bind(schema, case_sensitive)
        if not self.transform.can_transform(bref.field_type):
            raise ValueError(f"{self.transform} cannot transform {bref.field_type!r}")
        return BoundTransformTerm(self.transform, bref)

    def __repr__(self):
        return f"{self.transform}({self.ref.name})"


class BoundTransformTerm:
    def __init__(self, transform: tr.Transform, bref: BoundReference):
        self.transform_ = transform
        self.bref = bref

    @property
    def field(self) -> it.NestedField:
        return self.bref.field

    @property
    def field_id(self) -> int:
        return self.bref.field_id

    @property
    def field_type(self) -> it.IcebergType:
        return self.transform_.result_type(self.bref.field_type)

    @property
    def full_name(self) -> str:
        return self.bref.full_name

    @property
    def transform(self) -> Optional[tr.Transform]:
        return self.transform_

    def __repr__(self):
        return f"{self.transform_}({self.bref!r})"


Term = Union[str, Reference, TransformTerm]


def _as_ref(term: Term):
    if isinstance(term, str):
        return Reference(term)
    return term


# ---------------------------------------------------------------------------
# Predicates
# ---------------------------------------------------------------------------

_FLOATING = (it.FloatType, it.DoubleType)


class UnboundPredicate(Expression):
    def __init__(self, op: str, term: Term, literals: Optional[Sequence[Any]] = None):
        self.op = op
        self.term = _as_ref(term)
        self.literals = list(literals) if literals is not None else None

    def negate(self):
        return UnboundPredicate(_NEGATIONS[self.op], self.term, self.literals)

    def bind(self, schema: it.Schema, case_sensitive: bool = True) -> Expression:
        """Binding pipeline (predicate.cc:60-283): bind term, dispatch
        unary/literal/in, cast + fold sentinels."""
        bterm = self.term.bind(schema, case_sensitive)
        col_type = bterm.field_type
        op = self.op

        # v3 unknown: every value is null by invariant — fold without
        # touching data (is_null TRUE, not_null FALSE, any comparison /
        # IN / startswith FALSE under three-valued logic). NaN ops fall
        # through to the float-only type check below.
        if (isinstance(col_type, it.UnknownType)
                and op not in (Op.IS_NAN, Op.NOT_NAN)):
            if op == Op.IS_NULL:
                return ALWAYS_TRUE
            return ALWAYS_FALSE

        # v3 geospatial: ST ops bind only to geometry/geography, ordered
        # comparisons never do (geo has no total order — the spec gives
        # these columns point bounds, not value bounds)
        if op in _GEO_OPS:
            if not isinstance(col_type, it.GEO_TYPES):
                raise ValueError(
                    f"{op} requires a geometry/geography column, "
                    f"got {col_type!r}")
            if bterm.transform is not None:
                raise ValueError(f"{op} cannot apply to a transform term")
            bbox = self.literals[0] if self.literals else None
            if isinstance(bbox, (bytes, bytearray)):
                # exact mode: literal is a WKB POLYGON/MULTIPOLYGON —
                # validate it parses now (fail at bind, not mid-scan);
                # pruning derives the envelope, rows get the exact kernel
                from iceberg_cpp_spark.core import geom

                geom.parse_query_polygons(bytes(bbox))
                return BoundPredicate(op, bterm, [bytes(bbox)])
            try:
                xmin, ymin, xmax, ymax = (float(v) for v in bbox)
            except (TypeError, ValueError):
                raise ValueError(
                    f"{op} literal must be a (xmin, ymin, xmax, ymax) "
                    f"box or a WKB polygon, got {bbox!r}") from None
            if xmin > xmax or ymin > ymax:
                raise ValueError(f"degenerate query box: {bbox!r}")
            return BoundPredicate(op, bterm, [(xmin, ymin, xmax, ymax)])
        if (isinstance(col_type, it.GEO_TYPES)
                and op not in (Op.IS_NULL, Op.NOT_NULL)):
            raise ValueError(
                f"{op} is not valid on geospatial column "
                f"{bterm.field.name!r} (WKB values have no total order; "
                "use st_intersects/st_disjoint)")

        # unary (predicate.cc:141-176)
        if op in (Op.IS_NULL, Op.NOT_NULL, Op.IS_NAN, Op.NOT_NAN):
            if op == Op.IS_NULL and bterm.field.required and bterm.transform is None:
                return ALWAYS_FALSE
            if op == Op.NOT_NULL and bterm.field.required and bterm.transform is None:
                return ALWAYS_TRUE
            if op in (Op.IS_NAN, Op.NOT_NAN) and not isinstance(col_type, _FLOATING):
                raise ValueError(f"{op} only valid for float/double, got {col_type!r}")
            return BoundPredicate(op, bterm)

        # IN / NOT_IN (predicate.cc:234-283)
        if op in (Op.IN, Op.NOT_IN):
            converted = []
            for v in self.literals or []:
                c = _convert_literal(v, col_type)
                if c is BELOW_MIN or c is ABOVE_MAX or c is None and v is not None:
                    continue  # out-of-range value can't match
                converted.append(c)
            # dedup, keep order stable
            seen = set()
            vals = []
            for v in converted:
                k = repr(v)
                if k not in seen:
                    seen.add(k)
                    vals.append(v)
            if op == Op.IN:
                if not vals:
                    return ALWAYS_FALSE
                if len(vals) == 1:
                    return BoundPredicate(Op.EQ, bterm, vals)
            else:
                if not vals:
                    return ALWAYS_TRUE
                if len(vals) == 1:
                    return BoundPredicate(Op.NOT_EQ, bterm, vals)
            return BoundPredicate(op, bterm, vals)

        # literal comparisons (predicate.cc:200-227 sentinel folding)
        v = (self.literals or [None])[0]
        c = _convert_literal(v, col_type)
        if c is BELOW_MIN:
            #  x < BelowMin → false;  x >= BelowMin → true; etc.
            return {
                Op.LT: ALWAYS_FALSE, Op.LT_EQ: ALWAYS_FALSE,
                Op.GT: ALWAYS_TRUE, Op.GT_EQ: ALWAYS_TRUE,
                Op.EQ: ALWAYS_FALSE, Op.NOT_EQ: ALWAYS_TRUE,
            }[self.op]
        if c is ABOVE_MAX:
            return {
                Op.LT: ALWAYS_TRUE, Op.LT_EQ: ALWAYS_TRUE,
                Op.GT: ALWAYS_FALSE, Op.GT_EQ: ALWAYS_FALSE,
                Op.EQ: ALWAYS_FALSE, Op.NOT_EQ: ALWAYS_TRUE,
            }[self.op]
        if c is None and v is not None:
            raise ValueError(f"cannot cast literal {v!r} to {col_type!r}")
        if op in (Op.STARTS_WITH, Op.NOT_STARTS_WITH) and not isinstance(col_type, it.StringType):
            raise ValueError(f"{op} requires a string column")
        return BoundPredicate(op, bterm, [c])

    def __repr__(self):
        if self.literals is None:
            return f"{self.op}({self.term!r})"
        return f"{self.op}({self.term!r}, {self.literals!r})"


def _convert_literal(v: Any, col_type: it.IcebergType) -> Any:
    """Cast a python literal to the bound column type, normalizing
    date/timestamp values to comparable ints."""
    if v is None:
        return None
    # integer range folding against the column's width (predicate.cc:200)
    if isinstance(v, int) and not isinstance(v, bool):
        if isinstance(col_type, it.IntegerType):
            if v < -(2**31):
                return BELOW_MIN
            if v > 2**31 - 1:
                return ABOVE_MAX
        if isinstance(col_type, it.LongType):
            if v < -(2**63):
                return BELOW_MIN
            if v > 2**63 - 1:
                return ABOVE_MAX
    src = _infer_type(v)
    if src == col_type or src is None:
        return to_comparable(v, col_type)
    c = literal_cast(v, src, col_type)
    if c is None:
        # try direct comparability (e.g. python date vs DateType)
        return to_comparable(v, col_type)
    if c is BELOW_MIN or c is ABOVE_MAX:
        return c
    return to_comparable(c, col_type)


def _infer_type(v: Any) -> Optional[it.IcebergType]:
    import datetime as dt
    from decimal import Decimal as D

    if isinstance(v, bool):
        return it.BooleanType()
    if isinstance(v, int):
        return it.LongType() if not (-(2**31) <= v <= 2**31 - 1) else it.IntegerType()
    if isinstance(v, float):
        return it.DoubleType()
    if isinstance(v, str):
        return it.StringType()
    if isinstance(v, bytes):
        return it.BinaryType()
    if isinstance(v, dt.datetime):
        return it.TimestampType() if v.tzinfo is None else it.TimestampTzType()
    if isinstance(v, dt.date):
        return it.DateType()
    if isinstance(v, D):
        return None  # keep as-is; compared against decimal columns directly
    return None


class BoundPredicate(Expression):
    def __init__(self, op: str, term, literals: Optional[list] = None):
        self.op = op
        self.term = term
        self.literals = literals

    @property
    def literal(self) -> Any:
        return self.literals[0] if self.literals else None

    def negate(self):
        return BoundPredicate(_NEGATIONS[self.op], self.term, self.literals)

    def bind(self, schema, case_sensitive=True):
        return self

    def test(self, value: Any) -> bool:
        """Row-at-a-time evaluation (BoundPredicate::Evaluate,
        predicate.cc:291-400) — used by tests and the metrics evaluator."""
        import math

        if self.term.transform is not None:
            value = self.term.transform.pyvalue(value, self.term.bref.field_type)
        op = self.op
        if op == Op.IS_NULL:
            return value is None
        if op == Op.NOT_NULL:
            return value is not None
        if op == Op.IS_NAN:
            return value is not None and math.isnan(value)
        if op == Op.NOT_NAN:
            return value is not None and not math.isnan(value)
        if value is None:
            return False
        if op in _GEO_OPS:
            from iceberg_cpp_spark.core import wkb

            env = wkb.envelope(bytes(value))
            if env is None:  # empty geometry intersects nothing
                return op == Op.ST_DISJOINT
            if isinstance(self.literal, (bytes, bytearray)):
                from iceberg_cpp_spark.core import geom

                hit = geom.wkb_intersects_polygons(
                    bytes(value), geom.parse_query_polygons(self.literal))
                return hit if op == Op.ST_INTERSECTS else not hit
            xmin, ymin, xmax, ymax = self.literal
            hit = (env[0] <= xmax and env[2] >= xmin
                   and env[1] <= ymax and env[3] >= ymin)
            return hit if op == Op.ST_INTERSECTS else not hit
        # term.field_type is the comparison type for every term kind:
        # the column type for references, the transform RESULT type for
        # transform terms (pyvalue above already applied the transform),
        # the declared extraction type for variant_get terms. (The old
        # `term.bref` access crashed on plain BoundReference.)
        cmp_v = to_comparable(value, self.term.field_type)
        if op == Op.LT:
            return cmp_v < self.literal
        if op == Op.LT_EQ:
            return cmp_v <= self.literal
        if op == Op.GT:
            return cmp_v > self.literal
        if op == Op.GT_EQ:
            return cmp_v >= self.literal
        if op == Op.EQ:
            return cmp_v == self.literal
        if op == Op.NOT_EQ:
            return cmp_v != self.literal
        if op == Op.IN:
            return cmp_v in set(self.literals)
        if op == Op.NOT_IN:
            return cmp_v not in set(self.literals)
        if op == Op.STARTS_WITH:
            return str(cmp_v).startswith(self.literal)
        if op == Op.NOT_STARTS_WITH:
            return not str(cmp_v).startswith(self.literal)
        raise ValueError(f"cannot test op {op}")

    def __repr__(self):
        if self.literals is None:
            return f"{self.op}({self.term!r})"
        return f"{self.op}({self.term!r}, {self.literals!r})"


# ---------------------------------------------------------------------------
# Factories with short-circuit folding (expressions.h:43-93)
# ---------------------------------------------------------------------------

def and_(*exprs: Expression) -> Expression:
    result: Optional[Expression] = None
    for e in exprs:
        if isinstance(e, FalseExp):
            return ALWAYS_FALSE
        if isinstance(e, TrueExp):
            continue
        result = e if result is None else And(result, e)
    return result if result is not None else ALWAYS_TRUE


def or_(*exprs: Expression) -> Expression:
    result: Optional[Expression] = None
    for e in exprs:
        if isinstance(e, TrueExp):
            return ALWAYS_TRUE
        if isinstance(e, FalseExp):
            continue
        result = e if result is None else Or(result, e)
    return result if result is not None else ALWAYS_FALSE


def not_(e: Expression) -> Expression:
    #  not(true)→false, not(not(x))→x  (expressions.cc:29-44)
    if isinstance(e, TrueExp):
        return ALWAYS_FALSE
    if isinstance(e, FalseExp):
        return ALWAYS_TRUE
    if isinstance(e, Not):
        return e.child
    return e.negate() if isinstance(e, (UnboundPredicate, BoundPredicate)) else Not(e)


def is_null(term: Term) -> UnboundPredicate:
    return UnboundPredicate(Op.IS_NULL, term)


def not_null(term: Term) -> UnboundPredicate:
    return UnboundPredicate(Op.NOT_NULL, term)


def is_nan(term: Term) -> UnboundPredicate:
    return UnboundPredicate(Op.IS_NAN, term)


def not_nan(term: Term) -> UnboundPredicate:
    return UnboundPredicate(Op.NOT_NAN, term)


def lt(term: Term, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Op.LT, term, [v])


def lt_eq(term: Term, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Op.LT_EQ, term, [v])


def gt(term: Term, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Op.GT, term, [v])


def gt_eq(term: Term, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Op.GT_EQ, term, [v])


def eq(term: Term, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Op.EQ, term, [v])


def not_eq(term: Term, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Op.NOT_EQ, term, [v])


def in_(term: Term, values: Iterable[Any]) -> UnboundPredicate:
    return UnboundPredicate(Op.IN, term, list(values))


def not_in(term: Term, values: Iterable[Any]) -> UnboundPredicate:
    return UnboundPredicate(Op.NOT_IN, term, list(values))


def starts_with(term: Term, prefix: str) -> UnboundPredicate:
    return UnboundPredicate(Op.STARTS_WITH, term, [prefix])


def not_starts_with(term: Term, prefix: str) -> UnboundPredicate:
    return UnboundPredicate(Op.NOT_STARTS_WITH, term, [prefix])


def st_intersects(term: Term, query) -> UnboundPredicate:
    """Intersects for v3 geometry/geography columns. ``query`` is
    either an (xmin, ymin, xmax, ymax) box in the column's CRS
    (envelope semantics) or a WKB POLYGON / MULTIPOLYGON (EXACT,
    boundary-inclusive PostGIS ST_Intersects semantics — core/geom.py;
    file pruning still runs on the polygon's envelope)."""
    if isinstance(query, (bytes, bytearray)):
        return UnboundPredicate(Op.ST_INTERSECTS, term, [bytes(query)])
    return UnboundPredicate(Op.ST_INTERSECTS, term,
                            [tuple(query) if query is not None else None])


def st_disjoint(term: Term, query) -> UnboundPredicate:
    if isinstance(query, (bytes, bytearray)):
        return UnboundPredicate(Op.ST_DISJOINT, term, [bytes(query)])
    return UnboundPredicate(Op.ST_DISJOINT, term,
                            [tuple(query) if query is not None else None])


def bucket(term: Term, n: int) -> TransformTerm:
    return TransformTerm(tr.bucket(n), _as_ref(term))


def truncate(term: Term, w: int) -> TransformTerm:
    return TransformTerm(tr.truncate(w), _as_ref(term))


def year(term: Term) -> TransformTerm:
    return TransformTerm(tr.YEAR, _as_ref(term))


def month(term: Term) -> TransformTerm:
    return TransformTerm(tr.MONTH, _as_ref(term))


def day(term: Term) -> TransformTerm:
    return TransformTerm(tr.DAY, _as_ref(term))


def hour(term: Term) -> TransformTerm:
    return TransformTerm(tr.HOUR, _as_ref(term))


def referenced_names(expr) -> Optional[set]:
    """Column names an expression predicate reads (r18, guide §4): lets
    opaque executor-side readers (ORC/Avro need_meta legs) prune their
    decode to the referenced columns. Returns None when any node is
    unrecognized — callers must treat None as 'unknown, read all'."""
    if isinstance(expr, (TrueExp, FalseExp)):
        return set()
    if isinstance(expr, (And, Or)):
        l = referenced_names(expr.left)
        r = referenced_names(expr.right)
        return None if l is None or r is None else l | r
    if isinstance(expr, Not):
        return referenced_names(expr.child)
    if isinstance(expr, (UnboundPredicate, BoundPredicate)):
        t = expr.term
        if isinstance(t, Reference):
            return {t.name}
        if isinstance(t, BoundReference):
            return {t.full_name}
        if isinstance(t, TransformTerm):
            return {t.ref.name}
        if isinstance(t, BoundTransformTerm):
            return {t.bref.full_name}
        if isinstance(t, VariantGetTerm):
            return {t.name}
        if isinstance(t, BoundVariantGetTerm):
            return {t.source_name}
        return None
    return None
