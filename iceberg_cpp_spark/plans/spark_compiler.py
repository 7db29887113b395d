"""Compile a (bound or unbound) expression to a Spark ``Column``.

This is the data-plane compiler: the produced Column goes into
``DataFrame.filter`` where Catalyst applies the folding rewrites the
reference hand-rolls (BooleanSimplification, OptimizeIn,
UnwrapCastInBinaryComparison) and pushes eligible conjuncts down to the
parquet scan. Transform terms compile through
``Transform.spark_column`` (functions/transforms.py).
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.plans import expressions as ex


def _term_column(term) -> tuple[Column, it.IcebergType]:
    if isinstance(term, ex.BoundReference):
        return F.col(term.full_name), term.field_type
    if isinstance(term, ex.BoundTransformTerm):
        src = F.col(term.full_name)
        return term.transform_.spark_column(src, term.bref.field_type), term.field_type
    if isinstance(term, ex.BoundVariantGetTerm):
        # JVM-native extraction (codegen); NULL for missing/uncastable
        # paths — three-valued logic like any other null
        return (F.try_variant_get(F.col(term.source_name), term.path,
                                  term.type_name), term.field_type)
    raise ValueError(f"not a bound term: {term!r}")


def _lit(v: Any, t: it.IcebergType) -> Column:
    """Literal → Column, reversing the comparable-int normalization."""
    if isinstance(t, it.DateType) and isinstance(v, int):
        return F.lit(dt.date(1970, 1, 1) + dt.timedelta(days=v))
    if isinstance(t, (it.TimestampType, it.TimestampTzType)) and isinstance(v, int):
        return F.lit(dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=v))
    return F.lit(v)


def to_spark_column(expr: ex.Expression, schema: it.Schema | None = None,
                    case_sensitive: bool = True) -> Column:
    """Compile; unbound expressions are bound against ``schema`` first."""
    if isinstance(expr, (ex.UnboundPredicate, ex.And, ex.Or, ex.Not)) and schema is not None:
        expr = expr.bind(schema, case_sensitive)
    return _compile(expr)


def _compile(expr: ex.Expression) -> Column:
    if isinstance(expr, ex.TrueExp):
        return F.lit(True)
    if isinstance(expr, ex.FalseExp):
        return F.lit(False)
    if isinstance(expr, ex.And):
        return _compile(expr.left) & _compile(expr.right)
    if isinstance(expr, ex.Or):
        return _compile(expr.left) | _compile(expr.right)
    if isinstance(expr, ex.Not):
        return ~_compile(expr.child)
    if isinstance(expr, ex.BoundPredicate):
        col, t = _term_column(expr.term)
        op = expr.op
        if op == ex.Op.IS_NULL:
            return col.isNull()
        if op == ex.Op.NOT_NULL:
            return col.isNotNull()
        if op == ex.Op.IS_NAN:
            return F.isnan(col)
        if op == ex.Op.NOT_NAN:
            return ~F.isnan(col)
        if op == ex.Op.LT:
            return col < _lit(expr.literal, t)
        if op == ex.Op.LT_EQ:
            return col <= _lit(expr.literal, t)
        if op == ex.Op.GT:
            return col > _lit(expr.literal, t)
        if op == ex.Op.GT_EQ:
            return col >= _lit(expr.literal, t)
        if op == ex.Op.EQ:
            return col == _lit(expr.literal, t)
        if op == ex.Op.NOT_EQ:
            return col != _lit(expr.literal, t)
        if op == ex.Op.IN:
            return col.isin([_py_lit(v, t) for v in expr.literals])
        if op == ex.Op.NOT_IN:
            return ~col.isin([_py_lit(v, t) for v in expr.literals])
        if op == ex.Op.STARTS_WITH:
            return col.startswith(expr.literal)
        if op == ex.Op.NOT_STARTS_WITH:
            return ~col.startswith(expr.literal)
        if op in (ex.Op.ST_INTERSECTS, ex.Op.ST_DISJOINT):
            if isinstance(expr.literal, (bytes, bytearray)):
                hit = _st_exact_udf(bytes(expr.literal))(col)
            else:
                hit = _st_intersects_udf(tuple(expr.literal))(col)
            return hit if op == ex.Op.ST_INTERSECTS else ~hit
    raise ValueError(f"cannot compile expression: {expr!r}")


def _st_intersects_udf(bbox: tuple):
    """Arrow-batched envelope test for the geo row filter: numpy fast
    path for uniform 2D-point batches (core/wkb.py envelopes_np), no
    per-row Python there. Null WKB → null (three-valued logic, like
    every other predicate on a null value)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from iceberg_cpp_spark.core import wkb

    # annotations must be live types (not strings) for Spark's
    # pandas-UDF signature inference — hence the def-then-decorate shape
    def hit(vals):
        envs = wkb.envelopes_np(vals.tolist())
        mask = wkb.intersects_mask(envs, bbox)
        out = pd.Series(mask, index=vals.index, dtype="object")
        out[vals.isna()] = None
        return out.astype("boolean")

    hit.__annotations__ = {"vals": pd.Series, "return": pd.Series}
    return pandas_udf(hit, "boolean")


def _st_exact_udf(query_wkb: bytes):
    """Arrow-batched EXACT st_intersects (core/geom.py): vectorized
    crossing-number test for point batches, envelope-prefiltered
    per-row edge/vertex kernel otherwise. Null WKB → null."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from iceberg_cpp_spark.core import geom

    def hit(vals):
        mask = geom.intersects_exact_mask(vals.tolist(), query_wkb)
        out = pd.Series(mask, index=vals.index, dtype="object")
        out[vals.isna()] = None
        return out.astype("boolean")

    hit.__annotations__ = {"vals": pd.Series, "return": pd.Series}
    return pandas_udf(hit, "boolean")


def _py_lit(v: Any, t: it.IcebergType) -> Any:
    if isinstance(t, it.DateType) and isinstance(v, int):
        return dt.date(1970, 1, 1) + dt.timedelta(days=v)
    if isinstance(t, (it.TimestampType, it.TimestampTzType)) and isinstance(v, int):
        return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=v)
    return v
