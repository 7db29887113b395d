"""Random expression-tree equivalence: fold + bind + Spark-Column
compilation must preserve SQL three-valued semantics for ANY tree of
and/or/not over comparisons, IN/NOT IN, NULL checks and startsWith —
pinned against an independent Python 3VL model over rows with NULLs.
A folding rule or compiler branch that changes semantics diverges
from the model on some sampled tree."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.plans.spark_compiler import to_spark_column

SCHEMA = it.Schema([
    it.NestedField(1, "rid", it.LongType(), True),
    it.NestedField(2, "a", it.LongType()),
    it.NestedField(3, "s", it.StringType()),
])


def _rand_leaf(rng):
    kind = rng.choice(
        ["lt", "lt_eq", "gt", "gt_eq", "eq", "not_eq", "in", "not_in",
         "is_null_a", "not_null_a", "is_null_s", "not_null_s",
         "starts", "not_starts"])
    v = rng.randint(-5, 5)
    if kind in ("lt", "lt_eq", "gt", "gt_eq", "eq", "not_eq"):
        expr = getattr(ex, kind)(ex.Reference("a"), v)

        def model(row, _k=kind, _v=v):
            x = row["a"]
            if x is None:
                return None
            return {"lt": x < _v, "lt_eq": x <= _v, "gt": x > _v,
                    "gt_eq": x >= _v, "eq": x == _v,
                    "not_eq": x != _v}[_k]
        return expr, model
    if kind in ("in", "not_in"):
        vals = sorted({rng.randint(-5, 5)
                       for _ in range(rng.randint(1, 4))})
        expr = (ex.in_ if kind == "in" else ex.not_in)(
            ex.Reference("a"), vals)

        def model(row, _k=kind, _vals=tuple(vals)):
            x = row["a"]
            if x is None:
                return None
            hit = x in _vals
            return hit if _k == "in" else not hit
        return expr, model
    if kind in ("is_null_a", "not_null_a", "is_null_s", "not_null_s"):
        col = "a" if kind.endswith("_a") else "s"
        null = kind.startswith("is_null")
        expr = (ex.is_null if null else ex.not_null)(ex.Reference(col))

        def model(row, _c=col, _n=null):
            isnull = row[_c] is None
            return isnull if _n else not isnull
        return expr, model
    prefix = rng.choice(["x", "xy", "z", ""])
    expr = (ex.starts_with if kind == "starts"
            else ex.not_starts_with)(ex.Reference("s"), prefix)

    def model(row, _p=prefix, _k=kind):
        s = row["s"]
        if s is None:
            return None
        hit = s.startswith(_p)
        return hit if _k == "starts" else not hit
    return expr, model


def _rand_tree(rng, depth):
    if depth == 0 or rng.random() < 0.35:
        return _rand_leaf(rng)
    op = rng.choice(["and", "or", "not"])
    l_expr, l_model = _rand_tree(rng, depth - 1)
    if op == "not":
        def model(row, _m=l_model):
            v = _m(row)
            return None if v is None else not v
        return ex.not_(l_expr), model
    r_expr, r_model = _rand_tree(rng, depth - 1)
    if op == "and":
        def model(row, _l=l_model, _r=r_model):
            a, b = _l(row), _r(row)
            if a is False or b is False:
                return False
            if a is None or b is None:
                return None
            return True
        return ex.and_(l_expr, r_expr), model

    def model(row, _l=l_model, _r=r_model):
        a, b = _l(row), _r(row)
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False
    return ex.or_(l_expr, r_expr), model


class TestExpressionEquivalence:
    def test_random_trees_match_three_valued_model(self, spark):
        rng = random.Random(20260815)
        rows = []
        rid = 0
        for a in list(range(-6, 7)) + [None]:
            for s in ["x", "xyz", "zq", "", None]:
                rows.append((rid, a, s))
                rid += 1
        df = spark.createDataFrame(rows, "rid long, a long, s string")
        df = df.cache()
        df.count()
        for i in range(40):
            expr, model = _rand_tree(rng, depth=3)
            bound = expr.bind(SCHEMA)
            if isinstance(bound, ex.TrueExp):
                kept = {r[0] for r in rows}
            elif isinstance(bound, ex.FalseExp):
                kept = set()
            else:
                col = to_spark_column(expr, SCHEMA)
                kept = {r["rid"] for r in df.filter(col).collect()}
            want = {r[0] for r in rows
                    if model({"a": r[1], "s": r[2]}) is True}
            assert kept == want, f"tree {i}: {expr!r}"
        df.unpersist()
