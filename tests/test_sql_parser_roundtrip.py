"""Property sweep for the SQL predicate parser: render random
Expression-DSL trees to SQL text, parse the text back, and require the
IDENTICAL tree (same factories, same literal types). This is the same
pinning style as test_expr_equivalence — the grammar must be a faithful
inverse of the DSL it targets, or a SQL DELETE would prune with a
different predicate than the user wrote."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_cpp_spark.functions import transforms as tr
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.plans.sql_parser import parse_predicate

# column pool by type: renderable literals per column
_LONG = "lcol"
_DOUBLE = "dcol"
_STRING = "scol"
_DATE = "datecol"
_TS = "tscol"
_BOOL = "bcol"

_CMP = {"eq": "=", "not_eq": "!=", "lt": "<", "lt_eq": "<=",
        "gt": ">", "gt_eq": ">="}
_FACT = {"eq": ex.eq, "not_eq": ex.not_eq, "lt": ex.lt,
         "lt_eq": ex.lt_eq, "gt": ex.gt, "gt_eq": ex.gt_eq}


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _render_lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, dt.datetime):
        return f"TIMESTAMP '{v.isoformat()}'"
    if isinstance(v, dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, str):
        return _sql_str(v)
    return repr(v)


# literal strategies chosen to render unambiguously:
# ints within int64, floats finite with a fractional part, strings
# printable without wildcards (LIKE bodies exclude % and _)
_ints = st.integers(min_value=-(2**62), max_value=2**62)
_floats = st.floats(min_value=-1e12, max_value=1e12,
                    allow_nan=False, allow_infinity=False) \
    .map(lambda f: f if f % 1 else f + 0.5)
_strings = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           exclude_characters="%_\\"),
    min_size=0, max_size=12)
_dates = st.dates(min_value=dt.date(1900, 1, 1),
                  max_value=dt.date(2100, 1, 1))
_times = st.datetimes(min_value=dt.datetime(1900, 1, 1),
                      max_value=dt.datetime(2100, 1, 1)) \
    .map(lambda d: d.replace(microsecond=0, fold=0))


@st.composite
def _leaf(draw):
    kind = draw(st.sampled_from(
        ["num_cmp", "str_cmp", "date_cmp", "ts_cmp", "bool_cmp",
         "in", "not_in", "between", "like", "not_like",
         "null", "not_null", "nan", "not_nan",
         "bucket", "truncate", "flipped"]))
    op = draw(st.sampled_from(list(_CMP)))
    if kind == "num_cmp":
        col, v = draw(st.sampled_from(
            [(_LONG, _ints), (_DOUBLE, _floats)]))
        lit = draw(v)
        return (_FACT[op](ex.Reference(col), lit),
                f"{col} {_CMP[op]} {_render_lit(lit)}")
    if kind == "flipped":
        lit = draw(_ints)
        flip = {"lt": "gt", "lt_eq": "gt_eq", "gt": "lt",
                "gt_eq": "lt_eq", "eq": "eq", "not_eq": "not_eq"}
        return (_FACT[flip[op]](ex.Reference(_LONG), lit),
                f"{_render_lit(lit)} {_CMP[op]} {_LONG}")
    if kind == "str_cmp":
        lit = draw(_strings)
        return (_FACT[op](ex.Reference(_STRING), lit),
                f"{_STRING} {_CMP[op]} {_render_lit(lit)}")
    if kind == "date_cmp":
        lit = draw(_dates)
        return (_FACT[op](ex.Reference(_DATE), lit),
                f"{_DATE} {_CMP[op]} {_render_lit(lit)}")
    if kind == "ts_cmp":
        lit = draw(_times)
        return (_FACT[op](ex.Reference(_TS), lit),
                f"{_TS} {_CMP[op]} {_render_lit(lit)}")
    if kind == "bool_cmp":
        lit = draw(st.booleans())
        return (ex.eq(ex.Reference(_BOOL), lit),
                f"{_BOOL} = {_render_lit(lit)}")
    if kind in ("in", "not_in"):
        vals = draw(st.lists(_ints, min_size=1, max_size=5))
        f = ex.in_ if kind == "in" else ex.not_in
        neg = "" if kind == "in" else "NOT "
        return (f(ex.Reference(_LONG), vals),
                f"{_LONG} {neg}IN ("
                + ", ".join(_render_lit(v) for v in vals) + ")")
    if kind == "between":
        lo = draw(_ints)
        hi = draw(_ints)
        return (ex.and_(ex.gt_eq(ex.Reference(_LONG), lo),
                        ex.lt_eq(ex.Reference(_LONG), hi)),
                f"{_LONG} BETWEEN {_render_lit(lo)} AND {_render_lit(hi)}")
    if kind in ("like", "not_like"):
        body = draw(_strings)
        f = ex.starts_with if kind == "like" else ex.not_starts_with
        neg = "" if kind == "like" else "NOT "
        return (f(ex.Reference(_STRING), body),
                f"{_STRING} {neg}LIKE {_sql_str(body + '%')}")
    if kind == "null":
        return ex.is_null(ex.Reference(_STRING)), f"{_STRING} IS NULL"
    if kind == "not_null":
        return (ex.not_null(ex.Reference(_STRING)),
                f"{_STRING} IS NOT NULL")
    if kind == "nan":
        return ex.is_nan(ex.Reference(_DOUBLE)), f"{_DOUBLE} IS NAN"
    if kind == "not_nan":
        return (ex.not_nan(ex.Reference(_DOUBLE)),
                f"{_DOUBLE} IS NOT NAN")
    if kind == "bucket":
        n = draw(st.integers(min_value=1, max_value=512))
        lit = draw(st.integers(min_value=0, max_value=511))
        return (ex.eq(ex.TransformTerm(tr.BucketTransform(n),
                                       ex.Reference(_LONG)), lit),
                f"bucket({_LONG}, {n}) = {lit}")
    # kind == "truncate"
    w = draw(st.integers(min_value=1, max_value=64))
    lit = draw(_strings)
    return (ex.eq(ex.TransformTerm(tr.TruncateTransform(w),
                                   ex.Reference(_STRING)), lit),
            f"truncate({_STRING}, {w}) = {_render_lit(lit)}")


@st.composite
def _tree(draw, depth: int = 0):
    if depth >= 3 or draw(st.integers(0, 2)) == 0:
        return draw(_leaf())
    kind = draw(st.sampled_from(["and", "or", "not", "paren"]))
    if kind == "not":
        e, s = draw(_tree(depth + 1))
        return ex.not_(e), f"NOT ({s})"
    if kind == "paren":
        e, s = draw(_tree(depth + 1))
        return e, f"({s})"
    le, ls = draw(_tree(depth + 1))
    re_, rs = draw(_tree(depth + 1))
    if kind == "and":
        # parenthesize operands so rendered precedence always matches
        # the tree (the parser's AND-binds-tighter rule is pinned by
        # the unit tests)
        return ex.and_(le, re_), f"({ls}) AND ({rs})"
    return ex.or_(le, re_), f"({ls}) OR ({rs})"


@given(_tree())
@settings(max_examples=300, deadline=None)
def test_roundtrip_random_trees(tree_and_sql):
    expected, sql = tree_and_sql
    got = parse_predicate(sql)
    assert repr(got) == repr(expected), (
        f"SQL {sql!r}\n parsed   {got!r}\n expected {expected!r}")
