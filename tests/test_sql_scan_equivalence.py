"""End-to-end SQL-predicate equivalence: random WHERE texts run BOTH
through the engine (parse_predicate → scan(filter=...) — binding,
literal conversion, file pruning, Spark-Column compilation) and
through Spark's own SQL ``where()`` on the same raw rows. Any
divergence in literal typing (DATE/TIMESTAMP/bool/float), 3VL
handling, or an over-eager pruning rule shows up as a row-set diff.
Uses seeded ``random`` (not hypothesis) because the sweep needs the
session fixture, mirroring test_expr_equivalence."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.plans.sql_parser import parse_predicate

ROWS = 240


def _render_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _leaf(rng: random.Random) -> str:
    kind = rng.choice(
        ["long", "double", "string", "date", "ts", "bool",
         "in", "not_in", "between", "like", "null", "not_null"])
    op = rng.choice(["=", "!=", "<", "<=", ">", ">="])
    if kind == "long":
        v = rng.randint(-5, 25)
        return (f"lcol {op} {v}" if rng.random() < 0.7
                else f"{v} {op} lcol")
    if kind == "double":
        return f"dcol {op} {rng.randint(-3, 30)}.5"
    if kind == "string":
        return f"scol {op} {_render_str(rng.choice(['v1', 'v7', 'zz']))}"
    if kind == "date":
        d = dt.date(2020, 1, 1) + dt.timedelta(days=rng.randint(0, 40))
        return f"datecol {op} DATE '{d.isoformat()}'"
    if kind == "ts":
        t = (dt.datetime(2020, 1, 1)
             + dt.timedelta(hours=rng.randint(0, 900)))
        return f"tscol {op} TIMESTAMP '{t.isoformat()}'"
    if kind == "bool":
        return f"bcol = {rng.choice(['TRUE', 'FALSE'])}"
    if kind in ("in", "not_in"):
        vals = ", ".join(str(rng.randint(-5, 25))
                         for _ in range(rng.randint(1, 4)))
        neg = "NOT " if kind == "not_in" else ""
        return f"lcol {neg}IN ({vals})"
    if kind == "between":
        lo, hi = sorted((rng.randint(-5, 25), rng.randint(-5, 25)))
        neg = "NOT " if rng.random() < 0.3 else ""
        return f"lcol {neg}BETWEEN {lo} AND {hi}"
    if kind == "like":
        neg = "NOT " if rng.random() < 0.3 else ""
        return f"scol {neg}LIKE '{rng.choice(['v', 'v1', 'z'])}%'"
    col = rng.choice(["lcol", "scol", "dcol"])
    return (f"{col} IS NULL" if kind == "null"
            else f"{col} IS NOT NULL")


def _tree(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.45:
        return _leaf(rng)
    kind = rng.choice(["and", "or", "not"])
    if kind == "not":
        return f"NOT ({_tree(rng, depth + 1)})"
    return (f"({_tree(rng, depth + 1)}) {kind.upper()} "
            f"({_tree(rng, depth + 1)})")


@pytest.fixture(scope="module")
def eq_table(spark, tmp_path_factory):
    rng = random.Random(7)
    rows = []
    for i in range(ROWS):
        rows.append((
            i,
            None if rng.random() < 0.15 else rng.randint(-5, 25),
            None if rng.random() < 0.15 else rng.randint(-3, 30) + 0.5,
            None if rng.random() < 0.15 else f"v{rng.randint(0, 9)}",
            None if rng.random() < 0.15 else
            dt.date(2020, 1, 1) + dt.timedelta(days=rng.randint(0, 40)),
            None if rng.random() < 0.15 else
            dt.datetime(2020, 1, 1) + dt.timedelta(
                hours=rng.randint(0, 900)),
            None if rng.random() < 0.15 else rng.random() < 0.5,
        ))
    df = spark.createDataFrame(
        rows, "rid long, lcol long, dcol double, scol string, "
              "datecol date, tscol timestamp_ntz, bcol boolean") \
        .repartition(8)
    loc = str(tmp_path_factory.mktemp("sqleq")) + "/t"
    t = IceTable.create(spark, loc, schema_from_spark(df.schema))
    t.append(df)
    raw = t.to_df()
    return t, raw


def test_random_sql_predicates_match_spark(spark, eq_table):
    t, raw = eq_table
    rng = random.Random(20260816)
    checked = 0
    for _ in range(40):
        sql = _tree(rng)
        expected = {r["rid"] for r in raw.where(sql)
                    .select("rid").collect()}
        got = {r["rid"] for r in
               t.scan(filter=parse_predicate(sql)).to_df()
               .select("rid").collect()}
        assert got == expected, (
            f"predicate {sql!r}: engine {sorted(got)[:10]}... "
            f"vs spark {sorted(expected)[:10]}...")
        checked += 1
    assert checked == 40
