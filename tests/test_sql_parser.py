"""WHERE-clause text → Expression DSL (powers SQL DML): the parse
result must be the SAME tree the Python API builds, because that tree
is what reaches partition/metrics pruning. Session-free — pure parser
unit tests; binding/pruning behavior is pinned by the expression and
scan suites the output feeds into."""

from __future__ import annotations

import datetime as dt

import pytest

from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.plans.sql_parser import SqlParseError, parse_predicate


def same(a: ex.Expression, b: ex.Expression) -> bool:
    return repr(a) == repr(b)


class TestParsePredicate:
    def test_comparisons(self):
        r = ex.Reference
        assert same(parse_predicate("a = 1"), ex.eq(r("a"), 1))
        assert same(parse_predicate("a != 1"), ex.not_eq(r("a"), 1))
        assert same(parse_predicate("a <> 1"), ex.not_eq(r("a"), 1))
        assert same(parse_predicate("a < 1.5"), ex.lt(r("a"), 1.5))
        assert same(parse_predicate("a >= -3"), ex.gt_eq(r("a"), -3))
        assert same(parse_predicate("a = 'it''s'"), ex.eq(r("a"), "it's"))
        assert same(parse_predicate("a = 1e3"), ex.eq(r("a"), 1000.0))

    def test_flipped_literal_left(self):
        assert same(parse_predicate("5 < x"), ex.gt(ex.Reference("x"), 5))
        assert same(parse_predicate("5 = x"), ex.eq(ex.Reference("x"), 5))
        assert same(parse_predicate("5 >= x"),
                    ex.lt_eq(ex.Reference("x"), 5))

    def test_connectives_and_grouping(self):
        got = parse_predicate("NOT (a = 1 OR b < 2) AND c IS NOT NULL")
        want = ex.and_(
            ex.not_(ex.or_(ex.eq(ex.Reference("a"), 1),
                           ex.lt(ex.Reference("b"), 2))),
            ex.not_null(ex.Reference("c")))
        assert same(got, want)

    def test_precedence_and_binds_tighter_than_or(self):
        got = parse_predicate("a = 1 OR b = 2 AND c = 3")
        want = ex.or_(ex.eq(ex.Reference("a"), 1),
                      ex.and_(ex.eq(ex.Reference("b"), 2),
                              ex.eq(ex.Reference("c"), 3)))
        assert same(got, want)

    def test_in_between_like_null_nan(self):
        r = ex.Reference
        assert same(parse_predicate("a IN (1, 2, 3)"),
                    ex.in_(r("a"), [1, 2, 3]))
        assert same(parse_predicate("a NOT IN ('x')"),
                    ex.not_in(r("a"), ["x"]))
        assert same(parse_predicate("a BETWEEN 1 AND 10"),
                    ex.and_(ex.gt_eq(r("a"), 1), ex.lt_eq(r("a"), 10)))
        assert same(parse_predicate("a NOT BETWEEN 1 AND 10"),
                    ex.not_(ex.and_(ex.gt_eq(r("a"), 1),
                                    ex.lt_eq(r("a"), 10))))
        assert same(parse_predicate("s LIKE 'ab%'"),
                    ex.starts_with(r("s"), "ab"))
        assert same(parse_predicate("s NOT LIKE 'ab%'"),
                    ex.not_starts_with(r("s"), "ab"))
        assert same(parse_predicate("a IS NULL"), ex.is_null(r("a")))
        assert same(parse_predicate("a IS NOT NAN"), ex.not_nan(r("a")))

    def test_typed_literals(self):
        assert same(parse_predicate("d >= DATE '1995-01-01'"),
                    ex.gt_eq(ex.Reference("d"), dt.date(1995, 1, 1)))
        assert same(
            parse_predicate("ts < TIMESTAMP '2020-06-01T12:00:00'"),
            ex.lt(ex.Reference("ts"), dt.datetime(2020, 6, 1, 12)))
        assert same(parse_predicate("flag = TRUE"),
                    ex.eq(ex.Reference("flag"), True))
        assert same(parse_predicate("flag = false"),
                    ex.eq(ex.Reference("flag"), False))

    def test_standalone_booleans(self):
        assert same(parse_predicate("TRUE"), ex.TrueExp())
        # folding: FALSE OR p → p
        assert same(parse_predicate("FALSE OR a = 1"),
                    ex.eq(ex.Reference("a"), 1))

    def test_transform_terms(self):
        from iceberg_cpp_spark.functions import transforms as tr

        assert same(parse_predicate("bucket(id, 16) = 3"),
                    ex.eq(ex.TransformTerm(tr.BucketTransform(16),
                                           ex.Reference("id")), 3))
        assert same(parse_predicate("truncate(s, 4) = 'abcd'"),
                    ex.eq(ex.TransformTerm(tr.TruncateTransform(4),
                                           ex.Reference("s")), "abcd"))

    def test_temporal_transforms_refused(self):
        # Iceberg's year transform yields ordinals since 1970; Spark's
        # year() the calendar value — parsing either meaning silently
        # would mismatch the other, so the grammar refuses
        for text in ("year(ts) = 2020", "month(ts) = 5",
                     "day(ts) = 100", "hour(ts) <= 3"):
            with pytest.raises(SqlParseError, match="ambiguous"):
                parse_predicate(text)

    def test_nested_column_names(self):
        assert same(parse_predicate("addr.city = 'Oslo'"),
                    ex.eq(ex.Reference("addr.city"), "Oslo"))

    @pytest.mark.parametrize("bad", [
        "",                       # empty
        "a = b",                  # column vs column
        "a + 1 = 2",              # arithmetic
        "name LIKE '%abc'",       # non-prefix pattern
        "name LIKE 'a%b%'",       # wildcard inside body
        "x IN (SELECT 1)",        # subquery
        "a =",                    # dangling operator
        "a BETWEEN 1",            # missing AND
        "a IS 3",                 # IS without NULL/NAN
        "bucket(id) = 1",         # arity
        "a = 1 extra",            # trailing input
        "AND a = 1",              # keyword as term
    ])
    def test_loud_on_unsupported(self, bad):
        with pytest.raises(SqlParseError):
            parse_predicate(bad)
