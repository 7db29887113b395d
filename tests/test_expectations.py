"""Data-quality expectations (operators/expectations.py): declarative
rules, aggregate rules fused into one scan, counted violations."""
import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark.operators import expectations as ql


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "A", 10.0, 1), (2, "B", -5.0, 1), (3, None, 20.0, 2),
         (3, "C", 200.0, 9), (4, "ZZZ", 30.0, 2), (5, "A", None, None)],
        "id long, status string, v double, fk long")


class TestExpectations:
    def test_aggregate_rules_fused(self, spark, df):
        out = {r["rule"]: r for r in ql.check(df, [
            ql.not_null("status"),
            ql.accepted_values("status", ["A", "B", "C"]),
            ql.in_range("v", 0.0, 100.0),
            ql.matches("status", "^[A-C]$"),
        ]).collect()}
        assert out["not_null(status)"]["violations"] == 1
        assert out["accepted_values(status)"]["violations"] == 1
        assert out["in_range(v)"]["violations"] == 2  # -5 and 200
        assert out["matches(status)"]["violations"] == 1  # ZZZ
        assert all(r["total"] == 6 for r in out.values())

    def test_unique_counts_participating_rows(self, spark, df):
        out = ql.check(df, [ql.unique("id")]).collect()[0]
        assert out["violations"] == 2 and not out["passed"]
        ok = ql.check(df, [ql.unique("id", "status")]).collect()[0]
        assert ok["violations"] == 0 and ok["passed"]

    def test_references(self, spark, df):
        parent = spark.createDataFrame([(1,), (2,)], "pk long")
        out = ql.check(df, [ql.references("fk", parent, "pk")]).collect()[0]
        assert out["violations"] == 1  # fk=9; nulls don't violate FKs

    def test_satisfies_null_is_violation(self, spark, df):
        out = ql.check(df, [ql.satisfies(
            "v_known_when_A", (F.col("status") != "A") | F.col("v").isNotNull()
        )]).collect()[0]
        assert out["violations"] == 1  # (5, A, None) -> null -> violation

    def test_violations_df(self, spark, df):
        assert ql.violations_df(df, ql.unique("id")).count() == 2
        assert ql.violations_df(
            df, ql.in_range("v", 0.0, 100.0)).count() == 2
        parent = spark.createDataFrame([(1,), (2,)], "pk long")
        assert ql.violations_df(
            df, ql.references("fk", parent, "pk")).count() == 1

    def test_works_on_ice_table(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import types as it

        sch = it.Schema([it.NestedField(1, "id", it.LongType(), True)])
        t = IceTable.create(spark, f"{tmp_loc}/t", sch)
        t = t.append(spark.range(5).select("id"))
        out = ql.check(t, [ql.not_null("id"), ql.unique("id")])
        assert all(r["passed"] for r in out.collect())

    def test_bad_rule_args(self):
        with pytest.raises(ValueError, match="lo and/or hi"):
            ql.in_range("x")
