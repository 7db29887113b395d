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


class TestExpectationsWapGate:
    """expectations_wap_gate (VERDICT r10 task 8): stage → audit →
    publish-on-pass / main-untouched-on-fail, run both ways."""

    def _table(self, spark, loc):
        import iceberg_cpp_spark.core.types as it
        from iceberg_cpp_spark import IceTable

        sch = it.Schema([
            it.NestedField(1, "k", it.LongType(), True),
            it.NestedField(2, "grade", it.StringType(), False),
        ])
        t = IceTable.create(spark, loc, sch,
                            properties={"write.wap.enabled": "true"})
        return t.append(spark.createDataFrame(
            [(1, "a"), (2, "b")], "k long, grade string"))

    RULES = None  # built per test (references needs a df)

    def _rules(self):
        from iceberg_cpp_spark.operators import expectations as xp

        return [xp.not_null("k"), xp.unique("k"),
                xp.accepted_values("grade", ["a", "b", "c"])]

    def test_pass_path_publishes(self, spark, tmp_loc):
        from iceberg_cpp_spark.operators import expectations as xp

        t = self._table(spark, f"{tmp_loc}/t")
        main_before = t.current_snapshot().snapshot_id
        batch = spark.createDataFrame([(3, "c"), (4, "a")],
                                      "k long, grade string")
        res = xp.expectations_wap_gate(t, batch, self._rules(),
                                       wap_id="batch-1")
        assert res.published and not res.failed_rules()
        assert res.table.to_df().count() == 4
        # publish = cherry-pick of the staged snapshot, not a rewrite
        assert res.table.current_snapshot().snapshot_id != main_before
        assert {r["passed"] for r in res.report.collect()} == {True}

    def test_fail_path_leaves_main_untouched(self, spark, tmp_loc):
        from iceberg_cpp_spark.operators import expectations as xp

        t = self._table(spark, f"{tmp_loc}/t")
        main_before = t.current_snapshot().snapshot_id
        # k=2 duplicates an existing row (cross-batch unique catch) and
        # grade "zz" violates accepted_values
        batch = spark.createDataFrame([(2, "zz"), (5, "a")],
                                      "k long, grade string")
        res = xp.expectations_wap_gate(t, batch, self._rules(),
                                       wap_id="batch-2")
        assert not res.published
        assert set(res.failed_rules()) == {"unique(k)",
                                           "accepted_values(grade)"}
        # main is bit-for-bit unchanged — readers never saw the batch
        assert res.table.current_snapshot().snapshot_id == main_before
        assert res.table.to_df().count() == 2
        # the staged snapshot remains inspectable for debugging
        staged = res.table.scan(
            snapshot_id=res.staged_snapshot_id).to_df()
        assert staged.count() == 4
        bad = xp.violations_df(staged,
                               xp.accepted_values("grade", ["a", "b", "c"]))
        assert {r["grade"] for r in bad.collect()} == {"zz"}
        # fix + retry under a NEW wap id publishes
        fixed = spark.createDataFrame([(6, "a"), (5, "a")],
                                      "k long, grade string")
        res2 = xp.expectations_wap_gate(res.table, fixed, self._rules(),
                                        wap_id="batch-2-fixed")
        assert res2.published
        assert res2.table.to_df().count() == 4

    def test_generated_wap_id(self, spark, tmp_loc):
        from iceberg_cpp_spark.operators import expectations as xp

        t = self._table(spark, f"{tmp_loc}/t")
        batch = spark.createDataFrame([(9, "b")], "k long, grade string")
        res = xp.expectations_wap_gate(t, batch, self._rules())
        assert res.published and len(res.wap_id) == 16
