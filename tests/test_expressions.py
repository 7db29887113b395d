"""Expression DSL: construction, binding, folding, projection, pruning
(shapes from the reference's expression_test.cc / predicate_test.cc)."""

import datetime as dt

import pytest

from iceberg_cpp_spark.core import literals as lit
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec
from iceberg_cpp_spark.functions import transforms as tr
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.plans import pruning


SCHEMA = it.Schema([
    it.NestedField(1, "id", it.LongType(), True),
    it.NestedField(2, "data", it.StringType(), False),
    it.NestedField(3, "ts", it.TimestampType(), False),
    it.NestedField(4, "val", it.DoubleType(), False),
], schema_id=0)


class TestFolding:
    def test_and_short_circuit(self):
        assert ex.and_(ex.ALWAYS_FALSE, ex.eq(ex.Reference("id"), 1)) is ex.ALWAYS_FALSE
        e = ex.eq(ex.Reference("id"), 1)
        assert ex.and_(ex.ALWAYS_TRUE, e) is e

    def test_or_short_circuit(self):
        assert ex.or_(ex.ALWAYS_TRUE, ex.eq(ex.Reference("id"), 1)) is ex.ALWAYS_TRUE

    def test_not_folding(self):
        assert ex.not_(ex.ALWAYS_TRUE) is ex.ALWAYS_FALSE
        e = ex.eq(ex.Reference("id"), 1)
        # not(eq) negates eagerly to not_eq; not(not_eq) restores eq
        assert repr(ex.not_(ex.not_(e))) == repr(e)

    def test_de_morgan(self):
        a = ex.eq(ex.Reference("id"), 1)
        b = ex.eq(ex.Reference("data"), "x")
        n = ex.And(a, b).negate()
        assert isinstance(n, ex.Or)

    def test_empty_in_is_false(self):
        bound = ex.in_(ex.Reference("id"), []).bind(SCHEMA)
        assert isinstance(bound, ex.FalseExp)

    def test_single_in_becomes_eq(self):
        bound = ex.in_(ex.Reference("id"), [5]).bind(SCHEMA)
        assert isinstance(bound, ex.BoundPredicate)
        assert bound.op == ex.Op.EQ

    def test_out_of_range_literal_folds(self):
        # id < (value above int64 range representable)  — long col, big literal
        bound = ex.lt(ex.Reference("id"), 2**70).bind(SCHEMA)
        assert isinstance(bound, ex.TrueExp)

    def test_is_null_on_required_is_false(self):
        bound = ex.is_null(ex.Reference("id")).bind(SCHEMA)
        assert isinstance(bound, ex.FalseExp)

    def test_is_nan_on_non_fp_rejected(self):
        with pytest.raises(Exception):
            ex.is_nan(ex.Reference("id")).bind(SCHEMA)

    def test_case_insensitive_bind(self):
        bound = ex.eq(ex.Reference("ID"), 1).bind(SCHEMA, case_sensitive=False)
        assert isinstance(bound, ex.BoundPredicate)
        with pytest.raises(ValueError):
            ex.eq(ex.Reference("ID"), 1).bind(SCHEMA, case_sensitive=True)


class TestProjection:
    SPEC = PartitionSpec([
        PartitionField(1, 1000, "id_bucket", tr.BucketTransform(8)),
        PartitionField(3, 1001, "ts_month", tr.MonthTransform()),
        PartitionField(2, 1002, "data_ident", tr.IdentityTransform()),
    ])

    def test_identity_projection(self):
        p = pruning.project_to_partition(
            ex.eq(ex.Reference("data"), "x"), self.SPEC, SCHEMA)
        assert pruning.evaluate_partition_expr(p, {"data_ident": "x"})
        assert not pruning.evaluate_partition_expr(p, {"data_ident": "y"})

    def test_month_projection(self):
        p = pruning.project_to_partition(
            ex.gt_eq(ex.Reference("ts"), dt.datetime(2020, 3, 15)), self.SPEC, SCHEMA)
        month = (2020 - 1970) * 12 + 2  # 2020-03
        assert pruning.evaluate_partition_expr(p, {"ts_month": month})
        assert pruning.evaluate_partition_expr(p, {"ts_month": month + 1})
        assert not pruning.evaluate_partition_expr(p, {"ts_month": month - 1})

    def test_compound_filter_projects(self):
        """ADVICE regression: unbound And must bind, not degrade to true."""
        f = ex.eq(ex.Reference("data"), "x") & ex.gt_eq(ex.Reference("ts"), dt.datetime(2020, 3, 15))
        p = pruning.project_to_partition(f, self.SPEC, SCHEMA)
        month = (2020 - 1970) * 12 + 2
        assert not pruning.evaluate_partition_expr(p, {"data_ident": "y", "ts_month": month})
        assert not pruning.evaluate_partition_expr(p, {"data_ident": "x", "ts_month": month - 5})
        assert pruning.evaluate_partition_expr(p, {"data_ident": "x", "ts_month": month})

    def test_bucket_eq_projection(self):
        p = pruning.project_to_partition(ex.eq(ex.Reference("id"), 34), self.SPEC, SCHEMA)
        want = tr.BucketTransform(8).pyvalue(34, it.LongType())
        assert pruning.evaluate_partition_expr(p, {"id_bucket": want})
        assert not pruning.evaluate_partition_expr(p, {"id_bucket": (want + 1) % 8})

    def test_not_eq_identity_projection_is_exact(self):
        # not(eq) negates to not_eq at bind; identity projection is exact,
        # so a partition whose value IS 'x' contains no matching rows
        p = pruning.project_to_partition(
            ex.not_(ex.eq(ex.Reference("data"), "x")), self.SPEC, SCHEMA)
        assert not pruning.evaluate_partition_expr(p, {"data_ident": "x"})
        assert pruning.evaluate_partition_expr(p, {"data_ident": "y"})

    def test_not_eq_nonidentity_never_excludes(self):
        spec = PartitionSpec([PartitionField(3, 1001, "ts_month", tr.MonthTransform())])
        p = pruning.project_to_partition(
            ex.not_(ex.eq(ex.Reference("ts"), dt.datetime(2020, 3, 15))), spec, SCHEMA)
        month = (2020 - 1970) * 12 + 2
        # inclusive: month(ts) == target doesn't prove every row matches
        assert pruning.evaluate_partition_expr(p, {"ts_month": month})


class TestMetricsEvaluator:
    def _stats(self, lo, hi, nulls=0, values=100, nans=None):
        st = {
            "record_count": 100,
            "value_counts": {1: values},
            "null_value_counts": {1: nulls},
            "lower_bounds": {1: lit.to_bytes(lo, it.LongType())} if lo is not None else {},
            "upper_bounds": {1: lit.to_bytes(hi, it.LongType())} if hi is not None else {},
        }
        if nans is not None:
            st["nan_value_counts"] = {1: nans}
        return st

    def test_eq_outside_bounds_excludes(self):
        ev = pruning.InclusiveMetricsEvaluator(SCHEMA, ex.eq(ex.Reference("id"), 500))
        assert not ev.eval(self._stats(0, 100))
        assert ev.eval(self._stats(0, 1000))

    def test_lt_gt(self):
        ev = pruning.InclusiveMetricsEvaluator(SCHEMA, ex.lt(ex.Reference("id"), 10))
        assert not ev.eval(self._stats(10, 100))
        assert ev.eval(self._stats(9, 100))
        ev2 = pruning.InclusiveMetricsEvaluator(SCHEMA, ex.gt(ex.Reference("id"), 100))
        assert not ev2.eval(self._stats(0, 100))
        assert ev2.eval(self._stats(0, 101))

    def test_all_null_excludes_value_predicates(self):
        ev = pruning.InclusiveMetricsEvaluator(SCHEMA, ex.eq(ex.Reference("id"), 5))
        assert not ev.eval(self._stats(None, None, nulls=100, values=100))

    def test_null_counts(self):
        ev = pruning.InclusiveMetricsEvaluator(SCHEMA, ex.is_null(ex.Reference("data")))
        st = {"record_count": 100, "null_value_counts": {2: 0}, "value_counts": {2: 100}}
        assert not ev.eval(st)
        st2 = {"record_count": 100, "null_value_counts": {2: 5}, "value_counts": {2: 100}}
        assert ev.eval(st2)

    def test_empty_file_excluded(self):
        ev = pruning.InclusiveMetricsEvaluator(SCHEMA, ex.ALWAYS_TRUE)
        assert not ev.eval({"record_count": 0})


class TestSummaryEvaluator:
    SPEC = PartitionSpec([PartitionField(3, 1001, "ts_month", tr.MonthTransform())])

    def _summary(self, lo, hi):
        from iceberg_cpp_spark.core.manifests import PartitionFieldSummary

        return [PartitionFieldSummary(
            contains_null=False,
            lower_bound=lit.to_bytes(lo, it.IntegerType()),
            upper_bound=lit.to_bytes(hi, it.IntegerType()))]

    def test_manifest_pruned_by_month_range(self):
        f = ex.gt_eq(ex.Reference("ts"), dt.datetime(2020, 3, 15))
        p = pruning.project_to_partition(f, self.SPEC, SCHEMA)
        month = (2020 - 1970) * 12 + 2
        assert not pruning.evaluate_partition_summaries(p, self.SPEC, SCHEMA,
                                                        self._summary(month - 10, month - 1))
        assert pruning.evaluate_partition_summaries(p, self.SPEC, SCHEMA,
                                                    self._summary(month - 1, month + 1))
