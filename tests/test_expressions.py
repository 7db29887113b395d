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


class TestBatchMetricsEvaluator:
    """The vectorized planner path (pruning.batch_metrics_keep) must
    agree with InclusiveMetricsEvaluator on EVERY row for every
    vectorizable expression shape — randomized stats sweep, seeded."""

    OPS = None  # built in _expressions

    @staticmethod
    def _expressions():
        r = ex.Reference
        return [
            ex.lt(r("id"), 500), ex.lt_eq(r("id"), 500),
            ex.gt(r("id"), 500), ex.gt_eq(r("id"), 500),
            ex.eq(r("id"), 500), ex.not_eq(r("id"), 500),
            ex.in_(r("id"), [5, 500, 900]),
            ex.not_in(r("id"), [5, 500]),
            ex.is_null(r("val")), ex.not_null(r("val")),
            ex.is_nan(r("val")), ex.not_nan(r("val")),
            ex.and_(ex.gt(r("id"), 100), ex.lt(r("val"), 0.5)),
            ex.or_(ex.lt(r("id"), 50), ex.gt_eq(r("val"), 0.9)),
            ex.and_(ex.in_(r("id"), [1, 2, 3]),
                    ex.or_(ex.not_null(r("val")), ex.eq(r("id"), 2))),
            ex.gt(r("ts"), dt.datetime(2020, 6, 1)),
        ]

    @staticmethod
    def _random_batch(rng, n):
        import pandas as pd

        def maybe_counts(fid, total):
            if rng.random() < 0.2:
                return None
            m = {}
            if rng.random() < 0.8:
                m[fid] = total
            if rng.random() < 0.8:
                m[fid + 100] = 7  # unrelated field
            return m or None

        rows = {"record_count": [], "value_counts": [],
                "null_value_counts": [], "nan_value_counts": [],
                "lower_bounds": [], "upper_bounds": []}
        for _ in range(n):
            rc = rng.choice([0, 10, 100])
            rows["record_count"].append(rc)
            vc, nc, nanc = {}, {}, {}
            lo, hi = {}, {}
            for fid, t in ((1, it.LongType()), (3, it.TimestampType()),
                           (4, it.DoubleType())):
                if rng.random() < 0.85:
                    total = rng.randrange(0, 101)
                    vc[fid] = total
                    if rng.random() < 0.9:
                        nc[fid] = rng.choice([0, total // 2, total])
                    if fid == 4 and rng.random() < 0.7:
                        nanc[fid] = rng.choice([0, total])
                if rng.random() < 0.8:
                    if fid == 4:
                        a = rng.choice([rng.uniform(-1, 1), float("nan")])
                        b = rng.uniform(-1, 1)
                    elif fid == 3:
                        a = rng.randrange(1_500_000_000_000_000,
                                          1_700_000_000_000_000)
                        b = a + rng.randrange(0, 10 ** 12)
                    else:
                        a = rng.randrange(0, 1000)
                        b = a + rng.randrange(0, 1000)
                    lo[fid] = lit.to_bytes(a, t) if a == a else \
                        lit.to_bytes(float("nan"), t)
                    hi[fid] = lit.to_bytes(b, t)
            rows["value_counts"].append(vc or None)
            rows["null_value_counts"].append(nc or None)
            rows["nan_value_counts"].append(nanc or None)
            # arrow-style list-of-tuples on ~half the rows
            as_items = rng.random() < 0.5
            rows["lower_bounds"].append(
                list(lo.items()) if (lo and as_items) else (lo or None))
            rows["upper_bounds"].append(
                list(hi.items()) if (hi and as_items) else (hi or None))
        return pd.DataFrame(rows)

    def test_matches_scalar_evaluator(self):
        import random

        rng = random.Random(42)
        exprs = [e.bind(SCHEMA) for e in self._expressions()]
        for e in exprs:
            assert pruning.batch_metrics_keep.__doc__  # sanity
        for trial in range(6):
            b = self._random_batch(rng, 120)
            for e_unbound, e in zip(self._expressions(), exprs):
                vec = pruning.batch_metrics_keep(e, b, len(b))
                assert vec is not None, f"not vectorized: {e_unbound}"
                ev = pruning.InclusiveMetricsEvaluator(SCHEMA, e)
                for i in range(len(b)):
                    def as_d(v):
                        if v is None:
                            return {}
                        return dict(v) if not isinstance(v, dict) else v
                    stats = {
                        "record_count": b["record_count"].iloc[i],
                        "value_counts": as_d(b["value_counts"].iloc[i]),
                        "null_value_counts": as_d(
                            b["null_value_counts"].iloc[i]),
                        "nan_value_counts": as_d(
                            b["nan_value_counts"].iloc[i]),
                        "lower_bounds": as_d(b["lower_bounds"].iloc[i]),
                        "upper_bounds": as_d(b["upper_bounds"].iloc[i]),
                    }
                    want = bool(ev.eval(stats))
                    assert bool(vec[i]) == want, (
                        f"row {i} trial {trial}: vec={bool(vec[i])} "
                        f"scalar={want} expr={e_unbound} stats={stats}")

    def test_fallback_for_unsupported(self):
        # strings and transforms fall back (None) rather than mis-prune
        s = ex.starts_with(ex.Reference("data"), "ab").bind(SCHEMA)
        import pandas as pd

        b = pd.DataFrame({"record_count": [1],
                          "value_counts": [None],
                          "null_value_counts": [None],
                          "nan_value_counts": [None],
                          "lower_bounds": [None],
                          "upper_bounds": [None]})
        assert pruning.batch_metrics_keep(s, b, 1) is None
        e = ex.eq(ex.Reference("data"), "x").bind(SCHEMA)
        assert pruning.batch_metrics_keep(e, b, 1) is None
