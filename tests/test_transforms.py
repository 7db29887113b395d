"""Golden-vector tests for the 8 partition transforms.

Vectors are the Iceberg spec Appendix-B hash values — the same ones the
reference pins in bucket_util_test.cc and transform_test.cc:205-671.
"""

import datetime as dt
import uuid
from decimal import Decimal

import pytest

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.functions import murmur3
from iceberg_cpp_spark.functions import transforms as tr


class TestMurmur3SpecVectors:
    """Iceberg spec Appendix B 'Bucket transform requirements' vectors."""

    def test_int_34(self):
        assert murmur3.hash_long(34) == 2017239379

    def test_long_34(self):
        assert murmur3.hash_long(34) == 2017239379

    def test_decimal_14_20(self):
        # minimal big-endian two's-complement of unscaled 1420
        assert murmur3.hash_bytes((1420).to_bytes(2, "big", signed=True)) == -500754589

    def test_date(self):
        days = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
        assert days == 17486
        assert murmur3.hash_long(days) == -653330422

    def test_time(self):
        micros = ((22 * 60 + 31) * 60 + 8) * 1_000_000
        assert murmur3.hash_long(micros) == -662762989

    def test_timestamp(self):
        ts = dt.datetime(2017, 11, 16, 22, 31, 8)
        micros = int((ts - dt.datetime(1970, 1, 1)).total_seconds()) * 1_000_000
        assert murmur3.hash_long(micros) == -2047944441

    def test_string_iceberg(self):
        assert murmur3.hash_bytes(b"iceberg") == 1210000089

    def test_uuid(self):
        u = uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7")
        assert murmur3.hash_bytes(u.bytes) == 1488055340

    def test_binary_fixed(self):
        assert murmur3.hash_bytes(b"\x00\x01\x02\x03") == -188683207

    def test_vectorized_matches_scalar(self):
        import numpy as np

        vals = np.array([34, 0, -1, 17486, 1510871468000000, 2**40], dtype=np.int64)
        vec = murmur3.hash_longs_vectorized(vals)
        for v, h in zip(vals, vec):
            assert murmur3.hash_long(int(v)) == int(h)


class TestBucket:
    def test_bucket_int(self):
        b = tr.BucketTransform(16)
        assert b.pyvalue(34, it.IntegerType()) == (2017239379 & 0x7FFFFFFF) % 16

    def test_bucket_string(self):
        b = tr.BucketTransform(16)
        assert b.pyvalue("iceberg", it.StringType()) == (1210000089 & 0x7FFFFFFF) % 16

    def test_bucket_null(self):
        assert tr.BucketTransform(16).pyvalue(None, it.IntegerType()) is None

    def test_result_type(self):
        assert tr.BucketTransform(16).result_type(it.LongType()) == it.IntegerType()


class TestTruncate:
    def test_int_negative(self):
        t = tr.TruncateTransform(10)
        assert t.pyvalue(-1, it.IntegerType()) == -10
        assert t.pyvalue(1, it.IntegerType()) == 0
        assert t.pyvalue(10, it.IntegerType()) == 10
        assert t.pyvalue(-10, it.IntegerType()) == -10

    def test_string_code_points(self):
        t = tr.TruncateTransform(3)
        assert t.pyvalue("iceberg", it.StringType()) == "ice"
        # astronomical-emoji code points, not bytes
        assert t.pyvalue("\U0001F600\U0001F601\U0001F602\U0001F603", it.StringType()) \
            == "\U0001F600\U0001F601\U0001F602"

    def test_decimal(self):
        t = tr.TruncateTransform(50)
        assert t.pyvalue(Decimal("10.65"), it.DecimalType(9, 2)) == Decimal("10.50")

    def test_preserves_source_type(self):
        assert tr.TruncateTransform(10).result_type(it.LongType()) == it.LongType()


class TestTemporal:
    def test_year(self):
        y = tr.YearTransform()
        assert y.pyvalue(dt.date(2017, 11, 16), it.DateType()) == 47
        assert y.pyvalue(dt.date(1969, 12, 31), it.DateType()) == -1

    def test_month(self):
        m = tr.MonthTransform()
        assert m.pyvalue(dt.date(2017, 11, 16), it.DateType()) == 574
        assert m.pyvalue(dt.date(1969, 12, 31), it.DateType()) == -1

    def test_day_negative_epoch_floor(self):
        d = tr.DayTransform()
        assert d.pyvalue(dt.date(1970, 1, 2), it.DateType()) == 1
        assert d.pyvalue(dt.date(1969, 12, 31), it.DateType()) == -1
        ts = dt.datetime(1969, 12, 31, 23, 59, 59)
        assert d.pyvalue(ts, it.TimestampType()) == -1

    def test_hour(self):
        h = tr.HourTransform()
        ts = dt.datetime(2017, 11, 16, 22, 31, 8)
        assert h.pyvalue(ts, it.TimestampType()) == 17486 * 24 + 22  # 419686
        neg = dt.datetime(1969, 12, 31, 23, 30, 0)
        assert h.pyvalue(neg, it.TimestampType()) == -1


class TestVoidIdentity:
    def test_void(self):
        assert tr.VoidTransform().pyvalue(42, it.IntegerType()) is None

    def test_identity(self):
        assert tr.IdentityTransform().pyvalue("x", it.StringType()) == "x"


class TestFromString:
    @pytest.mark.parametrize("s,cls", [
        ("identity", tr.IdentityTransform),
        ("bucket[16]", tr.BucketTransform),
        ("truncate[10]", tr.TruncateTransform),
        ("year", tr.YearTransform),
        ("month", tr.MonthTransform),
        ("day", tr.DayTransform),
        ("hour", tr.HourTransform),
        ("void", tr.VoidTransform),
    ])
    def test_parse(self, s, cls):
        t = tr.from_string(s)
        assert isinstance(t, cls)
        assert str(t) == s

    def test_unknown_transform_carried_not_evaluated(self):
        """transform.h:41 kUnknown: foreign metadata loads; evaluation
        fails; string form round-trips; result type is string."""
        from iceberg_cpp_spark.core import types as it

        t = tr.from_string("zorder[4]")
        assert isinstance(t, tr.UnknownTransform)
        assert str(t) == "zorder[4]"
        assert isinstance(t.result_type(it.LongType()), it.StringType)
        import pytest as _pytest
        with _pytest.raises(NotImplementedError, match="zorder"):
            t.pyvalue(1, it.LongType())

    def test_custom_transform_registry(self):
        """§2.5 registry pattern: a registered transform wins over the
        UnknownTransform fallback."""
        class Always7(tr.Transform):
            name = "always7"

            def result_type(self, st):
                return st

            def can_transform(self, st):
                return True

            def pyvalue(self, v, st):
                return 7

        tr.register("always7", Always7())
        from iceberg_cpp_spark.core import types as it
        t = tr.from_string("always7")
        assert t.pyvalue(123, it.LongType()) == 7


class TestSparkColumnParity:
    """Column compilation must agree with pyvalue on real data."""

    def test_bucket_long_column(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(34,), (0,), (-1,), (12345678,)], "v long")
        b = tr.BucketTransform(16)
        rows = df.select("v", b.spark_column(F.col("v"), it.LongType()).alias("b")).collect()
        for r in rows:
            assert r["b"] == b.pyvalue(r["v"], it.LongType())

    def test_bucket_string_column(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("iceberg",), ("",), ("spark",)], "v string")
        b = tr.BucketTransform(32)
        rows = df.select("v", b.spark_column(F.col("v"), it.StringType()).alias("b")).collect()
        for r in rows:
            assert r["b"] == b.pyvalue(r["v"], it.StringType())

    def test_temporal_columns(self, spark):
        from pyspark.sql import functions as F

        vals = [dt.datetime(2017, 11, 16, 22, 31, 8), dt.datetime(1969, 12, 31, 23, 30, 0),
                dt.datetime(1970, 1, 1, 0, 0, 0)]
        df = spark.createDataFrame([(v,) for v in vals], "v timestamp_ntz")
        t = it.TimestampType()
        for trf in (tr.YearTransform(), tr.MonthTransform(), tr.DayTransform(), tr.HourTransform()):
            rows = df.select("v", trf.spark_column(F.col("v"), t).alias("x")).collect()
            for r in rows:
                assert r["x"] == trf.pyvalue(r["v"], t), f"{trf} on {r['v']}"
