"""Iceberg v3 nanosecond timestamps (timestamp_ns / timestamptz_ns).

The reference pins TimeUnit at microseconds (type_fwd.h:56-58 — "In
Iceberg V3 nanoseconds are also supported" but unimplemented); this
engine exceeds the slot. Spark has no ns timestamp, so the columns ride
as LongType nanos (engine-tagged, the TimeType pattern): exact storage,
long-ordered predicates and bounds, int64 spec encoding, and transforms
that agree with the µs family through exact floor division (a double
division would corrupt int64 nanos past 2^53 — pinned below).
"""
import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.literals import from_bytes, to_bytes
from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec
from iceberg_cpp_spark.functions import murmur3
from iceberg_cpp_spark.functions import transforms as tr
from iceberg_cpp_spark.plans import expressions as ex

NS_H = 3_600_000_000_000  # nanos per hour


class TestNsTypeCore:
    def test_json_serde(self):
        assert isinstance(it.type_from_json("timestamp_ns"), it.TimestampNsType)
        assert isinstance(it.type_from_json("timestamptz_ns"),
                          it.TimestampTzNsType)
        assert it.TimestampNsType().to_json() == "timestamp_ns"
        assert it.TimestampTzNsType().to_json() == "timestamptz_ns"

    def test_spark_mapping_is_tagged_long(self):
        sch = it.Schema([it.NestedField(1, "t", it.TimestampNsType(), True)])
        sf = it.to_spark_schema(sch).fields[0]
        assert sf.dataType.typeName() == "long"
        assert sf.metadata[it.ENGINE_TYPE_KEY] == "timestamp_ns"

    def test_single_value_encoding(self):
        v = 1_510_871_468_000_000_123  # 2017-11-16T22:31:08.000000123
        for t in (it.TimestampNsType(), it.TimestampTzNsType()):
            assert from_bytes(to_bytes(v, t), t) == v
            assert len(to_bytes(v, t)) == 8

    def test_schema_v3_types(self):
        sch = it.Schema([
            it.NestedField(1, "a", it.LongType(), True),
            it.NestedField(2, "t", it.TimestampTzNsType(), False),
        ])
        assert it.schema_v3_types(sch) == {"timestamptz_ns"}


class TestNsTransforms:
    def test_bucket_matches_spec_vector_through_micros(self):
        """Spec Appendix B: ns timestamps bucket by their FLOOR-µs value
        — the 2017-11-16T22:31:08 vector must hold for any ns value
        inside that microsecond."""
        micros = int((dt.datetime(2017, 11, 16, 22, 31, 8)
                      - dt.datetime(1970, 1, 1)).total_seconds()) * 1_000_000
        assert murmur3.hash_long(micros) == -2047944441  # spec vector
        b = tr.BucketTransform(100)
        expect = (murmur3.hash_long(micros) & 0x7FFFFFFF) % 100
        for extra in (0, 1, 999):  # any ns within the µs
            assert b.pyvalue(micros * 1000 + extra,
                             it.TimestampNsType()) == expect

    def test_bucket_column_parity_exact_past_2p53(self, spark):
        """The floor-div must be exact for nanos beyond double's 2^53
        integer range (today's epoch-nanos are ~1.7e18)."""
        vals = [1_700_000_000_123_456_789, 9_007_199_254_740_993,
                -1_800_000_000_000, 0, 123, None]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        b = tr.BucketTransform(64)
        t = it.TimestampTzNsType()
        rows = df.select("v", b.spark_column(F.col("v"), t).alias("x")).collect()
        for r in rows:
            assert r["x"] == b.pyvalue(r["v"], t), r["v"]

    def test_temporal_parity_with_micros_family(self, spark):
        """year/month/day/hour over ns must equal the same transform
        over the corresponding µs timestamp — including pre-epoch."""
        stamps = [dt.datetime(2017, 11, 16, 22, 31, 8),
                  dt.datetime(1969, 12, 31, 23, 30, 0),
                  dt.datetime(1970, 1, 1, 0, 0, 0)]
        ns_t, us_t = it.TimestampNsType(), it.TimestampType()
        for trf in (tr.YearTransform(), tr.MonthTransform(),
                    tr.DayTransform(), tr.HourTransform()):
            for s in stamps:
                micros = int((s - dt.datetime(1970, 1, 1))
                             / dt.timedelta(microseconds=1))
                assert trf.pyvalue(micros * 1000 + 77, ns_t) == \
                    trf.pyvalue(s, us_t), (trf.name, s)
        # column parity on the long representation
        df = spark.createDataFrame(
            [(int((s - dt.datetime(1970, 1, 1))
                  / dt.timedelta(microseconds=1)) * 1000 + 77,)
             for s in stamps], "v long")
        for trf in (tr.YearTransform(), tr.MonthTransform(),
                    tr.DayTransform(), tr.HourTransform()):
            rows = df.select(
                "v", trf.spark_column(F.col("v"), ns_t).alias("x")).collect()
            for r in rows:
                assert r["x"] == trf.pyvalue(r["v"], ns_t), (trf.name, r["v"])


class TestNsTable:
    def test_v2_create_rejected(self, spark, tmp_loc):
        sch = it.Schema([it.NestedField(1, "t", it.TimestampNsType(), True)])
        with pytest.raises(ValueError, match="format-version 3"):
            IceTable.create(spark, f"{tmp_loc}/bad", sch)
        sch2 = it.Schema([it.NestedField(1, "a", it.LongType(), True)])
        t = IceTable.create(spark, f"{tmp_loc}/v2", sch2)
        with pytest.raises(ValueError, match="format-version 3"):
            t.add_column("t", it.TimestampTzNsType())

    def test_partitioned_lifecycle_prunes_and_roundtrips(self, spark, tmp_loc):
        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "ts_ns", it.TimestampNsType(), False),
        ])
        spec = PartitionSpec([PartitionField(2, 1000, "d", tr.DAY)], spec_id=0)
        t = IceTable.create(spark, f"{tmp_loc}/t", sch, spec=spec,
                            properties={"format-version": "3"})
        df = spark.range(48).select(
            F.col("id"), (F.col("id") * NS_H + F.lit(123456789)).alias("ts_ns"))
        t = t.append(df)
        full = len(t.scan().plan_files())
        assert full >= 2  # two day partitions
        pruned = t.scan(filter=ex.gt(ex.Reference("ts_ns"), 24 * NS_H))
        assert len(pruned.plan_files()) < full
        assert pruned.to_df().count() == 24
        back = sorted(r["ts_ns"] for r in t.to_df().collect())
        assert back[0] == 123456789
        assert back[-1] == 47 * NS_H + 123456789  # ns-exact, no double loss

    def test_bounds_in_manifests(self, spark, tmp_loc):
        import iceberg_cpp_spark.core.manifests as mf

        sch = it.Schema([it.NestedField(1, "ts_ns", it.TimestampTzNsType(), True)])
        t = IceTable.create(spark, f"{tmp_loc}/b", sch,
                            properties={"format-version": "3"})
        vals = [1_700_000_000_000_000_001, 1_700_000_000_000_000_999]
        t = t.append(t.spark.createDataFrame([(v,) for v in vals],
                                             "ts_ns long").coalesce(1))
        snap = t.current_snapshot()
        for m in mf.read_manifest_list(snap.manifest_list):
            for e in mf.read_manifest(m.manifest_path, t.spec(), t.schema(),
                                      manifest=m):
                lo = from_bytes(e.data_file.lower_bounds[1],
                                it.TimestampTzNsType())
                hi = from_bytes(e.data_file.upper_bounds[1],
                                it.TimestampTzNsType())
                assert (lo, hi) == (vals[0], vals[1])


class TestUnknownType:
    """v3 ``unknown`` — always-null column (spec: always optional,
    readable as null). Rides as engine-tagged all-null string; binding
    folds predicates before any file is touched."""

    def _table(self, spark, loc):
        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "mystery", it.UnknownType(), False),
        ])
        return IceTable.create(spark, loc, sch,
                               properties={"format-version": "3"})

    def test_serde_and_v3_gate(self, spark, tmp_loc):
        assert isinstance(it.type_from_json("unknown"), it.UnknownType)
        assert it.UnknownType().to_json() == "unknown"
        sch = it.Schema([it.NestedField(1, "u", it.UnknownType(), False)])
        with pytest.raises(ValueError, match="format-version 3"):
            IceTable.create(spark, f"{tmp_loc}/bad", sch)

    def test_reads_null_with_or_without_column(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t")
        # append WITHOUT the column -> optional null-fill
        t = t.append(spark.range(3).select("id"))
        # append WITH an all-null column -> allowed
        t = t.append(spark.range(3, 5).select(
            "id", F.lit(None).cast("string").alias("mystery")))
        rows = t.to_df().collect()
        assert len(rows) == 5
        assert all(r["mystery"] is None for r in rows)

    def test_non_null_write_fails(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t")
        bad = spark.range(2).select("id", F.lit("x").alias("mystery"))
        with pytest.raises(Exception, match="must be null"):
            t.append(bad)

    def test_predicates_fold_at_bind(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t")
        t = t.append(spark.range(4).select("id"))
        assert t.scan(filter=ex.is_null(ex.Reference("mystery"))) \
                .to_df().count() == 4
        # not_null / eq fold to FALSE: no files planned at all
        assert t.scan(filter=ex.not_null(ex.Reference("mystery"))) \
                .plan_files() == []
        assert t.scan(filter=ex.eq(ex.Reference("mystery"), "x")) \
                .plan_files() == []

    def test_partition_and_eq_delete_fences(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t")
        with pytest.raises(ValueError, match="partition source"):
            t.update_spec([PartitionField(2, 0, "p", tr.IDENTITY)])
        keys = spark.createDataFrame([("x",)], "mystery string")
        with pytest.raises(ValueError, match="equality-delete key"):
            t.delete_by_keys(keys)
