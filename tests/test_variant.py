"""Iceberg v3 ``variant`` type — Spark-native end-to-end.

The reference pins its type enum at v2 ("Iceberg V3 types are not
currently supported", type_fwd.h:34-53); this engine maps variant onto
Spark 4's native VariantType so every JVM plane (scan, CoW rewrite, DV
scan, compaction, MERGE) carries it. The Python decode planes cannot
(pyarrow has no variant decoder) and must fail loudly — those fences
are pinned here too.

Key design pin: variant columns resolve BY NAME on read
(types._to_spark_field drops parquet.field.id for them) because Spark's
parquet writer loses the variant group's field id when the column was
itself read from parquet — an id-resolved read would silently null all
variants after the first rewrite (test_survives_rewrite is the
regression test).
"""
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.metrics import schema_has_variant
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.plans import expressions as ex


def _vdf(spark, n=10):
    return spark.range(n).select(
        F.col("id"),
        F.parse_json(F.concat(
            F.lit('{"a": '), F.col("id").cast("string"),
            F.lit(', "tag": "t'), (F.col("id") % 3).cast("string"),
            F.lit('"}'))).alias("payload"))


@pytest.fixture()
def vt(spark, tmp_loc):
    df = _vdf(spark)
    t = IceTable.create(spark, f"{tmp_loc}/t", schema_from_spark(df.schema),
                        properties={"format-version": "3"})
    return t.append(df)


def _amap(t):
    return {r["id"]: r["a"] for r in t.to_df().select(
        "id", F.try_variant_get("payload", "$.a", "int").alias("a")).collect()}


class TestVariantType:
    def test_schema_import_and_json(self, spark):
        df = _vdf(spark, 1)
        sch = schema_from_spark(df.schema)
        assert isinstance(sch.fields[1].field_type, it.VariantType)
        assert sch.fields[1].field_type.to_json() == "variant"
        assert isinstance(it.type_from_json("variant"), it.VariantType)
        assert schema_has_variant(sch)
        assert not schema_has_variant(schema_from_spark(
            spark.range(1).schema))

    def test_v2_create_rejected(self, spark, tmp_loc):
        df = _vdf(spark, 1)
        with pytest.raises(ValueError, match="format-version 3"):
            IceTable.create(spark, f"{tmp_loc}/bad",
                            schema_from_spark(df.schema))

    def test_roundtrip_and_extract(self, vt):
        assert _amap(vt) == {i: i for i in range(10)}
        tags = {r["tag"] for r in vt.to_df().select(
            F.try_variant_get("payload", "$.tag", "string").alias("tag"))
            .collect()}
        assert tags == {"t0", "t1", "t2"}

    def test_metrics_harvested_jvm_side(self, vt):
        """The footer path can't open variant files; the JVM harvest
        must still deliver exact counts, null counts, and bounds for
        the NON-variant columns (pruning stays alive)."""
        import iceberg_cpp_spark.core.manifests as mf
        from iceberg_cpp_spark.core.literals import from_bytes

        snap = vt.current_snapshot()
        seen = 0
        los, his = [], []
        for m in mf.read_manifest_list(snap.manifest_list):
            for e in mf.read_manifest(m.manifest_path, vt.spec(),
                                      vt.schema(), manifest=m):
                d = e.data_file
                seen += d.record_count
                # id (fid 1) carries exact bounds; payload (fid 2) none
                assert 1 in d.lower_bounds and 2 not in d.lower_bounds
                assert d.null_value_counts.get(2) == 0
                assert d.value_counts.get(2) == d.record_count
                los.append(from_bytes(d.lower_bounds[1], it.LongType()))
                his.append(from_bytes(d.upper_bounds[1], it.LongType()))
        assert seen == 10
        assert min(los) == 0 and max(his) == 9

    def test_bounds_prune_on_plain_column(self, vt):
        """min/max from the JVM harvest must actually prune file scans
        on the non-variant column."""
        full = len(vt.scan().plan_files())
        pruned = len(vt.scan(filter=ex.gt(ex.Reference("id"), 10_000))
                     .plan_files())
        assert full > 0 and pruned == 0

    def test_survives_rewrite(self, vt):
        """THE regression pin: Spark drops the variant group's parquet
        field id on rewrite; by-name resolution must keep values
        readable after compaction (id-resolved reads return all-null)."""
        t = vt.rewrite_data_files(target_file_count=1)
        assert len(t.scan().plan_files()) == 1
        assert _amap(t) == {i: i for i in range(10)}

    def test_cow_delete_dv_delete_merge(self, spark, vt):
        t = vt.delete_where(ex.lt(ex.Reference("id"), 3))
        t = t.delete_where(ex.eq(ex.Reference("id"), 5),
                           mode="deletion-vector")
        assert sorted(_amap(t)) == [3, 4, 6, 7, 8, 9]
        src = spark.range(8, 12).select(
            F.col("id"), F.parse_json(F.lit('{"a": 99}')).alias("payload"))
        t = t.merge_into(src, on=["id"])
        m = _amap(t)
        assert m[3] == 3 and m[8] == 99 and m[11] == 99

    def test_time_travel(self, spark, vt):
        v1 = vt.current_snapshot().snapshot_id
        t2 = vt.delete_where(ex.lt(ex.Reference("id"), 5))
        assert t2.to_df().count() == 5
        assert t2.scan(snapshot_id=v1).to_df().count() == 10

    def test_variant_filter_rejected(self, vt):
        with pytest.raises(ValueError, match="variant column"):
            vt.scan(filter=ex.eq(ex.Reference("payload"), "x")).to_df()

    def test_eq_delete_key_rejected(self, spark, vt):
        keys = spark.createDataFrame([("x",)], "payload string")
        with pytest.raises(ValueError, match="equality-delete key"):
            vt.delete_by_keys(keys.select(
                F.parse_json("payload").alias("payload")))

    def test_partition_source_rejected(self, vt):
        from iceberg_cpp_spark.core.metadata import PartitionField
        from iceberg_cpp_spark.functions.transforms import IdentityTransform

        with pytest.raises(ValueError, match="partition source"):
            vt.update_spec([PartitionField(2, 0, "p", IdentityTransform())])

    def test_rename_and_name_reuse_rejected(self, vt):
        with pytest.raises(ValueError, match="rename variant"):
            vt.rename_column("payload", "p2")
        t = vt.drop_column("payload")
        with pytest.raises(ValueError, match="historical schema"):
            t.add_column("payload", it.VariantType())
        # a FRESH name is fine on a v3 table
        t2 = t.add_column("payload2", it.VariantType())
        assert isinstance(t2.schema().find_field("payload2").field_type,
                          it.VariantType)

    def test_add_column_requires_v3(self, spark, tmp_loc):
        df = spark.range(3).select("id")
        t = IceTable.create(spark, f"{tmp_loc}/v2", schema_from_spark(df.schema))
        with pytest.raises(ValueError, match="format-version 3"):
            t.add_column("v", it.VariantType())

    def test_write_format_fences(self, vt):
        for fmt in ("orc", "avro"):
            t = vt.update_properties({"write.format.default": fmt})
            with pytest.raises(NotImplementedError, match="parquet-only"):
                t.append(_vdf(t.spark, 2))

    def test_add_files_fence(self, vt, tmp_loc):
        with pytest.raises(NotImplementedError, match="add_files"):
            vt.add_files([f"{tmp_loc}/nope.parquet"])

    def test_python_datasource_fence(self, spark, vt):
        from iceberg_cpp_spark.sources.spark_datasource import (
            IcebergCppDataSource)

        spark.dataSource.register(IcebergCppDataSource)
        with pytest.raises(Exception, match="variant"):
            spark.read.format("icecpp").load(
                vt.metadata.location).collect()

    def test_large_scan_stays_on_jvm_plane(self, spark, vt):
        """python-datasource strategy must silently fall back to the
        jvm-union plane for variant tables instead of crashing."""
        t = vt.update_properties({
            "engine.read.large-scan-strategy": "python-datasource",
            "engine.read.datasource-file-threshold": "1"})
        assert t.to_df().count() == 10

    def test_compute_statistics_skips_variant(self, vt):
        t = vt.compute_statistics()
        assert t.metadata.statistics, "stats file registered"

    def test_changelog_carries_variant(self, spark, vt):
        from iceberg_cpp_spark.streaming.changelog import changes

        t = vt.delete_where(ex.lt(ex.Reference("id"), 2))
        df = changes(t)
        rows = df.select("id", "_change_type",
                         F.try_variant_get("payload", "$.a", "int")
                         .alias("a")).collect()
        inserts = {(r["id"], r["a"]) for r in rows
                   if r["_change_type"] == "insert"}
        deletes = {(r["id"], r["a"]) for r in rows
                   if r["_change_type"] == "delete"}
        assert inserts == {(i, i) for i in range(10)}
        assert deletes == {(0, 0), (1, 1)}
