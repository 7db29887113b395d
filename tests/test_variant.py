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


class TestVariantShredding:
    """Variant shredding (VERDICT r10 task 5): declared shred paths
    write typed shadow columns whose stats land in the manifests under
    deterministic synthetic field ids; variant_get predicates prune
    files and filter rows JVM-side; scans never see the shadows."""

    def _table(self, spark, loc, n=1000):
        df = spark.range(0, n).select(
            F.col("id").alias("k"),
            F.parse_json(F.concat(
                F.lit('{"a": '), F.col("id").cast("string"),
                F.lit(', "s": "v'), (F.col("id") % 7).cast("string"),
                F.lit('"}'))).alias("payload"))
        t = IceTable.create(
            spark, loc, schema_from_spark(df.schema),
            properties={"format-version": "3",
                        "write.variant.shred.payload":
                        "$.a:long, $.s:string"})
        return t.append(df.repartitionByRange(4, "k")), df

    def test_bounds_in_manifests(self, spark, tmp_loc):
        import struct

        import iceberg_cpp_spark.core.manifests as mf
        from iceberg_cpp_spark.core.shredding import shred_field_id

        t, _ = self._table(spark, f"{tmp_loc}/t")
        fid_a = shred_field_id(2, "$.a", "long")
        fid_s = shred_field_id(2, "$.s", "string")
        seen = 0
        for m in mf.read_manifest_list(t.current_snapshot().manifest_list):
            for e in mf.read_manifest(m.manifest_path, t.metadata.spec(),
                                      t.schema(), manifest=m):
                f = e.data_file
                lo = struct.unpack("<q", f.lower_bounds[fid_a])[0]
                hi = struct.unpack("<q", f.upper_bounds[fid_a])[0]
                assert 0 <= lo <= hi <= 999
                assert f.lower_bounds[fid_s].decode().startswith("v")
                assert f.value_counts[fid_a] == f.record_count
                assert f.null_value_counts[fid_a] == 0
                seen += 1
        assert seen == 4

    def test_prune_and_filter(self, spark, tmp_loc):
        t, _ = self._table(spark, f"{tmp_loc}/t")
        term = ex.variant_get("payload", "$.a", "long")
        scan = t.scan(filter=ex.lt(term, 100))
        assert len(list(scan.plan_files())) == 1  # 3 of 4 files pruned
        got = scan.to_df()
        assert got.count() == 100
        assert got.agg(F.max("k")).collect()[0][0] == 99
        # string path prunes nothing (all files carry v0..v6) but
        # filters correctly
        s_scan = t.scan(filter=ex.eq(
            ex.variant_get("payload", "$.s", "string"), "v3"))
        assert len(list(s_scan.plan_files())) == 4
        assert s_scan.to_df().count() == len(
            [i for i in range(1000) if i % 7 == 3])

    def test_shadows_invisible_to_scans(self, spark, tmp_loc):
        t, _ = self._table(spark, f"{tmp_loc}/t")
        assert t.to_df().columns == ["k", "payload"]
        assert t.scan(columns=["k"]).to_df().columns == ["k"]

    def test_cow_rewrite_reshreds(self, spark, tmp_loc):
        """A CoW delete rewrites files through the same writer — the
        surviving rows' shadows (and bounds) must be regenerated."""
        t, _ = self._table(spark, f"{tmp_loc}/t")
        t = t.delete_where(ex.lt(ex.Reference("k"), 250))
        term = ex.variant_get("payload", "$.a", "long")
        scan = t.scan(filter=ex.lt(term, 500))
        files = list(scan.plan_files())
        assert len(files) < len(list(t.scan().plan_files()))
        assert scan.to_df().count() == 250  # 250..499
        # far-out predicate prunes everything
        none = t.scan(filter=ex.gt_eq(term, 10_000))
        assert not list(none.plan_files())

    def test_predeclaration_files_stay_conservative(self, spark, tmp_loc):
        """Files written BEFORE the shred declaration carry no bounds
        for the synthetic id — they are always kept, never wrong."""
        df = spark.range(0, 100).select(
            F.col("id").alias("k"),
            F.parse_json(F.concat(F.lit('{"a": '),
                                  F.col("id").cast("string"),
                                  F.lit("}"))).alias("payload"))
        t = IceTable.create(spark, f"{tmp_loc}/t",
                            schema_from_spark(df.schema),
                            properties={"format-version": "3"})
        t = t.append(df.coalesce(1))
        t = t.update_properties(
            {"write.variant.shred.payload": "$.a:long"})
        t = t.append(df.select("k", "payload")
                     .withColumn("k", F.col("k") + 1000)
                     .coalesce(1))
        term = ex.variant_get("payload", "$.a", "long")
        scan = t.scan(filter=ex.gt_eq(term, 50))
        # both files survive planning (old one has no bounds)
        assert len(list(scan.plan_files())) == 2
        assert scan.to_df().count() == 100  # 50..99 from each append

    def test_filter_works_without_shredding(self, spark, tmp_loc):
        df = spark.range(0, 50).select(
            F.col("id").alias("k"),
            F.parse_json(F.concat(F.lit('{"a": '),
                                  F.col("id").cast("string"),
                                  F.lit("}"))).alias("payload"))
        t = IceTable.create(spark, f"{tmp_loc}/t",
                            schema_from_spark(df.schema),
                            properties={"format-version": "3"})
        t = t.append(df)
        got = t.scan(filter=ex.lt(
            ex.variant_get("payload", "$.a", "long"), 10)).to_df()
        assert got.count() == 10

    def test_spec_validation(self, spark, tmp_loc):
        from iceberg_cpp_spark.core.shredding import shred_fields

        t, df = self._table(spark, f"{tmp_loc}/t")
        sch = t.schema()
        # stale property (column dropped/renamed): warn-and-skip — a
        # raise would brick every subsequent write (metrics_modes rule)
        with pytest.warns(UserWarning, match="unknown column"):
            assert shred_fields(
                sch, {"write.variant.shred.nope": "$.a:long"}) == []
        with pytest.raises(ValueError, match="non-variant"):
            shred_fields(sch, {"write.variant.shred.k": "$.a:long"})
        with pytest.raises(ValueError, match="unsupported shred type"):
            shred_fields(sch, {"write.variant.shred.payload": "$.a:blob"})
        with pytest.raises(ValueError, match="must start with"):
            shred_fields(sch, {"write.variant.shred.payload": "a:long"})
        with pytest.raises(ValueError, match="variant_get requires"):
            t.scan(filter=ex.lt(
                ex.variant_get("k", "$.a", "long"), 1)).plan_files()

    def test_bound_term_test_path(self, spark, tmp_loc):
        """BoundPredicate.test on a variant_get term (metrics-evaluator
        row path) compares in the declared type."""
        t, _ = self._table(spark, f"{tmp_loc}/t")
        bound = ex.lt(ex.variant_get("payload", "$.a", "long"),
                      100).bind(t.schema())
        assert bound.test(50) is True
        assert bound.test(500) is False

    def test_shred_bounds_follow_default_metrics_mode(self, spark, tmp_loc):
        """truncate(4) default: long string extractions keep VALID
        truncated bounds (prefix lower, incremented-prefix upper);
        counts mode strips shred bounds entirely."""
        from iceberg_cpp_spark.core.literals import from_bytes
        from iceberg_cpp_spark.core.shredding import shred_field_id
        import iceberg_cpp_spark.core.manifests as mf

        def bounds_of(t, fid):
            for m in mf.read_manifest_list(
                    t.current_snapshot().manifest_list):
                for e in mf.read_manifest(m.manifest_path,
                                          t.metadata.spec(), t.schema(),
                                          manifest=m):
                    return (e.data_file.lower_bounds.get(fid),
                            e.data_file.upper_bounds.get(fid))

        df = spark.range(0, 50).select(
            F.col("id").alias("k"),
            F.parse_json(F.concat(
                F.lit('{"s": "longvalue'), F.col("id").cast("string"),
                F.lit('"}'))).alias("payload"))
        fid = shred_field_id(2, "$.s", "string")
        t = IceTable.create(
            spark, f"{tmp_loc}/t1", schema_from_spark(df.schema),
            properties={"format-version": "3",
                        "write.variant.shred.payload": "$.s:string",
                        "write.metadata.metrics.default": "truncate(4)"})
        t = t.append(df.coalesce(1))
        lo, hi = bounds_of(t, fid)
        assert from_bytes(lo, it.StringType()) == "long"   # prefix
        assert from_bytes(hi, it.StringType()) == "lonh"   # incremented
        t2 = IceTable.create(
            spark, f"{tmp_loc}/t2", schema_from_spark(df.schema),
            properties={"format-version": "3",
                        "write.variant.shred.payload": "$.s:string",
                        "write.metadata.metrics.default": "counts"})
        t2 = t2.append(df.coalesce(1))
        lo2, hi2 = bounds_of(t2, fid)
        assert lo2 is None and hi2 is None

    def test_variant_get_in_and_null_predicates(self, spark, tmp_loc):
        """The full predicate vocabulary binds on variant_get terms:
        IN prunes on bounds like EQ; IS_NULL matches rows whose path is
        missing or uncastable (try_variant_get null semantics)."""
        df = spark.range(0, 100).select(
            F.col("id").alias("k"),
            F.parse_json(F.when(
                F.col("id") % 10 == 0, F.lit('{"other": 1}')).otherwise(
                F.concat(F.lit('{"a": '), F.col("id").cast("string"),
                         F.lit("}")))).alias("payload"))
        t = IceTable.create(
            spark, f"{tmp_loc}/t", schema_from_spark(df.schema),
            properties={"format-version": "3",
                        "write.variant.shred.payload": "$.a:long"})
        t = t.append(df.coalesce(1))
        term = ex.variant_get("payload", "$.a", "long")
        got = t.scan(filter=ex.in_(term, [5, 7, 9999])).to_df()
        assert {r["k"] for r in got.collect()} == {5, 7}
        # every 10th row has no $.a → NULL extraction
        assert t.scan(filter=ex.UnboundPredicate(
            ex.Op.IS_NULL, term)).to_df().count() == 10
        assert t.scan(filter=ex.UnboundPredicate(
            ex.Op.NOT_NULL, term)).to_df().count() == 90
