"""Metadata JSON serde, literals, manifests, catalog — the table-format
kernel (shapes mirror the reference's metadata_serde_test /
manifest_reader_writer_test / in_memory_catalog_test)."""

import datetime as dt
import os
from decimal import Decimal

import pytest

from iceberg_cpp_spark.core import literals as lit
from iceberg_cpp_spark.core import manifests as mf
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.metadata import (
    PartitionField,
    PartitionSpec,
    Snapshot,
    SnapshotRef,
    TableMetadata,
    read_table_metadata,
    write_table_metadata,
)
from iceberg_cpp_spark.functions import transforms as tr


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "data", it.StringType(), False),
        it.NestedField(3, "ts", it.TimestampType(), False),
        it.NestedField(4, "price", it.DoubleType(), False),
    ], schema_id=0)


def _meta(loc="/tmp/ice_meta_test"):
    schema = _schema()
    spec = PartitionSpec([PartitionField(1, 1000, "id_bucket", tr.BucketTransform(4))])
    return TableMetadata(
        format_version=2, table_uuid="9c12d441-03fe-4693-9a96-a0705ddf69c1",
        location=loc, last_column_id=4, schemas=[schema], current_schema_id=0,
        partition_specs=[spec], default_spec_id=0, last_partition_id=1000,
    )


class TestLiterals:
    @pytest.mark.parametrize("v,t", [
        (True, it.BooleanType()),
        (34, it.IntegerType()),
        (2**40, it.LongType()),
        (1.25, it.FloatType()),
        (3.14159, it.DoubleType()),
        ("iceberg", it.StringType()),
        (b"\x00\x01", it.BinaryType()),
        (Decimal("14.20"), it.DecimalType(9, 2)),
    ])
    def test_roundtrip(self, v, t):
        assert lit.from_bytes(lit.to_bytes(v, t), t) == v

    def test_date_roundtrip(self):
        d = dt.date(2017, 11, 16)
        assert lit.from_bytes(lit.to_bytes(d, it.DateType()), it.DateType()) == 17486

    def test_timestamp_le(self):
        # spec: 8-byte little-endian micros
        assert lit.to_bytes(1, it.TimestampType()) == b"\x01\x00\x00\x00\x00\x00\x00\x00"

    def test_decimal_big_endian_minimal(self):
        assert lit.to_bytes(Decimal("14.20"), it.DecimalType(9, 2)) == (1420).to_bytes(2, "big")

    def test_cast_overflow_sentinels(self):
        assert lit.cast(2**40, it.LongType(), it.IntegerType()) is lit.ABOVE_MAX
        assert lit.cast(-(2**40), it.LongType(), it.IntegerType()) is lit.BELOW_MIN
        assert lit.cast(7, it.IntegerType(), it.LongType()) == 7


class TestMetadataSerde:
    def test_roundtrip(self, tmp_loc):
        meta = _meta(tmp_loc)
        path = os.path.join(tmp_loc, "metadata", "v1.metadata.json")
        write_table_metadata(meta, path)
        back = read_table_metadata(path)
        assert back.table_uuid == meta.table_uuid
        assert back.schema() == meta.schema()
        assert back.spec().fields[0].transform == tr.BucketTransform(4)

    def test_unknown_transform_spec_roundtrips(self, tmp_loc):
        """Metadata written by another engine with a transform we don't
        implement must load, round-trip losslessly, and plan scans
        (pruning just skips the un-projectable field)."""
        import dataclasses

        from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec

        meta = _meta(tmp_loc)
        spec = PartitionSpec(spec_id=7, fields=[PartitionField(
            source_id=1, field_id=1001, name="z",
            transform=tr.from_string("zorder[16]"))])
        meta = dataclasses.replace(
            meta, partition_specs=meta.partition_specs + [spec],
            default_spec_id=7)
        path = os.path.join(tmp_loc, "metadata", "vz.metadata.json")
        write_table_metadata(meta, path)
        back = read_table_metadata(path)
        t = back.spec().fields[0].transform
        assert isinstance(t, tr.UnknownTransform) and str(t) == "zorder[16]"

    def test_gzip_roundtrip(self, tmp_loc):
        meta = _meta(tmp_loc)
        path = os.path.join(tmp_loc, "metadata", "v1.gz.metadata.json")
        write_table_metadata(meta, path)
        with open(path, "rb") as f:
            assert f.read(2) == b"\x1f\x8b"
        assert read_table_metadata(path).table_uuid == meta.table_uuid

    def test_exclusive_write_is_cas(self, tmp_loc):
        meta = _meta(tmp_loc)
        path = os.path.join(tmp_loc, "metadata", "v1.metadata.json")
        write_table_metadata(meta, path, exclusive=True)
        with pytest.raises(FileExistsError):
            write_table_metadata(meta, path, exclusive=True)

    def test_unsupported_version_rejected(self):
        with pytest.raises(ValueError, match="unsupported format version"):
            TableMetadata.from_json({"format-version": 9})

    def test_v1_inline_manifests_snapshot(self):
        s = Snapshot.from_json({
            "snapshot-id": 1, "timestamp-ms": 1000,
            "manifests": ["m1.avro", "m2.avro"],
        })
        assert s.manifests == ["m1.avro", "m2.avro"]
        j = s.to_json()
        assert j["manifests"] == ["m1.avro", "m2.avro"]
        assert "manifest-list" not in j

    def test_snapshot_missing_both_rejected(self):
        with pytest.raises(ValueError, match="manifest"):
            Snapshot.from_json({"snapshot-id": 1, "timestamp-ms": 1000})

    def test_time_travel_lookup(self):
        meta = _meta()
        meta.snapshots = [
            Snapshot(1, 1, 100, "a"), Snapshot(2, 2, 200, "b"), Snapshot(3, 3, 300, "c"),
        ]
        assert meta.snapshot_as_of(250).snapshot_id == 2
        assert meta.snapshot_as_of(300).snapshot_id == 3
        assert meta.snapshot_as_of(50) is None

    def test_refs(self):
        meta = _meta()
        meta.snapshots = [Snapshot(1, 1, 100, "a")]
        meta.refs = {"main": SnapshotRef(1), "tag1": SnapshotRef(1, type="tag")}
        assert meta.ref("main").snapshot_id == 1
        assert meta.ref("tag1").type == "tag"
        assert meta.ref("nope") is None


class TestManifests:
    def _entry(self, i, flag, qty):
        return mf.ManifestEntry(
            status=mf.STATUS_ADDED,
            data_file=mf.DataFile(
                content=mf.CONTENT_DATA, file_path=f"/data/f{i}.parquet",
                file_format="parquet", partition={"id_bucket": i % 4},
                record_count=10 + i, file_size_in_bytes=1000 + i,
                value_counts={1: 10 + i}, null_value_counts={1: 0},
                lower_bounds={1: lit.to_bytes(i, it.LongType())},
                upper_bounds={1: lit.to_bytes(i + 100, it.LongType())},
            ),
        )

    def test_roundtrip_with_inheritance(self, tmp_loc):
        schema = _schema()
        spec = PartitionSpec([PartitionField(1, 1000, "id_bucket", tr.BucketTransform(4))])
        path = os.path.join(tmp_loc, "m1.parquet")
        w = mf.ManifestWriter(path, spec, schema, snapshot_id=77)
        for i in range(3):
            w.add(self._entry(i, "A", i))
        manifest = w.close()
        assert manifest.added_files_count == 3
        assert manifest.added_rows_count == 10 + 11 + 12

        entries = mf.read_manifest(path, spec, schema, manifest=manifest)
        assert len(entries) == 3
        # inheritance: entry snapshot_id was None → inherits manifest's
        assert all(e.snapshot_id == 77 for e in entries)
        assert entries[0].data_file.partition == {"id_bucket": 0}
        assert lit.from_bytes(entries[1].data_file.lower_bounds[1], it.LongType()) == 1

    def test_partition_summaries(self, tmp_loc):
        schema = _schema()
        spec = PartitionSpec([PartitionField(1, 1000, "id_bucket", tr.BucketTransform(4))])
        w = mf.ManifestWriter(os.path.join(tmp_loc, "m.parquet"), spec, schema, 1)
        for i in range(4):
            w.add(self._entry(i, "A", i))
        manifest = w.close()
        s = manifest.partitions[0]
        assert s.contains_null is False
        assert lit.from_bytes(s.lower_bound, it.IntegerType()) == 0
        assert lit.from_bytes(s.upper_bound, it.IntegerType()) == 3
        # int partition: NaN not applicable → None
        assert s.contains_nan is None

    def test_contains_nan_false_for_double_partition(self, tmp_loc):
        schema = _schema()
        spec = PartitionSpec([PartitionField(4, 1000, "p", tr.IdentityTransform())])
        w = mf.ManifestWriter(os.path.join(tmp_loc, "m.parquet"), spec, schema, 1)
        e = self._entry(0, "A", 0)
        e.data_file.partition = {"p": 1.5}
        w.add(e)
        manifest = w.close()
        # definite False must be kept (ADVICE fix), not collapsed to None
        assert manifest.partitions[0].contains_nan is False

    def test_manifest_list_roundtrip(self, tmp_loc):
        schema = _schema()
        spec = PartitionSpec([PartitionField(1, 1000, "id_bucket", tr.BucketTransform(4))])
        w = mf.ManifestWriter(os.path.join(tmp_loc, "m.parquet"), spec, schema, 5)
        w.add(self._entry(0, "A", 0))
        manifest = w.close()
        lp = os.path.join(tmp_loc, "snap.parquet")
        lw = mf.ManifestListWriter(lp, snapshot_id=5, sequence_number=9)
        lw.add(manifest)
        lw.close()
        files = mf.read_manifest_list(lp)
        assert len(files) == 1
        assert files[0].manifest_path == manifest.manifest_path
        assert files[0].partitions[0].contains_null is False


class TestCatalog:
    def test_crud_and_cas(self, tmp_loc):
        from iceberg_cpp_spark.sources.catalog import (
            AlreadyExistsError,
            AssertRefSnapshotId,
            CommitFailedError,
            FileSystemCatalog,
            NoSuchTableError,
        )

        cat = FileSystemCatalog(tmp_loc)
        cat.create_namespace("db")
        assert cat.namespace_exists("db")
        assert cat.list_tables("db") == []

        schema = _schema()
        cat.create_table("db.t", schema)
        assert cat.table_exists("db.t")
        with pytest.raises(AlreadyExistsError):
            cat.create_table("db.t", schema)
        assert cat.list_tables("db") == ["db.t"]

        meta, loc = cat.load_metadata("db.t")
        assert meta.schema() == schema

        # CAS: requirement failure on wrong expected snapshot
        with pytest.raises(CommitFailedError):
            cat.commit_table("db.t", [AssertRefSnapshotId("main", 999)], meta)

        assert cat.drop_table("db.t")
        with pytest.raises(NoSuchTableError):
            cat.load_metadata("db.t")

    def test_register_and_load(self, tmp_loc):
        from iceberg_cpp_spark.sources.catalog import FileSystemCatalog

        cat = FileSystemCatalog(os.path.join(tmp_loc, "w1"))
        cat.create_namespace("db")
        meta = cat.create_table("db.src", _schema())
        src_loc = os.path.join(meta.location, "metadata", "v1.metadata.json")

        cat2 = FileSystemCatalog(os.path.join(tmp_loc, "w2"))
        cat2.create_namespace("db")
        cat2.register_table("db.copy", src_loc)
        meta2, _ = cat2.load_metadata("db.copy")
        assert meta2.table_uuid == meta.table_uuid
