"""Avro interop: pure-Python container reader/writer + spec manifests.

Reader parity targets: the reference's avro subsystem
(avro_reader.cc, avro_data_util.cc, manifest_adapter.cc) and its real
test fixtures at src/iceberg/test/resources/ — files written by
another Iceberg engine, which this engine must decode byte-exactly.
"""

import glob
import json
import os
from decimal import Decimal

import pytest

from iceberg_cpp_spark.core import avro as av
from iceberg_cpp_spark.core import manifests as mf
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec
from iceberg_cpp_spark.functions import transforms as tr

RES = "/root/reference/src/iceberg/test/resources"


# ---------------------------------------------------------------------------
# Generic container round-trip
# ---------------------------------------------------------------------------

class TestContainerRoundTrip:
    SCHEMA = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": ["null", "bytes"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "e", "type": {"type": "enum", "name": "c",
                                   "symbols": ["A", "B"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
            {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal",
                                     "precision": 9, "scale": 2}},
        ],
    }
    ROWS = [
        {"i": -1, "l": 2**40, "s": "héllo", "d": 1.5, "b": b"\x00\xff",
         "arr": [1, -2, 3], "m": {"k": "v", "k2": "v2"}, "e": "B",
         "fx": b"abcd", "dec": Decimal("123.45")},
        {"i": 0, "l": -2**40, "s": "", "d": -0.0, "b": None,
         "arr": [], "m": {}, "e": "A", "fx": b"\x00\x01\x02\x03",
         "dec": Decimal("-0.01")},
    ]

    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_roundtrip(self, tmp_loc, codec):
        path = os.path.join(tmp_loc, "t.avro")
        av.write_avro(path, self.SCHEMA, self.ROWS, codec=codec)
        f = av.read_avro(path)
        assert f.records == self.ROWS
        assert f.metadata["avro.codec"] == codec.encode()

    def test_zigzag_extremes(self, tmp_loc):
        schema = {"type": "record", "name": "z",
                  "fields": [{"name": "v", "type": "long"}]}
        vals = [0, -1, 1, 2**62, -2**62, 63, -64]
        path = os.path.join(tmp_loc, "z.avro")
        av.write_avro(path, schema, [{"v": v} for v in vals])
        assert [r["v"] for r in av.read_avro(path).records] == vals


# ---------------------------------------------------------------------------
# Reference fixtures (REAL files written by another engine)
# ---------------------------------------------------------------------------

class TestReferenceFixtures:
    def test_all_manifest_lists_decode(self):
        paths = sorted(glob.glob(f"{RES}/snap-*.avro"))
        assert len(paths) == 5
        for p in paths:
            mfs = av.manifest_list_from_avro(p)
            assert mfs, p
            for m in mfs:
                assert m.manifest_path.endswith(".avro")
                assert m.manifest_length > 0
                assert m.added_snapshot_id > 0

    def test_manifest_list_fields(self):
        p = f"{RES}/snap-7412193043800610213-1-2bccd69e-d642-4816-bba0-261cd9bd0d93.avro"
        mfs = av.manifest_list_from_avro(p)
        assert len(mfs) == 4
        assert mfs[0].sequence_number == 4
        assert mfs[0].added_files_count == 1
        assert mfs[0].added_rows_count == 1
        assert mfs[0].partitions and mfs[0].partitions[0].lower_bound is not None

    def test_unpartitioned_manifest_entries(self):
        p = f"{RES}/2ddf1bc9-830b-4015-aced-c060df36f150-m0.avro"
        entries = av.manifest_entries_from_avro(p)
        assert len(entries) == 1
        d = entries[0].data_file
        assert d.file_format == "parquet"
        assert d.record_count == 4
        assert d.partition == {}
        # bounds decode as raw little-endian single-value buffers:
        # field 1 is a long with min value 1
        assert d.lower_bounds[1] == (1).to_bytes(8, "little")

    def test_partitioned_manifest_entries(self):
        p = f"{RES}/56357cd7-391f-4df8-aa24-e7e667da8870-m4.avro"
        entries = av.manifest_entries_from_avro(p)
        assert len(entries) == 4
        parts = [e.data_file.partition.get("order_ts_hour") for e in entries]
        assert all(isinstance(v, int) for v in parts)
        # hours-since-epoch for 2021..2024 timestamps
        assert all(400_000 < v < 500_000 for v in parts)

    def test_inheritance_from_manifest(self):
        p = f"{RES}/2ddf1bc9-830b-4015-aced-c060df36f150-m0.avro"
        stub = mf.ManifestFile(manifest_path=p, manifest_length=0,
                               partition_spec_id=0, added_snapshot_id=99,
                               sequence_number=7)
        entries = av.manifest_entries_from_avro(p, manifest=stub)
        for e in entries:
            assert e.snapshot_id is not None


# ---------------------------------------------------------------------------
# Spec-avro manifest write path
# ---------------------------------------------------------------------------

def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), required=True),
        it.NestedField(2, "d", it.DateType()),
        it.NestedField(3, "name", it.StringType()),
    ])


def _datafile(i, part=None):
    return mf.DataFile(
        content=mf.CONTENT_DATA, file_path=f"/data/f{i}.parquet",
        file_format="parquet", partition=part or {}, record_count=10 * i,
        file_size_in_bytes=100 * i,
        value_counts={1: 10 * i}, null_value_counts={1: 0},
        lower_bounds={1: (i).to_bytes(8, "little")},
        upper_bounds={1: (9 * i).to_bytes(8, "little")},
        split_offsets=[4], sort_order_id=0,
    )


class TestV1NameMapping:
    def test_v1_field_names_resolve_by_id(self, tmp_loc):
        """v1 manifests name the count columns differently
        (added_data_files_count, id 504); the adapter maps by field-id,
        so names must not matter."""
        schema = {
            "type": "record", "name": "manifest_file",
            "fields": [
                {"name": "manifest_path", "type": "string", "field-id": 500},
                {"name": "manifest_length", "type": "long", "field-id": 501},
                {"name": "partition_spec_id", "type": "int", "field-id": 502},
                {"name": "added_snapshot_id", "type": "long", "field-id": 503},
                {"name": "added_data_files_count", "type": "int", "field-id": 504},
                {"name": "existing_data_files_count", "type": "int", "field-id": 505},
                {"name": "deleted_data_files_count", "type": "int", "field-id": 506},
            ],
        }
        rec = {"manifest_path": "/m/x.avro", "manifest_length": 9,
               "partition_spec_id": 0, "added_snapshot_id": 7,
               "added_data_files_count": 3, "existing_data_files_count": 1,
               "deleted_data_files_count": 0}
        path = os.path.join(tmp_loc, "v1.avro")
        av.write_avro(path, schema, [rec])
        back = av.manifest_list_from_avro(path)
        assert back[0].added_files_count == 3
        assert back[0].existing_files_count == 1
        assert back[0].added_snapshot_id == 7
        # v2-only fields default sanely
        assert back[0].content == mf.MANIFEST_CONTENT_DATA
        assert back[0].sequence_number == 0


class TestAvroManifestWriter:
    def test_roundtrip_unpartitioned(self, tmp_loc):
        schema = _schema()
        spec = PartitionSpec.unpartitioned()
        path = os.path.join(tmp_loc, "m.avro")
        w = mf.ManifestWriter(path, spec, schema, snapshot_id=5, format="avro")
        w.add_file(_datafile(1), sequence_number=3)
        w.add_file(_datafile(2), sequence_number=3)
        m = w.close()
        assert av.is_avro(path)
        assert m.added_files_count == 2 and m.sequence_number == 3

        back = mf.read_manifest(path, spec, schema, manifest=m)
        assert len(back) == 2
        assert back[0].data_file.file_path == "/data/f1.parquet"
        assert back[0].data_file.value_counts == {1: 10}
        assert back[0].data_file.lower_bounds[1] == (1).to_bytes(8, "little")
        assert back[0].snapshot_id == 5 and back[0].sequence_number == 3

    def test_roundtrip_partitioned(self, tmp_loc):
        schema = _schema()
        spec = PartitionSpec([PartitionField(2, 1000, "d_day", tr.DayTransform())])
        path = os.path.join(tmp_loc, "mp.avro")
        w = mf.ManifestWriter(path, spec, schema, snapshot_id=5, format="avro")
        w.add_file(_datafile(1, part={"d_day": 19000}), sequence_number=1)
        w.add_file(_datafile(2, part={"d_day": None}), sequence_number=1)
        m = w.close()
        back = mf.read_manifest(path, spec, schema, manifest=m)
        assert back[0].data_file.partition == {"d_day": 19000}
        assert back[1].data_file.partition == {"d_day": None}
        # summaries survive
        assert m.partitions[0].contains_null is True

    def test_schema_metadata_keys(self, tmp_loc):
        schema = _schema()
        spec = PartitionSpec.unpartitioned()
        path = os.path.join(tmp_loc, "mk.avro")
        w = mf.ManifestWriter(path, spec, schema, snapshot_id=1, format="avro")
        w.add_file(_datafile(1), sequence_number=1)
        w.close()
        f = av.read_avro(path)
        assert f.metadata["format-version"] == b"2"
        assert f.metadata["content"] == b"data"
        parsed = json.loads(f.metadata["schema"])
        assert parsed["fields"][0]["id"] == 1

    def test_manifest_list_roundtrip(self, tmp_loc):
        path = os.path.join(tmp_loc, "snap.avro")
        m = mf.ManifestFile(
            manifest_path="/meta/m1.avro", manifest_length=123,
            partition_spec_id=0, sequence_number=2, min_sequence_number=1,
            added_snapshot_id=42, added_files_count=1, added_rows_count=10,
            partitions=[mf.PartitionFieldSummary(
                contains_null=False, contains_nan=False,
                lower_bound=b"\x01", upper_bound=b"\x09")])
        lw = mf.ManifestListWriter(path, snapshot_id=42, sequence_number=2,
                                   format="avro", parent_snapshot_id=41)
        lw.add(m)
        lw.close()
        back = mf.read_manifest_list(path)
        assert len(back) == 1
        assert back[0].manifest_path == "/meta/m1.avro"
        assert back[0].added_rows_count == 10
        assert back[0].partitions[0].upper_bound == b"\x09"
        assert av.read_avro(path).metadata["parent-snapshot-id"] == b"41"


# ---------------------------------------------------------------------------
# End-to-end table with avro manifests
# ---------------------------------------------------------------------------

class TestAvroTable:
    def test_write_scan_delete(self, spark, tmp_loc, lineitem):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        t = IceTable.create(
            spark, os.path.join(tmp_loc, "li"),
            schema_from_spark(lineitem.schema),
            properties={"write.metadata.manifest-format": "avro"})
        t = t.append(lineitem)
        assert glob.glob(os.path.join(tmp_loc, "li/metadata/*.avro"))
        assert not glob.glob(os.path.join(tmp_loc, "li/metadata/*.parquet"))
        assert t.to_df().count() == lineitem.count()

        n_a = lineitem.filter("l_returnflag = 'A'").count()
        got = t.scan(filter=ex.eq(ex.Reference("l_returnflag"), "A")).to_df().count()
        assert got == n_a

        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "A"))
        assert t.to_df().count() == lineitem.count() - n_a

    def test_load_external_layout(self, spark, tmp_loc, lineitem):
        """A table laid out as a foreign warehouse would write it —
        sequence-prefixed metadata name, avro manifests — loads through
        IceTable.load and scans correctly."""
        import shutil

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        loc = os.path.join(tmp_loc, "ext")
        t = IceTable.create(
            spark, loc, schema_from_spark(lineitem.schema),
            properties={"write.metadata.manifest-format": "avro"})
        t.append(lineitem.limit(500))
        # rename v2.metadata.json -> 00002-<uuid>.metadata.json, drop v1
        md = os.path.join(loc, "metadata")
        vs = sorted(f for f in os.listdir(md) if f.endswith(".metadata.json"))
        latest = vs[-1]
        shutil.move(os.path.join(md, latest),
                    os.path.join(md, "00002-abc123.metadata.json"))
        for f in vs[:-1]:
            os.remove(os.path.join(md, f))

        t2 = IceTable.load(spark, loc)
        assert t2.to_df().count() == 500
        assert t2.scan().count() == 500  # metadata-only count

        t3 = IceTable.from_metadata_file(
            spark, os.path.join(md, "00002-abc123.metadata.json"))
        assert t3.scan().count() == 500

    def test_v1_table_end_to_end(self, spark, tmp_loc, lineitem):
        """format-version=1 table with spec-Avro manifests (VERDICT r06
        task 5): appends write v1 manifests + v1 manifest lists (v1
        field names, block_size_in_bytes, no sequence fields), the carry
        path preserves v1, scans read back exactly, and the metadata
        JSON carries the singular v1 `schema`/`partition-spec` keys."""
        import json as _json

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import avro as av
        from iceberg_cpp_spark.core.types import schema_from_spark

        loc = os.path.join(tmp_loc, "v1tab")
        t = IceTable.create(
            spark, loc, schema_from_spark(lineitem.schema),
            properties={"format-version": "1",
                        "write.metadata.manifest-format": "avro"})
        assert t.metadata.format_version == 1
        t.append(lineitem.limit(100))
        t.append(lineitem.limit(50))  # exercises manifest carry
        assert t.to_df().count() == 150

        # every written avro metadata file declares format-version 1
        for p in glob.glob(os.path.join(loc, "metadata/*.avro")):
            f = av.read_avro(p)
            assert f.metadata["format-version"] == b"1", p
            names = {fl["name"] for fl in f.schema["fields"]}
            if "manifest_path" in names:  # manifest list
                assert "added_data_files_count" in names
                assert "sequence_number" not in names
            else:  # manifest
                dn = {fl["name"] for fl in next(
                    fl for fl in f.schema["fields"]
                    if fl["name"] == "data_file")["type"]["fields"]}
                assert "block_size_in_bytes" in dn
                assert "content" not in dn

        # v1 metadata JSON has the singular schema/partition-spec keys
        metas = sorted(glob.glob(os.path.join(loc, "metadata/*.metadata.json")))
        j = _json.loads(open(metas[-1]).read())
        assert j["format-version"] == 1
        assert "schema" in j and "partition-spec" in j

        # a fresh load sees the same table
        t2 = IceTable.load(spark, loc)
        assert t2.metadata.format_version == 1
        assert t2.to_df().count() == 150

        # v1 cannot hold delete manifests
        from iceberg_cpp_spark.plans import expressions as ex
        with pytest.raises(ValueError, match="v1"):
            t2.delete_where(ex.eq(ex.Reference("l_returnflag"), "A"),
                            mode="merge-on-read")

    def test_v3_table_end_to_end(self, spark, tmp_loc, lineitem):
        """format-version=3 table with spec-Avro manifests (VERDICT r07
        task 3; reference manifest_writer.h:70-84,139-147 MakeV3Writer,
        v3_metadata.cc): appends write v3 manifests + v3 manifest lists
        (first_row_id field id 520, key_metadata in data_file), deletion
        vectors carry their pointer fields, row lineage survives a fresh
        load, and every avro file declares format-version 3."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import avro as av
        from iceberg_cpp_spark.core import manifests as mf
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(150)
        loc = os.path.join(tmp_loc, "v3tab")
        t = IceTable.create(
            spark, loc, schema_from_spark(li.schema),
            properties={"format-version": "3",
                        "write.metadata.manifest-format": "avro"})
        assert t.metadata.format_version == 3
        t = t.append(li.limit(100))
        t = t.append(li.limit(150).subtract(li.limit(100)))
        assert t.to_df().count() == 150
        t = t.delete_where(ex.lt(ex.Reference("l_quantity"), 10.0),
                           mode="deletion-vector")
        expect = li.filter("l_quantity >= 10").count()
        assert t.to_df().count() == expect

        for p in glob.glob(os.path.join(loc, "metadata/*.avro")):
            f = av.read_avro(p)
            assert f.metadata["format-version"] == b"3", p
            names = {fl["name"] for fl in f.schema["fields"]}
            if "manifest_path" in names:  # manifest list
                assert "first_row_id" in names
                assert "key_metadata" in names  # v3 field id 519
                assert "sequence_number" in names
                # ADVICE r08: v3 list metadata mirrors
                # ManifestFileAdapterV3::Init — first-row-id and
                # parent-snapshot-id written unconditionally
                assert "first-row-id" in f.metadata
                assert "parent-snapshot-id" in f.metadata
            else:  # manifest
                dn = {fl["name"] for fl in next(
                    fl for fl in f.schema["fields"]
                    if fl["name"] == "data_file")["type"]["fields"]}
                assert {"content", "key_metadata", "referenced_data_file",
                        "content_offset", "content_size_in_bytes",
                        "first_row_id"} <= dn

        # manifest-list first_row_id round-trips: each data manifest's
        # value equals the min of its ADDED entries' explicit ids
        snap = t.current_snapshot()
        schema = t.schema()
        for m in mf.read_manifest_list(snap.manifest_list):
            if m.content != mf.MANIFEST_CONTENT_DATA:
                continue
            spec = t.metadata.spec_by_id(m.partition_spec_id)
            rids = [e.data_file.first_row_id
                    for e in mf.read_manifest(m.manifest_path, spec, schema,
                                              manifest=m)
                    if e.status == mf.STATUS_ADDED
                    and e.data_file.first_row_id is not None]
            if rids:
                assert m.first_row_id == min(rids)

        # DV pointers survived the v3 avro manifest
        d = [d for d in t.scan().plan_deletes() if d.is_deletion_vector][0]
        assert d.referenced_data_file and d.content_size_in_bytes > 0

        # fresh load: rows, DV application, and row lineage all intact
        t2 = IceTable.load(spark, loc)
        assert t2.metadata.format_version == 3
        df = t2.scan().with_metadata_columns().to_df()
        assert df.count() == expect
        ids = df.select("_row_id").distinct().count()
        assert ids == expect  # lineage ids stay unique through the DV

    def test_v3_existing_only_manifest_gets_first_row_id(self, spark,
                                                         tmp_loc, lineitem):
        """ADVICE r08: a freshly written data manifest holding only
        EXISTING entries (rewrite_manifests) must not carry a null
        first_row_id — the reference treats null as writer-unassigned
        and assigns from the snapshot base at list-write time
        (ManifestFileAdapterV3::Append)."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import manifests as mf
        from iceberg_cpp_spark.core.types import schema_from_spark

        li = lineitem.limit(80)
        t = IceTable.create(
            spark, os.path.join(tmp_loc, "v3rm"),
            schema_from_spark(li.schema),
            properties={"format-version": "3",
                        "write.metadata.manifest-format": "avro"})
        t = t.append(li.limit(40))
        t = t.append(li.limit(80).subtract(li.limit(40)))
        t = t.rewrite_manifests(entries_per_manifest=10)
        snap = t.current_snapshot()
        data_manifests = [m for m in mf.read_manifest_list(snap.manifest_list)
                          if m.content == mf.MANIFEST_CONTENT_DATA]
        assert data_manifests
        for m in data_manifests:
            assert m.first_row_id is not None
        assert t.to_df().count() == 80

    def test_distributed_avro_planning(self, spark, tmp_loc, lineitem, monkeypatch):
        import iceberg_cpp_spark.table as tbl
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        t = IceTable.create(
            spark, os.path.join(tmp_loc, "li2"),
            schema_from_spark(lineitem.schema),
            properties={"write.metadata.manifest-format": "avro"})
        t = t.append(lineitem.limit(100)).append(lineitem.limit(50))
        monkeypatch.setattr(tbl, "DISTRIBUTED_PLAN_THRESHOLD", 0)
        scan = t.scan(filter=ex.gt(ex.Reference("l_quantity"), 0))
        tasks = scan.plan_files()
        assert len(tasks) >= 2
        assert scan.to_df().count() == 150


# ---------------------------------------------------------------------------
# Avro DATA files (reference: file_reader.h:100-113 format dispatch,
# avro_reader.cc:77-160 — the one reader-registry slot the engine
# lacked until r9)
# ---------------------------------------------------------------------------

class TestAvroDataFiles:
    def _typed_schema(self):
        return it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "name", it.StringType()),
            it.NestedField(3, "d", it.DateType()),
            it.NestedField(4, "ts", it.TimestampTzType()),
            it.NestedField(5, "amount", it.DecimalType(12, 2)),
            it.NestedField(6, "tags", it.ListType(7, it.StringType())),
            it.NestedField(8, "props",
                           it.MapType(9, it.StringType(), 10, it.LongType())),
            it.NestedField(11, "pt", it.StructType([
                it.NestedField(12, "x", it.DoubleType()),
                it.NestedField(13, "y", it.DoubleType()),
            ])),
        ], schema_id=0)

    def test_typed_roundtrip(self, tmp_path):
        import datetime

        sch = self._typed_schema()
        rows = [
            {"id": 1, "name": "a", "d": datetime.date(2023, 5, 17),
             "ts": datetime.datetime(2023, 5, 17, 12, 30, 1, 250,
                                     tzinfo=datetime.timezone.utc),
             "amount": Decimal("1234.56"), "tags": ["x", "y"],
             "props": {"k": 7, "j": -1}, "pt": {"x": 1.5, "y": -2.5}},
            {"id": 2, "name": None, "d": None, "ts": None, "amount": None,
             "tags": None, "props": None, "pt": None},
        ]
        p = str(tmp_path / "data.avro")
        assert av.write_avro_data(p, sch, rows) == 2
        back = av.data_records(av.read_avro(p), sch)
        assert back == rows
        assert av.avro_record_count(p) == 2

    def test_record_count_matches_multi_block(self, tmp_path):
        # avro_record_count must agree with a full decode (single-block
        # writer today, but the counter walks ALL blocks)
        sch = it.Schema([it.NestedField(1, "v", it.LongType(), True)],
                        schema_id=0)
        p = str(tmp_path / "n.avro")
        av.write_avro_data(p, sch, [{"v": i} for i in range(1000)])
        assert av.avro_record_count(p) == len(av.read_avro(p).records) == 1000

    def test_field_id_projection_survives_rename(self, tmp_path):
        # the file stores the OLD column name; read schema renamed the
        # field — field-id resolution must still find it (the Avro
        # analogue of parquet field-id mapping)
        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "old_name", it.StringType()),
        ], schema_id=0)
        p = str(tmp_path / "r.avro")
        av.write_avro_data(p, sch, [{"id": 1, "old_name": "v"}])
        renamed = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "new_name", it.StringType()),
        ], schema_id=1)
        assert av.data_records(av.read_avro(p), renamed) == [
            {"id": 1, "new_name": "v"}]
        # and a column the file never had comes back None
        widened = it.Schema(renamed.fields + [
            it.NestedField(3, "extra", it.IntegerType())], schema_id=2)
        assert av.data_records(av.read_avro(p), widened)[0]["extra"] is None

    def test_scan_avro_table(self, spark, tmp_loc, lineitem):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(300)
        sch = schema_from_spark(li.schema)
        rows = [r.asDict() for r in li.collect()]
        a1 = os.path.join(tmp_loc, "ext", "a.avro")
        a2 = os.path.join(tmp_loc, "ext", "b.avro")
        av.write_avro_data(a1, sch, rows[:150])
        av.write_avro_data(a2, sch, rows[150:])
        t = IceTable.create(spark, os.path.join(tmp_loc, "tavd"), sch)
        t = t.add_files([a1, a2])
        tasks = t.scan().plan_files()
        assert {x.file_format for x in tasks} == {"avro"}
        assert sum(x.record_count for x in tasks) == 300
        df = t.to_df()
        assert df.count() == 300
        got = df.groupBy("l_returnflag").count().collect()
        exp = {(r["l_returnflag"], r["count"])
               for r in li.groupBy("l_returnflag").count().collect()}
        assert {(r["l_returnflag"], r["count"]) for r in got} == exp
        # filtered scan evaluates post-decode
        n = t.scan(filter=ex.gt(ex.Reference("l_quantity"), 30.0)) \
             .to_df().count()
        assert n == li.filter("l_quantity > 30").count()

    def test_mixed_format_deletes_and_compaction(self, spark, tmp_loc,
                                                 lineitem):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(200)
        sch = schema_from_spark(li.schema)
        rows = [r.asDict() for r in li.collect()]
        a1 = os.path.join(tmp_loc, "ext2", "a.avro")
        av.write_avro_data(a1, sch, rows[:100])
        t = IceTable.create(spark, os.path.join(tmp_loc, "tmix"), sch)
        t = t.add_files([a1])
        import pandas as pd

        t = t.append(spark.createDataFrame(pd.DataFrame(rows[100:]),
                                           schema=li.schema))
        assert t.to_df().count() == 200
        # MoR position delete spans both formats
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="merge-on-read")
        exp = sum(1 for r in rows if r["l_returnflag"] != "R")
        assert t.to_df().count() == exp
        # DV delete on the avro leg too
        t = t.delete_where(ex.gt(ex.Reference("l_quantity"), 45.0),
                           mode="deletion-vector")
        exp = sum(1 for r in rows
                  if r["l_returnflag"] != "R" and not r["l_quantity"] > 45)
        assert t.to_df().count() == exp
        # compaction migrates avro -> parquet, rows unchanged
        t = t.rewrite_data_files(target_file_count=1)
        assert {x.file_format for x in t.scan().plan_files()} == {"parquet"}
        assert t.to_df().count() == exp

    def test_dropped_readded_column_not_resurrected(self, tmp_path):
        # ADVICE r09: after dropping column x (id 2) and re-adding x
        # (id 3), a read-schema field absent BY ID but present BY NAME
        # must read None — name fallback applies only to id-less files
        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "x", it.StringType()),
        ], schema_id=0)
        p = str(tmp_path / "drop.avro")
        av.write_avro_data(p, sch, [{"id": 1, "x": "stale"}])
        readded = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(3, "x", it.StringType()),
        ], schema_id=1)
        assert av.data_records(av.read_avro(p), readded) == [
            {"id": 1, "x": None}]

    def test_changelog_and_incremental_dispatch_avro(self, spark, tmp_loc,
                                                     lineitem):
        # ADVICE r09: changes()/incremental_read read data-file rows —
        # they must format-dispatch like the scan plane, not assume
        # parquet (an Avro file made them fail on parquet magic bytes)
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.streaming.changelog import changes
        from iceberg_cpp_spark.streaming.incremental import incremental_read

        li = lineitem.limit(60)
        sch = schema_from_spark(li.schema)
        rows = [r.asDict() for r in li.collect()]
        a1 = os.path.join(tmp_loc, "ext3", "a.avro")
        av.write_avro_data(a1, sch, rows[:30])
        t = IceTable.create(spark, os.path.join(tmp_loc, "tcl"), sch)
        t = t.append(spark.createDataFrame(rows[30:], schema=li.schema))
        s1 = t.current_snapshot().snapshot_id
        t = t.add_files([a1])
        c = changes(t, from_snapshot_id=s1)
        assert c.filter("_change_type = 'insert'").count() == 30
        inc = incremental_read(t, from_snapshot_id=s1)
        assert inc.count() == 30
        # full-range changelog crosses both formats
        assert changes(t, from_snapshot_id=None).count() == 60

    def test_alias_scan_with_avro_raises(self, spark, tmp_loc, lineitem):
        # ADVICE r09: the name-mapping-alias scan route decodes with
        # pyarrow.parquet only — Avro tasks on that path must fail
        # loudly, not crash mid-scan
        import pyspark.sql.functions as F
        import pytest

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        li = lineitem.limit(20).select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_quantity").alias("quantity"))
        sch = schema_from_spark(li.schema)
        ext = os.path.join(tmp_loc, "ext4")
        os.makedirs(ext, exist_ok=True)
        pqf = os.path.join(ext, "aliased.parquet")
        li.toDF("ok_alias", "qty_alias").coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(ext, "pqdir"))
        import glob as _g
        import shutil
        shutil.copy(_g.glob(os.path.join(ext, "pqdir", "*.parquet"))[0], pqf)
        a1 = os.path.join(ext, "a.avro")
        av.write_avro_data(a1, sch,
                           [r.asDict() for r in li.collect()][:5])
        t = IceTable.create(spark, os.path.join(tmp_loc, "tal"), sch)
        t = t.add_files([pqf], aliases={"orderkey": ["ok_alias"],
                                        "quantity": ["qty_alias"]})
        t = t.add_files([a1])
        with pytest.raises(NotImplementedError, match="[Aa]vro"):
            t.to_df()

    def test_orc_import_scan_and_mixed_deletes(self, spark, tmp_loc,
                                               lineitem):
        """ORC data-file leg (VERDICT r09 task 6 — exceeds the
        reference's empty FileFormatType slot, file_format.h): add_files
        import, JVM-native plain scans, and need_meta reads (pyarrow.orc
        leg) composing with MoR/DV deletes across a mixed
        parquet+orc table; compaction migrates orc -> parquet."""
        import glob as _glob

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(200)
        sch = schema_from_spark(li.schema)
        rows = [r.asDict() for r in li.collect()]
        orc_dir = os.path.join(tmp_loc, "orcdir")
        li.limit(100).coalesce(1).write.mode("overwrite").orc(orc_dir)
        orcf = _glob.glob(os.path.join(orc_dir, "*.orc"))
        t = IceTable.create(spark, os.path.join(tmp_loc, "torc"), sch)
        t = t.add_files(orcf)
        assert {x.file_format for x in t.scan().plan_files()} == {"orc"}
        assert t.to_df().count() == 100
        t = t.append(spark.createDataFrame(rows[100:], schema=li.schema))
        assert t.to_df().count() == 200
        # filtered scan across both legs
        n = t.scan(filter=ex.gt(ex.Reference("l_quantity"), 30.0)) \
             .to_df().count()
        assert n == li.filter("l_quantity > 30").count()
        # pushdown + pruning reach the JVM ORC leg (100 TB rule): the
        # ORC FileScan must carry the predicate and a pruned ReadSchema
        plan = (t.scan(filter=ex.gt(ex.Reference("l_quantity"), 30.0),
                       columns=["l_orderkey", "l_quantity"]).to_df()
                ._jdf.queryExecution().executedPlan().toString())
        orc_scan = [ln for ln in plan.splitlines()
                    if "FileScan orc" in ln]
        assert orc_scan and "GreaterThan(l_quantity,30.0)" in orc_scan[0]
        assert "struct<l_orderkey:bigint,l_quantity:double>" \
            in orc_scan[0]
        # MoR position delete spans both formats (need_meta ORC leg)
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="merge-on-read")
        exp = sum(1 for r in rows if r["l_returnflag"] != "R")
        assert t.to_df().count() == exp
        # DV delete over the mixed table
        t = t.delete_where(ex.gt(ex.Reference("l_quantity"), 45.0),
                           mode="deletion-vector")
        exp = sum(1 for r in rows
                  if r["l_returnflag"] != "R" and not r["l_quantity"] > 45)
        assert t.to_df().count() == exp
        # changelog + incremental dispatch the orc leg too
        from iceberg_cpp_spark.streaming.changelog import changes

        assert changes(t, from_snapshot_id=None).count() > 0
        # compaction migrates orc -> parquet, rows unchanged
        t = t.rewrite_data_files(target_file_count=1)
        assert {x.file_format for x in t.scan().plan_files()} == {"parquet"}
        assert t.to_df().count() == exp

    def test_orc_write_format_default(self, spark, tmp_loc, lineitem):
        """``write.format.default=orc``: append/overwrite emit ORC data
        files through Spark's native JVM writer (footer harvest via
        collect_orc_metrics — counts, sizes AND column bounds from the
        ORC footer protobuf, see tests/test_orc_metrics.py), scans ride
        the JVM ORC leg with pushdown, MoR deletes use the need_meta
        pyarrow leg, and flipping the property back to parquet yields a
        mixed-format table that still scans correctly."""
        import pytest

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(150)
        sch = schema_from_spark(li.schema)
        rows = [r.asDict() for r in li.collect()]
        t = IceTable.create(
            spark, os.path.join(tmp_loc, "torcw"), sch,
            properties={"write.format.default": "orc"})
        t = t.append(spark.createDataFrame(rows[:100], schema=li.schema))
        files = list(t.scan().plan_files())
        assert {x.file_format for x in files} == {"orc"}
        assert all(x.file_path.endswith(".orc") for x in files)
        assert sum(x.record_count for x in files) == 100
        assert t.to_df().count() == 100
        # filtered + projected scan hits the JVM ORC reader with the
        # predicate pushed and ReadSchema pruned (100 TB rule)
        plan = (t.scan(filter=ex.gt(ex.Reference("l_quantity"), 30.0),
                       columns=["l_orderkey", "l_quantity"]).to_df()
                ._jdf.queryExecution().executedPlan().toString())
        orc_scan = [ln for ln in plan.splitlines() if "FileScan orc" in ln]
        assert orc_scan and "GreaterThan(l_quantity,30.0)" in orc_scan[0]
        # parquet-format appends after the property flips → mixed table
        t = t.update_properties({"write.format.default": "parquet"})
        t = t.append(spark.createDataFrame(rows[100:], schema=li.schema))
        assert {x.file_format for x in t.scan().plan_files()} == \
            {"orc", "parquet"}
        assert t.to_df().count() == 150
        # MoR position delete spans both write formats
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="merge-on-read")
        exp = sum(1 for r in rows if r["l_returnflag"] != "R")
        assert t.to_df().count() == exp
        # unsupported format fails loudly at write time
        t2 = IceTable.create(
            spark, os.path.join(tmp_loc, "tbadfmt"), sch,
            properties={"write.format.default": "feather"})
        with pytest.raises(ValueError, match="write.format.default"):
            t2.append(spark.createDataFrame(rows[:5], schema=li.schema))

    def test_avro_write_format_default(self, spark, tmp_loc, lineitem):
        """``write.format.default=avro``: appends encode Avro container
        files in executors (one per Spark partition, field-ids in the
        writer schema so reads project BY ID), scans ride the
        _read_avro_paths leg, deletes compose, and renames keep working
        because resolution is id-based (unlike the ORC leg)."""
        import pytest

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import avro as av
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(80).select("l_orderkey", "l_quantity",
                                       "l_returnflag", "l_shipdate")
        sch = schema_from_spark(li.schema)
        rows = [r.asDict() for r in li.collect()]
        t = IceTable.create(
            spark, os.path.join(tmp_loc, "tavw"), sch,
            properties={"write.format.default": "avro"})
        t = t.append(spark.createDataFrame(rows, schema=li.schema))
        files = list(t.scan().plan_files())
        assert {x.file_format for x in files} == {"avro"}
        assert all(x.file_path.endswith(".avro") for x in files)
        assert sum(x.record_count for x in files) == 80
        # writer schema carries field-ids → id-resolved projection
        wfields = av.avro_file_schema(files[0].file_path)["fields"]
        assert all(f.get("field-id") for f in wfields)
        assert t.to_df().count() == 80
        got = {r["l_orderkey"] for r in
               t.scan(filter=ex.eq(ex.Reference("l_returnflag"), "A"))
               .to_df().collect()}
        exp = {r["l_orderkey"] for r in rows if r["l_returnflag"] == "A"}
        assert got == exp
        # rename survives (id-based resolution), then MoR delete
        t = t.rename_column("l_quantity", "qty")
        assert t.to_df().filter("qty > 30").count() == \
            sum(1 for r in rows if r["l_quantity"] > 30)
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="merge-on-read")
        assert t.to_df().count() == \
            sum(1 for r in rows if r["l_returnflag"] != "R")
        # partitioned + avro is a loud boundary
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)
        from iceberg_cpp_spark.functions import transforms as tr

        spec = PartitionSpec([PartitionField(
            sch.find_field("l_returnflag").field_id, 1000,
            "l_returnflag", tr.IdentityTransform())])
        tp = IceTable.create(
            spark, os.path.join(tmp_loc, "tavwp"), sch, spec=spec,
            properties={"write.format.default": "avro"})
        with pytest.raises(ValueError, match="unpartitioned"):
            tp.append(spark.createDataFrame(rows, schema=li.schema))

    def test_orc_blocks_unrepresentable_schema_evolution(
            self, spark, tmp_loc, lineitem):
        """ORC files resolve by name (no field ids): renaming over live
        ORC files would silently null the column, and re-adding a
        dropped name would resurrect old values — both fail loudly;
        compacting to parquet unblocks them."""
        import pytest

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import (IntegerType,
                                                  schema_from_spark)

        li = lineitem.limit(40).select("l_orderkey", "l_quantity",
                                       "l_returnflag")
        t = IceTable.create(
            spark, os.path.join(tmp_loc, "torcevo"),
            schema_from_spark(li.schema),
            properties={"write.format.default": "orc"})
        t = t.append(li)
        with pytest.raises(ValueError, match="ORC.*rename|rename.*ORC"):
            t.rename_column("l_quantity", "qty")
        # same-named add over a live ORC column → loud failure
        t2 = t.drop_column("l_quantity")
        with pytest.raises(ValueError, match="resurrect"):
            t2.add_column("l_quantity", IntegerType())
        # a fresh name is fine (nulls for old files is the contract)
        t3 = t2.add_column("brand_new", IntegerType())
        assert t3.to_df().filter("brand_new is null").count() == 40
        # parquet migration unblocks the rename (separate table — the
        # handles above all committed against the first one)
        tb = IceTable.create(
            spark, os.path.join(tmp_loc, "torcevo2"),
            schema_from_spark(li.schema),
            properties={"write.format.default": "orc"})
        tb = tb.append(li)
        # flip the format first — rewrite honors write.format.default,
        # so compacting while it is still orc would re-emit ORC files
        tb = tb.update_properties({"write.format.default": "parquet"})
        tb = tb.rewrite_data_files(target_file_count=1)
        tb = tb.rename_column("l_quantity", "qty")
        assert tb.to_df().filter("qty > 0").count() == 40

    def test_add_files_rejects_non_record_avro(self, spark, tmp_loc,
                                               tmp_path):
        # ADVICE r09: a non-record writer schema gets a clear ValueError
        # (was a KeyError)
        import pytest

        from iceberg_cpp_spark import IceTable

        sch = it.Schema([it.NestedField(1, "v", it.LongType(), True)],
                        schema_id=0)
        p = str(tmp_path / "arr.avro")
        av.write_avro(p, {"type": "array", "items": "long"}, [],
                      metadata={})
        t = IceTable.create(spark, os.path.join(tmp_loc, "tnr"), sch)
        with pytest.raises(ValueError, match="record"):
            t.add_files([p])
