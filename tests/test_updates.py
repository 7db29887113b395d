"""TableMetadataBuilder + TableUpdate hierarchy (shapes from the
reference's table_metadata_builder_test.cc) plus name mapping, the
format registry, FileIO, and foreign-file import."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.metadata import (
    PartitionField,
    PartitionSpec,
    Snapshot,
    SortOrder,
    TableMetadata,
)
from iceberg_cpp_spark.core.updates import TableMetadataBuilder
from iceberg_cpp_spark.functions import transforms as tr


def _schema(schema_id=0):
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "data", it.StringType(), False),
    ], schema_id=schema_id)


def _nested_schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "addr", it.StructType([
            it.NestedField(3, "zip", it.LongType()),
            it.NestedField(4, "city", it.StringType()),
        ])),
    ])


def _base():
    return TableMetadata(
        format_version=2, table_uuid="u-1", location="/tmp/t",
        last_column_id=2, schemas=[_schema()], current_schema_id=0,
        partition_specs=[PartitionSpec.unpartitioned()], default_spec_id=0,
        sort_orders=[SortOrder.unsorted()],
    )


class TestBuilder:
    def test_add_and_set_schema(self):
        b = TableMetadataBuilder.build_from(_base())
        s2 = _schema(schema_id=1)
        b.add_schema(s2).set_current_schema(1)
        meta, updates, reqs = b.build()
        assert meta.current_schema_id == 1
        assert [u.action for u in updates] == ["add-schema", "set-current-schema"]
        assert any(type(r).__name__ == "AssertCurrentSchemaId" for r in reqs)

    def test_duplicate_schema_id_rejected(self):
        b = TableMetadataBuilder.build_from(_base())
        with pytest.raises(ValueError, match="schema id exists"):
            b.add_schema(_schema(schema_id=0))

    def test_add_snapshot_and_branch(self):
        b = TableMetadataBuilder.build_from(_base())
        snap = Snapshot(9, 1, 1234, "/ml", summary={"operation": "append"})
        b.add_snapshot(snap).set_branch_snapshot(9)
        meta, _u, reqs = b.build()
        assert meta.current_snapshot_id == 9
        assert meta.last_sequence_number == 1
        assert meta.ref("main").snapshot_id == 9
        assert len(meta.snapshot_log) == 1
        assert any(type(r).__name__ == "AssertRefSnapshotId" for r in reqs)

    def test_sequence_number_must_advance(self):
        base = _base()
        base.last_sequence_number = 5
        b = TableMetadataBuilder.build_from(base)
        with pytest.raises(ValueError, match="sequence number"):
            b.add_snapshot(Snapshot(9, 5, 1234, "/ml"))

    def test_remove_snapshots(self):
        base = _base()
        base.snapshots = [Snapshot(1, 1, 10, "a"), Snapshot(2, 2, 20, "b")]
        base.last_sequence_number = 2
        base.current_snapshot_id = 2
        base.snapshot_log = [{"timestamp-ms": 10, "snapshot-id": 1},
                             {"timestamp-ms": 20, "snapshot-id": 2}]
        b = TableMetadataBuilder.build_from(base)
        b.remove_snapshots([1])
        meta, _u, _r = b.build()
        assert [s.snapshot_id for s in meta.snapshots] == [2]
        assert len(meta.snapshot_log) == 1

    def test_properties(self):
        b = TableMetadataBuilder.build_from(_base())
        b.set_properties({"a": "1", "b": "2"}).remove_properties(["a"])
        meta, _u, _r = b.build()
        assert meta.properties == {"b": "2"}

    def test_format_downgrade_rejected(self):
        b = TableMetadataBuilder.build_from(_base())
        with pytest.raises(ValueError, match="downgrade"):
            b.upgrade_format_version(1)

    def test_add_spec(self):
        b = TableMetadataBuilder.build_from(_base())
        spec = PartitionSpec([PartitionField(1, 1001, "idb", tr.BucketTransform(4))],
                             spec_id=1)
        b.add_partition_spec(spec).set_default_spec(1)
        meta, _u, _r = b.build()
        assert meta.default_spec_id == 1
        assert meta.last_partition_id == 1001

    def test_build_validates_current_snapshot(self):
        base = _base()
        base.current_snapshot_id = 42  # dangling
        with pytest.raises(ValueError, match="current snapshot"):
            TableMetadataBuilder.build_from(base).build()


class TestNameMapping:
    def test_roundtrip_and_lookup(self):
        from iceberg_cpp_spark.core.name_mapping import NameMapping

        m = NameMapping.from_schema(_schema(), aliases={"id": ["record_id"]})
        s = m.to_json_string()
        back = NameMapping.from_json_string(s)
        assert back.id_for("id") == 1
        assert back.id_for("record_id") == 1
        assert back.id_for("data") == 2
        assert back.id_for("nope") is None
        assert back.names_for(1) == ["id", "record_id"]

    def test_top_level_name_with_literal_dot(self):
        """A top-level field whose NAME contains a dot must resolve by
        exact match before the dotted-path traversal kicks in."""
        from iceberg_cpp_spark.core.name_mapping import MappedField, NameMapping

        m = NameMapping([
            MappedField(field_id=1, names=["a.b"]),
            MappedField(field_id=2, names=["a"],
                        fields=[MappedField(field_id=3, names=["c"])]),
        ])
        assert m.id_for("a.b") == 1   # exact wins over path a -> b (absent)
        assert m.id_for("a.c") == 3   # path traversal still works
        assert m.id_for("a") == 2

    def test_apply_to_file_columns(self):
        from iceberg_cpp_spark.core import name_mapping as nm

        m = nm.NameMapping.from_schema(_schema(), aliases={"id": ["record_id"]})
        out = nm.apply_to_file_columns(m, ["record_id", "data", "junk"], _schema())
        assert out["record_id"][0] == 1
        assert out["data"][0] == 2
        assert "junk" not in out

    def test_nested_struct_mapping(self):
        """Nested resolution (name_mapping.h:76-113): dotted paths walk
        MappedField.fields; aliases key by dotted path."""
        from iceberg_cpp_spark.core import name_mapping as nm

        schema = _nested_schema()
        m = nm.NameMapping.from_schema(
            schema, aliases={"addr.zip": ["postal_code"]})
        back = nm.NameMapping.from_json_string(m.to_json_string())
        assert back.id_for("id") == 1
        assert back.id_for("addr") == 2
        assert back.id_for("addr.zip") == 3
        assert back.id_for("addr.postal_code") == 3
        assert back.id_for("addr.city") == 4
        assert back.id_for("addr.nope") is None
        assert back.names_for(4) == ["city"]
        out = nm.apply_to_file_columns(
            back, ["id", "addr.zip", "addr.city"], schema)
        assert out["addr.zip"][0] == 3
        assert out["addr.city"][0] == 4
        assert "addr" not in out  # struct itself is not a leaf

    def test_list_and_map_children_mapped(self):
        from iceberg_cpp_spark.core import name_mapping as nm

        schema = it.Schema([
            it.NestedField(1, "tags", it.ListType(2, it.StringType())),
            it.NestedField(3, "props", it.MapType(
                4, it.StringType(), 5, it.LongType())),
        ])
        m = nm.NameMapping.from_schema(schema)
        assert m.id_for("tags.element") == 2
        assert m.id_for("props.key") == 4
        assert m.id_for("props.value") == 5


class TestAddFiles:
    def test_import_foreign_parquet(self, spark, tmp_loc):
        """files written by a plain writer (no field IDs) import without
        rewrite and scan correctly by name."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from iceberg_cpp_spark import IceTable

        foreign = os.path.join(tmp_loc, "foreign.parquet")
        pq.write_table(pa.table({"id": [1, 2, 3], "data": ["a", "b", "c"]}), foreign)

        t = IceTable.create(spark, os.path.join(tmp_loc, "t"), _schema())
        t.add_files([foreign])
        df = t.to_df()
        assert df.count() == 3
        assert {r["data"] for r in df.collect()} == {"a", "b", "c"}
        # metrics came from the footer
        task = t.scan().plan_files()[0]
        assert task.record_count == 3
        # bounds present → pruning works on imported files
        from iceberg_cpp_spark.plans import expressions as ex

        assert t.scan(filter=ex.gt(ex.Reference("id"), 100)).plan_files() == []

    def test_import_struct_column(self, spark, tmp_loc):
        """ID-less file with a struct column: nested fields resolve
        through the name mapping, scan reads the struct, and footer
        bounds of struct LEAVES drive pruning."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import name_mapping as nm

        foreign = os.path.join(tmp_loc, "nested.parquet")
        pq.write_table(pa.table({
            "id": [1, 2],
            "addr": [{"zip": 94110, "city": "sf"},
                     {"zip": 10001, "city": "nyc"}],
        }), foreign)

        t = IceTable.create(spark, os.path.join(tmp_loc, "t"), _nested_schema())
        t.add_files([foreign])
        rows = {r["id"]: r["addr"] for r in t.to_df().collect()}
        assert rows[1]["city"] == "sf" and rows[2]["zip"] == 10001
        # the stored mapping resolves nested paths
        mapping = nm.NameMapping.from_json_string(
            t.properties()[nm.PROPERTY_KEY])
        assert mapping.id_for("addr.zip") == 3
        # nested leaf footer bounds were harvested → pruning on the
        # nested field works (and doesn't over-prune)
        from iceberg_cpp_spark.plans import expressions as ex

        assert t.scan(filter=ex.gt(ex.Reference("addr.zip"),
                                   999999)).plan_files() == []
        assert len(t.scan(filter=ex.gt(ex.Reference("addr.zip"),
                                       50000)).plan_files()) == 1

    def test_mixed_native_and_foreign(self, spark, tmp_loc):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from iceberg_cpp_spark import IceTable

        t = IceTable.create(spark, os.path.join(tmp_loc, "t"), _schema())
        native = spark.createDataFrame([(10, "n1"), (11, "n2")], "id long, data string")
        t.append(native)
        foreign = os.path.join(tmp_loc, "f.parquet")
        pq.write_table(pa.table({"id": [1], "data": ["f1"]}), foreign)
        t.add_files([foreign])
        assert t.to_df().count() == 3


class TestFormats:
    def test_registry_dispatch(self, spark, tmp_loc):
        from iceberg_cpp_spark.sources import formats

        df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, data string")
        for fmt in ("parquet", "json", "csv"):
            path = os.path.join(tmp_loc, fmt)
            formats.open_writer(fmt, df, path)
            back = formats.open_reader(fmt, spark, [path])
            assert back.count() == 2

    def test_unknown_format(self, spark):
        from iceberg_cpp_spark.sources import formats

        with pytest.raises(formats.UnknownFormatError):
            formats.open_reader("nope", spark, ["/tmp/x"])

    def test_custom_registration(self, spark, tmp_loc):
        from iceberg_cpp_spark.sources import formats

        calls = []
        formats.register_reader("fake", lambda s, p, sc: calls.append(p) or s.range(1))
        formats.open_reader("fake", spark, ["/p"])
        assert calls == [["/p"]]


class TestFileIO:
    def test_local_io(self, tmp_loc):
        from iceberg_cpp_spark.core.io import LocalFileIO

        io = LocalFileIO()
        p = os.path.join(tmp_loc, "sub", "x.bin")
        io.write_bytes(p, b"abc")
        assert io.read_bytes(p) == b"abc"
        assert io.exists(p)
        with pytest.raises(FileExistsError):
            io.write_bytes(p, b"other", exclusive=True)
        io.delete(p)
        assert not io.exists(p)


class TestTableMaintenance:
    def test_expire_snapshots(self, spark, lineitem, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "e"),
                            schema_from_spark(lineitem.schema))
        for i in range(3):
            t.append(lineitem.limit(5))
        assert len(t.snapshots()) == 3
        t.expire_snapshots(keep_last=1)
        assert len(t.snapshots()) == 1
        assert t.to_df().count() == 15  # current data untouched

    def test_ref_retention_policy(self, spark, lineitem, tmp_loc):
        """Spec snapshot-retention semantics (snapshot.h:64-118 models
        the fields; enforcement is ours): a branch's
        min-snapshots-to-keep retains its head's ancestors through an
        aggressive expire; max-snapshot-age-ms retains young ancestors
        beyond the min; a tag past max-ref-age-ms is removed and its
        snapshot becomes expirable; retention survives branch-head
        moves (commits must not reset policy)."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "rr"),
                            schema_from_spark(lineitem.schema))
        for _ in range(4):
            t = t.append(lineitem.limit(2))
        snaps = [s.snapshot_id for s in t.snapshots()]  # oldest..newest
        now = max(s.timestamp_ms for s in t.snapshots()) + 10_000

        # tag the oldest snapshot with a 1ms ref age: expired at `now`
        t = t.create_tag("old-tag", snaps[0], max_ref_age_ms=1)
        # branch at head keeping 3 ancestors regardless of age
        t = t.create_branch("audit", snaps[3], min_snapshots_to_keep=3)
        t = t.expire_snapshots(keep_last=1, now_ms=now)
        kept = {s.snapshot_id for s in t.snapshots()}
        assert "old-tag" not in t.metadata.refs, "stale tag must expire"
        assert snaps[0] not in kept, "tag gone -> its snapshot expirable"
        assert {snaps[1], snaps[2], snaps[3]} <= kept, (
            "min-snapshots-to-keep=3 retains the head's ancestor chain")

        # age-based ancestor retention: fresh branch keeping only 1 by
        # count but everything younger than a wide age window
        t2 = IceTable.create(spark, os.path.join(tmp_loc, "rr2"),
                             schema_from_spark(lineitem.schema))
        for _ in range(3):
            t2 = t2.append(lineitem.limit(2))
        s2 = [s.snapshot_id for s in t2.snapshots()]
        now2 = max(s.timestamp_ms for s in t2.snapshots()) + 10_000
        t2 = t2.create_branch("fresh", s2[2], min_snapshots_to_keep=1,
                              max_snapshot_age_ms=3_600_000)
        t2 = t2.expire_snapshots(keep_last=1, now_ms=now2)
        assert {s.snapshot_id for s in t2.snapshots()} == set(s2), (
            "max-snapshot-age-ms retains the whole young ancestor chain")

        # policy survives a branch-head move (append to the branch)
        t2 = t2.append(lineitem.limit(2), branch="fresh")
        r = t2.metadata.refs["fresh"]
        assert r.min_snapshots_to_keep == 1
        assert r.max_snapshot_age_ms == 3_600_000

    def test_ref_retention_defaults_unchanged(self, spark, lineitem,
                                              tmp_loc):
        """With no retention fields or history.expire.* properties the
        pre-retention contract holds exactly: ref heads + keep_last,
        nothing else retained, no refs removed."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "rd"),
                            schema_from_spark(lineitem.schema))
        for _ in range(3):
            t = t.append(lineitem.limit(2))
        snaps = [s.snapshot_id for s in t.snapshots()]
        t = t.create_tag("pin", snaps[0])
        t = t.expire_snapshots(keep_last=1)
        assert {s.snapshot_id for s in t.snapshots()} == {snaps[0], snaps[2]}
        assert "pin" in t.metadata.refs

    def test_expire_drops_stats_pointers(self, spark, lineitem, tmp_loc):
        """Expiring a snapshot removes its statistics AND
        partition-statistics pointers (spec: stats files belong to a
        snapshot; dangling pointers would break readers that follow
        them after the snapshot is gone)."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "es"),
                            schema_from_spark(lineitem.schema))
        t = t.append(lineitem.limit(5))
        t = t.compute_statistics()
        t = t.compute_partition_statistics()
        old = t.current_snapshot().snapshot_id
        assert t.metadata.statistics and t.metadata.partition_statistics
        t = t.append(lineitem.limit(5))
        t = t.compute_statistics()
        t = t.compute_partition_statistics()
        t = t.expire_snapshots(keep_last=1)
        assert [s.snapshot_id for s in t.snapshots()] != [old]
        assert all(s["snapshot-id"] != old for s in t.metadata.statistics)
        assert all(s["snapshot-id"] != old
                   for s in t.metadata.partition_statistics)
        # the surviving snapshot keeps its pointers
        cur = t.current_snapshot().snapshot_id
        assert any(s["snapshot-id"] == cur for s in t.metadata.statistics)
        assert any(s["snapshot-id"] == cur
                   for s in t.metadata.partition_statistics)

    def test_branch_and_tag(self, spark, lineitem, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "b"),
                            schema_from_spark(lineitem.schema))
        t.append(lineitem.limit(10))
        s1 = t.current_snapshot().snapshot_id
        t.create_tag("v1")
        t.create_branch("dev")
        t.append(lineitem.limit(5))  # main moves on
        assert t.scan().use_ref("v1").to_df().count() == 10
        assert t.scan().use_ref("dev").to_df().count() == 10
        assert t.to_df().count() == 15
        assert t.metadata.ref("v1").snapshot_id == s1
        t.remove_ref("dev")
        assert t.metadata.ref("dev") is None

    def test_update_properties(self, spark, lineitem, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "p"),
                            schema_from_spark(lineitem.schema))
        t.update_properties({"owner": "me"})
        assert t.properties()["owner"] == "me"
        t.update_properties(removals=["owner"])
        assert "owner" not in t.properties()

    def test_remove_orphan_files(self, spark, lineitem, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "o"),
                            schema_from_spark(lineitem.schema))
        t.append(lineitem.limit(20))
        orphan = os.path.join(t.location(), "data", "stray.parquet")
        with open(orphan, "wb") as f:
            f.write(b"junk")
        listed = t.remove_orphan_files(dry_run=True)
        assert listed == [orphan] and os.path.exists(orphan)
        removed = t.remove_orphan_files()
        assert removed == [orphan] and not os.path.exists(orphan)
        assert t.to_df().count() == 20  # live data untouched
        assert t.remove_orphan_files() == []

    def test_remove_orphan_files_distributed(self, spark, lineitem, tmp_loc):
        """Object-store-scale path (VERDICT r4 item 4): above the
        listing threshold, referenced-set build and directory walk run
        as Spark jobs (executors read manifests / walk prefixes) —
        forced here with threshold 0. Many orphans across nested dirs;
        live files untouched; results identical to the driver walk."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(
            spark, os.path.join(tmp_loc, "od"),
            schema_from_spark(lineitem.schema),
            properties={
                "engine.maintenance.distributed-listing-threshold": "0"})
        t.append(lineitem.limit(20))
        t.append(lineitem.limit(10))
        strays = []
        for d in range(6):
            sub = os.path.join(t.location(), "data", f"stray{d}")
            os.makedirs(sub)
            for i in range(50):
                p = os.path.join(sub, f"junk{i}.parquet")
                with open(p, "wb") as f:
                    f.write(b"x")
                strays.append(p)
        # hidden/underscore files are never treated as orphans
        with open(os.path.join(t.location(), "data", "_SUCCESS"), "w"):
            pass
        listed = t.remove_orphan_files(dry_run=True)
        assert listed == sorted(strays)
        # identical answer from the driver walk
        assert listed == t._list_orphans_driver(None)
        removed = t.remove_orphan_files()
        assert removed == sorted(strays)
        assert not any(os.path.exists(p) for p in strays)
        assert t.to_df().count() == 30
        assert t.remove_orphan_files() == []

    def test_wap_fast_forward(self, spark, lineitem, tmp_loc):
        """write-audit-publish: stage on a branch, publish by fast-forward."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "w"),
                            schema_from_spark(lineitem.schema))
        t.append(lineitem.limit(10))
        t.create_branch("audit")
        t.append(lineitem.limit(5), branch="audit")
        assert t.to_df().count() == 10              # main unchanged
        assert t.scan().use_ref("audit").to_df().count() == 15
        t.fast_forward("main", "audit")
        assert t.to_df().count() == 15              # published
        with pytest.raises(ValueError, match="no such ref"):
            t.fast_forward("main", "nope")
        # r15: fast_forward is now ancestry-VALIDATED — a diverged pair
        # refuses instead of silently dropping the target's commits
        t.create_branch("side")
        t.append(lineitem.limit(2), branch="side")
        t.append(lineitem.limit(1))  # main moves past the branch point
        with pytest.raises(ValueError, match="not an ancestor"):
            t.fast_forward("main", "side")

    def test_rollback_to_snapshot(self, spark, lineitem, tmp_loc):
        """rollback_to: main points back at an earlier snapshot; later
        snapshots stay reachable, so rolling forward again also works."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "rb"),
                            schema_from_spark(lineitem.schema))
        t.append(lineitem.limit(10))
        s1 = t.current_snapshot().snapshot_id
        t.append(lineitem.limit(5))
        s2 = t.current_snapshot().snapshot_id
        assert t.to_df().count() == 15
        t.rollback_to(s1)
        assert t.current_snapshot().snapshot_id == s1
        assert t.to_df().count() == 10
        # roll-forward is NOT a rollback (s2 is no ancestor of s1):
        with pytest.raises(ValueError, match="not an ancestor"):
            t.rollback_to(s2)
        t.set_current_snapshot(s2)  # the arbitrary-repoint primitive
        assert t.to_df().count() == 15
        with pytest.raises(ValueError, match="snapshot not found"):
            t.rollback_to(12345)
        # rollback refuses another branch's lineage too
        t.create_branch("side", snapshot_id=s1)
        t.append(lineitem.limit(2), branch="side")
        side_head = t.metadata.ref("side").snapshot_id
        with pytest.raises(ValueError, match="not an ancestor"):
            t.rollback_to(side_head)  # main must not adopt side's head

    def test_cherry_pick_from_audit_branch(self, spark, lineitem, tmp_loc):
        """cherry_pick: an append staged on an audit branch is re-applied
        onto a main that has MOVED ON since the branch point (the case
        fast_forward cannot publish); data files are referenced, not
        copied."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "cp"),
                            schema_from_spark(lineitem.schema))
        t.append(lineitem.limit(10))
        t.create_branch("audit")
        t.append(lineitem.limit(7), branch="audit")
        staged = t.metadata.ref("audit").snapshot_id
        base_paths = {task.file_path for task in t.scan().plan_files()}
        audit_paths = {task.file_path
                       for task in t.scan().use_ref("audit").plan_files()}
        t.append(lineitem.limit(3))  # main diverges — fast_forward would lose this
        assert t.to_df().count() == 13
        t.cherry_pick(staged)
        assert t.to_df().count() == 20
        # metadata-only: the staged snapshot's parquet files are reused
        main_paths = {task.file_path for task in t.scan().plan_files()}
        assert (audit_paths - base_paths) <= main_paths
        with pytest.raises(ValueError, match="snapshot not found"):
            t.cherry_pick(999)
        # double-publish guard: the publish has a NEW snapshot id, so the
        # source-snapshot-id summary stamp is what must catch a re-pick
        with pytest.raises(ValueError, match="already"):
            t.cherry_pick(staged)

    def test_cherry_pick_rejects_ancestor(self, spark, lineitem, tmp_loc):
        """Re-applying a snapshot already in the branch's ancestry would
        double-count its rows — must refuse."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "cpa"),
                            schema_from_spark(lineitem.schema))
        t.append(lineitem.limit(5))
        s1 = t.current_snapshot().snapshot_id
        t.append(lineitem.limit(3))
        with pytest.raises(ValueError, match="already an ancestor"):
            t.cherry_pick(s1)

    def test_cherry_pick_rejects_non_append(self, spark, lineitem, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        t = IceTable.create(spark, os.path.join(tmp_loc, "cpn"),
                            schema_from_spark(lineitem.schema))
        t.append(lineitem.limit(10))
        t.delete_where(ex.not_null(ex.Reference("l_orderkey")))
        sid = t.current_snapshot().snapshot_id
        with pytest.raises(ValueError, match="only append"):
            t.cherry_pick(sid)

    def test_rewrite_manifests(self, spark, lineitem, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import manifests as mf
        from iceberg_cpp_spark.core.types import schema_from_spark

        t = IceTable.create(spark, os.path.join(tmp_loc, "rm"),
                            schema_from_spark(lineitem.schema))
        for i in range(1, 5):
            t.append(lineitem.filter(F.col("l_linenumber") == i))
        n0 = t.to_df().count()
        before = len(mf.read_manifest_list(t.current_snapshot().manifest_list))
        old_snap = t.current_snapshot().snapshot_id
        t.rewrite_manifests()
        after = len(mf.read_manifest_list(t.current_snapshot().manifest_list))
        assert after < before
        assert t.to_df().count() == n0
        # data files untouched; old snapshot still scans
        assert t.scan(snapshot_id=old_snap).to_df().count() == n0
        assert t.current_snapshot().summary["operation"] == "replace"

    def test_rewrite_manifests_distributed_equals_driver(
            self, spark, lineitem, tmp_loc):
        """Past the distributed threshold the consolidation is authored
        in executors — the resulting entry set (every DataFile field,
        inherited snapshot/sequence numbers, partition values) must be
        IDENTICAL to the driver loop's, and deletes/time-travel must
        keep working."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import manifests as mf
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        schema = schema_from_spark(lineitem.schema)
        f = schema.find_field("l_linenumber")
        spec = PartitionSpec([PartitionField(f.field_id, 1000, "ln",
                                             tr.IdentityTransform())])

        t = IceTable.create(
            spark, os.path.join(tmp_loc, "rm_dist"), schema, spec=spec,
            properties={"engine.maintenance."
                        "rewrite-manifests-distributed-threshold": "0"})
        for i in range(1, 4):
            t = t.append(lineitem.filter(F.col("l_linenumber") == i))
        # a delete manifest + position deletes ride along too
        t = t.delete_where(ex.eq(ex.Reference("l_linenumber"), 2),
                           mode="merge-on-read")
        n0 = t.to_df().count()

        def entries(tt):
            out = []
            for m in mf.read_manifest_list(tt.current_snapshot().manifest_list):
                pspec = tt.metadata.spec_by_id(m.partition_spec_id)
                for e in mf.read_manifest(m.manifest_path, pspec,
                                          tt.schema(), manifest=m):
                    if not e.is_live:
                        continue
                    df = e.data_file
                    out.append((
                        df.file_path, df.content, df.file_format,
                        tuple(sorted(df.partition.items())),
                        df.record_count, e.snapshot_id,
                        e.sequence_number, df.first_row_id,
                        tuple(sorted(df.lower_bounds.items())),
                        tuple(sorted(df.upper_bounds.items())),
                        tuple(sorted(df.value_counts.items())),
                        tuple(sorted(df.null_value_counts.items()))))
            return sorted(out)

        before = entries(t)
        t = t.rewrite_manifests(entries_per_manifest=2)  # executor path
        # every DataFile field, the inherited snapshot ids and the
        # sequence numbers survive the executor re-authoring EXACTLY
        assert entries(t) == before
        assert all(e.status == mf.STATUS_EXISTING
                   for m in mf.read_manifest_list(
                       t.current_snapshot().manifest_list)
                   for e in mf.read_manifest(
                       m.manifest_path,
                       t.metadata.spec_by_id(m.partition_spec_id),
                       t.schema(), manifest=m))
        assert t.to_df().count() == n0
        # MoR deletes still apply after the distributed rewrite
        assert t.to_df().filter(F.col("l_linenumber") == 2).count() == 0
        # consolidation happened (data + delete groups) + pruning works
        assert len(mf.read_manifest_list(
            t.current_snapshot().manifest_list)) >= 2
        pruned = t.scan(filter=ex.eq(ex.Reference("l_linenumber"), 1))
        assert pruned.to_df().count() > 0
        assert (len(pruned.plan_files())
                < len(t.scan().plan_files()))

    def test_partitions_df(self, spark, lineitem, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.functions import transforms as tr

        schema = schema_from_spark(lineitem.schema)
        f = schema.find_field("l_linenumber")
        t = IceTable.create(
            spark, os.path.join(tmp_loc, "pd"), schema,
            spec=PartitionSpec([PartitionField(f.field_id, 1000, "ln",
                                               tr.IdentityTransform())]))
        t.append(lineitem)
        pdf = t.partitions_df()
        n_parts = lineitem.select("l_linenumber").distinct().count()
        assert pdf.count() == n_parts
        assert pdf.agg(F.sum("record_count")).first()[0] == lineitem.count()
        # the partition column is the TYPED struct (r13), matching the
        # per-value source counts exactly
        got = {r["partition"]["ln"]: r["record_count"]
               for r in pdf.collect()}
        want = {r["l_linenumber"]: r["n"] for r in
                lineitem.groupBy("l_linenumber")
                .agg(F.count("*").alias("n")).collect()}
        assert got == want


def _race_worker(args):
    """Spawn-process worker for TestMultiProcessCommitRace: N fake-file
    append commits against a shared table, relying ONLY on the atomic
    hard-link CAS + retry/rebase protocol (no coordination)."""
    loc, wid, n = args
    from iceberg_cpp_spark.core import manifests as mfs
    from iceberg_cpp_spark.table import DataOperation, IceTable

    t = IceTable.load(None, loc)
    for i in range(n):
        f = mfs.DataFile(
            content=mfs.CONTENT_DATA,
            file_path=f"/fake/w{wid}/f{i}.parquet",
            file_format="parquet", partition={},
            record_count=1, file_size_in_bytes=100)
        t = t._commit_files([f], operation=DataOperation.APPEND)
    return wid


class TestMultiProcessCommitRace:
    def test_concurrent_drivers_no_lost_snapshots(self, spark, tmp_loc):
        """VERDICT r09 task 8: TRUE multi-process commit race (three
        drivers, separate OS processes, same table) over the atomic
        hard-link CAS (core/io.py): every commit must land, the
        snapshot history must be one linear parent chain, and every
        committed data file must be live — no lost updates, no forked
        history. Runtime-capped via the pool timeout."""
        import multiprocessing as mp

        from iceberg_cpp_spark.core import manifests as mfs
        from iceberg_cpp_spark.table import IceTable

        schema = it.Schema([
            it.NestedField(1, "id", it.LongType(), required=True),
        ], schema_id=0)
        loc = os.path.join(tmp_loc, "mprace")
        IceTable.create(spark, loc, schema, properties={
            "commit.retry.num-retries": "200",
            "commit.retry.min-wait-ms": "1",
        })
        nproc, per = 3, 6
        ctx = mp.get_context("spawn")
        with ctx.Pool(nproc) as pool:
            res = pool.map_async(_race_worker,
                                 [(loc, w, per) for w in range(nproc)])
            assert sorted(res.get(timeout=300)) == list(range(nproc))

        t = IceTable.load(None, loc)
        assert len(t.snapshots()) == nproc * per
        # linear history: the parent chain from current covers EVERY
        # snapshot exactly once (no forks, no orphans)
        chain = []
        cur = t.current_snapshot()
        while cur is not None:
            chain.append(cur.snapshot_id)
            cur = (t.metadata.snapshot_by_id(cur.parent_snapshot_id)
                   if cur.parent_snapshot_id is not None else None)
        assert len(chain) == nproc * per
        assert set(chain) == {s.snapshot_id for s in t.snapshots()}
        # every committed file is live in the final snapshot
        live = set()
        snap = t.current_snapshot()
        for m in mfs.read_manifest_list(snap.manifest_list):
            spec = t.metadata.spec_by_id(m.partition_spec_id)
            for e in mfs.read_manifest(m.manifest_path, spec, t.schema(),
                                       manifest=m):
                if e.is_live:
                    live.add(e.data_file.file_path)
        assert live == {f"/fake/w{w}/f{i}.parquet"
                        for w in range(nproc) for i in range(per)}


class TestRebaseValidation:
    # module-level imports above don't carry these

    """Snapshot-isolation conflict checks on CAS retry (Iceberg's
    ValidationException): a stale handle whose rewrite races a
    concurrent commit must ABORT instead of silently rebasing into
    duplicated rows, resurrected rows, or lost deletes."""

    def _table(self, spark, loc, n=8, files=2):
        from iceberg_cpp_spark import IceTable

        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "v", it.LongType(), False),
        ])
        t = IceTable.create(spark, loc, sch,
                            properties={"format-version": "3"})
        df = spark.range(n).select(
            F.col("id"), (F.col("id") * 10).alias("v"))
        return t.append(df.repartition(files, "id"))

    def test_stale_delete_vs_concurrent_compaction_aborts(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.table import ValidationError

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc)
        stale = IceTable.load(spark, loc)
        t.rewrite_data_files(target_file_count=1)  # rewrites every file
        with pytest.raises(ValidationError, match="concurrent commit removed"):
            stale.delete_where(ex.eq(ex.Reference("id"), 1))
        # the conflict aborted cleanly: nothing was lost or duplicated
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().count() == 8
        assert fresh.to_df().filter(F.col("id") == 1).count() == 1

    def test_stale_rewrite_vs_concurrent_dv_delete_aborts(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.table import ValidationError

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc, files=1)
        stale = IceTable.load(spark, loc)
        t.delete_where(ex.eq(ex.Reference("id"), 3), mode="deletion-vector")
        with pytest.raises(ValidationError, match="lose those deletes"):
            stale.update_where(ex.eq(ex.Reference("id"), 5), {"v": 999})
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().count() == 7  # DV delete survived
        assert fresh.to_df().filter(F.col("id") == 3).count() == 0

    def test_stale_dv_delete_vs_concurrent_dv_delete_aborts(self, spark, tmp_loc):
        # two writers build DVs for the SAME data file from the same
        # base; each vector supersedes the file's DV state, so the loser
        # of the CAS must abort (rebasing would discard the winner's
        # delete bits), even though the loser saw NO prior DV at plan
        # time (drop_dv_for covers every touched file, not just replaced)
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.table import ValidationError

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc, files=1)
        stale = IceTable.load(spark, loc)
        t.delete_where(ex.eq(ex.Reference("id"), 3), mode="deletion-vector")
        with pytest.raises(ValidationError, match="lose those deletes"):
            stale.delete_where(ex.eq(ex.Reference("id"), 5),
                               mode="deletion-vector")
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().count() == 7  # winner's delete intact
        assert fresh.to_df().filter(F.col("id") == 3).count() == 0
        assert fresh.to_df().filter(F.col("id") == 5).count() == 1

    def test_stale_dv_delete_vs_concurrent_compaction_aborts(self, spark, tmp_loc):
        # the data file our DV targets was compacted away concurrently:
        # its rows live on in a new file our bitmap doesn't reference
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.table import ValidationError

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc, files=2)
        stale = IceTable.load(spark, loc)
        t.rewrite_data_files(target_file_count=1)
        with pytest.raises(ValidationError, match="concurrent commit removed"):
            stale.delete_where(ex.eq(ex.Reference("id"), 1),
                               mode="deletion-vector")
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().count() == 8  # nothing lost, nothing deleted

    def test_stale_rewrite_vs_disjoint_append_rebases(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc)
        stale = IceTable.load(spark, loc)
        t.append(t.spark.range(100, 104).select(
            F.col("id"), (F.col("id") * 10).alias("v")))
        # a concurrent APPEND of unrelated files is a safe rebase
        stale = stale.delete_where(ex.eq(ex.Reference("id"), 1))
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().count() == 8 - 1 + 4
        assert fresh.to_df().filter(F.col("id") == 1).count() == 0
        assert fresh.to_df().filter(F.col("id") == 101).count() == 1

    def test_stale_compaction_vs_any_commit_aborts(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.table import ValidationError

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc)
        stale = IceTable.load(spark, loc)
        t.append(t.spark.range(100, 102).select(
            F.col("id"), (F.col("id") * 10).alias("v")))
        with pytest.raises(ValidationError, match="erase"):
            stale.rewrite_data_files(target_file_count=1)
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().count() == 10  # append survived

    def test_merge_into_vs_concurrent_compaction_aborts(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.table import ValidationError

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc)
        stale = IceTable.load(spark, loc)
        t.rewrite_data_files(target_file_count=1)
        src = spark.range(2).select(F.col("id"), F.lit(777).alias("v"))
        with pytest.raises(ValidationError, match="concurrent commit removed"):
            stale.merge_into(src, on=["id"])
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().filter(F.col("v") == 777).count() == 0

    def test_stale_dv_fold_vs_concurrent_dv_rewrite_aborts(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.table import ValidationError

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc, files=1)
        t = t.delete_where(ex.eq(ex.Reference("id"), 2), mode="merge-on-read")
        stale = IceTable.load(spark, loc)
        # concurrent DV delete on the same data file the fold will
        # re-vector: folding from the stale read would drop that DV
        t.delete_where(ex.eq(ex.Reference("id"), 4), mode="deletion-vector")
        with pytest.raises(ValidationError, match="lose those deletes"):
            stale.rewrite_position_deletes()
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().count() == 6  # both deletes intact

    def test_stale_dv_fold_vs_disjoint_append_rebases(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc, files=1)
        t = t.delete_where(ex.eq(ex.Reference("id"), 2), mode="merge-on-read")
        stale = IceTable.load(spark, loc)
        t.append(t.spark.range(100, 103).select(
            F.col("id"), (F.col("id") * 10).alias("v")))
        # dropping the folded delete FILES must validate against all
        # live paths (not just data files) — this rebase is safe
        stale = stale.rewrite_position_deletes()
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().count() == 7 + 3
        assert fresh.to_df().filter(F.col("id") == 2).count() == 0


class TestCommitManifestMerge:
    """commit.manifest-merge.* (reference declares them with no write
    path): small carried manifests consolidate AT COMMIT once min-count
    accumulate, so planning cost tracks data size, not commit count."""

    def _table(self, spark, loc, props=None):
        from iceberg_cpp_spark import IceTable

        sch = it.Schema([it.NestedField(1, "id", it.LongType(), True)])
        return IceTable.create(spark, loc, sch, properties=props or {})

    def _manifests(self, t):
        import iceberg_cpp_spark.core.manifests as mf

        return list(mf.read_manifest_list(t.current_snapshot().manifest_list))

    def test_merges_past_min_count(self, spark, tmp_loc):
        from pyspark.sql import functions as F

        t = self._table(spark, f"{tmp_loc}/t",
                        {"commit.manifest.min-count-to-merge": "4"})
        for i in range(7):
            t = t.append(spark.range(i * 10, i * 10 + 10)
                         .select(F.col("id")).coalesce(1))
        assert len(self._manifests(t)) < 7
        assert t.to_df().count() == 70
        # every value still present exactly once
        assert t.to_df().distinct().count() == 70

    def test_default_threshold_means_no_merge_at_toy_scale(self, spark, tmp_loc):
        from pyspark.sql import functions as F

        t = self._table(spark, f"{tmp_loc}/t")
        for i in range(5):
            t = t.append(spark.range(i, i + 1).select(F.col("id"))
                         .coalesce(1))
        assert len(self._manifests(t)) == 5  # min-count 100 untouched

    def test_disabled_flag(self, spark, tmp_loc):
        from pyspark.sql import functions as F

        t = self._table(spark, f"{tmp_loc}/t",
                        {"commit.manifest-merge.enabled": "false",
                         "commit.manifest.min-count-to-merge": "2"})
        for i in range(5):
            t = t.append(spark.range(i, i + 1).select(F.col("id"))
                         .coalesce(1))
        assert len(self._manifests(t)) == 5

    def test_merge_preserves_row_lineage_and_time_travel(self, spark, tmp_loc):
        from pyspark.sql import functions as F

        t = self._table(spark, f"{tmp_loc}/t",
                        {"commit.manifest.min-count-to-merge": "3",
                         "format-version": "3"})
        snaps = []
        for i in range(6):
            t = t.append(spark.range(i * 5, i * 5 + 5)
                         .select(F.col("id")).coalesce(1))
            snaps.append(t.current_snapshot().snapshot_id)
        # _row_id assignment survives merging (EXISTING entries keep
        # their first_row_id through consolidation)
        ids = sorted(r["_row_id"] for r in
                     t.scan().with_metadata_columns().to_df()
                     .select("_row_id").collect())
        assert ids == list(range(30))
        # time travel to a pre-merge snapshot still reads its own list
        early = t.scan(snapshot_id=snaps[1]).to_df()
        assert early.count() == 10

    def test_merge_keeps_delete_manifests_applied(self, spark, tmp_loc):
        from pyspark.sql import functions as F

        from iceberg_cpp_spark.plans import expressions as ex

        t = self._table(spark, f"{tmp_loc}/t",
                        {"commit.manifest.min-count-to-merge": "3"})
        for i in range(4):
            t = t.append(spark.range(i * 5, i * 5 + 5)
                         .select(F.col("id")).coalesce(1))
        t = t.delete_where(ex.lt(ex.Reference("id"), 3),
                           mode="merge-on-read")
        for i in range(4, 8):
            t = t.append(spark.range(i * 5, i * 5 + 5)
                         .select(F.col("id")).coalesce(1))
        assert t.to_df().count() == 40 - 3
        assert t.to_df().filter("id < 3").count() == 0


class TestWriteAuditPublish:
    """write.wap.enabled (declared by the reference with no write path):
    staged commits land in metadata without advancing the branch ref;
    publish_wap cherry-picks them after the audit."""

    def _table(self, spark, loc):
        from iceberg_cpp_spark import IceTable

        sch = it.Schema([it.NestedField(1, "id", it.LongType(), True)])
        t = IceTable.create(spark, loc, sch,
                            properties={"write.wap.enabled": "true"})
        return t.append(spark.range(5).select("id").coalesce(1))

    def test_stage_audit_publish(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable

        t = self._table(spark, f"{tmp_loc}/t")
        t = t.append(spark.range(100, 103).select("id").coalesce(1),
                     wap_id="audit-1")
        assert t.to_df().count() == 5          # staged rows invisible
        staged = t.wap_snapshot("audit-1")
        assert staged is not None
        # the AUDIT reads the staged snapshot directly
        audit = t.scan(snapshot_id=staged.snapshot_id).to_df()
        assert audit.count() == 8
        t = t.publish_wap("audit-1")
        assert t.to_df().count() == 8
        # a fresh reader sees the published state
        assert IceTable.load(spark, f"{tmp_loc}/t").to_df().count() == 8

    def test_double_publish_and_dup_wap_refused(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t")
        t = t.append(spark.range(10, 12).select("id").coalesce(1),
                     wap_id="w1")
        t = t.publish_wap("w1")
        with pytest.raises(ValueError, match="already"):
            t.publish_wap("w1")
        with pytest.raises(ValueError, match="already staged or published"):
            t.append(t.spark.range(1).select("id"), wap_id="w1")
        with pytest.raises(ValueError, match="no staged snapshot"):
            t.publish_wap("never-staged")

    def test_non_string_wap_id_hits_duplicate_guard(self, spark, tmp_loc):
        # summaries store str(wap_id); an int id must not bypass the
        # duplicate-stage guard via a str-vs-int comparison mismatch
        t = self._table(spark, f"{tmp_loc}/t")
        t = t.append(spark.range(10, 12).select("id").coalesce(1),
                     wap_id=7)
        with pytest.raises(ValueError, match="already staged or published"):
            t.append(t.spark.range(1).select("id"), wap_id=7)
        with pytest.raises(ValueError, match="already staged or published"):
            t.append(t.spark.range(1).select("id"), wap_id="7")
        t = t.publish_wap(7)
        assert t.to_df().count() == 7

    def test_wap_requires_property(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable

        sch = it.Schema([it.NestedField(1, "id", it.LongType(), True)])
        t = IceTable.create(spark, f"{tmp_loc}/plain", sch)
        with pytest.raises(ValueError, match="write.wap.enabled"):
            t.append(spark.range(1).select("id"), wap_id="x")

    def test_concurrent_commits_dont_see_staged(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t")
        t = t.append(spark.range(100, 105).select("id").coalesce(1),
                     wap_id="w2")
        # a normal append AFTER staging: branch advances past the staged
        # snapshot's parent; publish still lands the staged files on top
        t = t.append(spark.range(200, 202).select("id").coalesce(1))
        assert t.to_df().count() == 7
        t = t.publish_wap("w2")
        assert t.to_df().count() == 12


class TestPartitionSummaries:
    def test_changed_partition_count_and_limit(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)

        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "cat", it.StringType(), False),
        ])
        spec = PartitionSpec([PartitionField(2, 1000, "cat", tr.IDENTITY)],
                             spec_id=0)
        t = IceTable.create(spark, f"{tmp_loc}/t", sch, spec=spec,
                            properties={"write.summary.partition-limit": "4"})
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "id long, cat string")
        t = t.append(df)
        summ = t.current_snapshot().summary
        assert summ["changed-partition-count"] == "2"
        assert "partitions.cat=a" in summ and "partitions.cat=b" in summ
        assert "added-records=2" in summ["partitions.cat=a"]
        # over the limit: count only, no per-partition rows
        t2 = IceTable.create(
            spark, f"{tmp_loc}/t2", sch, spec=spec,
            properties={"write.summary.partition-limit": "1"})
        t2 = t2.append(df)
        s2 = t2.current_snapshot().summary
        assert s2["changed-partition-count"] == "2"
        assert not any(k.startswith("partitions.") for k in s2)


class TestGcEnabled:
    def test_gc_disabled_fences_maintenance(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable

        sch = it.Schema([it.NestedField(1, "id", it.LongType(), True)])
        t = IceTable.create(spark, f"{tmp_loc}/t", sch,
                            properties={"gc.enabled": "false"})
        t = t.append(spark.range(3).select("id"))
        with pytest.raises(ValueError, match="gc.enabled"):
            t.expire_snapshots(keep_last=1)
        with pytest.raises(ValueError, match="gc.enabled"):
            t.remove_orphan_files(older_than_ms=0)
        # re-enable -> works again
        t = t.update_properties({"gc.enabled": "true"})
        t.expire_snapshots(keep_last=1)


class TestAddFilesDistributed:
    """add_files scale path (r12): past ADD_FILES_DISTRIBUTED_THRESHOLD
    the format sniff + mapping validation + footer harvest run in
    executors; results must be IDENTICAL to the driver loop."""

    def _mk_files(self, tmp_loc, n=6):
        import pyarrow as pa
        import pyarrow.parquet as pq

        paths = []
        for i in range(n):
            p = os.path.join(tmp_loc, f"f{i}.parquet")
            pq.write_table(pa.table({
                "id": [i * 10 + 1, i * 10 + 2],
                "data": [f"a{i}", f"b{i}"]}), p)
            paths.append(p)
        return paths

    def test_distributed_equals_driver(self, spark, tmp_loc, monkeypatch):
        import iceberg_cpp_spark.table as tbl
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex

        paths = self._mk_files(tmp_loc)
        t1 = IceTable.create(spark, os.path.join(tmp_loc, "t1"), _schema())
        t1 = t1.add_files(paths)                      # driver loop
        monkeypatch.setattr(tbl, "ADD_FILES_DISTRIBUTED_THRESHOLD", 2)
        t2 = IceTable.create(spark, os.path.join(tmp_loc, "t2"), _schema())
        t2 = t2.add_files(paths)                      # executor path
        def entries(t):
            import iceberg_cpp_spark.core.manifests as mf

            out = set()
            for m in mf.read_manifest_list(
                    t.current_snapshot().manifest_list):
                for e in mf.read_manifest(m.manifest_path,
                                          t.metadata.spec(), t.schema(),
                                          manifest=m):
                    f = e.data_file
                    out.add((os.path.basename(f.file_path),
                             f.file_format, f.record_count,
                             tuple(sorted(f.lower_bounds.items())),
                             tuple(sorted(f.upper_bounds.items())),
                             tuple(sorted(f.null_value_counts.items()))))
            return out

        assert entries(t1) == entries(t2)
        assert t2.to_df().count() == 12
        # bounds drive pruning identically
        assert len(t2.scan(filter=ex.lt(ex.Reference("id"), 10))
                   .plan_files()) == 1
        # name mapping installed on both
        assert t2.properties().get("engine.read.name-based") == "true"

    def test_distributed_mapping_error_is_loud(self, spark, tmp_loc,
                                               monkeypatch):
        import pyarrow as pa
        import pyarrow.parquet as pq

        import iceberg_cpp_spark.table as tbl
        from iceberg_cpp_spark import IceTable

        paths = self._mk_files(tmp_loc, n=3)
        bad = os.path.join(tmp_loc, "unmappable.parquet")
        pq.write_table(pa.table({"zz": [1]}), bad)
        monkeypatch.setattr(tbl, "ADD_FILES_DISTRIBUTED_THRESHOLD", 2)
        t = IceTable.create(spark, os.path.join(tmp_loc, "t"), _schema())
        with pytest.raises(ValueError, match="unmappable"):
            t.add_files(paths + [bad])

    def test_distributed_error_and_order_match_driver(self, spark, tmp_loc,
                                                      monkeypatch):
        """The distributed harvest collects in partition-arbitrary
        order; the commit must still (a) raise the error of the FIRST
        bad path in INPUT order and (b) register DataFiles in caller
        path order — both exactly like the driver loop."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import iceberg_cpp_spark.core.manifests as mf
        import iceberg_cpp_spark.table as tbl
        from iceberg_cpp_spark import IceTable

        monkeypatch.setattr(tbl, "ADD_FILES_DISTRIBUTED_THRESHOLD", 2)
        paths = self._mk_files(tmp_loc, n=4)
        bad1 = os.path.join(tmp_loc, "zz_first_bad.parquet")
        bad2 = os.path.join(tmp_loc, "aa_second_bad.parquet")
        for b in (bad1, bad2):
            pq.write_table(pa.table({"zz": [1]}), b)
        t = IceTable.create(spark, os.path.join(tmp_loc, "t"), _schema())
        # bad1 comes FIRST in input order though bad2 sorts first
        with pytest.raises(ValueError, match="zz_first_bad"):
            t.add_files([paths[0], bad1, paths[1], bad2])
        # caller order ≠ sorted order: committed entries keep caller order
        unsorted = [paths[2], paths[0], paths[3], paths[1]]
        t = t.add_files(unsorted)
        entries = []
        for m in mf.read_manifest_list(t.current_snapshot().manifest_list):
            for e in mf.read_manifest(m.manifest_path, t.metadata.spec(),
                                      t.schema(), manifest=m):
                entries.append(e.data_file.file_path)
        assert entries == unsorted

    def test_cow_dml_over_imported_files(self, spark, tmp_loc):
        """r13 regression: copy-on-write DELETE/MERGE over field-ID-less
        imported files must resolve the rewrite READ by name (the same
        rule as the scan plane) instead of demanding parquet field ids."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex

        paths = self._mk_files(tmp_loc, n=3)  # ids i*10+1, i*10+2
        t = IceTable.create(spark, os.path.join(tmp_loc, "t"), _schema())
        t = t.add_files(paths)
        t = t.delete_where(ex.lt(ex.Reference("id"), 10))
        assert {r["id"] for r in t.to_df().collect()} == {11, 12, 21, 22}
        src = spark.createDataFrame([(11, "upd"), (99, "new")],
                                    "id long, data string")
        t = t.merge_into(src, on=["id"])
        got = {r["id"]: r["data"] for r in t.to_df().collect()}
        assert got[11] == "upd" and got[99] == "new" and len(got) == 5

    def test_distributed_mixed_formats(self, spark, tmp_loc, monkeypatch):
        import pyarrow as pa
        import pyarrow.orc as po

        import iceberg_cpp_spark.table as tbl
        from iceberg_cpp_spark import IceTable

        paths = self._mk_files(tmp_loc, n=3)
        orcp = os.path.join(tmp_loc, "x.orc")
        po.write_table(pa.table({"id": [900, 901],
                                 "data": ["q", "r"]}), orcp)
        monkeypatch.setattr(tbl, "ADD_FILES_DISTRIBUTED_THRESHOLD", 2)
        t = IceTable.create(spark, os.path.join(tmp_loc, "t"), _schema())
        t = t.add_files(paths + [orcp])
        files = list(t.scan().plan_files())
        assert {x.file_format for x in files} == {"parquet", "orc"}
        assert t.to_df().count() == 8
        # the ORC import carries bounds too (r12 footer reader)
        from iceberg_cpp_spark.plans import expressions as ex

        pruned = t.scan(filter=ex.gt_eq(ex.Reference("id"), 900))
        assert len(list(pruned.plan_files())) == 1
        assert pruned.to_df().count() == 2


class TestRebaseValidationDistributed:
    """r14: past the carry-filter threshold the SAME conflict checks
    run as executor jobs (_validate_rebase_distributed) — no driver
    live-set at 10^6 files. Forced on here (threshold 1): identical
    ValidationError messages, identical safe-rebase outcomes."""

    def _table(self, spark, loc, n=8, files=2):
        from iceberg_cpp_spark import IceTable

        sch = it.Schema([
            it.NestedField(1, "id", it.LongType(), True),
            it.NestedField(2, "v", it.LongType(), False),
        ])
        t = IceTable.create(spark, loc, sch, properties={
            "format-version": "3",
            "engine.commit.carry-filter-distributed-threshold": "1"})
        df = spark.range(n).select(
            F.col("id"), (F.col("id") * 10).alias("v"))
        return t.append(df.repartition(files, "id"))

    def test_delete_vs_compaction_aborts(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.table import ValidationError

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc)
        stale = IceTable.load(spark, loc)
        t.rewrite_data_files(target_file_count=1)
        with pytest.raises(ValidationError,
                           match="concurrent commit removed"):
            stale.delete_where(ex.eq(ex.Reference("id"), 1))
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().count() == 8

    def test_rewrite_vs_new_dv_aborts(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.table import ValidationError

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc, files=1)
        stale = IceTable.load(spark, loc)
        t.delete_where(ex.eq(ex.Reference("id"), 3),
                       mode="deletion-vector")
        with pytest.raises(ValidationError, match="lose those deletes"):
            stale.update_where(ex.eq(ex.Reference("id"), 5), {"v": 999})
        fresh = IceTable.load(spark, loc)
        assert fresh.to_df().count() == 7
        assert fresh.to_df().filter(F.col("id") == 3).count() == 0

    def test_disjoint_append_rebases(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex

        loc = f"{tmp_loc}/t"
        t = self._table(spark, loc)
        stale = IceTable.load(spark, loc)
        t.append(spark.range(100, 103).select(
            F.col("id"), (F.col("id") * 10).alias("v")))
        out = stale.delete_where(ex.eq(ex.Reference("id"), 1))
        assert sorted(r["id"] for r in out.to_df().collect()) == [
            0, 2, 3, 4, 5, 6, 7, 100, 101, 102]


class TestTypePromotion:
    """r15: update_column_type — Iceberg promotion lattice, metadata
    only. The hazard pins: OLD manifests keep write-time bound
    encodings (4-byte int bounds under a now-long column decode by
    LENGTH in literals.from_bytes), partition-source promotion keeps
    pruning, and pre-promotion equality deletes keep applying."""

    def test_old_bounds_decode_and_prune(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex

        sch = it.Schema([it.NestedField(1, "k", it.IntegerType(), False)])
        t = IceTable.create(spark, f"{tmp_loc}/t", sch)
        t.append(spark.createDataFrame([(1,), (2,)], "k int")
                 .repartition(1))
        t.append(spark.createDataFrame([(100,), (200,)], "k int")
                 .repartition(1))
        t = t.update_column_type("k", it.LongType())
        scan = t.scan(filter=ex.lt(ex.Reference("k"), 10))
        # metrics pruning still works on the 4-byte pre-promotion bounds
        assert len(scan.plan_files()) == 1
        assert sorted(r["k"] for r in scan.to_df().collect()) == [1, 2]
        # float→double bounds likewise
        sch2 = it.Schema([it.NestedField(1, "f", it.FloatType(), False)])
        t2 = IceTable.create(spark, f"{tmp_loc}/t2", sch2)
        t2.append(spark.createDataFrame([(1.5,)], "f float"))
        t2 = t2.update_column_type("f", it.DoubleType())
        assert t2.scan(filter=ex.gt(ex.Reference("f"), 1.0)) \
            .to_df().count() == 1

    def test_partition_source_promotion_prunes(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex

        sch = it.Schema([it.NestedField(1, "k", it.IntegerType(), False),
                         it.NestedField(2, "v", it.StringType(), False)])
        spec = PartitionSpec([PartitionField(1, 1000, "k",
                                             tr.IdentityTransform())])
        t = IceTable.create(spark, f"{tmp_loc}/tp", sch, spec=spec)
        t.append(spark.createDataFrame([(1, "a"), (2, "b")],
                                       "k int, v string"))
        t = t.update_column_type("k", it.LongType())
        t = t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
        scan = t.scan(filter=ex.gt(ex.Reference("k"), 1))
        assert sorted(r["k"] for r in scan.to_df().collect()) == [2, 3]
        # partition pruning dropped the k=1 file (old-spec encoding)
        assert len(scan.plan_files()) == 2

    def test_eq_deletes_survive_promotion(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable

        sch = it.Schema([it.NestedField(1, "k", it.IntegerType(), False),
                         it.NestedField(2, "v", it.StringType(), False)])
        t = IceTable.create(spark, f"{tmp_loc}/te", sch)
        t.append(spark.createDataFrame([(1, "a"), (2, "b")],
                                       "k int, v string"))
        t = t.delete_by_keys(spark.createDataFrame([(1,)], "k int"))
        t = t.update_column_type("k", it.LongType())
        assert sorted(r["k"] for r in t.to_df().collect()) == [2]

    def test_promotion_guards(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable

        sch = it.Schema([it.NestedField(1, "k", it.LongType(), False),
                         it.NestedField(2, "d", it.DecimalType(10, 2),
                                        False)])
        t = IceTable.create(spark, f"{tmp_loc}/tg", sch)
        with pytest.raises(ValueError, match="invalid type promotion"):
            t.update_column_type("k", it.IntegerType())
        with pytest.raises(ValueError, match="invalid type promotion"):
            t.update_column_type("d", it.DecimalType(12, 3))  # scale change
        with pytest.raises(ValueError, match="invalid type promotion"):
            t.update_column_type("d", it.DecimalType(8, 2))  # narrowing
        t2 = t.update_column_type("d", it.DecimalType(20, 2))
        assert t2.schema().find_field("d").field_type.precision == 20

    @pytest.mark.parametrize("fmt", ["avro", "orc"])
    def test_promotion_across_python_decode_legs(self, spark, tmp_loc, fmt):
        """Avro/ORC data files decode in Python executors (by-id
        projection) — int files under a promoted long schema must
        widen there too, not just on the parquet JVM leg."""
        from iceberg_cpp_spark import IceTable

        sch = it.Schema([it.NestedField(1, "k", it.IntegerType(), False)])
        t = IceTable.create(spark, f"{tmp_loc}/{fmt}", sch,
                            properties={"write.format.default": fmt})
        t.append(spark.createDataFrame([(1,), (2,)], "k int"))
        t = t.update_column_type("k", it.LongType())
        assert t.to_df().schema.simpleString() == "struct<k:bigint>"
        assert sorted(r["k"] for r in t.to_df().collect()) == [1, 2]
