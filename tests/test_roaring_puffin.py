"""Deletion vectors: roaring bitmap serde, puffin container, and the
table-level DV delete path (reference groundwork: util/roaring.h,
test/roaring_test.cc; v3 spec deletion-vector-v1 blobs)."""

import os
import struct

import numpy as np
import pytest

from iceberg_cpp_spark.core import puffin
from iceberg_cpp_spark.core.roaring import (
    ARRAY_MAX, SERIAL_COOKIE_RUN, Roaring64, _parse32, _serialize32)


class TestRoaring:
    def test_roundtrip_shapes(self):
        rs = np.random.RandomState(7)
        cases = [
            np.array([], dtype=np.uint64),
            np.array([0, 1, 65535, 65536, 2**32 - 1, 2**32, 2**40 + 5],
                     dtype=np.uint64),
            rs.randint(0, 2**20, 10000).astype(np.uint64),   # bitset containers
            np.arange(100000, 101000, dtype=np.uint64),      # contiguous
            rs.randint(0, 2**63, 5000).astype(np.uint64),    # sparse 64-bit
        ]
        for vals in cases:
            rb = Roaring64.from_array(vals)
            back = Roaring64.deserialize(rb.serialize())
            assert rb == back
            assert np.array_equal(back.to_array(), np.sort(np.unique(vals)))

    def test_container_encoding_boundary(self):
        # exactly ARRAY_MAX stays an array; one more becomes a bitset
        # (both serialize to 8192 container bytes at the boundary — the
        # header cardinality decides the decode path)
        for n in (ARRAY_MAX, ARRAY_MAX + 1):
            rb = Roaring64.from_array(np.arange(n, dtype=np.uint64))
            back = Roaring64.deserialize(rb.serialize())
            assert back == rb and back.cardinality == n

    def test_union_and_membership(self):
        a = Roaring64.from_array(np.array([1, 5, 9], dtype=np.uint64))
        b = Roaring64.from_array(np.array([5, 7], dtype=np.uint64))
        u = a.union(b)
        assert u.to_array().tolist() == [1, 5, 7, 9]
        assert u.cardinality == 4
        got = u.contains_many(np.array([1, 2, 7], dtype=np.uint64))
        assert got.tolist() == [True, False, True]

    def test_parse_run_container(self):
        # hand-build a RUN-cookie serialization: {key 0: runs [3..6],[10..10]}
        n = 1
        buf = struct.pack("<I", SERIAL_COOKIE_RUN | ((n - 1) << 16))
        buf += bytes([0b1])                       # run flag for container 0
        buf += struct.pack("<HH", 0, 5 - 1)       # key, cardinality-1
        buf += struct.pack("<H", 2)               # n_runs (< offset threshold)
        buf += struct.pack("<HH", 3, 3)           # [3, 3+3]
        buf += struct.pack("<HH", 10, 0)          # [10]
        containers, _ = _parse32(buf, 0)
        assert containers[0].tolist() == [3, 4, 5, 6, 10]

    def test_serialize32_offsets_are_correct(self):
        c = {0: np.array([1, 2], dtype=np.uint16),
             7: np.array([9], dtype=np.uint16)}
        buf = _serialize32(c)
        (off0,) = struct.unpack_from("<I", buf, 8 + 8)
        (off1,) = struct.unpack_from("<I", buf, 8 + 8 + 4)
        assert np.frombuffer(buf, "<u2", 2, off0).tolist() == [1, 2]
        assert np.frombuffer(buf, "<u2", 1, off1).tolist() == [9]


class TestPuffin:
    def test_roundtrip(self, tmp_loc):
        a = Roaring64.from_array(np.array([0, 3, 2**33], dtype=np.uint64))
        b = Roaring64.from_array(np.arange(5000, dtype=np.uint64))
        p = os.path.join(tmp_loc, "dv.puffin")
        metas = puffin.write_deletion_vectors(
            p, {"/d/a.parquet": a, "/d/b.parquet": b},
            snapshot_id=42, sequence_number=7)
        blobs, _props = puffin.read_puffin_metadata(p)
        assert [bm.type for bm in blobs] == [puffin.DELETION_VECTOR_V1] * 2
        assert blobs[0].snapshot_id == 42 and blobs[0].sequence_number == 7
        got = puffin.parse_dv_blob(puffin.read_blob(p, metas["/d/a.parquet"]))
        assert got == a
        assert metas["/d/b.parquet"].properties["cardinality"] == "5000"

    def test_dv_blob_crc_guard(self):
        blob = bytearray(puffin.dv_blob_bytes(
            Roaring64.from_array(np.array([1], dtype=np.uint64))))
        blob[-1] ^= 0xFF
        with pytest.raises(ValueError, match="crc"):
            puffin.parse_dv_blob(bytes(blob))

    def test_magic_guard(self, tmp_loc):
        p = os.path.join(tmp_loc, "not.puffin")
        with open(p, "wb") as f:
            f.write(b"nope")
        with pytest.raises(ValueError, match="puffin"):
            puffin.read_puffin_metadata(p)


class TestDeletionVectorTable:
    def test_dv_delete_merge_and_cow(self, spark, tmp_loc, lineitem):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(600)
        t = IceTable.create(spark, os.path.join(tmp_loc, "t"),
                            schema_from_spark(li.schema))
        t.append(li)
        t = t.delete_where(ex.gt(ex.Reference("l_quantity"), 40.0),
                           mode="deletion-vector")
        assert t.to_df().count() == li.filter("l_quantity <= 40").count()

        # second DV merges into (replaces) the first — one live DV per file
        t = t.delete_where(ex.lt_eq(ex.Reference("l_quantity"), 5.0),
                           mode="deletion-vector")
        expect = li.filter("l_quantity <= 40 and l_quantity > 5").count()
        assert t.to_df().count() == expect
        dvs = [d for d in t.scan().plan_deletes() if d.is_deletion_vector]
        refs = [d.referenced_data_file for d in dvs]
        assert len(refs) == len(set(refs)) > 0
        assert all(d.content_offset is not None and d.content_size_in_bytes
                   for d in dvs)

        # copy-on-write rewrite applies the DVs and retires them
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "A"))
        expect = li.filter(
            "l_quantity <= 40 and l_quantity > 5 and l_returnflag <> 'A'").count()
        assert t.to_df().count() == expect
        assert not [d for d in t.scan().plan_deletes() if d.is_deletion_vector]

    def test_dv_applied_by_datasource(self, spark, tmp_loc, lineitem):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.sources.spark_datasource import IcebergCppDataSource

        spark.dataSource.register(IcebergCppDataSource)
        li = lineitem.limit(400)
        loc = os.path.join(tmp_loc, "tds")
        t = IceTable.create(spark, loc, schema_from_spark(li.schema))
        t.append(li)
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="deletion-vector")
        df = spark.read.format("icecpp").load(loc)
        assert df.count() == li.filter("l_returnflag <> 'R'").count()
        assert df.filter("l_returnflag = 'R'").count() == 0

    def test_dv_changelog_deltas(self, spark, tmp_loc, lineitem):
        """Each DV commit's change rows are the NEW positions only —
        a rewritten (merged) vector must not re-report old deletes."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.streaming.changelog import changes

        li = lineitem.limit(400)
        t = IceTable.create(spark, os.path.join(tmp_loc, "tcl"),
                            schema_from_spark(li.schema))
        t.append(li)
        s1 = t.current_snapshot().snapshot_id
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="deletion-vector")
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "A"),
                           mode="deletion-vector")
        c = changes(t, from_snapshot_id=s1)
        assert c.filter("_change_type = 'insert'").count() == 0
        dels = c.filter("_change_type = 'delete'")
        n_r = li.filter("l_returnflag = 'R'").count()
        n_a = li.filter("l_returnflag = 'A'").count()
        got = {r["_change_ordinal"]: r["n"] for r in
               dels.groupBy("_change_ordinal")
               .agg(__import__("pyspark.sql.functions", fromlist=["count"])
                    .count("*").alias("n")).collect()}
        assert got == {0: n_r, 1: n_a}

    def test_rewrite_position_deletes_to_dvs(self, spark, tmp_loc, lineitem):
        """Parquet position-delete files + an existing DV fold into one
        merged vector per data file; rows unchanged; the conversion
        commit is invisible to the changelog (no logical change)."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.streaming.changelog import changes

        li = lineitem.limit(500)
        t = IceTable.create(spark, os.path.join(tmp_loc, "trw"),
                            schema_from_spark(li.schema))
        t.append(li)
        t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                       mode="merge-on-read")
        t.delete_where(ex.gt(ex.Reference("l_quantity"), 45.0),
                       mode="merge-on-read")
        t = t.delete_where(ex.lt(ex.Reference("l_quantity"), 2.0),
                           mode="deletion-vector")
        before = t.to_df().count()
        s_before = t.current_snapshot().snapshot_id
        t = t.rewrite_position_deletes()
        assert t.to_df().count() == before
        dels = t.scan().plan_deletes()
        assert all(d.is_deletion_vector for d in dels)
        refs = [d.referenced_data_file for d in dels]
        assert len(refs) == len(set(refs))
        c = changes(t, from_snapshot_id=s_before)
        assert c.count() == 0

    def test_dv_paths_read_no_blobs_on_driver(self, spark, tmp_loc,
                                              lineitem, monkeypatch):
        """100 TB guard (VERDICT r07 item 2, sharpened r17): the driver
        may decode DV blobs ONLY on the scan's join plane, where total
        DV cardinality is under ``engine.read.dv-join-max-positions`` —
        there the exploded (file, pos) rows are driver-collected for
        the broadcast anyway, so a cap-bounded driver blob read moves
        strictly fewer bytes than the pre-r17 executor explode +
        collect did (and saves one Spark job per scan).  Everything
        unbounded stays executor-side: the over-cap PROBE plane, the
        merging vector delete, and the maintenance fold must never
        read a blob on the driver.  Monkeypatching ``puffin.read_blob``
        in this (driver) process counts driver-side calls only;
        executor python workers are separate processes and keep the
        real function, so results stay correct either way."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import puffin
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(500)
        t = IceTable.create(spark, os.path.join(tmp_loc, "tnodrv"),
                            schema_from_spark(li.schema))
        t.append(li)
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="deletion-vector")
        t.delete_where(ex.gt(ex.Reference("l_quantity"), 45.0),
                       mode="merge-on-read")
        t = IceTable.load(spark, t.location())

        calls = []
        real = puffin.read_blob
        monkeypatch.setattr(puffin, "read_blob",
                            lambda *a, **k: calls.append(a) or real(*a, **k))
        # the driver-side decode memo would hide reads behind earlier
        # tests' entries — clear it so the bound below is exact
        puffin._decode_dv_pointer_cached.cache_clear()

        # join plane (under the cap): driver reads allowed, but ONLY
        # the pointer-listed blobs of this table's live DVs
        expect = li.filter("l_returnflag <> 'R' and l_quantity <= 45").count()
        assert t.to_df().count() == expect
        live_ptrs = {d.file_path for d in t.scan().plan_deletes()
                     if d.is_deletion_vector}
        assert {c[0] for c in calls} <= live_ptrs, (
            f"driver read blobs outside the live DV pointer set: {calls}")

        # probe plane (cap forced to 0): pointers broadcast, blobs
        # decoded per-executor — zero driver reads
        t_probe = t.update_properties(
            {"engine.read.dv-join-max-positions": "0"})
        puffin._decode_dv_pointer_cached.cache_clear()
        calls.clear()
        assert t_probe.to_df().count() == expect
        assert calls == [], f"probe-plane driver DV blob reads: {calls}"

        # merging vector delete (folds the old DV executor-side) and
        # the maintenance fold: still zero driver blob reads
        calls.clear()
        t = t.delete_where(ex.lt(ex.Reference("l_quantity"), 2.0),
                           mode="deletion-vector")
        t = t.rewrite_position_deletes()
        assert calls == [], f"driver-side DV blob reads: {calls}"
        expect = li.filter("l_returnflag <> 'R' and l_quantity <= 45 "
                           "and l_quantity >= 2").count()
        puffin._decode_dv_pointer_cached.cache_clear()
        calls.clear()
        assert t.to_df().count() == expect
        live_ptrs = {d.file_path for d in t.scan().plan_deletes()
                     if d.is_deletion_vector}
        assert {c[0] for c in calls} <= live_ptrs

    def test_dv_blob_count_gate_routes_to_probe_plane(self, spark,
                                                      tmp_loc, lineitem,
                                                      monkeypatch):
        """r18 (ADVICE r17): the join plane is gated on BLOB COUNT too
        (``engine.read.dv-join-max-blobs``) — many tiny DVs under the
        position cap must not serialize one driver blob read each.
        With the blob cap forced to 0 the probe plane takes over:
        zero driver blob reads, identical results."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import puffin
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(400)
        t = IceTable.create(spark, os.path.join(tmp_loc, "tblobcap"),
                            schema_from_spark(li.schema))
        t.append(li)
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="deletion-vector")
        expect = li.filter("l_returnflag <> 'R'").count()

        calls = []
        real = puffin.read_blob
        monkeypatch.setattr(puffin, "read_blob",
                            lambda *a, **k: calls.append(a) or real(*a, **k))
        t_capped = t.update_properties(
            {"engine.read.dv-join-max-blobs": "0"})
        puffin._decode_dv_pointer_cached.cache_clear()
        assert t_capped.to_df().count() == expect
        assert calls == [], f"blob-cap ignored, driver reads: {calls}"

        # generous cap: small table well under → join plane reads on
        # the driver and the result is the same (update_properties
        # COMMITS, so flip the same table's property back up)
        t_default = t_capped.update_properties(
            {"engine.read.dv-join-max-blobs": "256"})
        puffin._decode_dv_pointer_cached.cache_clear()
        calls.clear()
        assert t_default.to_df().count() == expect
        assert len(calls) > 0

    def test_dv_writes_happen_in_executors(self, spark, tmp_loc,
                                           lineitem, monkeypatch):
        """100 TB guard (VERDICT r08 item 3): DV puffin files are written
        as shards FROM EXECUTORS — the driver receives only pointer rows,
        never serialized bitmaps. Monkeypatching both the puffin writer
        and the roaring deserializer in this (driver) process proves no
        bitmap is materialized or written driver-side; executor workers
        are separate processes and keep the real functions."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import puffin, roaring
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(400)
        t = IceTable.create(spark, os.path.join(tmp_loc, "tdvw"),
                            schema_from_spark(li.schema))
        t.append(li)
        t.delete_where(ex.gt(ex.Reference("l_quantity"), 45.0),
                       mode="merge-on-read")
        t = IceTable.load(spark, t.location())

        writes, deser = [], []
        monkeypatch.setattr(
            puffin, "write_deletion_vectors",
            lambda *a, **k: writes.append(a) or (_ for _ in ()).throw(
                AssertionError("driver-side DV write")))
        real_deser = roaring.Roaring64.deserialize
        monkeypatch.setattr(
            roaring.Roaring64, "deserialize",
            staticmethod(lambda b: deser.append(1) or real_deser(b)))

        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="deletion-vector")
        t = t.rewrite_position_deletes()
        assert writes == [], "driver-side DV puffin writes"
        assert deser == [], "driver-side bitmap deserialization"
        expect = li.filter("l_quantity <= 45 and l_returnflag <> 'R'").count()
        assert t.to_df().count() == expect
        dels = t.scan().plan_deletes()
        assert dels and all(d.is_deletion_vector for d in dels)
        refs = [d.referenced_data_file for d in dels]
        assert len(refs) == len(set(refs))

    def test_changelog_reads_no_dv_blobs_on_driver(self, spark, tmp_loc,
                                                   lineitem, monkeypatch):
        """100 TB guard (VERDICT r08 item 1): the CDC changelog plane
        must follow the same rule as the scan plane — DV blobs are read
        and decoded by EXECUTORS only; the driver broadcasts
        (puffin_path, offset, length) pointers.  Monkeypatching
        ``puffin.read_blob`` counts driver-side calls only (executor
        python workers are separate processes)."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core import puffin
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex
        from iceberg_cpp_spark.streaming.changelog import CHANGE_TYPE, changes
        from pyspark.sql import functions as F

        li = lineitem.limit(400)
        t = IceTable.create(spark, os.path.join(tmp_loc, "tclnodrv"),
                            schema_from_spark(li.schema))
        t.append(li)
        s0 = t.current_snapshot().snapshot_id
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="deletion-vector")
        t = t.delete_where(ex.gt(ex.Reference("l_quantity"), 45.0),
                           mode="deletion-vector")
        t = IceTable.load(spark, t.location())

        calls = []
        real = puffin.read_blob
        monkeypatch.setattr(puffin, "read_blob",
                            lambda *a, **k: calls.append(a) or real(*a, **k))

        c = changes(t, from_snapshot_id=s0)
        n_r = li.filter("l_returnflag = 'R'").count()
        n_q = li.filter("l_returnflag <> 'R' and l_quantity > 45").count()
        got = {r[CHANGE_TYPE]: r["cnt"] for r in
               c.groupBy(CHANGE_TYPE).agg(
                   F.count("*").alias("cnt")).collect()}
        assert got == {"delete": n_r + n_q}
        assert calls == [], f"driver-side DV blob reads: {calls}"

    def test_include_deleted_tags_rows(self, spark, tmp_loc, lineitem):
        """scan().include_deleted(): dead rows stay, flagged `_deleted`
        (metadata_columns.h:56-59), across DV + parquet-pos + equality."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(300)
        t = IceTable.create(spark, os.path.join(tmp_loc, "tid"),
                            schema_from_spark(li.schema))
        t.append(li)
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="deletion-vector")
        t.delete_where(ex.gt(ex.Reference("l_quantity"), 45.0),
                       mode="merge-on-read")
        keys = spark.createDataFrame([("A", "F")],
                                     "l_returnflag string, l_linestatus string")
        t.delete_by_keys(keys)
        tagged = t.scan().include_deleted().to_df()
        assert tagged.count() == li.count()  # nothing filtered
        n_live_tagged = tagged.filter("NOT _deleted").count()
        assert n_live_tagged == t.to_df().count()  # flag == filter semantics
        expect_live = li.filter(
            "l_returnflag <> 'R' AND l_quantity <= 45 "
            "AND NOT (l_returnflag = 'A' AND l_linestatus = 'F')").count()
        assert n_live_tagged == expect_live

    def test_include_deleted_keeps_user_file_path_pos_columns(
            self, spark, tmp_loc):
        """Regression (ADVICE r14): the DV join-plane tag path joins an
        exploded (file, position) frame into the scan; a USER column
        named `file_path` or `pos` must survive — the joined side now
        uses reserved `_dv_*` names, so .drop() can't eat user data."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        df = spark.range(50).selectExpr(
            "id", "concat('path_', id) AS file_path", "id * 2 AS pos")
        t = IceTable.create(spark, os.path.join(tmp_loc, "tdvcols"),
                            schema_from_spark(df.schema))
        t.append(df)
        t = t.delete_where(ex.lt(ex.Reference("id"), 10),
                           mode="deletion-vector")
        tagged = t.scan().include_deleted().to_df()
        assert {"file_path", "pos"} <= set(tagged.columns)
        assert tagged.count() == 50
        assert tagged.filter("_deleted").count() == 10
        # user column VALUES intact on both live and dead rows
        assert tagged.filter("file_path <> concat('path_', id) "
                             "OR pos <> id * 2").count() == 0

    def test_dv_roundtrips_through_avro_manifests(self, spark, tmp_loc, lineitem):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(200)
        t = IceTable.create(
            spark, os.path.join(tmp_loc, "tav"), schema_from_spark(li.schema),
            properties={"write.metadata.manifest-format": "avro"})
        t.append(li)
        t = t.delete_where(ex.lt(ex.Reference("l_quantity"), 10.0),
                           mode="deletion-vector")
        assert t.to_df().count() == li.filter("l_quantity >= 10").count()
        d = [d for d in t.scan().plan_deletes() if d.is_deletion_vector][0]
        # offsets/refs survived the spec-avro manifest (field-ids 143-145)
        assert d.referenced_data_file and d.content_size_in_bytes > 0
