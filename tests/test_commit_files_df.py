"""Executor-side manifest authoring (commit_files_df): a single commit
of ~10^6 data files never materializes a driver-side DataFile list —
manifest shards are written by applyInPandas in executors and the
driver collects only pointer rows. Reference analogue:
manifest_writer.h:36-158 (single-process there)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark.core import manifests as mf
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.table import IceTable


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "data", it.StringType(), False),
    ])


def _mk_parquet(tmp_loc, n):
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


def _descriptors(spark, paths, schema, with_metrics=True):
    from iceberg_cpp_spark.core.metrics import _field_map, _metrics_json

    fields = _field_map(schema)
    rows = []
    for p in paths:
        mj = _metrics_json(p, fields) if with_metrics else None
        rows.append((p, "parquet", 2, os.path.getsize(p), mj))
    return spark.createDataFrame(
        rows, "file_path string, file_format string, record_count long, "
              "file_size_in_bytes long, metrics_json string")


def _all_entries(t):
    out = []
    for m in mf.read_manifest_list(t.current_snapshot().manifest_list):
        for e in mf.read_manifest(m.manifest_path, t.metadata.spec(),
                                  t.schema(), manifest=m):
            out.append(e)
    return out


class TestCommitFilesDf:
    def test_matches_driver_add_files(self, spark, tmp_loc, monkeypatch):
        """Same physical files through add_files (driver list) and
        commit_files_df (executor shards): identical scan results,
        bounds-driven pruning, and inherited snapshot/sequence ids."""
        paths = _mk_parquet(tmp_loc, 8)
        t1 = IceTable.create(spark, f"{tmp_loc}/t1", _schema())
        t1 = t1.add_files(paths)
        from iceberg_cpp_spark.core import name_mapping as nm

        t2 = IceTable.create(spark, f"{tmp_loc}/t2", _schema())
        desc = _descriptors(spark, paths, t2.schema())
        # foreign field-ID-less parquet resolves by name (the caller
        # installs the mapping, exactly what add_files does internally);
        # force several shards so the shard plane is actually exercised
        t2 = t2.update_properties({
            nm.PROPERTY_KEY:
                nm.NameMapping.from_schema(t2.schema()).to_json_string(),
            "engine.read.name-based": "true",
            "engine.commit.manifest-shard-entries": "3"})
        t2 = t2.commit_files_df(desc)
        assert ({tuple(r) for r in t2.to_df().collect()}
                == {tuple(r) for r in t1.to_df().collect()})
        # one executor-authored manifest per NON-EMPTY hash shard:
        # shards are xxhash64(file_path) % ceil(n/entries), so with 8
        # random-tmp paths into 3 shards one may legitimately be empty
        # — pin the exact expected count from the same hash instead of
        # a flaky >= bound
        from pyspark.sql import functions as F
        n_shards = 3  # ceil(8 / shard-entries=3)
        expected = (spark.createDataFrame([(p,) for p in paths], "p string")
                    .select((F.abs(F.xxhash64("p")) % n_shards)
                            .alias("s")).distinct().count())
        mfs = list(mf.read_manifest_list(t2.current_snapshot().manifest_list))
        assert len(mfs) == expected
        # bounds prune identically to the driver path
        assert (len(t2.scan(filter=ex.lt(ex.Reference("id"), 10))
                    .plan_files())
                == len(t1.scan(filter=ex.lt(ex.Reference("id"), 10))
                       .plan_files()) == 1)
        # inheritance: entries carry the snapshot/sequence of the commit
        snap = t2.current_snapshot()
        for e in _all_entries(t2):
            assert e.snapshot_id == snap.snapshot_id
            assert e.sequence_number == snap.sequence_number

    def test_summary_and_cas_retry_reuses_shards(self, spark, tmp_loc):
        """A concurrent commit between authoring and publish restamps
        the manifest LIST only: the retry's snapshot references the
        same shard manifests (no re-author on v2 tables)."""
        paths = _mk_parquet(tmp_loc, 6)
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(spark.range(3).select(
            F.col("id"), F.lit("seed").alias("data")))
        desc = _descriptors(spark, paths, t.schema(), with_metrics=False)

        authored: list = []
        orig_once = type(t)._commit_files_once
        raced = {"done": False}

        def racy_once(self, *a, **kw):
            if kw.get("prebuilt_data_manifests") and not raced["done"]:
                raced["done"] = True
                authored.extend(
                    m.manifest_path for m in kw["prebuilt_data_manifests"])
                # concurrent writer lands first — our CAS must fail once
                other = IceTable.load(spark, f"{tmp_loc}/t")
                other.append(spark.range(100, 102).select(
                    F.col("id"), F.lit("race").alias("data")))
            return orig_once(self, *a, **kw)

        import unittest.mock as mock
        with mock.patch.object(type(t), "_commit_files_once", racy_once):
            t = t.commit_files_df(desc)
        summary = t.current_snapshot().summary
        assert summary["added-data-files"] == "6"
        assert summary["added-records"] == "12"
        assert int(summary["total-records"]) == 12 + 3 + 2
        final = {m.manifest_path for m in
                 mf.read_manifest_list(t.current_snapshot().manifest_list)}
        assert set(authored) <= final  # shards reused across the retry
        assert t.to_df().count() == 17

    def test_v3_row_lineage_spans(self, spark, tmp_loc):
        """v3 tables bake contiguous, collision-free _row_id spans in
        executors; a concurrent commit that advances the counter forces
        a re-author instead of double-issuing ids."""
        paths = _mk_parquet(tmp_loc, 5)
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema(),
                            properties={"format-version": "3"})
        t = t.append(spark.range(4).select(
            F.col("id"), F.lit("seed").alias("data")))
        desc = _descriptors(spark, paths, t.schema(), with_metrics=False)
        t = t.update_properties(
            {"engine.commit.manifest-shard-entries": "2"})
        t = t.commit_files_df(desc)
        rows = (t.scan().with_metadata_columns().to_df()
                .select("_row_id").collect())
        ids = sorted(r["_row_id"] for r in rows)
        assert len(ids) == len(set(ids)) == 4 + 10
        assert ids == list(range(14))
        entries = [e for e in _all_entries(t)
                   if e.data_file.file_path in set(paths)]
        assert all(e.data_file.first_row_id is not None for e in entries)

    def test_empty_and_missing_column_refusals(self, spark, tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        empty = spark.createDataFrame(
            [], "file_path string, record_count long, "
                "file_size_in_bytes long")
        assert t.commit_files_df(empty) is t
        with pytest.raises(ValueError, match="missing columns"):
            t.commit_files_df(spark.createDataFrame(
                [("x",)], "file_path string"))
        from iceberg_cpp_spark.functions import transforms as tr
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)

        pspec = PartitionSpec(spec_id=0, fields=[PartitionField(
            source_id=2, field_id=1000, name="data",
            transform=tr.IdentityTransform())])
        tp = IceTable.create(spark, f"{tmp_loc}/tp", _schema(), spec=pspec)
        with pytest.raises(ValueError, match="partition_json"):
            tp.commit_files_df(empty)

    def test_partitioned_descriptors_prune_and_read(self, spark, tmp_loc):
        """Partitioned plane: descriptors carry partition_json (the
        partition_to_json hex shape) — committed entries land with
        TYPED partition values, so partition pruning at plan time and
        reads both work."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from iceberg_cpp_spark.core import name_mapping as nm
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)
        from iceberg_cpp_spark.functions import transforms as tr

        pspec = PartitionSpec(spec_id=0, fields=[PartitionField(
            source_id=2, field_id=1000, name="data",
            transform=tr.IdentityTransform())])
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema(), spec=pspec)
        t = t.update_properties({
            nm.PROPERTY_KEY:
                nm.NameMapping.from_schema(t.schema()).to_json_string(),
            "engine.read.name-based": "true",
            "engine.commit.manifest-shard-entries": "2"})
        rows = []
        for part in ("a", "b", "c"):
            for j in range(2):
                p = os.path.join(tmp_loc, f"{part}{j}.parquet")
                ids = [ord(part) * 100 + j * 10, ord(part) * 100 + j * 10 + 1]
                pq.write_table(pa.table({
                    "id": ids, "data": [part, part]}), p)
                pj = mf.partition_to_json({"data": part}, pspec, t.schema())
                rows.append((p, 2, os.path.getsize(p), pj))
        desc = spark.createDataFrame(
            rows, "file_path string, record_count long, "
                  "file_size_in_bytes long, partition_json string")
        t = t.commit_files_df(desc)
        assert t.to_df().count() == 12
        pruned = t.scan(filter=ex.eq(ex.Reference("data"), "b"))
        assert len(pruned.plan_files()) == 2
        got = {r["id"] for r in pruned.to_df().collect()}
        assert got == {ord("b") * 100, ord("b") * 100 + 1,
                       ord("b") * 100 + 10, ord("b") * 100 + 11}
        # entries carry typed partition values (not raw hex)
        entries = _all_entries(t)
        assert {e.data_file.partition["data"] for e in entries} == {
            "a", "b", "c"}

    def test_fast_path_equals_writer(self, spark, tmp_loc):
        """The vectorized author (unpartitioned, metrics-less batches)
        must produce manifests whose READ-BACK entries equal the
        general ManifestWriter path exactly — including v3 row-id
        spans and inheritance-ready null snapshot/sequence ids."""
        import pandas as pd

        from iceberg_cpp_spark.core.manifests import (ManifestEntry,
                                                      ManifestWriter)
        from iceberg_cpp_spark.core.metadata import PartitionSpec
        from iceberg_cpp_spark.table import _author_manifest_vectorized

        spec = PartitionSpec.unpartitioned()
        schema = _schema()
        pdf = pd.DataFrame({
            "file_path": [f"/fake/f{i}.parquet" for i in range(7)],
            "file_format": ["parquet"] * 7,
            "record_count": [10 * (i + 1) for i in range(7)],
            "file_size_in_bytes": [1000 + i for i in range(7)],
            "metrics_json": [None] * 7,
            "partition_json": ["{}"] * 7,
        })
        fast = os.path.join(tmp_loc, "fast.parquet")
        slow = os.path.join(tmp_loc, "slow.parquet")
        ptr = _author_manifest_vectorized(pdf, fast, 0, 500)
        w = ManifestWriter(slow, spec, schema, snapshot_id=0,
                           format="parquet", version=3)
        rid = 500
        for r in pdf.itertuples(index=False):
            f = mf.DataFile(content=mf.CONTENT_DATA,
                            file_path=r.file_path,
                            file_format=r.file_format, partition={},
                            record_count=r.record_count,
                            file_size_in_bytes=r.file_size_in_bytes,
                            first_row_id=rid)
            rid += r.record_count
            w.add(ManifestEntry(status=mf.STATUS_ADDED, data_file=f,
                                snapshot_id=None, sequence_number=None))
        slow_mf = w.close()

        def norm(path):
            return [(e.status, e.snapshot_id, e.sequence_number,
                     e.data_file.file_path, e.data_file.record_count,
                     e.data_file.file_size_in_bytes,
                     e.data_file.first_row_id,
                     e.data_file.column_sizes, e.data_file.lower_bounds)
                    for e in mf.read_manifest(path, spec, schema)]

        assert norm(fast) == norm(slow)
        row = ptr.iloc[0]
        assert row["added_files_count"] == slow_mf.added_files_count
        assert row["added_rows_count"] == slow_mf.added_rows_count
        assert row["first_row_id"] == slow_mf.first_row_id == 500

    def test_synthetic_descriptors_metadata_only(self, spark, tmp_loc):
        """The 10^6-file bench shape in miniature: purely synthetic
        descriptors (no physical files) commit fine — planning and
        metadata tables work; only an actual read would touch disk."""
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        desc = spark.range(1000).select(
            F.concat(F.lit(f"{tmp_loc}/data/part-"), F.col("id"),
                     F.lit(".parquet")).alias("file_path"),
            F.lit(100).cast("long").alias("record_count"),
            F.lit(4096).cast("long").alias("file_size_in_bytes"))
        t = t.update_properties(
            {"engine.commit.manifest-shard-entries": "300"})
        t = t.commit_files_df(desc)
        assert t.current_snapshot().summary["added-data-files"] == "1000"
        assert len(t.scan().plan_files()) == 1000
        # metadata-only COUNT comes straight from the list row summaries
        assert int(t.current_snapshot().summary["total-records"]) == 100000


class TestCommitFilesDfDeletes:
    """content column (r14): a migration registers existing DATA and
    DELETE files in ONE one-CAS commit — delete shards land in
    MANIFEST_CONTENT_DELETES manifests whose entries inherit the
    commit's sequence number, so standard v2 apply rules hold
    (pos-deletes hit same-seq data; eq-deletes hit strictly older)."""

    def _name_mapped(self, spark, tmp_loc, name="t"):
        from iceberg_cpp_spark.core import name_mapping as nm

        t = IceTable.create(spark, f"{tmp_loc}/{name}", _schema())
        return t.update_properties({
            nm.PROPERTY_KEY:
                nm.NameMapping.from_schema(t.schema()).to_json_string(),
            "engine.read.name-based": "true",
            "engine.commit.manifest-shard-entries": "2"})

    def test_data_plus_pos_deletes_one_commit(self, spark, tmp_loc):
        import pyarrow as pa
        import pyarrow.parquet as pq

        paths = _mk_parquet(tmp_loc, 4)  # file i holds ids i*10+1, i*10+2
        t = self._name_mapped(spark, tmp_loc)
        dp = os.path.join(tmp_loc, "pd0.parquet")
        pq.write_table(pa.table({
            "file_path": [paths[0], paths[2]],
            "pos": pa.array([0, 1], pa.int64())}), dp)
        rows = ([(p, 2, os.path.getsize(p), "data", None)
                 for p in paths]
                + [(dp, 2, os.path.getsize(dp), "position-deletes",
                    None)])
        desc = spark.createDataFrame(
            rows, "file_path string, record_count long, "
                  "file_size_in_bytes long, content string, "
                  "referenced_data_file string")
        t = t.commit_files_df(desc)
        # f0 pos0 (id 1) and f2 pos1 (id 22) are dead IN THE SAME COMMIT
        assert sorted(r["id"] for r in t.to_df().collect()) == [
            2, 11, 12, 21, 31, 32]
        s = t.current_snapshot().summary
        assert s["added-data-files"] == "4"
        assert s["added-records"] == "8"
        assert s["added-delete-files"] == "1"
        assert s["added-position-deletes"] == "2"
        assert s["added-equality-deletes"] == "0"
        assert s["total-delete-files"] == "1"
        mfs = list(mf.read_manifest_list(t.current_snapshot().manifest_list))
        dels = [m for m in mfs if m.content == mf.MANIFEST_CONTENT_DELETES]
        assert len(dels) == 1
        es = mf.read_manifest(dels[0].manifest_path, t.metadata.spec(),
                              t.schema(), manifest=dels[0])
        assert [e.data_file.content for e in es] == [
            mf.CONTENT_POSITION_DELETES]
        snap = t.current_snapshot()
        assert es[0].sequence_number == snap.sequence_number

    def test_eq_delete_registered_applies_to_older(self, spark, tmp_loc):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(spark.range(4).select(
            F.col("id"),
            F.concat(F.lit("v"), F.col("id")).alias("data")))
        dp = os.path.join(tmp_loc, "eq0.parquet")
        pq.write_table(pa.table({"data": ["v1", "v3"]}), dp)
        desc = spark.createDataFrame(
            [(dp, 2, os.path.getsize(dp), "equality-deletes", "[2]")],
            "file_path string, record_count long, "
            "file_size_in_bytes long, content string, "
            "equality_ids_json string")
        t = t.commit_files_df(desc)
        assert sorted(r["data"] for r in t.to_df().collect()) == [
            "v0", "v2"]
        s = t.current_snapshot().summary
        assert s["added-equality-deletes"] == "2"
        assert s["added-data-files"] == "0"
        mfs = list(mf.read_manifest_list(t.current_snapshot().manifest_list))
        dels = [m for m in mfs if m.content == mf.MANIFEST_CONTENT_DELETES]
        es = mf.read_manifest(dels[0].manifest_path, t.metadata.spec(),
                              t.schema(), manifest=dels[0])
        assert es[0].data_file.equality_ids == [2]

    def test_content_guards(self, spark, tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        bad = spark.createDataFrame(
            [("/x.parquet", 1, 10, "bogus")],
            "file_path string, record_count long, "
            "file_size_in_bytes long, content string")
        with pytest.raises(ValueError, match="content must be one of"):
            t.commit_files_df(bad)
        t3 = IceTable.create(spark, f"{tmp_loc}/t3", _schema(),
                             properties={"format-version": "3"})
        pd_desc = spark.createDataFrame(
            [("/pd.parquet", 1, 10, "position-deletes")],
            "file_path string, record_count long, "
            "file_size_in_bytes long, content string")
        with pytest.raises(ValueError, match="v3 forbids"):
            t3.commit_files_df(pd_desc)

    def test_shard_pointer_partition_summaries(self, spark, tmp_loc):
        """ADVICE r13: executor-authored shard pointers carry the
        manifest's PartitionFieldSummary rows, so manifest-LIST-level
        pruning works on partitioned bulk registrations (entry-level
        pruning was already exact)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from iceberg_cpp_spark.core import name_mapping as nm
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)
        from iceberg_cpp_spark.functions import transforms as tr

        pspec = PartitionSpec(spec_id=0, fields=[PartitionField(
            source_id=2, field_id=1000, name="data",
            transform=tr.IdentityTransform())])
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema(), spec=pspec)
        t = t.update_properties({
            nm.PROPERTY_KEY:
                nm.NameMapping.from_schema(t.schema()).to_json_string(),
            "engine.read.name-based": "true",
            "engine.commit.manifest-shard-entries": "2"})
        rows = []
        for i, part in enumerate(("a", "b", "c", "d")):
            p = os.path.join(tmp_loc, f"p{part}.parquet")
            pq.write_table(pa.table({"id": [i], "data": [part]}), p)
            pj = mf.partition_to_json({"data": part}, pspec, t.schema())
            rows.append((p, 1, os.path.getsize(p), pj))
        desc = spark.createDataFrame(
            rows, "file_path string, record_count long, "
                  "file_size_in_bytes long, partition_json string")
        t = t.commit_files_df(desc)
        # shards are xxhash64(file_path) % 2 over random-tmp paths, so
        # the grouping varies per run — compute the EXPECTED per-shard
        # partition bounds with the same hash and pin them exactly
        from pyspark.sql import functions as F
        shard_of = {
            r["p"]: r["s"]
            for r in spark.createDataFrame([(r[0], r[3]) for r in rows],
                                           "p string, pj string")
            .select("p", (F.abs(F.xxhash64("p")) % 2).alias("s")).collect()}
        part_of = dict(zip((r[0] for r in rows), ("a", "b", "c", "d")))
        groups: dict[int, list] = {}
        for p, s in shard_of.items():
            groups.setdefault(s, []).append(part_of[p])
        expected = {(min(v).encode(), max(v).encode())
                    for v in groups.values()}
        mfs = list(mf.read_manifest_list(t.current_snapshot().manifest_list))
        assert len(mfs) == len(groups)
        for m in mfs:
            assert len(m.partitions) == 1
        got = {(bytes(m.partitions[0].lower_bound),
                bytes(m.partitions[0].upper_bound)) for m in mfs}
        assert got == expected


class TestCarryFilterDistributed:
    """r14: past `engine.commit.carry-filter-distributed-threshold`, a
    delete commit discovers WHICH carried manifests contain a dropped
    path executor-side and decodes only those on the driver — the
    carry pass goes O(#affected-entries), not O(#table-entries)."""

    def _bulk_table(self, spark, tmp_loc, n=9):
        from iceberg_cpp_spark.core import name_mapping as nm

        paths = _mk_parquet(tmp_loc, n)
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.update_properties({
            nm.PROPERTY_KEY:
                nm.NameMapping.from_schema(t.schema()).to_json_string(),
            "engine.read.name-based": "true",
            "engine.commit.manifest-shard-entries": "3"})
        return t.commit_files_df(_descriptors(spark, paths, t.schema())), paths

    def test_discovery_names_exactly_the_affected_manifests(self, spark,
                                                            tmp_loc):
        t, paths = self._bulk_table(spark, tmp_loc)
        mfs = list(mf.read_manifest_list(t.current_snapshot().manifest_list))
        assert len(mfs) >= 3
        expected = {m.manifest_path for m in mfs
                    if any(e.data_file.file_path == paths[0]
                           for e in mf.read_manifest(
                               m.manifest_path, t.metadata.spec(),
                               t.schema(), manifest=m))}
        # below the threshold: None (driver decodes everything — no
        # Spark job overhead on small tables)
        assert t._affected_manifests(mfs, {paths[0]}, None) is None
        t = t.update_properties(
            {"engine.commit.carry-filter-distributed-threshold": "1"})
        aff = t._affected_manifests(mfs, {paths[0]}, None)
        assert aff == expected and len(aff) < len(mfs)
        # drop_dv_for probes referenced_data_file too (no DVs here →
        # only non-parquet conservatism could add paths; none exist)
        assert t._affected_manifests(mfs, None, {paths[0]}) == expected

    def test_filtered_and_driver_carry_agree(self, spark, tmp_loc):
        """Same delete against the same content, one commit with the
        executor discovery forced on, one with it off: identical scan
        results, identical live entry sets, untouched shard manifests
        carried by POINTER in both."""
        outs = []
        for sub, thr in (("a", "1"), ("b", "999999999")):
            loc = f"{tmp_loc}/{sub}"
            os.makedirs(loc)
            t, paths = self._bulk_table(spark, loc)
            before = {m.manifest_path for m in mf.read_manifest_list(
                t.current_snapshot().manifest_list)}
            t = t.update_properties(
                {"engine.commit.carry-filter-distributed-threshold": thr})
            t = t.delete_where(ex.lt(ex.Reference("id"), 11))  # f0 only
            after = {m.manifest_path for m in mf.read_manifest_list(
                t.current_snapshot().manifest_list)}
            # untouched shards carried by pointer (>= 2 of 3+ shards)
            assert len(before & after) >= len(before) - 1
            rows = sorted(tuple(r) for r in t.to_df().collect())
            live = sorted(os.path.basename(e.data_file.file_path)
                          for e in _all_entries(t) if e.is_live)
            outs.append((rows, live))
        assert outs[0] == outs[1]
