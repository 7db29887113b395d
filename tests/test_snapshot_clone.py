"""Zero-copy table clone (IceTable.snapshot_to + CALL
ice.system.snapshot): the Spark-Iceberg snapshot-procedure shape over
the executor-sharded commit_files_df plane. A clone shares data files
by path, keeps column bounds (pruning parity), diverges on write, and
can never GC the source's files (gc.enabled=false)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceSqlEngine
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.metadata import (PartitionField,
                                             PartitionSpec)
from iceberg_cpp_spark.functions.transforms import from_string
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "data", it.StringType(), False),
    ])


@pytest.fixture()
def cat(spark, tmp_loc):
    c = FileSystemCatalog(f"{tmp_loc}/wh")
    c.create_namespace("db")
    return c


def _fill(spark, t, lo, hi):
    t.append(spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("data")))
    return t


class TestSnapshotTo:
    def test_zero_copy_and_divergence(self, spark, cat):
        cat.create_table("db.src", _schema())
        src = _fill(spark, cat.load_table("db.src", spark=spark), 0, 6)
        src = _fill(spark, src, 6, 12)
        clone = src.snapshot_to(cat, "db.clone")
        # same rows, SAME data files (nothing copied)
        assert clone.to_df().count() == 12
        src_paths = {f.file_path for f in src.scan().plan_files()}
        cl_paths = {f.file_path for f in clone.scan().plan_files()}
        assert cl_paths == src_paths
        # provenance in the summary
        s = clone.current_snapshot()
        assert s.summary["snapshot-source-table"] == "db.src"
        assert int(s.summary["snapshot-source-snapshot-id"]) == \
            src.current_snapshot().snapshot_id
        # divergence: writes to the clone never touch the source
        clone = _fill(spark, clone, 100, 103)
        assert clone.to_df().count() == 15
        assert cat.load_table("db.src", spark=spark) \
            .to_df().count() == 12
        # the source sees no new files
        assert {f.file_path for f in
                cat.load_table("db.src", spark=spark)
                .scan().plan_files()} == src_paths

    def test_clone_cannot_gc_source_files(self, spark, cat):
        cat.create_table("db.src", _schema())
        src = _fill(spark, cat.load_table("db.src", spark=spark), 0, 4)
        clone = src.snapshot_to(cat, "db.clone")
        with pytest.raises(ValueError, match="gc.enabled"):
            clone.expire_snapshots()
        with pytest.raises(ValueError, match="gc.enabled"):
            clone.remove_orphan_files()

    def test_bounds_survive_pruning_parity(self, spark, cat):
        cat.create_table("db.src", _schema())
        src = cat.load_table("db.src", spark=spark)
        # two appends with disjoint id ranges -> distinct file bounds
        src = _fill(spark, src, 0, 5)
        src = _fill(spark, src, 1000, 1005)
        clone = src.snapshot_to(cat, "db.clone")
        pred = ex.gt(ex.Reference("id"), 500)
        n_src = len(src.scan(filter=pred).plan_files())
        n_clone = len(clone.scan(filter=pred).plan_files())
        n_all = len(clone.scan().plan_files())
        assert n_clone == n_src < n_all  # metrics pruning carried over
        got = sorted(r["id"] for r in
                     clone.scan(filter=pred).to_df().collect())
        assert got == list(range(1000, 1005))

    def test_partitioned_clone(self, spark, cat):
        spec = PartitionSpec([PartitionField(
            source_id=1, field_id=1000, name="id_bucket",
            transform=from_string("bucket[4]"))])
        cat.create_table("db.psrc", _schema(), spec=spec)
        src = _fill(spark, cat.load_table("db.psrc", spark=spark),
                    0, 20)
        clone = src.snapshot_to(cat, "db.pclone")
        assert clone.spec().fields[0].name == "id_bucket"
        assert clone.to_df().count() == 20
        # partition pruning on the clone: bucket filter keeps a strict
        # subset of files
        pred = ex.eq(ex.Reference("id"), 7)
        assert len(clone.scan(filter=pred).plan_files()) < \
            len(clone.scan().plan_files())
        assert [r["id"] for r in
                clone.scan(filter=pred).to_df().collect()] == [7]

    def test_avro_manifest_source(self, spark, cat):
        cat.create_table(
            "db.asrc", _schema(),
            properties={"write.metadata.manifest-format": "avro"})
        src = _fill(spark, cat.load_table("db.asrc", spark=spark),
                    0, 8)
        clone = src.snapshot_to(cat, "db.aclone")
        assert clone.to_df().count() == 8
        assert {f.file_path for f in clone.scan().plan_files()} == \
            {f.file_path for f in src.scan().plan_files()}
        # bounds survived the executor decode leg too
        pred = ex.gt(ex.Reference("id"), 100)
        assert clone.scan(filter=pred).to_df().count() == 0

    def test_position_delete_source_clones(self, spark, cat):
        # MoR parquet position deletes ride along as delete
        # descriptors: the clone reads exactly like the source
        cat.create_table("db.dsrc", _schema())
        src = _fill(spark, cat.load_table("db.dsrc", spark=spark),
                    0, 8)
        src = src.delete_where(ex.eq(ex.Reference("id"), 3),
                               mode="merge-on-read")
        clone = src.snapshot_to(cat, "db.dclone")
        got = sorted(r["id"] for r in clone.to_df().collect())
        assert got == [0, 1, 2, 4, 5, 6, 7]
        # nothing was copied: data AND delete files are shared
        src_all = {f.file_path
                   for f in src.scan().plan_files()}
        cl_all = {f.file_path
                  for f in clone.scan().plan_files()}
        assert cl_all == src_all

    def test_dv_source_refuses(self, spark, cat):
        cat.create_table("db.vsrc2", _schema(),
                         properties={"format-version": "3"})
        src = _fill(spark, cat.load_table("db.vsrc2", spark=spark),
                    0, 8)
        src = src.delete_where(ex.eq(ex.Reference("id"), 3),
                               mode="deletion-vector")
        with pytest.raises(ValueError, match="deletion vectors"):
            src.snapshot_to(cat, "db.vclone2")
        # the refusal must not leave a poisoned empty clone entry
        assert not cat.table_exists("db.vclone2")

    def test_equality_delete_source_refuses(self, spark, cat):
        import pyarrow as pa
        import pyarrow.parquet as pq
        cat.create_table("db.esrc2", _schema())
        src = _fill(spark, cat.load_table("db.esrc2", spark=spark),
                    0, 8)
        # register an external equality-delete file (the r14 bulk
        # delete-descriptor path)
        p = f"{src.location()}/eq-del.parquet"
        pq.write_table(pa.table({"id": pa.array([5], pa.int64())}), p)
        desc = spark.createDataFrame(
            [(p, 1, 200, "equality-deletes", "[1]")],
            "file_path string, record_count long, "
            "file_size_in_bytes long, content string, "
            "equality_ids_json string")
        src = src.commit_files_df(desc)
        assert sorted(r["id"] for r in src.to_df().collect()) == \
            [0, 1, 2, 3, 4, 6, 7]
        with pytest.raises(ValueError, match="EQUALITY deletes"):
            src.snapshot_to(cat, "db.eclone2")
        assert not cat.table_exists("db.eclone2")

    def test_multi_spec_source_refuses(self, spark, cat):
        cat.create_table("db.msrc", _schema())
        src = _fill(spark, cat.load_table("db.msrc", spark=spark),
                    0, 4)
        src = src.update_spec([PartitionField(
            source_id=1, field_id=0, name="id_bucket",
            transform=from_string("bucket[4]"))])
        src = _fill(spark, src, 4, 8)
        with pytest.raises(ValueError, match="partition spec"):
            src.snapshot_to(cat, "db.mclone")
        # spec evolution with NO writes since: same refusal, and the
        # message names the stale spec rather than claiming "multiple"
        cat.create_table("db.m2", _schema())
        s2 = _fill(spark, cat.load_table("db.m2", spark=spark), 0, 4)
        s2 = s2.update_spec([PartitionField(
            source_id=1, field_id=0, name="id_bucket",
            transform=from_string("bucket[4]"))])
        with pytest.raises(ValueError, match=r"spec\(s\) \[0\]"):
            s2.snapshot_to(cat, "db.m2clone")

    def test_requires_spark_session(self, spark, cat):
        cat.create_table("db.nsrc", _schema())
        _fill(spark, cat.load_table("db.nsrc", spark=spark), 0, 4)
        bare = cat.load_table("db.nsrc")  # driver-only handle
        with pytest.raises(ValueError, match="SparkSession"):
            bare.snapshot_to(cat, "db.nclone")

    def test_empty_source_clones_empty(self, spark, cat):
        cat.create_table("db.esrc", _schema())
        src = cat.load_table("db.esrc", spark=spark)
        clone = src.snapshot_to(cat, "db.eclone")
        assert clone.to_df().count() == 0
        assert clone.current_snapshot() is None

    def test_v3_and_evolved_schema_carry(self, spark, cat):
        # non-contiguous field ids (evolution) + v3 format survive
        cat.create_table("db.vsrc", _schema(),
                         properties={"format-version": "3"})
        src = _fill(spark, cat.load_table("db.vsrc", spark=spark),
                    0, 4)
        src = src.add_column("extra", it.LongType())
        src = src.drop_column("data")
        src.append(spark.createDataFrame(
            [(50, 7)], "id long, extra long"))
        src = cat.load_table("db.vsrc", spark=spark)
        clone = src.snapshot_to(cat, "db.vclone")
        assert clone.metadata.format_version == 3
        assert [f.field_id for f in clone.schema().fields] == \
            [f.field_id for f in src.schema().fields]
        got = {(r["id"], r["extra"]) for r in clone.to_df().collect()}
        assert (50, 7) in got and len(got) == 5


class TestSnapshotSql:
    def test_call_snapshot_and_stats(self, spark, cat):
        cat.create_table("db.src", _schema())
        _fill(spark, cat.load_table("db.src", spark=spark), 0, 6)
        eng = IceSqlEngine(spark, cat)
        got = eng.sql("CALL ice.system.snapshot(source_table => "
                      "'db.src', table => 'db.clone')").collect()[0]
        assert got["imported_files_count"] >= 1
        assert eng.sql("SELECT count(*) AS n FROM ice.db.clone") \
            .collect()[0]["n"] == 6
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("CALL ice.system.snapshot(source_table => "
                    "'db.nope', table => 'db.c2')")
        # stats procedures register statistics files on the snapshot
        p = eng.sql("CALL ice.system.compute_table_stats("
                    "table => 'db.src')").collect()[0]
        assert p["statistics_file"].endswith(".puffin")
        t = cat.load_table("db.src", spark=spark)
        assert t.ndv("id") is not None and t.ndv("id") >= 5
        p = eng.sql("CALL ice.system.compute_partition_stats("
                    "table => 'db.src')").collect()[0]
        assert p["statistics_file"].endswith(".parquet")


class TestFoldDeletes:
    """r16: ``snapshot_to(..., fold_deletes=True)`` — every refusal
    folds on a staged source-side branch (kept for GC protection), so
    DV/eq-delete/Avro-delete-manifest/multi-spec sources clone in one
    call. Each refusal test above gains its fold-path green twin."""

    def _assert_fold(self, cat, src, clone, expect_ids):
        got = sorted(r["id"] for r in clone.to_df().collect())
        assert got == expect_ids
        # provenance records the staged fold branch, and the branch is
        # KEPT on the source (its folded files stay GC-referenced)
        s = clone.current_snapshot()
        br = s.summary["snapshot-fold-branch"]
        assert br.startswith("snapshot-fold-")
        src = src.refresh()
        assert src.metadata.ref(br) is not None
        # the clone's files are the FOLDED branch's files
        fold_sid = src.metadata.ref(br).snapshot_id
        fold_paths = {f.file_path for f in
                      src.scan().use_snapshot(fold_sid).plan_files()}
        assert {f.file_path for f in clone.scan().plan_files()} == \
            fold_paths

    def test_dv_source_folds(self, spark, cat):
        cat.create_table("db.fdv", _schema(),
                         properties={"format-version": "3"})
        src = _fill(spark, cat.load_table("db.fdv", spark=spark), 0, 8)
        src = src.delete_where(ex.eq(ex.Reference("id"), 3),
                               mode="deletion-vector")
        clone = src.snapshot_to(cat, "db.fdvc", fold_deletes=True)
        self._assert_fold(cat, src, clone, [0, 1, 2, 4, 5, 6, 7])
        # the SOURCE's main branch is untouched (still DV'd, same head)
        assert sorted(r["id"] for r in
                      cat.load_table("db.fdv", spark=spark)
                      .to_df().collect()) == [0, 1, 2, 4, 5, 6, 7]

    def test_equality_delete_source_folds(self, spark, cat):
        import pyarrow as pa
        import pyarrow.parquet as pq
        cat.create_table("db.feq", _schema())
        src = _fill(spark, cat.load_table("db.feq", spark=spark), 0, 8)
        p = f"{src.location()}/eq-del.parquet"
        pq.write_table(pa.table({"id": pa.array([5], pa.int64())}), p)
        desc = spark.createDataFrame(
            [(p, 1, 200, "equality-deletes", "[1]")],
            "file_path string, record_count long, "
            "file_size_in_bytes long, content string, "
            "equality_ids_json string")
        src = src.commit_files_df(desc)
        clone = src.snapshot_to(cat, "db.feqc", fold_deletes=True)
        self._assert_fold(cat, src, clone, [0, 1, 2, 3, 4, 6, 7])

    def test_multi_spec_source_folds(self, spark, cat):
        cat.create_table("db.fms", _schema())
        src = _fill(spark, cat.load_table("db.fms", spark=spark), 0, 4)
        src = src.update_spec([PartitionField(
            source_id=1, field_id=0, name="id_bucket",
            transform=from_string("bucket[4]"))])
        src = _fill(spark, src, 4, 8)
        clone = src.snapshot_to(cat, "db.fmsc", fold_deletes=True)
        self._assert_fold(cat, src, clone, list(range(8)))

    def test_avro_delete_manifest_source_folds(self, spark, cat):
        # avro manifests carrying position deletes: the fold rewrites
        # the manifests to parquet, then (deletes now visible) folds
        # the pos-deletes are clonable as-is, so no data rewrite needed
        cat.create_table(
            "db.fav", _schema(),
            properties={"write.metadata.manifest-format": "avro"})
        src = _fill(spark, cat.load_table("db.fav", spark=spark), 0, 8)
        src = src.delete_where(ex.eq(ex.Reference("id"), 2),
                               mode="merge-on-read")
        clone = src.snapshot_to(cat, "db.favc", fold_deletes=True)
        self._assert_fold(cat, src, clone, [0, 1, 3, 4, 5, 6, 7])

    def test_clean_source_pays_nothing(self, spark, cat):
        # no blockers: fold_deletes=True must not stage a branch or
        # rewrite anything — pure zero-copy, no fold provenance
        cat.create_table("db.fok", _schema())
        src = _fill(spark, cat.load_table("db.fok", spark=spark), 0, 6)
        clone = src.snapshot_to(cat, "db.fokc", fold_deletes=True)
        assert {f.file_path for f in clone.scan().plan_files()} == \
            {f.file_path for f in src.scan().plan_files()}
        assert "snapshot-fold-branch" not in \
            clone.current_snapshot().summary
        assert not [n for n in src.refresh().metadata.refs
                    if n.startswith("snapshot-fold-")]
