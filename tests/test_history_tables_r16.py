"""r16 history-wide metadata-table fixes: manifest inheritance joins on
the FULL normalized path (two same-basename manifests in different
directories — the clone/import shape — must not fan out), and the
per-metadata memo of the manifest-list walk (one query touching
all_manifests + all_entries + all_files reads each manifest list ONCE).
VERDICT r15 items 8 and 10."""

import dataclasses
import os
import shutil

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core.types import schema_from_spark


def _mk(spark, tmp_loc, name="ht"):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    t = IceTable.create(spark, os.path.join(tmp_loc, name),
                        schema_from_spark(df.schema))
    t.append(df)
    return t, df


class TestFullPathInheritanceJoin:
    def test_same_basename_manifests_no_fanout(self, spark, tmp_loc):
        import iceberg_cpp_spark.core.manifests as mf

        t, df = _mk(spark, tmp_loc)
        snap = t.current_snapshot()
        [man] = mf.read_manifest_list(snap.manifest_list)
        assert man.manifest_path.endswith(".parquet")
        n_entries = t.entries_df().count()
        # clone/import shape: the SAME manifest bytes under one basename
        # in two different directories, registered as two pointers
        dirs = [os.path.join(tmp_loc, d) for d in ("cloneA", "cloneB")]
        mans = {}
        for i, d in enumerate(dirs):
            os.makedirs(d)
            p = os.path.join(d, "m-same-name.parquet")
            shutil.copy(man.manifest_path, p)
            mans[p] = dataclasses.replace(
                man, manifest_path=p,
                added_snapshot_id=111 + i, sequence_number=7 + i)
        out = t._entries_union_df(mans)
        # a basename join would match each file's entries to BOTH
        # pointer rows (4x fan-out); the full-path join keeps 2x
        assert out.count() == 2 * n_entries

    def test_entries_df_distributed_no_fanout(self, spark, tmp_loc,
                                              monkeypatch):
        """r17 (VERDICT r16 item 2): the DISTRIBUTED entries_df plane
        (past the rewrite-manifests threshold) must join inheritance on
        the full normalized path too — same clone/import shape as the
        union-df test above, forced onto the big-table leg by a zeroed
        threshold and a monkeypatched manifest list."""
        import iceberg_cpp_spark.table as tbl

        t, df = _mk(spark, tmp_loc, name="htdist")
        snap = t.current_snapshot()
        [man] = tbl.mf.read_manifest_list(snap.manifest_list)
        n_entries = t.entries_df().count()
        dirs = [os.path.join(tmp_loc, d) for d in ("distA", "distB")]
        dup = []
        for i, d in enumerate(dirs):
            os.makedirs(d)
            p = os.path.join(d, "m-same-name.parquet")
            shutil.copy(man.manifest_path, p)
            dup.append(dataclasses.replace(
                man, manifest_path=p,
                added_snapshot_id=111 + i, sequence_number=7 + i))
        t = t.update_properties(
            {"engine.maintenance.rewrite-manifests-distributed-threshold":
             "0"})
        orig = tbl.mf.read_manifest_list
        monkeypatch.setattr(
            tbl.mf, "read_manifest_list",
            lambda path, *a, **kw: (list(dup)
                                    if path == t.current_snapshot()
                                    .manifest_list else orig(path, *a, **kw)))
        out = t.entries_df()
        # a basename join matches each copy's entries to BOTH pointer
        # rows (4x); the full-path join keeps exactly 2x (the entries
        # carry explicit snapshot/sequence values, so inheritance
        # itself is exercised by the rebase-plane test below)
        assert out.count() == 2 * n_entries

    def test_validate_rebase_distributed_no_fanout(self, spark, tmp_loc):
        """r17 (VERDICT r16 item 2): _validate_rebase_distributed's
        new-delete conflict scan inherits each entry's sequence number
        from ITS OWN manifest pointer. Two same-basename delete-manifest
        copies with different sequence numbers: only the one past the
        read snapshot may conflict (n=1); the old basename join fanned
        every entry to both pointers and double-counted (n=2)."""
        import dataclasses as dc

        import pytest

        import iceberg_cpp_spark.core.manifests as mf
        import iceberg_cpp_spark.table as tbl
        from iceberg_cpp_spark.plans import expressions as ex

        t, df = _mk(spark, tmp_loc, name="htreb")
        snap = t.current_snapshot()
        dataman = list(mf.read_manifest_list(snap.manifest_list))
        # author the commit_files_df shard shape directly: one delete
        # entry with NULL sequence number (inherited from the pointer)
        # under the SAME basename in two directories, pointers seq 1/99
        schema = t.schema()
        spec = t.spec()
        dirs = [os.path.join(tmp_loc, d) for d in ("rebA", "rebB")]
        dup = []
        for i, d in enumerate(dirs):
            os.makedirs(d)
            p = os.path.join(d, "m-same-name.parquet")
            w = mf.ManifestWriter(p, spec, schema, snapshot_id=0,
                                  content=mf.MANIFEST_CONTENT_DELETES,
                                  version=2)
            w.add(mf.ManifestEntry(
                status=mf.STATUS_ADDED,
                data_file=mf.DataFile(
                    content=mf.CONTENT_POSITION_DELETES,
                    file_path=os.path.join(tmp_loc, "ext-del.parquet"),
                    file_format="parquet", partition={},
                    record_count=1, file_size_in_bytes=10),
                snapshot_id=None, sequence_number=None))
            dup.append(dc.replace(w.close(),
                                  sequence_number=1 if i == 0 else 99))
        live = {x.file_path for x in t.scan().plan_files()}
        with pytest.raises(tbl.ValidationError) as ei:
            t._validate_rebase_distributed(
                dataman + dup, read_seq=50,
                drop_paths=set(sorted(live)[:1]), drop_dv_for=set(),
                require_live=set(), operation="test-rewrite")
        # only rebB's entry inherits a sequence number past the read
        # snapshot; the old basename join fanned the null-seq entries
        # to BOTH pointer rows and reported 2
        assert "1 delete file(s)" in str(ei.value), str(ei.value)


class TestManifestListMemo:
    def test_history_tables_read_each_list_once(self, spark, tmp_loc,
                                                monkeypatch):
        import iceberg_cpp_spark.table as tbl

        from iceberg_cpp_spark.plans import expressions as ex

        t, df = _mk(spark, tmp_loc)
        t.append(df.withColumn("k", df["k"] + 10))
        t.delete_where(ex.eq(ex.Reference("k"), 1))
        n_snaps = len(t.metadata.snapshots)
        assert n_snaps >= 3
        calls = []
        orig = tbl.mf.read_manifest_list

        def counting(path, *a, **kw):
            calls.append(path)
            return orig(path, *a, **kw)

        monkeypatch.setattr(tbl.mf, "read_manifest_list", counting)
        t.all_manifests_df().count()
        t.all_entries_df().count()
        t.all_files_df().count()
        assert len(calls) == n_snaps, (
            f"manifest lists re-read: {len(calls)} reads for "
            f"{n_snaps} snapshots — the per-metadata memo regressed")

    def test_memo_invalidates_on_commit(self, spark, tmp_loc):
        t, df = _mk(spark, tmp_loc, name="ht2")
        before = t.all_manifests_df().count()
        t.append(df)
        after = t.all_manifests_df().count()
        assert after > before, "memo survived a metadata replacement"
