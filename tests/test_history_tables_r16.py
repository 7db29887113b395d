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
