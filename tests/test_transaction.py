"""Multi-action Transaction (reference transaction.h:31-51 — declared
there, unimplemented; type_fwd.h:153-157): several DML / property ops
accumulate on a working copy and publish atomically with ONE
metadata-pointer CAS; concurrent-writer conflicts rebase with
batch-level validation."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.table import IceTable, ValidationError


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "data", it.StringType(), False),
    ])


def _df(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit(tag), F.col("id")).alias("data"))


def _meta_versions(loc):
    return sorted(glob.glob(os.path.join(loc, "metadata", "*.metadata.json")))


class TestTransaction:
    def test_append_delete_props_one_atomic_commit(self, spark, tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 10))
        base_versions = _meta_versions(f"{tmp_loc}/t")
        base_snaps = len(t.metadata.snapshots)

        txn = t.new_transaction()
        txn.append(_df(spark, 10, 20, tag="y"))
        txn.delete_where(ex.lt(ex.Reference("id"), 3))
        txn.update_properties({"pipeline.run": "r13"})
        # nothing visible yet: no new metadata file, a fresh loader
        # still reads the pre-transaction contents
        assert _meta_versions(f"{tmp_loc}/t") == base_versions
        assert IceTable.load(spark, f"{tmp_loc}/t").to_df().count() == 10
        # ...but the transaction's own view sees the pending chain
        assert txn.table().to_df().count() == 17

        out = txn.commit()
        # exactly ONE new metadata version carries the whole chain
        assert len(_meta_versions(f"{tmp_loc}/t")) == len(base_versions) + 1
        assert len(out.metadata.snapshots) == base_snaps + 2
        got = {r["id"] for r in out.to_df().collect()}
        assert got == set(range(3, 20))
        assert out.properties()["pipeline.run"] == "r13"
        fresh = IceTable.load(spark, f"{tmp_loc}/t")
        assert fresh.to_df().count() == 17

    def test_intra_transaction_delete_sees_pending_append(self, spark,
                                                          tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 5))
        txn = t.new_transaction()
        txn.append(_df(spark, 100, 105, tag="y"))
        # deletes rows that only exist in the PENDING append
        txn.delete_where(ex.gt_eq(ex.Reference("id"), 103))
        out = txn.commit()
        assert {r["id"] for r in out.to_df().collect()} == (
            set(range(0, 5)) | {100, 101, 102})

    def test_concurrent_append_rebases(self, spark, tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 5))
        txn = t.new_transaction()
        txn.append(_df(spark, 10, 15, tag="y"))
        txn.delete_where(ex.eq(ex.Reference("id"), 0))
        # concurrent writer wins the next version file
        other = IceTable.load(spark, f"{tmp_loc}/t")
        other.append(_df(spark, 100, 103, tag="z"))
        out = txn.commit()  # CAS fails once, rebases, retries
        got = {r["id"] for r in out.to_df().collect()}
        assert got == ({1, 2, 3, 4} | set(range(10, 15))
                       | {100, 101, 102})
        # the rebuilt chain sits ON TOP of the concurrent commit
        fresh = IceTable.load(spark, f"{tmp_loc}/t")
        assert {r["id"] for r in fresh.to_df().collect()} == got

    def test_concurrent_rewrite_of_deleted_file_conflicts(self, spark,
                                                          tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 10))
        txn = t.new_transaction()
        txn.delete_where(ex.lt(ex.Reference("id"), 3))  # rewrites file(s)
        other = IceTable.load(spark, f"{tmp_loc}/t")
        other.rewrite_data_files()  # compaction replaces those files
        with pytest.raises(ValidationError, match="concurrent"):
            txn.commit()

    def test_whole_replace_conflicts_with_any_commit(self, spark, tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 5))
        txn = t.new_transaction()
        txn.overwrite(_df(spark, 50, 55, tag="w"))
        other = IceTable.load(spark, f"{tmp_loc}/t")
        other.append(_df(spark, 100, 101, tag="z"))
        with pytest.raises(ValidationError, match="erase"):
            txn.commit()

    def test_closed_and_empty_transactions(self, spark, tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 3))
        txn = t.new_transaction()
        assert txn.commit() is t  # empty txn: no-op, no new version
        with pytest.raises(ValueError, match="already committed"):
            txn.append(_df(spark, 3, 4))
        with pytest.raises(ValueError, match="already committed"):
            txn.commit()

    def test_non_transaction_aware_op_fails_loudly(self, spark, tmp_loc):
        """Ops that commit metadata outside the _commit_files plane
        (spec evolution, snapshot expiry, refs) can't be rebase-replayed
        — they must refuse inside a transaction, not silently vanish
        from the conflict log."""
        from iceberg_cpp_spark.functions import transforms as tr

        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 3))
        txn = t.new_transaction()
        txn.append(_df(spark, 3, 6, tag="y"))
        with pytest.raises(ValueError, match="not transaction-aware"):
            txn.table().create_branch("audit")
        # the transaction itself is still committable afterwards
        out = txn.commit()
        assert out.to_df().count() == 6

    def test_branch_mismatch_refused(self, spark, tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 3))
        t = t.create_branch("audit")
        txn = t.new_transaction()
        with pytest.raises(ValueError, match="bound to branch"):
            txn.table().append(_df(spark, 3, 4), branch="audit")

    def test_nested_transaction_refused(self, spark, tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        txn = t.new_transaction()
        with pytest.raises(ValueError, match="already inside"):
            txn.table().new_transaction()
        txn.commit()

    def test_add_files_and_commit_files_df_in_transaction(self, spark,
                                                          tmp_loc):
        """The import planes compose with transactions: add_files (and
        its internal name-mapping property update) and the
        executor-authored commit_files_df both join the pending chain
        and publish atomically — and survive a concurrent-append
        rebase."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        paths = []
        for i in range(3):
            p = os.path.join(tmp_loc, f"imp{i}.parquet")
            pq.write_table(pa.table({"id": [500 + i], "data": [f"i{i}"]}),
                           p)
            paths.append(p)
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 3))
        txn = t.new_transaction()
        txn.add_files(paths)
        desc = spark.createDataFrame(
            [(p, 1, os.path.getsize(p)) for p in paths[:1]],
            "file_path string, record_count long, file_size_in_bytes long")
        # synthetic second registration of imp0 via the executor plane
        txn.commit_files_df(desc.withColumn(
            "file_path", F.concat(F.col("file_path"), F.lit(""))))
        base_count = IceTable.load(spark, f"{tmp_loc}/t").to_df().count()
        assert base_count == 3  # nothing visible mid-txn
        other = IceTable.load(spark, f"{tmp_loc}/t")
        other.append(_df(spark, 100, 102, tag="z"))
        out = txn.commit()  # rebase replays add_files + shard pointers
        got = [r["id"] for r in out.to_df().collect()]
        assert sorted(got) == sorted(
            [0, 1, 2, 100, 101, 500, 500, 501, 502])
        assert out.properties().get("engine.read.name-based") == "true"

    def test_catalog_backed_transaction(self, spark, tmp_loc):
        """Catalog path: the one publish CAS goes through
        catalog.commit_table with an AssertRefSnapshotId on the txn's
        base; a concurrent catalog commit fails it once and the rebase
        retries (same semantics as the filesystem exclusive-create)."""
        from iceberg_cpp_spark.sources.catalog import FileSystemCatalog

        cat = FileSystemCatalog(f"{tmp_loc}/wh")
        cat.create_namespace("db")
        cat.create_table("db.t", _schema())
        t = cat.load_table("db.t", spark=spark)
        t = t.append(_df(spark, 0, 5))
        txn = t.new_transaction()
        txn.append(_df(spark, 10, 13, tag="y"))
        txn.delete_where(ex.eq(ex.Reference("id"), 1))
        # concurrent writer through the catalog
        other = cat.load_table("db.t", spark=spark)
        other.append(_df(spark, 100, 102, tag="z"))
        out = txn.commit()
        got = {r["id"] for r in out.to_df().collect()}
        assert got == {0, 2, 3, 4, 10, 11, 12, 100, 101}
        fresh = cat.load_table("db.t", spark=spark)
        assert {r["id"] for r in fresh.to_df().collect()} == got

    def test_branch_transaction_leaves_main_untouched(self, spark,
                                                      tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 5))
        t = t.create_branch("dev")
        txn = t.new_transaction(branch="dev")
        txn.append(_df(spark, 10, 13, tag="d"))
        txn.delete_where(ex.eq(ex.Reference("id"), 0))
        out = txn.commit()
        assert {r["id"] for r in out.to_df().collect()} == set(range(5))
        dev = out.scan().use_ref("dev").to_df()
        assert {r["id"] for r in dev.collect()} == {1, 2, 3, 4, 10, 11, 12}

    def test_wap_staging_inside_transaction(self, spark, tmp_loc):
        """A WAP-staged append rides the pending chain without moving
        the ref; after the atomic publish it stays invisible until
        publish_wap cherry-picks it."""
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema(),
                            properties={"write.wap.enabled": "true"})
        t = t.append(_df(spark, 0, 3))
        txn = t.new_transaction()
        txn.append(_df(spark, 10, 12, tag="w"), wap_id="w1")
        txn.append(_df(spark, 20, 22, tag="n"))
        out = txn.commit()
        assert {r["id"] for r in out.to_df().collect()} == {0, 1, 2, 20, 21}
        out = out.publish_wap("w1")
        assert {r["id"] for r in out.to_df().collect()} == {
            0, 1, 2, 10, 11, 20, 21}

    def test_mor_and_dv_deletes_inside_transaction(self, spark, tmp_loc):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 10))
        txn = t.new_transaction()
        txn.delete_where(ex.lt(ex.Reference("id"), 3),
                         mode="merge-on-read")
        txn.delete_where(ex.gt(ex.Reference("id"), 7),
                         mode="deletion-vector")
        txn.append(_df(spark, 100, 102, tag="n"))
        out = txn.commit()
        assert {r["id"] for r in out.to_df().collect()} == {
            3, 4, 5, 6, 7, 100, 101}

    def test_randomized_txn_equals_sequential(self, spark, tmp_loc):
        """Property sweep: a random op sequence applied inside ONE
        transaction must produce exactly the table contents of the same
        ops committed one-by-one (the transaction only changes
        ATOMICITY, never results)."""
        import random

        rng = random.Random(20260815)
        t1 = IceTable.create(spark, f"{tmp_loc}/t1", _schema())
        t2 = IceTable.create(spark, f"{tmp_loc}/t2", _schema())
        t1 = t1.append(_df(spark, 0, 8))
        t2 = t2.append(_df(spark, 0, 8))
        base = 100
        ops = []
        for _ in range(6):
            kind = rng.choice(["append", "delete", "merge"])
            if kind == "append":
                lo = base
                hi = base + rng.randint(1, 6)
                base += 50
                ops.append(("append", lo, hi))
            elif kind == "delete":
                ops.append(("delete", rng.randint(0, base)))
            else:
                k = rng.randint(0, 7)
                ops.append(("merge", k))
        txn = t1.new_transaction()
        for op in ops:
            if op[0] == "append":
                txn.append(_df(spark, op[1], op[2], tag="a"))
                t2 = t2.append(_df(spark, op[1], op[2], tag="a"))
            elif op[0] == "delete":
                txn.delete_where(ex.lt(ex.Reference("id"), op[1]))
                t2 = t2.delete_where(ex.lt(ex.Reference("id"), op[1]))
            else:
                src = spark.createDataFrame(
                    [(op[1], f"m{op[1]}")], "id long, data string")
                txn.merge_into(src, on=["id"])
                t2 = t2.merge_into(src, on=["id"])
        t1 = txn.commit()
        rows1 = sorted(tuple(r) for r in t1.to_df().collect())
        rows2 = sorted(tuple(r) for r in t2.to_df().collect())
        assert rows1 == rows2, ops

    def test_rebase_replays_merge_and_props(self, spark, tmp_loc):
        """A mixed merge_into + update_properties transaction survives
        a concurrent append: replay preserves op order and reuses the
        written data files."""
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 5))
        txn = t.new_transaction()
        src = spark.createDataFrame(
            [(2, "upd2"), (7, "new7")], "id long, data string")
        txn.merge_into(src, on=["id"])
        txn.update_properties({"stage": "merged"})
        other = IceTable.load(spark, f"{tmp_loc}/t")
        other.append(_df(spark, 100, 102, tag="z"))
        out = txn.commit()
        got = {r["id"]: r["data"] for r in out.to_df().collect()}
        assert got[2] == "upd2" and got[7] == "new7"
        assert {100, 101} <= set(got)
        assert out.properties()["stage"] == "merged"


class TestTransactionBulkRegister:
    def test_rebase_after_bulk_register_then_delete(self, spark, tmp_loc):
        """ADVICE r13 (medium): commit_files_df registers files as
        prebuilt shard pointers (new_files=[]); a later delete_where in
        the SAME txn puts those paths in drop/require sets. A conflict
        rebase must recognize them as txn-added (the replay re-adds
        them) instead of demanding them live on the fresh head and
        raising a spurious ValidationError."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from iceberg_cpp_spark.core import name_mapping as nm

        paths = []
        for i in range(4):
            p = os.path.join(tmp_loc, f"bulk{i}.parquet")
            pq.write_table(pa.table({"id": [1000 + i],
                                     "data": [f"b{i}"]}), p)
            paths.append(p)
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema())
        t = t.append(_df(spark, 0, 3))
        t = t.update_properties({
            nm.PROPERTY_KEY:
                nm.NameMapping.from_schema(t.schema()).to_json_string(),
            "engine.read.name-based": "true",
            "engine.commit.manifest-shard-entries": "2"})
        txn = t.new_transaction()
        desc = spark.createDataFrame(
            [(p, 1, os.path.getsize(p)) for p in paths],
            "file_path string, record_count long, file_size_in_bytes long")
        txn.commit_files_df(desc)
        # rows that exist ONLY in the bulk-registered files
        txn.delete_where(ex.gt_eq(ex.Reference("id"), 1002))
        other = IceTable.load(spark, f"{tmp_loc}/t")
        other.append(_df(spark, 100, 102, tag="z"))
        out = txn.commit()  # CAS fails once; rebase must NOT raise
        got = sorted(r["id"] for r in out.to_df().collect())
        assert got == [0, 1, 2, 100, 101, 1000, 1001]


class TestTransactionSurface:
    """VERDICT r13 task 4: every public mutator's transaction behavior
    is pinned — COMPOSE for the _commit_files-based DML/maintenance
    planes (explicit Transaction methods), REFUSE LOUDLY for
    metadata-plane ops and physical-delete maintenance. No silent
    base-table commit from a working copy."""

    def _seeded(self, spark, tmp_loc, props=None):
        t = IceTable.create(spark, f"{tmp_loc}/t", _schema(),
                            properties=props or {})
        return t.append(_df(spark, 0, 6))

    def test_update_where_composes(self, spark, tmp_loc):
        t = self._seeded(spark, tmp_loc)
        txn = t.new_transaction()
        txn.append(_df(spark, 10, 12, tag="y"))
        txn.update_where(ex.lt(ex.Reference("id"), 2), {"data": "zz"})
        assert IceTable.load(spark, f"{tmp_loc}/t").to_df().count() == 6
        out = txn.commit()
        got = {r["id"]: r["data"] for r in out.to_df().collect()}
        assert got[0] == "zz" and got[1] == "zz" and len(got) == 8
        # the pending append's rows were visible to the update
        assert got[10] == "y10"

    def test_update_where_updates_pending_rows(self, spark, tmp_loc):
        t = self._seeded(spark, tmp_loc)
        txn = t.new_transaction()
        txn.append(_df(spark, 100, 102, tag="y"))
        txn.update_where(ex.gt_eq(ex.Reference("id"), 100), {"data": "u"})
        out = txn.commit()
        got = {r["id"]: r["data"] for r in out.to_df().collect()}
        assert got[100] == "u" and got[101] == "u"

    def test_delete_by_keys_composes(self, spark, tmp_loc):
        t = self._seeded(spark, tmp_loc)
        txn = t.new_transaction()
        txn.append(_df(spark, 10, 13, tag="y"))
        # equality delete lands AFTER the append in the chain: it
        # applies to the pending rows too (seq ordering inside the txn)
        txn.delete_by_keys(spark.createDataFrame([(1,), (11,)], "id long"))
        out = txn.commit()
        assert sorted(r["id"] for r in out.to_df().collect()) == [
            0, 2, 3, 4, 5, 10, 12]

    def test_rewrite_data_files_composes(self, spark, tmp_loc):
        t = self._seeded(spark, tmp_loc)
        t = t.append(_df(spark, 6, 12))
        txn = t.new_transaction()
        txn.append(_df(spark, 100, 103, tag="y"))
        txn.rewrite_data_files(target_file_count=1)
        out = txn.commit()
        assert out.to_df().count() == 15
        assert len(out.scan().plan_files()) == 1  # compacted w/ pending

    def test_rewrite_data_files_conflicts_with_any_commit(self, spark,
                                                          tmp_loc):
        t = self._seeded(spark, tmp_loc)
        txn = t.new_transaction()
        txn.rewrite_data_files(target_file_count=1)
        other = IceTable.load(spark, f"{tmp_loc}/t")
        other.append(_df(spark, 100, 102, tag="z"))
        with pytest.raises(ValidationError):
            txn.commit()  # whole-content replace vs concurrent append

    def test_rewrite_position_deletes_composes(self, spark, tmp_loc):
        t = self._seeded(spark, tmp_loc, {"format-version": "3"})
        v0 = len(_meta_versions(f"{tmp_loc}/t"))
        txn = t.new_transaction()
        txn.delete_where(ex.eq(ex.Reference("id"), 2),
                         mode="merge-on-read")
        txn.rewrite_position_deletes()
        out = txn.commit()
        assert len(_meta_versions(f"{tmp_loc}/t")) == v0 + 1  # ONE CAS
        assert sorted(r["id"] for r in out.to_df().collect()) == [
            0, 1, 3, 4, 5]
        dels = out.scan().plan_deletes()
        assert dels and all(d.is_deletion_vector for d in dels)

    def test_rewrite_equality_deletes_composes(self, spark, tmp_loc):
        t = self._seeded(spark, tmp_loc, {"format-version": "3"})
        txn = t.new_transaction()
        txn.delete_by_keys(spark.createDataFrame([(3,)], "id long"))
        txn.rewrite_equality_deletes()
        out = txn.commit()
        assert sorted(r["id"] for r in out.to_df().collect()) == [
            0, 1, 2, 4, 5]
        dels = out.scan().plan_deletes()
        assert dels and all(d.is_deletion_vector for d in dels)

    def test_metadata_plane_ops_refuse_loudly(self, spark, tmp_loc):
        """expire_snapshots / refs / rollback / spec evolution /
        orphan cleanup would either vanish from the rebase log or
        delete files non-transactionally — all must raise, and the
        BASE table must stay untouched."""
        t = self._seeded(spark, tmp_loc)
        t = t.append(_df(spark, 6, 9))
        txn = t.new_transaction()
        txn.append(_df(spark, 100, 102, tag="y"))
        w = txn.table()
        with pytest.raises(ValueError, match="not transaction-aware"):
            w.expire_snapshots(keep_last=1)
        with pytest.raises(ValueError, match="not transaction-aware"):
            w.create_branch("audit")
        with pytest.raises(ValueError, match="not transaction-aware"):
            w.rollback_to(t.snapshots()[0].snapshot_id)
        with pytest.raises(ValueError, match="not transaction-aware"):
            w.update_spec([])
        with pytest.raises(ValueError, match="not transaction-aware"):
            w.replace_sort_order([])
        with pytest.raises(ValueError,
                           match="not transaction-aware"):
            w.remove_orphan_files(dry_run=True)
        # the failed calls left no base commit and the txn still works
        assert IceTable.load(spark, f"{tmp_loc}/t").to_df().count() == 9
        out = txn.commit()
        assert out.to_df().count() == 11
