"""Merge-on-read deletes: position-delete and equality-delete files
applied at scan time (the reference rejects delete files outright —
table_scan.cc:288-291)."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core import manifests as mf
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.plans import expressions as ex


@pytest.fixture()
def li_table(spark, lineitem, tmp_loc):
    t = IceTable.create(spark, os.path.join(tmp_loc, "li"),
                        schema_from_spark(lineitem.schema))
    t.append(lineitem)
    return t


class TestPositionDeletes:
    def test_mor_delete_matches_cow_result(self, spark, lineitem, li_table):
        n_a = lineitem.filter("l_returnflag = 'A'").count()
        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "A"),
                              mode="merge-on-read")
        got = li_table.to_df()
        assert got.filter("l_returnflag = 'A'").count() == 0
        assert got.count() == 6000 - n_a
        # data files untouched (no rewrite): snapshot only added deletes
        s = li_table.current_snapshot()
        assert s.summary["operation"] == "delete"
        assert int(s.summary["added-delete-files"]) >= 1
        assert int(s.summary["added-position-deletes"]) == n_a

    def test_delete_files_planned(self, li_table):
        li_table.delete_where(ex.lt(ex.Reference("l_orderkey"), 10),
                              mode="merge-on-read")
        dels = li_table.scan().plan_deletes()
        assert len(dels) == 1
        assert dels[0].content == mf.CONTENT_POSITION_DELETES
        assert dels[0].record_count > 0

    def test_two_mor_deletes_compose(self, spark, lineitem, li_table):
        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "A"),
                              mode="merge-on-read")
        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                              mode="merge-on-read")
        got = li_table.to_df()
        assert got.filter("l_returnflag in ('A','R')").count() == 0
        want = lineitem.filter("l_returnflag not in ('A','R')").count()
        assert got.count() == want

    def test_append_after_mor_delete_unaffected(self, spark, lineitem, li_table):
        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "A"),
                              mode="merge-on-read")
        n = li_table.to_df().count()
        new_rows = lineitem.filter("l_returnflag = 'A'").limit(20)
        li_table.append(new_rows)
        got = li_table.to_df()
        # freshly appended 'A' rows are new files → position deletes
        # (file-scoped) cannot touch them
        assert got.count() == n + 20
        assert got.filter("l_returnflag = 'A'").count() == 20

    def test_compaction_materializes_deletes(self, spark, lineitem, li_table):
        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "A"),
                              mode="merge-on-read")
        n = li_table.to_df().count()
        li_table.rewrite_data_files(target_file_count=2)
        assert li_table.scan().plan_deletes() == []
        assert li_table.to_df().count() == n

    def test_time_travel_before_delete(self, spark, lineitem, li_table):
        s1 = li_table.current_snapshot().snapshot_id
        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "A"),
                              mode="merge-on-read")
        assert li_table.scan(snapshot_id=s1).to_df().count() == 6000


class TestEqualityDeletes:
    def test_delete_by_keys(self, spark, lineitem, li_table):
        keys = spark.createDataFrame([("A", "F")], "l_returnflag string, l_linestatus string")
        li_table.delete_by_keys(keys)
        got = li_table.to_df()
        assert got.filter("l_returnflag='A' and l_linestatus='F'").count() == 0
        want = lineitem.filter("not (l_returnflag='A' and l_linestatus='F')").count()
        assert got.count() == want

    def test_sequence_visibility(self, spark, lineitem, li_table):
        """rows appended AFTER the equality delete keep the deleted key."""
        keys = spark.createDataFrame([("A",)], "l_returnflag string")
        li_table.delete_by_keys(keys)
        assert li_table.to_df().filter("l_returnflag='A'").count() == 0
        li_table.append(lineitem.filter("l_returnflag='A'").limit(15))
        got = li_table.to_df()
        assert got.filter("l_returnflag='A'").count() == 15

    def test_unknown_key_column_rejected(self, spark, li_table):
        keys = spark.createDataFrame([(1,)], "nope int")
        with pytest.raises(ValueError, match="equality column"):
            li_table.delete_by_keys(keys)

    def test_metadata_columns_with_deletes(self, spark, li_table):
        li_table.delete_where(ex.lt(ex.Reference("l_orderkey"), 5),
                              mode="merge-on-read")
        df = li_table.scan().with_metadata_columns().to_df()
        assert "_file" in df.columns and "_pos" in df.columns
        assert df.count() == li_table.to_df().count()


class TestCowWithMorInteraction:
    def test_cow_delete_does_not_resurrect_mor_deleted_rows(
            self, spark, lineitem, li_table):
        """Regression: copy-on-write rewrite of a file carrying live
        position deletes must apply them, not resurrect the dead rows."""
        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                              mode="merge-on-read")
        alive = li_table.to_df().count()
        f_alive = li_table.to_df().filter("l_linestatus = 'F'").count()
        li_table.delete_where(ex.eq(ex.Reference("l_linestatus"), "F"))
        got = li_table.to_df()
        assert got.count() == alive - f_alive
        assert got.filter("l_returnflag = 'R'").count() == 0

    def test_update_where_rewrites_matched_rows(self, spark, lineitem,
                                                li_table):
        from pyspark.sql import functions as F

        n = li_table.to_df().count()
        n_r = li_table.to_df().filter("l_returnflag = 'R'").count()
        li_table.update_where(
            ex.eq(ex.Reference("l_returnflag"), "R"),
            {"l_linestatus": "X", "l_quantity": F.col("l_quantity") + 1000})
        got = li_table.to_df()
        assert got.count() == n  # UPDATE never changes cardinality
        assert got.filter("l_returnflag = 'R' and l_linestatus <> 'X'").count() == 0
        assert got.filter("l_returnflag = 'R'").count() == n_r
        assert got.filter("l_quantity > 1000").count() == n_r
        # unmatched rows untouched
        assert got.filter("l_returnflag <> 'R' and l_linestatus = 'X'").count() == 0
        with pytest.raises(ValueError, match="unknown column"):
            li_table.update_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                                  {"nope": 1})

    def test_update_where_respects_mor_deletes(self, spark, lineitem,
                                               li_table):
        """UPDATE's copy-on-write rewrite must not resurrect rows dead
        under merge-on-read deletes."""
        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                              mode="merge-on-read")
        alive = li_table.to_df().count()
        li_table.update_where(ex.eq(ex.Reference("l_linestatus"), "F"),
                              {"l_linestatus": "Y"})
        got = li_table.to_df()
        assert got.count() == alive
        assert got.filter("l_returnflag = 'R'").count() == 0
        assert got.filter("l_linestatus = 'F'").count() == 0

    def test_merge_into_respects_mor_deletes(self, spark, lineitem, li_table):
        from pyspark.sql import functions as F

        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                              mode="merge-on-read")
        alive = li_table.to_df().count()
        src = (lineitem.filter("l_orderkey <= 100 and l_returnflag <> 'R'")
               .dropDuplicates(["l_orderkey", "l_linenumber"])
               .withColumn("l_returnflag", F.lit("Z")))
        li_table.merge_into(src, on=["l_orderkey", "l_linenumber"],
                            when_not_matched=None)
        got = li_table.to_df()
        assert got.count() == alive
        assert got.filter("l_returnflag = 'R'").count() == 0


class TestChangelog:
    def test_changes_inserts_and_mor_deletes(self, spark, lineitem, li_table):
        from iceberg_cpp_spark.streaming.changelog import changes

        s1 = li_table.current_snapshot().snapshot_id
        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                              mode="merge-on-read")
        li_table.append(lineitem.filter("l_orderkey <= 50"))
        c = changes(li_table, from_snapshot_id=s1)
        by_type = {r["_change_type"]: r["n"] for r in
                   c.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
        assert by_type["delete"] == lineitem.filter("l_returnflag = 'R'").count()
        assert by_type["insert"] == lineitem.filter("l_orderkey <= 50").count()
        # ordinals increase per commit
        assert set(r["_change_ordinal"] for r in
                   c.select("_change_ordinal").distinct().collect()) == {0, 1}

    def test_changes_net_cancels_carryover(self, spark, lineitem, li_table):
        from iceberg_cpp_spark.streaming.changelog import changes

        s1 = li_table.current_snapshot().snapshot_id
        n_a = lineitem.filter("l_returnflag = 'A'").count()
        li_table.delete_where(ex.eq(ex.Reference("l_returnflag"), "A"))
        raw = changes(li_table, from_snapshot_id=s1)
        net = changes(li_table, from_snapshot_id=s1, net=True)
        # raw carries rewrite pairs; net is exactly the A-row deletes
        assert raw.filter("_change_type = 'insert'").count() > 0
        by_type = {r["_change_type"]: r["n"] for r in
                   net.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
        assert by_type == {"delete": n_a}

    def test_changes_full_history(self, spark, lineitem, li_table):
        from iceberg_cpp_spark.streaming.changelog import changes

        c = changes(li_table)  # since table creation
        assert c.filter("_change_type = 'insert'").count() == lineitem.count()

    def test_changes_bad_ancestor(self, spark, li_table):
        from iceberg_cpp_spark.streaming.changelog import changes

        with pytest.raises(ValueError, match="ancestor"):
            changes(li_table, from_snapshot_id=123456789)


class TestEqDeleteScaling:
    """Scan cost must not grow one join per eq-delete commit
    (VERDICT r03 scale-killer #2): all eq-delete files of a key set
    batch into ONE broadcast join, and rewrite_equality_deletes folds
    them into deletion vectors (zero joins afterwards)."""

    def test_twenty_commits_one_join(self, spark, lineitem, li_table):
        t = li_table
        for k in range(1, 21):
            t = t.delete_by_keys(
                spark.createDataFrame([(k,)], "l_orderkey long"))
        assert len([d for d in t.scan().plan_deletes()
                    if d.content == mf.CONTENT_EQUALITY_DELETES]) == 20
        df = t.to_df()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # one seq-map join + one batched key join (+1 slack for AQE
        # variants) — NOT 21
        assert plan.count("Join") <= 3, plan
        exp = lineitem.filter("l_orderkey < 1 or l_orderkey > 20").count()
        assert df.count() == exp
        assert df.filter("l_orderkey between 1 and 20").count() == 0

    def test_mixed_key_sets_one_join_each(self, spark, lineitem, li_table):
        t = li_table
        for k in range(1, 6):
            t = t.delete_by_keys(
                spark.createDataFrame([(k,)], "l_orderkey long"))
        for rf in ["A", "N"]:
            t = t.delete_by_keys(
                spark.createDataFrame([(rf,)], "l_returnflag string"))
        df = t.to_df()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # seq-map join + per key set: one fact join + one metadata-side
        # seq-tagging join inside the key aggregate = 1 + 2*2; the
        # 20-commit test above pins independence from commit count
        assert plan.count("Join") <= 5, plan
        exp = lineitem.filter(
            "(l_orderkey < 1 or l_orderkey > 5) "
            "and l_returnflag not in ('A','N')").count()
        assert df.count() == exp

    def test_unknown_record_count_not_force_broadcast(self, spark, lineitem,
                                                      li_table):
        """A delete file with record_count=None (imported/external
        manifests may lack counts) is UNKNOWN size, not zero: the
        broadcast gate must not force-broadcast it (ADVICE r4) — and
        the scan result stays correct either way."""
        import dataclasses

        t = li_table.delete_by_keys(
            spark.createDataFrame([(1,), (2,)], "l_orderkey long"))
        scan = t.scan()
        real = scan.plan_deletes()
        stripped = [dataclasses.replace(d, record_count=None) for d in real]
        # with known (tiny) counts the key join carries a broadcast hint
        counted = t.scan().to_df()._jdf.queryExecution().analyzed().toString()
        scan.plan_deletes = lambda: stripped
        df = scan.to_df()
        plan = df._jdf.queryExecution().analyzed().toString()
        # the metadata-side hints (seq-map, per-file fseq map) remain;
        # exactly the unknown-size delete-KEY hint must disappear
        assert plan.count("broadcast") == counted.count("broadcast") - 1, plan
        exp = lineitem.filter("l_orderkey not in (1,2)").count()
        assert df.count() == exp

    def test_sequence_visibility_survives_batching(self, spark, lineitem,
                                                   li_table):
        t = li_table
        t = t.delete_by_keys(spark.createDataFrame([(1,)], "l_orderkey long"))
        # rows appended AFTER the delete commit must survive it
        resurrected = lineitem.filter("l_orderkey = 1")
        t = t.append(resurrected)
        t = t.delete_by_keys(spark.createDataFrame([(2,)], "l_orderkey long"))
        got = t.to_df()
        assert got.filter("l_orderkey = 1").count() == resurrected.count()
        assert got.filter("l_orderkey = 2").count() == 0

    def test_rewrite_equality_deletes_folds_to_dvs(self, spark, lineitem,
                                                   li_table):
        t = li_table
        for k in range(1, 11):
            t = t.delete_by_keys(
                spark.createDataFrame([(k,)], "l_orderkey long"))
        t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                       mode="merge-on-read")  # parquet position deletes too
        before = sorted(r["l_orderkey"] for r in
                        t.to_df().select("l_orderkey").collect())
        t = t.rewrite_equality_deletes()
        dels = t.scan().plan_deletes()
        assert all(d.is_deletion_vector for d in dels), dels
        # post-fold scan: the eq-delete join PER COMMIT is gone. Under
        # the r14 cardinality gate the folded DVs apply as ONE
        # broadcast anti-join of executor-decoded positions (big side
        # fully JVM — no Python probe of every row); above the gate
        # (cap=0 here) the pointer-probe plane with ZERO joins.
        after_df = t.to_df()
        plan = after_df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Join") == 1, plan
        assert "ArrowEvalPython" not in plan
        after = sorted(r["l_orderkey"] for r in
                       after_df.select("l_orderkey").collect())
        assert before == after
        probe_t = t.update_properties(
            {"engine.read.dv-join-max-positions": "0"})
        probe_df = probe_t.to_df()
        pplan = probe_df._jdf.queryExecution() \
            .optimizedPlan().toString()
        assert pplan.count("Join") == 0, pplan
        assert sorted(r["l_orderkey"] for r in
                      probe_df.select("l_orderkey").collect()) == before
        t = probe_t.update_properties(
            removals=["engine.read.dv-join-max-positions"])
        # appends after the fold are untouched by the old deletes
        t = t.append(lineitem.filter("l_orderkey = 3"))
        assert t.to_df().filter("l_orderkey = 3").count() == \
            lineitem.filter("l_orderkey = 3").count()

    def test_rewrite_noop_without_eq_deletes(self, li_table):
        snap = li_table.current_snapshot().snapshot_id
        t2 = li_table.rewrite_equality_deletes()
        assert t2.current_snapshot().snapshot_id == snap


class TestMorDml:
    """Merge-on-read UPDATE / MERGE (write.update.mode /
    write.merge.mode = merge-on-read — the reference declares the
    properties with no write path): matched rows become position
    deletes + new-version data files; target files are never
    rewritten."""

    def _table(self, spark, loc, props=None, n=8):
        sch = it.Schema([
            it.NestedField(1, "k", it.LongType(), True),
            it.NestedField(2, "v", it.LongType(), False),
        ])
        t = IceTable.create(spark, loc, sch, properties=props or {})
        return t.append(spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
            .coalesce(1))

    def test_mor_update_values_and_file_survival(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t",
                        {"write.update.mode": "merge-on-read"})
        before = {f.file_path for f in t.scan().plan_files()}
        t = t.update_where(ex.lt(ex.Reference("k"), 3), {"v": 777})
        got = {r["k"]: r["v"] for r in t.to_df().collect()}
        assert got == {0: 777, 1: 777, 2: 777, 3: 30, 4: 40,
                       5: 50, 6: 60, 7: 70}
        after = {f.file_path for f in t.scan().plan_files()}
        assert before <= after  # nothing rewritten
        # time travel: pre-update snapshot unchanged
        snaps = t.snapshots()
        old = t.scan(snapshot_id=snaps[-2].snapshot_id).to_df()
        assert {r["k"]: r["v"] for r in old.collect()}[0] == 0

    def test_mor_update_folds_to_dvs(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t",
                        {"format-version": "3"})
        t = t.update_where(ex.eq(ex.Reference("k"), 1), {"v": 111},
                           mode="merge-on-read")
        t = t.rewrite_position_deletes()
        got = {r["k"]: r["v"] for r in t.to_df().collect()}
        assert got[1] == 111 and len(got) == 8

    def test_mor_merge_upsert(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t",
                        {"write.merge.mode": "merge-on-read"})
        before = {f.file_path for f in t.scan().plan_files()}
        src = spark.createDataFrame([(1, 111), (9, 999)], "k long, v long")
        t = t.merge_into(src, on=["k"])
        got = {r["k"]: r["v"] for r in t.to_df().collect()}
        assert got[1] == 111 and got[9] == 999 and got[0] == 0
        assert len(got) == 9
        assert before <= {f.file_path for f in t.scan().plan_files()}

    def test_mor_merge_duplicate_target_keys_each_version(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t", n=4)
        # duplicate key 2 in the TARGET (two rows with k=2)
        t = t.append(spark.createDataFrame([(2, 20)], "k long, v long")
                     .coalesce(1))
        src = spark.createDataFrame([(2, 222)], "k long, v long")
        t = t.merge_into(src, on=["k"], mode="merge-on-read")
        hits = t.to_df().filter("k = 2").collect()
        assert len(hits) == 2 and all(r["v"] == 222 for r in hits)

    def test_mor_merge_delete_mode_and_insert_only(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t")
        t = t.merge_into(
            spark.createDataFrame([(0, 0)], "k long, v long"),
            on=["k"], when_matched="delete", when_not_matched=None,
            mode="merge-on-read")
        assert sorted(r["k"] for r in t.to_df().collect()) == list(range(1, 8))
        # no matches, insert only
        t = t.merge_into(
            spark.createDataFrame([(50, 500)], "k long, v long"),
            on=["k"], mode="merge-on-read")
        assert t.to_df().filter("k = 50").count() == 1

    def test_mor_update_race_vs_compaction_aborts(self, spark, tmp_loc):
        from iceberg_cpp_spark.table import ValidationError

        t = self._table(spark, f"{tmp_loc}/t")
        stale = IceTable.load(spark, f"{tmp_loc}/t")
        t.rewrite_data_files(target_file_count=1)
        with pytest.raises(ValidationError, match="concurrent commit removed"):
            stale.update_where(ex.eq(ex.Reference("k"), 1), {"v": 1},
                               mode="merge-on-read")

    def test_unknown_modes_raise(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t")
        with pytest.raises(ValueError, match="unknown update mode"):
            t.update_where(ex.eq(ex.Reference("k"), 1), {"v": 1},
                           mode="bogus")
        with pytest.raises(ValueError, match="unknown merge mode"):
            t.merge_into(spark.createDataFrame([(1, 1)], "k long, v long"),
                         on=["k"], mode="bogus")
        with pytest.raises(ValueError, match="unknown delete mode"):
            t.delete_where(ex.eq(ex.Reference("k"), 1), mode="bogus")

    def test_delete_mode_property_default(self, spark, tmp_loc):
        t = self._table(spark, f"{tmp_loc}/t",
                        {"write.delete.mode": "merge-on-read"})
        before = {f.file_path for f in t.scan().plan_files()}
        t = t.delete_where(ex.eq(ex.Reference("k"), 0))
        assert t.to_df().count() == 7
        assert before <= {f.file_path for f in t.scan().plan_files()}


class TestDvFoldUncollected:
    """VERDICT r13 task 2: the DV-fold maintenance plane must never
    materialize the table's live-file list on the driver — the live set
    is a plan_files_df semi-join (executor-side end-to-end)."""

    def test_fold_never_calls_driver_plan_files(self, spark, tmp_loc):
        import unittest.mock as mock

        from iceberg_cpp_spark.table import TableScan

        sch = it.Schema([
            it.NestedField(1, "k", it.LongType(), True),
            it.NestedField(2, "v", it.LongType(), False),
        ])
        t = IceTable.create(spark, f"{tmp_loc}/t", sch,
                            properties={"format-version": "3"})
        t = t.append(spark.range(8).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
            .coalesce(1))
        t = t.update_where(ex.eq(ex.Reference("k"), 1), {"v": 111},
                           mode="merge-on-read")

        def boom(self, *a, **kw):
            raise AssertionError(
                "rewrite_position_deletes materialized the live-file "
                "plan on the driver (plan_files call)")

        with mock.patch.object(TableScan, "plan_files", boom):
            t = t.rewrite_position_deletes()
        got = {r["k"]: r["v"] for r in t.to_df().collect()}
        assert got[1] == 111 and len(got) == 8
        # the fold actually produced a DV and dropped the parquet leg
        dels = t.scan().plan_deletes()
        assert dels and all(d.is_deletion_vector for d in dels)

    def test_fold_eq_uncollected_live_set(self, spark, tmp_loc):
        """The eq fold's LIVE SET is also plan_files_df now (its
        materialization scan still plans tasks — that is the read
        plane's job, with its own large-scan strategy)."""
        sch = it.Schema([
            it.NestedField(1, "k", it.LongType(), True),
            it.NestedField(2, "v", it.LongType(), False),
        ])
        t = IceTable.create(spark, f"{tmp_loc}/t", sch,
                            properties={"format-version": "3"})
        t = t.append(spark.range(8).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
            .coalesce(1))
        t = t.delete_by_keys(spark.createDataFrame([(2,)], "k long"))
        t = t.rewrite_equality_deletes()
        assert sorted(r["k"] for r in t.to_df().collect()) == [
            0, 1, 3, 4, 5, 6, 7]
        dels = t.scan().plan_deletes()
        assert dels and all(d.is_deletion_vector for d in dels)

    def test_fold_200k_synthetic_rss(self, spark, tmp_loc):
        """ice_commit_1m's RSS discipline on the DV-fold plane: a 200k
        live-file table with a 10k-row position-delete fold keeps the
        driver flat — the live set is never a Python list."""
        import gc
        import time as _time

        from iceberg_cpp_spark.table import DataOperation

        sch = it.Schema(
            [it.NestedField(1, "id", it.LongType(), required=True)],
            schema_id=0)
        t = IceTable.create(spark, f"{tmp_loc}/t", sch,
                            properties={"format-version": "3"})
        n = 200_000
        desc = spark.range(n).select(
            F.concat(F.lit("/fake/data/part-"), F.col("id"),
                     F.lit(".parquet")).alias("file_path"),
            F.lit(100).cast("long").alias("record_count"),
            F.lit(4096).cast("long").alias("file_size_in_bytes"))
        t = t.commit_files_df(desc)
        # one REAL pos-delete parquet over 10k of the synthetic files
        # (the fold reads delete files, never data files); committed
        # through the internal plane — v3 forbids REGISTERING new
        # pos-delete files via commit_files_df by design
        pd_dir = f"{tmp_loc}/pd"
        (spark.range(10_000).select(
            F.concat(F.lit("/fake/data/part-"), F.col("id") * 20,
                     F.lit(".parquet")).alias("file_path"),
            (F.col("id") % 100).alias("pos"))
         .coalesce(1).sortWithinPartitions("file_path", "pos")
         .write.parquet(pd_dir))
        pd_path = next(os.path.join(pd_dir, f)
                       for f in sorted(os.listdir(pd_dir))
                       if f.endswith(".parquet"))
        t = t._commit_files([mf.DataFile(
            content=mf.CONTENT_POSITION_DELETES, file_path=pd_path,
            file_format="parquet", partition={}, record_count=10_000,
            file_size_in_bytes=os.path.getsize(pd_path))],
            operation=DataOperation.DELETE)

        def _rss_mb() -> float:
            with open("/proc/self/status") as fh:
                for line in fh:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1]) / 1024.0
            return 0.0

        gc.collect()
        rss0 = _rss_mb()
        t0 = _time.time()
        t = t.rewrite_position_deletes()
        el = _time.time() - t0
        gc.collect()
        delta = _rss_mb() - rss0
        assert delta < 400, (
            f"200k-file DV fold grew driver RSS by {delta:.0f} MiB — "
            "a live-file list leaked onto the driver")
        assert el < 120, f"200k-file DV fold took {el:.1f}s"
        dels = t.scan().plan_deletes()
        assert len(dels) == 10_000
        assert all(d.is_deletion_vector for d in dels)


def boom_factory():
    def boom(self, *a, **kw):
        raise AssertionError(
            "maintenance fold materialized the live-file plan on "
            "the driver (plan_files call)")
    return boom
