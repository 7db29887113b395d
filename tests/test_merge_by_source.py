"""MERGE ``WHEN NOT MATCHED BY SOURCE`` (the Spark 3.4+ / SQL:2003
full-sync leg) and the loudly-enforced MERGE source-cardinality rule
(VERDICT r15 tasks 1 and 2).

Reference parity: the reference declares but never implements a write
path (transaction.h:31-51); the semantics pinned here are the
Spark-Iceberg MERGE rules — by-source clauses act on TARGET rows whose
key appears in no source row, expressions reference the target only,
first-wins ordering within the group, and a source with duplicate ON
keys raises (Spark's MERGE_CARDINALITY_VIOLATION) instead of silently
fanning out the rewrite.
"""

import os

import pytest

from iceberg_cpp_spark import (IceSqlEngine, IceTable, MatchedClause,
                               NotMatchedBySourceClause, NotMatchedClause)
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def _mk(spark, tmp_loc, name="tbs", mode=None):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, name string, v double")
    props = {"write.merge.mode": mode} if mode else None
    t = IceTable.create(spark, os.path.join(tmp_loc, name),
                        schema_from_spark(df.schema), properties=props)
    t.append(df)
    return t


def _state(t):
    return {r["k"]: (r["name"], r["v"]) for r in t.to_df().collect()}


class TestBySourceEngine:
    def test_full_sync_delete(self, spark, tmp_loc):
        # mirror-a-dimension: target rows absent from the source vanish
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(2, "B", 22.0), (3, "C", 33.0)],
                                    "k int, name string, v double")
        t = t.merge_into(
            src, on=["k"],
            when_matched=[MatchedClause("update")],
            when_not_matched=[NotMatchedClause()],
            when_not_matched_by_source=[NotMatchedBySourceClause("delete")])
        assert _state(t) == {2: ("B", 22.0), 3: ("C", 33.0)}

    def test_by_source_delete_string_shorthand(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(1,), (4,)], "k int")
        t = t.merge_into(src, on=["k"], when_matched=None,
                         when_not_matched=None,
                         when_not_matched_by_source="delete")
        assert set(_state(t)) == {1, 4}

    def test_conditional_by_source_update(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(3, "C", 33.0)],
                                    "k int, name string, v double")
        t = t.merge_into(
            src, on=["k"], when_matched=None, when_not_matched=None,
            when_not_matched_by_source=[NotMatchedBySourceClause(
                "update", condition="t.v < 25",
                assignments={"name": "'stale'"})])
        # k=1 (v=10) and k=2 (v=20) flagged; k=3 matched (kept); k=4 kept
        assert _state(t) == {1: ("stale", 10.0), 2: ("stale", 20.0),
                             3: ("c", 30.0), 4: ("d", 40.0)}

    def test_by_source_first_wins_ordering(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(3,)], "k int")
        t = t.merge_into(
            src, on=["k"], when_matched=None, when_not_matched=None,
            when_not_matched_by_source=[
                NotMatchedBySourceClause("delete", condition="t.v >= 40"),
                NotMatchedBySourceClause(
                    "update", assignments={"name": "'kept'"})])
        # k=4 deleted by clause 1; k=1/k=2 fall to clause 2; k=3 matched
        assert _state(t) == {1: ("kept", 10.0), 2: ("kept", 20.0),
                             3: ("c", 30.0)}

    def test_full_sync_mor_parity(self, spark, tmp_loc):
        src_rows = [(2, "B", 22.0), (3, "C", 33.0), (9, "i", 90.0)]
        results = []
        for mode in (None, "merge-on-read"):
            t = _mk(spark, tmp_loc, name=f"tbs_{mode or 'cow'}",
                    mode=mode)
            src = spark.createDataFrame(
                src_rows, "k int, name string, v double")
            t = t.merge_into(
                src, on=["k"],
                when_matched=[MatchedClause("update")],
                when_not_matched=[NotMatchedClause()],
                when_not_matched_by_source=[
                    NotMatchedBySourceClause("delete")])
            results.append(_state(t))
        assert results[0] == results[1] == {
            2: ("B", 22.0), 3: ("C", 33.0), 9: ("i", 90.0)}

    def test_mor_by_source_update_and_matched_no_touch(self, spark,
                                                       tmp_loc):
        # MoR: a matched row no clause touches stays; unmatched rows
        # update in place via delete+version
        t = _mk(spark, tmp_loc, mode="merge-on-read")
        src = spark.createDataFrame([(2, "skip")], "k int, op string")
        t = t.merge_into(
            src, on=["k"],
            when_matched=[MatchedClause(
                "update", condition="s.op = 'U'",
                assignments={"name": "s.op"})],
            when_not_matched=None,
            when_not_matched_by_source=[NotMatchedBySourceClause(
                "update", condition="t.k = 4",
                assignments={"v": "t.v * 2"})])
        assert _state(t) == {1: ("a", 10.0), 2: ("b", 20.0),
                             3: ("c", 30.0), 4: ("d", 80.0)}

    def test_by_source_through_transaction(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(1, "A", 11.0)],
                                    "k int, name string, v double")
        txn = t.new_transaction()
        txn.merge_into(src, on=["k"],
                       when_matched=[MatchedClause("update")],
                       when_not_matched=None,
                       when_not_matched_by_source="delete")
        t = txn.commit()
        assert _state(t) == {1: ("A", 11.0)}


class TestBySourceValidation:
    def test_update_needs_assignments(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(ValueError, match="explicit assignments"):
            t.merge_into(src, on=["k"], when_matched=None,
                         when_not_matched=None,
                         when_not_matched_by_source=[
                             NotMatchedBySourceClause("update")])

    def test_source_reference_refuses(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(1, "x")], "k int, tag string")
        with pytest.raises(ValueError, match="target columns only"):
            t.merge_into(src, on=["k"], when_matched=None,
                         when_not_matched=None,
                         when_not_matched_by_source=[
                             NotMatchedBySourceClause(
                                 "update",
                                 assignments={"name": "s.tag"})])

    def test_conditionless_must_be_last(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(ValueError, match="unreachable"):
            t.merge_into(
                src, on=["k"], when_matched=None, when_not_matched=None,
                when_not_matched_by_source=[
                    NotMatchedBySourceClause("delete"),
                    NotMatchedBySourceClause(
                        "update", condition="t.v > 0",
                        assignments={"v": "0.0"})])

    def test_delete_takes_no_assignments(self):
        # direct normalization check (no table needed)
        from iceberg_cpp_spark.table import _normalize_merge_clauses
        with pytest.raises(ValueError, match="no assignments"):
            _normalize_merge_clauses(
                None, None, [NotMatchedBySourceClause(
                    "delete", assignments={"v": "0"})])


class TestMergeCardinality:
    def test_duplicate_source_keys_refuse_string_path(self, spark,
                                                      tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame(
            [(2, "x", 1.0), (2, "y", 2.0)],
            "k int, name string, v double")
        with pytest.raises(ValueError, match="cardinality"):
            t.merge_into(src, on=["k"])

    def test_duplicate_source_keys_refuse_clause_path(self, spark,
                                                      tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame(
            [(2, 1.0), (2, 2.0)], "k int, delta double")
        with pytest.raises(ValueError, match="cardinality"):
            t.merge_into(
                src, on=["k"],
                when_matched=[MatchedClause(
                    "update", assignments={"v": "t.v + s.delta"})],
                when_not_matched=None)

    def test_duplicate_keys_refuse_delete_merge(self, spark, tmp_loc):
        # Spark raises for DELETE matched actions too (which source
        # row's clause condition applies is ambiguous)
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(2,), (2,)], "k int")
        with pytest.raises(ValueError, match="cardinality"):
            t.merge_into(src, on=["k"], when_matched="delete",
                         when_not_matched=None)

    def test_insert_only_merge_allows_duplicates(self, spark, tmp_loc):
        # no matched clause → no join fan-out; each unmatched source
        # row inserts (standard SQL behavior)
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame(
            [(9, "i", 1.0), (9, "i", 1.0)],
            "k int, name string, v double")
        t = t.merge_into(src, on=["k"], when_matched=None,
                         when_not_matched="insert")
        assert t.to_df().filter("k = 9").count() == 2

    def test_unique_source_keys_still_merge(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame(
            [(2, "B", 2.0), (9, "i", 9.0)],
            "k int, name string, v double")
        t = t.merge_into(src, on=["k"])
        got = _state(t)
        assert got[2] == ("B", 2.0) and got[9] == ("i", 9.0)


@pytest.fixture()
def eng(spark, tmp_loc):
    c = FileSystemCatalog(f"{tmp_loc}/wh")
    c.create_namespace("db")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, name string, v double")
    c.create_table("db.t", schema_from_spark(df.schema))
    c.load_table("db.t", spark=spark).append(df)
    return IceSqlEngine(spark, c)


class TestBySourceSql:
    def test_sql_full_sync(self, spark, eng):
        spark.createDataFrame([(2, "B", 22.0), (9, "i", 90.0)],
                              "k int, name string, v double") \
             .createOrReplaceTempView("sync_src")
        eng.sql("""
            MERGE INTO ice.db.t t USING sync_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED BY TARGET THEN INSERT *
            WHEN NOT MATCHED BY SOURCE THEN DELETE
        """)
        got = {r["k"]: (r["name"], r["v"])
               for r in eng.sql("SELECT * FROM ice.db.t").collect()}
        assert got == {2: ("B", 22.0), 9: ("i", 90.0)}

    def test_sql_by_source_conditional_update(self, spark, eng):
        spark.createDataFrame([(3,)], "k int") \
             .createOrReplaceTempView("keep_src")
        eng.sql("""
            MERGE INTO ice.db.t t USING keep_src s ON t.k = s.k
            WHEN NOT MATCHED BY SOURCE AND t.v < 25
                THEN UPDATE SET name = 'stale', v = t.v + 1
        """)
        got = {r["k"]: (r["name"], r["v"])
               for r in eng.sql("SELECT * FROM ice.db.t").collect()}
        assert got == {1: ("stale", 11.0), 2: ("stale", 21.0),
                       3: ("c", 30.0), 4: ("d", 40.0)}

    def test_sql_matched_by_source_refuses(self, eng, spark):
        spark.range(1).selectExpr("cast(id as int) k") \
             .createOrReplaceTempView("one_src")
        with pytest.raises(ValueError,
                           match="WHEN NOT MATCHED BY SOURCE"):
            eng.sql("MERGE INTO ice.db.t t USING one_src s ON t.k = s.k "
                    "WHEN MATCHED BY SOURCE THEN DELETE")

    def test_sql_by_source_source_ref_refuses(self, eng, spark):
        spark.createDataFrame([(1, "x")], "k int, tag string") \
             .createOrReplaceTempView("tag_src")
        with pytest.raises(ValueError, match="cannot\\s+reference the "
                                             "source"):
            eng.sql("MERGE INTO ice.db.t t USING tag_src s ON t.k = s.k "
                    "WHEN NOT MATCHED BY SOURCE THEN "
                    "UPDATE SET name = s.tag")

    def test_sql_by_source_set_star_refuses(self, eng, spark):
        spark.createDataFrame([(1, "x", 0.0)],
                              "k int, name string, v double") \
             .createOrReplaceTempView("star_src")
        with pytest.raises(ValueError, match="no SET \\*"):
            eng.sql("MERGE INTO ice.db.t t USING star_src s "
                    "ON t.k = s.k "
                    "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *")

    def test_sql_cardinality_violation(self, eng, spark):
        spark.createDataFrame([(2, "x", 1.0), (2, "y", 2.0)],
                              "k int, name string, v double") \
             .createOrReplaceTempView("dup_src")
        with pytest.raises(ValueError, match="cardinality"):
            eng.sql("MERGE INTO ice.db.t t USING dup_src s ON t.k = s.k "
                    "WHEN MATCHED THEN UPDATE SET *")


class TestReviewFindingsR16:
    """Pins for the r16 review findings on the by-source MERGE leg."""

    def test_by_source_only_duplicate_source_keys_refuse(self, spark,
                                                         tmp_loc):
        # CoW by-source-only: the left join fans out matched KEEP rows
        # on a duplicate source key — the guard must cover this shape
        t = _mk(spark, tmp_loc, name="bsdup")
        src = spark.createDataFrame([(1,), (1,)], "k int")
        with pytest.raises(ValueError, match="cardinality"):
            t.merge_into(src, on=["k"], when_matched=None,
                         when_not_matched=None,
                         when_not_matched_by_source="delete")
        # and the table is untouched (guard fires before any rewrite)
        assert t.to_df().count() == 4

    def test_by_source_nested_set_target_refuses(self, spark, tmp_loc):
        # a dotted SET target would silently no-op (the fold keys on
        # top-level names) — refuse at plan time instead
        from iceberg_cpp_spark.core.types import schema_from_spark

        df = spark.createDataFrame(
            [(1, ("x", 1))], "k int, addr struct<street string, num int>")
        t = IceTable.create(spark, os.path.join(tmp_loc, "bsnest"),
                            schema_from_spark(df.schema))
        t.append(df)
        src = spark.createDataFrame([(9,)], "k int")
        with pytest.raises(ValueError, match="top-level"):
            t.merge_into(src, on=["k"], when_matched=None,
                         when_not_matched=None,
                         when_not_matched_by_source=[
                             NotMatchedBySourceClause(
                                 "update",
                                 assignments={"addr.num": "7"})])

    def test_by_source_ambiguous_bare_name_refuses_early(self, spark,
                                                         tmp_loc):
        # bare 'v' exists in BOTH frames: resolves on the target-only
        # probe but is ambiguous on the joined frame — must refuse at
        # plan time, not mid-job
        t = _mk(spark, tmp_loc, name="bsamb")
        src = spark.createDataFrame([(1, 5.0)], "k int, v double")
        with pytest.raises(ValueError, match="ambiguous"):
            t.merge_into(src, on=["k"], when_matched=None,
                         when_not_matched=None,
                         when_not_matched_by_source=[
                             NotMatchedBySourceClause(
                                 "delete", condition="v < 25")])
        # the t.-qualified spelling works
        t = t.merge_into(src, on=["k"], when_matched=None,
                         when_not_matched=None,
                         when_not_matched_by_source=[
                             NotMatchedBySourceClause(
                                 "delete", condition="t.v < 25")])
        assert sorted(r["k"] for r in t.to_df().collect()) == [1, 3, 4]
