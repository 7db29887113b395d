"""Column-level MERGE: clause predicates, UPDATE SET col = expr and
INSERT (cols) VALUES (exprs) — the canonical CDC-upsert shape (VERDICT
r14 task 1). Engine surface: ``MatchedClause`` / ``NotMatchedClause``
lists passed to ``IceTable.merge_into``; SQL surface tested in
test_sql_engine.py.

Reference parity: the reference declares but never implements a write
path (transaction.h:31-51); the semantics pinned here are the
Spark-Iceberg MERGE rules — clauses apply in ORDER, the first clause
whose condition holds wins per row, a matched row no clause touches is
kept, a not-matched source row no insert clause accepts is dropped.
"""

import os

import pytest

from iceberg_cpp_spark import IceTable, MatchedClause, NotMatchedClause
from iceberg_cpp_spark.core.types import schema_from_spark


def _mk(spark, tmp_loc, name="tmc", mode=None):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, name string, v double")
    props = {"write.merge.mode": mode} if mode else None
    t = IceTable.create(spark, os.path.join(tmp_loc, name),
                        schema_from_spark(df.schema), properties=props)
    t.append(df)
    return t


# CDC feed: op column drives the clause; k=2 delete, k=3 update,
# k=9 insert, k=8 arrives as an op='D' no-op (never inserted)
def _cdc(spark):
    return spark.createDataFrame(
        [(2, "x", 0.0, "D"), (3, "c2", 33.0, "U"),
         (9, "i", 90.0, "I"), (8, "never", 0.0, "D")],
        "k int, name string, v double, op string")


class TestMatchedClauses:
    def test_cdc_upsert_conditional_delete(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        t = t.merge_into(
            _cdc(spark), on=["k"],
            when_matched=[MatchedClause("delete", condition="s.op = 'D'"),
                          MatchedClause("update")],
            when_not_matched=[NotMatchedClause(condition="s.op <> 'D'")])
        got = {r["k"]: (r["name"], r["v"])
               for r in t.to_df().collect()}
        assert got == {1: ("a", 10.0), 3: ("c2", 33.0),
                       4: ("d", 40.0), 9: ("i", 90.0)}

    def test_update_set_columns_with_exprs(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(1, 5.0), (3, 7.0)],
                                    "k int, delta double")
        t = t.merge_into(
            src, on=["k"],
            when_matched=[MatchedClause(
                "update", assignments={"v": "t.v + s.delta",
                                       "name": "upper(t.name)"})],
            when_not_matched=None)
        got = {r["k"]: (r["name"], r["v"]) for r in t.to_df().collect()}
        assert got == {1: ("A", 15.0), 2: ("b", 20.0),
                       3: ("C", 37.0), 4: ("d", 40.0)}

    def test_clause_order_first_wins(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(1, 100.0), (2, 1.0)],
                                    "k int, nv double")
        t = t.merge_into(
            src, on=["k"],
            when_matched=[
                MatchedClause("update", condition="s.nv > 50",
                              assignments={"v": "s.nv"}),
                MatchedClause("update", assignments={"name": "'small'"})],
            when_not_matched=None)
        got = {r["k"]: (r["name"], r["v"]) for r in t.to_df().collect()}
        # k=1 hits clause 1 (v replaced, name kept); k=2 falls to
        # clause 2 (name replaced, v kept)
        assert got[1] == ("a", 100.0)
        assert got[2] == ("small", 20.0)

    def test_matched_row_no_clause_kept(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(1, "zz")], "k int, tag string")
        t2 = t.merge_into(
            src, on=["k"],
            when_matched=[MatchedClause("delete",
                                        condition="s.tag = 'del'")],
            when_not_matched=None)
        assert t2.to_df().count() == 4  # matched but condition false → kept
        got = {r["k"]: r["v"] for r in t2.to_df().collect()}
        assert got[1] == 10.0

    def test_insert_column_list_values(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(7, "raw")], "k int, label string")
        t = t.merge_into(
            src, on=["k"], when_matched=None,
            when_not_matched=[NotMatchedClause(
                values={"k": "s.k", "name": "concat(s.label, '!')"})])
        row = t.to_df().filter("k = 7").collect()[0]
        assert (row["name"], row["v"]) == ("raw!", None)  # v unlisted → NULL

    def test_merge_key_in_values_dict(self, spark, tmp_loc):
        """Source doesn't need table column names at all when every
        clause lists explicit values — the on-key must be IN source."""
        t = _mk(spark, tmp_loc)
        with pytest.raises(ValueError, match="merge key not in source"):
            t.merge_into(spark.createDataFrame([(7,)], "id int"),
                         on=["k"], when_matched=None,
                         when_not_matched=[NotMatchedClause(
                             values={"k": "s.id"})])


class TestClauseValidation:
    def test_unconditional_clause_must_be_last(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        with pytest.raises(ValueError, match="unreachable"):
            t.merge_into(
                _cdc(spark), on=["k"],
                when_matched=[MatchedClause("update"),
                              MatchedClause("delete")])

    def test_duplicate_unconditional_insert_refuses(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        with pytest.raises(ValueError, match="unreachable"):
            t.merge_into(
                _cdc(spark), on=["k"],
                when_not_matched=[NotMatchedClause(), NotMatchedClause()])

    def test_bad_expression_loud_even_with_no_matches(self, spark, tmp_loc):
        from pyspark.errors import AnalysisException

        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(99, "zz", 0.0, "U")],
                                    "k int, name string, v double, op string")
        with pytest.raises(AnalysisException):
            t.merge_into(src, on=["k"], when_not_matched=None,
                         when_matched=[MatchedClause(
                             "update", assignments={"v": "s.no_such + 1"})])

    def test_set_target_not_in_schema(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        with pytest.raises(ValueError, match="SET target"):
            t.merge_into(_cdc(spark), on=["k"],
                         when_matched=[MatchedClause(
                             "update", assignments={"bogus": "1"})])

    def test_star_needs_full_source_columns(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        src = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(ValueError, match="missing"):
            t.merge_into(src, on=["k"], when_not_matched=None,
                         when_matched=[MatchedClause(
                             "update", condition="s.k > 0")])

    def test_delete_clause_takes_no_assignments(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        with pytest.raises(ValueError, match="DELETE clause"):
            t.merge_into(_cdc(spark), on=["k"],
                         when_matched=[MatchedClause(
                             "delete", assignments={"v": "1"})])

    def test_simple_shape_falls_back_to_fast_path(self, spark, tmp_loc):
        """[unconditional SET *] + [unconditional INSERT *] must behave
        exactly like the legacy strings (they share the same plan)."""
        t1 = _mk(spark, tmp_loc, "fa")
        t2 = _mk(spark, tmp_loc, "fb")
        src = spark.createDataFrame([(2, "B", 22.0), (9, "i", 90.0)],
                                    "k int, name string, v double")
        t1 = t1.merge_into(src, on=["k"])
        t2 = t2.merge_into(src, on=["k"],
                           when_matched=[MatchedClause("update")],
                           when_not_matched=[NotMatchedClause()])
        assert sorted(t1.to_df().collect()) == sorted(t2.to_df().collect())


class TestMorClauses:
    def test_cdc_upsert_merge_on_read(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc, mode="merge-on-read")
        t = t.merge_into(
            _cdc(spark), on=["k"],
            when_matched=[MatchedClause("delete", condition="s.op = 'D'"),
                          MatchedClause(
                              "update",
                              assignments={"v": "s.v", "name": "s.name"})],
            when_not_matched=[NotMatchedClause(condition="s.op <> 'D'")])
        got = {r["k"]: (r["name"], r["v"]) for r in t.to_df().collect()}
        assert got == {1: ("a", 10.0), 3: ("c2", 33.0),
                       4: ("d", 40.0), 9: ("i", 90.0)}
        # no data file rewritten: position deletes carry the change
        assert any(d for d in t.scan().plan_deletes())

    def test_mor_matched_no_clause_row_not_deleted(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc, mode="merge-on-read")
        src = spark.createDataFrame([(1, "zz")], "k int, tag string")
        t = t.merge_into(src, on=["k"], when_not_matched=None,
                         when_matched=[MatchedClause(
                             "delete", condition="s.tag = 'del'")])
        assert t.to_df().count() == 4

    def test_mor_matched_key_never_inserted(self, spark, tmp_loc):
        """A matched key whose row no clause touches is still MATCHED —
        the insert anti-join uses the full matched set."""
        t = _mk(spark, tmp_loc, mode="merge-on-read")
        src = spark.createDataFrame([(1, "n", 1.0, "skip"),
                                     (9, "i", 90.0, "I")],
                                    "k int, name string, v double, op string")
        t = t.merge_into(
            src, on=["k"],
            when_matched=[MatchedClause("update", condition="s.op = 'U'")],
            when_not_matched=[NotMatchedClause()])
        ks = sorted(r["k"] for r in t.to_df().collect())
        assert ks == [1, 2, 3, 4, 9]  # k=1 untouched, not duplicated
