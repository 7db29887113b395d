"""r18 (ADVICE r17): MERGE with column names containing dots.

``F.col(f"t.{k}")`` parses a dotted name as a nested path; the merge
join conditions and projections now backtick-quote every interpolated
name (``_acol``/``_qcol``), and the write-side alignment does the same
— so a top-level column literally named ``a.b`` survives append,
string-path MERGE, and clause MERGE with correct results."""
import os

from iceberg_cpp_spark import IceTable, MatchedClause, NotMatchedClause
from iceberg_cpp_spark.core.types import schema_from_spark


def _mk(spark, tmp_loc, rows, cols):
    df = spark.createDataFrame(rows, cols)
    t = IceTable.create(spark, os.path.join(tmp_loc, "t"),
                        schema_from_spark(df.schema))
    t.append(df)
    return t, df


def test_append_and_scan_dotted_column(spark, tmp_loc):
    t, df = _mk(spark, tmp_loc, [(1, "x"), (2, "y")], ["k", "a.b"])
    assert sorted(map(tuple, t.to_df().collect())) == [(1, "x"), (2, "y")]


def test_merge_into_dotted_value_column(spark, tmp_loc):
    t, _ = _mk(spark, tmp_loc, [(1, "x"), (2, "y")], ["k", "a.b"])
    src = spark.createDataFrame([(2, "Y2"), (3, "z")], ["k", "a.b"])
    t.merge_into(src, on=["k"])
    assert sorted(map(tuple, t.to_df().collect())) == \
        [(1, "x"), (2, "Y2"), (3, "z")]


def test_merge_into_dotted_join_key(spark, tmp_loc):
    t, _ = _mk(spark, tmp_loc, [("k1", 10), ("k2", 20)], ["id.x", "v"])
    src = spark.createDataFrame([("k2", 99), ("k3", 30)], ["id.x", "v"])
    t.merge_into(src, on=["id.x"])
    assert sorted(map(tuple, t.to_df().collect())) == \
        [("k1", 10), ("k2", 99), ("k3", 30)]


def test_clause_merge_dotted_join_key(spark, tmp_loc):
    t, _ = _mk(spark, tmp_loc, [("k1", 10), ("k2", 20)], ["id.x", "v"])
    src = spark.createDataFrame([("k1", 11), ("k9", 90)], ["id.x", "v"])
    t.merge_into(src, on=["id.x"],
                 when_matched=[MatchedClause("update")],
                 when_not_matched=[NotMatchedClause()])
    assert sorted(map(tuple, t.to_df().collect())) == \
        [("k1", 11), ("k2", 20), ("k9", 90)]


def test_delete_only_merge_dotted_key(spark, tmp_loc):
    t, _ = _mk(spark, tmp_loc, [("k1", 10), ("k2", 20)], ["id.x", "v"])
    src = spark.createDataFrame([("k1",)], ["id.x"])
    t.merge_into(src, on=["id.x"], when_matched="delete",
                 when_not_matched=None)
    assert sorted(map(tuple, t.to_df().collect())) == [("k2", 20)]
