"""r18: apply_changes folds op validation + the dup probe into ONE
combinable aggregation and skips the last-write-wins window whenever
the batch is key-unique (seq_col or not)."""
import os

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core.types import schema_from_spark


def _table(spark, tmp_loc, rows):
    df = spark.createDataFrame(rows, ["id", "v"])
    t = IceTable.create(spark, os.path.join(tmp_loc, "t"),
                        schema_from_spark(df.schema))
    t.append(df)
    return t


def test_unique_seq_batch_skips_window_same_result(spark, tmp_loc,
                                                   monkeypatch):
    t = _table(spark, tmp_loc, [(1, "a"), (2, "b"), (3, "c")])
    # key-unique batch WITH seq_col: the window must not run
    import pyspark.sql.window as W
    called = []
    orig = W.Window.partitionBy

    def spy(*a, **k):
        called.append(a)
        return orig(*a, **k)
    monkeypatch.setattr(W.Window, "partitionBy", staticmethod(spy))
    ch = spark.createDataFrame(
        [(2, "B", "U", 1), (3, None, "D", 1), (9, "i", "I", 1)],
        ["id", "v", "_op", "_seq"])
    t.apply_changes(ch, on=["id"], seq_col="_seq")
    assert called == []
    assert sorted(map(tuple, t.to_df().collect())) == \
        [(1, "a"), (2, "B"), (9, "i")]


def test_duplicate_keys_with_seq_still_window(spark, tmp_loc):
    t = _table(spark, tmp_loc, [(1, "a"), (2, "b")])
    # same key twice: last-write-wins by _seq (the window path)
    ch = spark.createDataFrame(
        [(2, "first", "U", 1), (2, "last", "U", 2), (1, None, "D", 1)],
        ["id", "v", "_op", "_seq"])
    t.apply_changes(ch, on=["id"], seq_col="_seq")
    assert sorted(map(tuple, t.to_df().collect())) == [(2, "last")]


def test_duplicate_keys_without_seq_refuse(spark, tmp_loc):
    t = _table(spark, tmp_loc, [(1, "a")])
    ch = spark.createDataFrame(
        [(1, "x", "U"), (1, "y", "U")], ["id", "v", "_op"])
    with pytest.raises(ValueError, match="multiple ops"):
        t.apply_changes(ch, on=["id"])


def test_bad_op_detected_even_with_seq(spark, tmp_loc):
    t = _table(spark, tmp_loc, [(1, "a")])
    ch = spark.createDataFrame(
        [(1, "x", "U", 1), (2, "y", "Z", 1)], ["id", "v", "_op", "_seq"])
    with pytest.raises(ValueError, match="must be 'I'/'U'/'D'"):
        t.apply_changes(ch, on=["id"], seq_col="_seq")


def test_null_op_detected(spark, tmp_loc):
    t = _table(spark, tmp_loc, [(1, "a")])
    ch = spark.createDataFrame(
        [(1, "x", None, 1)],
        "id long, v string, _op string, _seq int")
    with pytest.raises(ValueError, match="must be 'I'/'U'/'D'"):
        t.apply_changes(ch, on=["id"], seq_col="_seq")
