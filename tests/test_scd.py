"""SCD Type 2 dimension maintenance (operators/scd.py).

The pattern plain MERGE can't express: a changed key CLOSES the current
row and INSERTS the new version — two output rows per match — with
copy-on-write touching only files that hold a matched current row."""
import datetime as dt

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.operators import scd

TS1 = dt.datetime(2024, 1, 1)
TS2 = dt.datetime(2024, 2, 1)
TS3 = dt.datetime(2024, 3, 1)


def _dim(spark, loc, n=6):
    src = it.Schema([
        it.NestedField(1, "k", it.LongType(), True),
        it.NestedField(2, "v", it.LongType(), False),
        it.NestedField(3, "w", it.StringType(), False),
    ])
    t = IceTable.create(spark, loc, scd.scd2_schema(src),
                        properties={"format-version": "3"})
    init = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
        F.lit("a").alias("w"))
    return t.append(scd.scd2_init(init, TS1).repartition(2, "k"))


class TestScd2:
    def test_close_insert_and_noop(self, spark, tmp_loc):
        t = _dim(spark, f"{tmp_loc}/t")
        upd = spark.createDataFrame(
            [(1, 999, "a"), (3, 30, "a"), (100, 5, "a")],
            "k long, v long, w string")
        t = scd.scd2_apply(t, upd, key=["k"], effective=TS2)
        df = t.to_df()
        assert df.count() == 8  # 6 + 1 closed-version + 1 new key
        cur = {r["k"]: r["v"] for r in df.filter("_is_current").collect()}
        assert cur[1] == 999 and cur[3] == 30 and cur[100] == 5
        closed = df.filter("not _is_current").collect()
        assert len(closed) == 1 and closed[0]["k"] == 1
        assert closed[0]["_valid_to"] == TS2
        assert closed[0]["_valid_from"] == TS1

    def test_multi_batch_history_chain(self, spark, tmp_loc):
        t = _dim(spark, f"{tmp_loc}/t")
        t = scd.scd2_apply(t, spark.createDataFrame(
            [(1, 11, "a")], "k long, v long, w string"),
            key=["k"], effective=TS2)
        t = scd.scd2_apply(t, spark.createDataFrame(
            [(1, 12, "a")], "k long, v long, w string"),
            key=["k"], effective=TS3)
        hist = (t.to_df().filter("k = 1")
                .orderBy("_valid_from").collect())
        assert [r["v"] for r in hist] == [10, 11, 12]
        assert [r["_valid_to"] for r in hist] == [TS2, TS3, None]
        assert [r["_is_current"] for r in hist] == [False, False, True]

    def test_identical_batch_is_noop(self, spark, tmp_loc):
        t = _dim(spark, f"{tmp_loc}/t")
        before = t.current_snapshot().snapshot_id
        same = spark.range(6).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
            F.lit("a").alias("w"))
        t = scd.scd2_apply(t, same, key=["k"], effective=TS2)
        assert t.current_snapshot().snapshot_id == before  # no commit

    def test_untracked_change_ignored(self, spark, tmp_loc):
        t = _dim(spark, f"{tmp_loc}/t")
        upd = spark.createDataFrame([(1, 10, "DIFFERENT")],
                                    "k long, v long, w string")
        t = scd.scd2_apply(t, upd, key=["k"], effective=TS2, tracked=["v"])
        assert t.to_df().count() == 6  # w not tracked -> no version

    def test_null_transitions_are_changes(self, spark, tmp_loc):
        t = _dim(spark, f"{tmp_loc}/t")
        upd = spark.createDataFrame([(1, None, "a")],
                                    "k long, v long, w string")
        t = scd.scd2_apply(t, upd, key=["k"], effective=TS2)
        cur = t.to_df().filter("_is_current and k = 1").collect()
        assert cur[0]["v"] is None
        # null -> null is NOT a change (null-safe compare)
        before = t.current_snapshot().snapshot_id
        t = scd.scd2_apply(t, upd, key=["k"], effective=TS3)
        assert t.current_snapshot().snapshot_id == before

    def test_null_key_versions_like_any_other(self, spark, tmp_loc):
        # a NULL key is a valid dimension member: a changed update for
        # it must CLOSE the current null-key row and insert the new
        # version — exactly one is_current row for the null key after
        t = _dim(spark, f"{tmp_loc}/t")
        t = scd.scd2_apply(t, spark.createDataFrame(
            [(None, 1, "a")], "k long, v long, w string"),
            key=["k"], effective=TS2)  # first sight: plain insert
        assert t.to_df().filter("k is null").count() == 1
        t = scd.scd2_apply(t, spark.createDataFrame(
            [(None, 2, "a")], "k long, v long, w string"),
            key=["k"], effective=TS3)  # changed: close + insert
        nk = t.to_df().filter("k is null").orderBy("_valid_from").collect()
        assert [r["v"] for r in nk] == [1, 2]
        assert [r["_is_current"] for r in nk] == [False, True]
        assert nk[0]["_valid_to"] == TS3
        # unchanged null-key batch is a no-op (null-safe discovery)
        before = t.current_snapshot().snapshot_id
        t = scd.scd2_apply(t, spark.createDataFrame(
            [(None, 2, "a")], "k long, v long, w string"),
            key=["k"], effective=TS3)
        assert t.current_snapshot().snapshot_id == before

    def test_duplicate_batch_key_raises(self, spark, tmp_loc):
        t = _dim(spark, f"{tmp_loc}/t")
        upd = spark.createDataFrame([(1, 5, "a"), (1, 6, "a")],
                                    "k long, v long, w string")
        with pytest.raises(ValueError, match="duplicate key"):
            scd.scd2_apply(t, upd, key=["k"], effective=TS2)

    def test_untouched_files_not_rewritten(self, spark, tmp_loc):
        t = _dim(spark, f"{tmp_loc}/t")
        files_before = {f.file_path for f in t.scan().plan_files()}
        # change a key living in exactly one of the two files
        upd = spark.createDataFrame([(0, 777, "a")],
                                    "k long, v long, w string")
        t = scd.scd2_apply(t, upd, key=["k"], effective=TS2)
        files_after = {f.file_path for f in t.scan().plan_files()}
        assert files_before & files_after, \
            "the unmatched file must survive the batch untouched"

    def test_not_an_scd_table_raises(self, spark, tmp_loc):
        sch = it.Schema([it.NestedField(1, "k", it.LongType(), True)])
        t = IceTable.create(spark, f"{tmp_loc}/plain", sch)
        with pytest.raises(ValueError, match="scd2_init"):
            scd.scd2_apply(t, t.spark.range(1).select(
                F.col("id").alias("k")), key=["k"], effective=TS2)


class TestScd2Stream:
    def test_streaming_sink_versions_dimension(self, spark, tmp_loc):
        import os

        from iceberg_cpp_spark.streaming.incremental import scd2_stream

        src_sch = it.Schema([
            it.NestedField(1, "k", it.LongType(), True),
            it.NestedField(2, "v", it.LongType(), False),
        ])
        t = IceTable.create(spark, f"{tmp_loc}/dim", scd.scd2_schema(src_sch),
                            properties={"format-version": "3"})
        t = t.append(scd.scd2_init(
            spark.range(4).select(F.col("id").alias("k"),
                                  (F.col("id") * 10).alias("v")), TS1))
        # stream: k=1 changes twice in one batch (latest wins), k=9 new
        rows = [(1, 100, TS2), (1, 101, dt.datetime(2024, 2, 2)),
                (9, 900, TS2), (2, 20, TS2)]
        srcdir = os.path.join(tmp_loc, "scd_src")
        spark.createDataFrame(rows, "k long, v long, ts timestamp") \
            .write.parquet(srcdir)
        stream = spark.readStream.schema("k long, v long, ts timestamp") \
            .parquet(srcdir)
        q = scd2_stream(stream, t, key=["k"],
                        checkpoint_dir=os.path.join(tmp_loc, "ckpt"),
                        effective_col="ts")
        q.awaitTermination(300)
        t.refresh()
        df = t.to_df()
        cur = {r["k"]: r["v"] for r in df.filter("_is_current").collect()}
        assert cur[1] == 101 and cur[9] == 900 and cur[2] == 20
        hist = df.filter("k = 1 and not _is_current").collect()
        assert len(hist) == 1 and hist[0]["v"] == 10
        # batch effective ts = max event time in the batch
        assert hist[0]["_valid_to"] == dt.datetime(2024, 2, 2)
        # replay of the same source is a no-op (summary watermark)
        snap_before = t.current_snapshot().snapshot_id
        q2 = scd2_stream(stream, t, key=["k"],
                         checkpoint_dir=os.path.join(tmp_loc, "ckpt"),
                         effective_col="ts")
        q2.awaitTermination(300)
        t.refresh()
        assert t.current_snapshot().snapshot_id == snap_before

    def test_effective_col_as_dimension_attribute(self, spark, tmp_loc):
        # the event-time column doubling as a dimension attribute (the
        # common updated_at shape) must survive the batch projection
        import os

        from iceberg_cpp_spark.streaming.incremental import scd2_stream

        src_sch = it.Schema([
            it.NestedField(1, "k", it.LongType(), True),
            it.NestedField(2, "v", it.LongType(), False),
            it.NestedField(3, "ts", it.TimestampType(), False),
        ])
        t = IceTable.create(spark, f"{tmp_loc}/dim", scd.scd2_schema(src_sch),
                            properties={"format-version": "3"})
        t = t.append(scd.scd2_init(
            spark.createDataFrame([(1, 10, TS1)],
                                  "k long, v long, ts timestamp"), TS1))
        srcdir = os.path.join(tmp_loc, "scd_src")
        spark.createDataFrame([(1, 11, TS2), (2, 20, TS2)],
                              "k long, v long, ts timestamp") \
            .write.parquet(srcdir)
        stream = spark.readStream.schema("k long, v long, ts timestamp") \
            .parquet(srcdir)
        q = scd2_stream(stream, t, key=["k"],
                        checkpoint_dir=os.path.join(tmp_loc, "ckpt"),
                        effective_col="ts")
        q.awaitTermination(300)
        t.refresh()
        cur = {r["k"]: (r["v"], r["ts"])
               for r in t.to_df().filter("_is_current").collect()}
        assert cur[1] == (11, TS2) and cur[2] == (20, TS2)
        closed = t.to_df().filter("not _is_current").collect()
        assert len(closed) == 1 and closed[0]["ts"] == TS1
