"""As-of join, range join, and stateful streaming sessionization."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark.operators.temporal_joins import asof_join, range_join


@pytest.fixture(scope="module")
def lr(spark):
    L = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 15, "d"), (3, 7, "e")],
        "k long, t long, lv string")
    R = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 15, 300.0)],
        "k long, t long, rv double")
    return L, R


class TestAsofJoin:
    def test_backward(self, lr):
        L, R = lr
        got = {(r["k"], r["t"]): r["rv"]
               for r in asof_join(L, R, on="t", by="k").collect()}
        assert got == {(1, 5): None, (1, 10): 100.0, (1, 20): 200.0,
                       (2, 15): 300.0, (3, 7): None}

    def test_forward(self, lr):
        L, R = lr
        got = {(r["k"], r["t"]): r["rv"]
               for r in asof_join(L, R, on="t", by="k", direction="forward").collect()}
        assert got == {(1, 5): 100.0, (1, 10): 200.0, (1, 20): None,
                       (2, 15): 300.0, (3, 7): None}

    def test_tolerance(self, lr):
        L, R = lr
        got = {(r["k"], r["t"]): r["rv"]
               for r in asof_join(L, R, on="t", by="k", tolerance=F.lit(3)).collect()}
        assert got[(1, 10)] == 100.0   # gap 2 ≤ 3
        assert got[(1, 20)] is None    # gap 5 > 3

    def test_exact_timestamp_matches(self, spark):
        L = spark.createDataFrame([(1, 15)], "k long, t long")
        R = spark.createDataFrame([(1, 15, 9.0)], "k long, t long, rv double")
        assert asof_join(L, R, on="t", by="k").first()["rv"] == 9.0

    def test_row_count_preserved(self, lr):
        L, R = lr
        assert asof_join(L, R, on="t", by="k").count() == L.count()


class TestRangeJoin:
    def test_inclusive_bounds(self, spark):
        P = spark.createDataFrame([(1, 10), (1, 20), (1, 21)], "k long, p long")
        I = spark.createDataFrame([(1, 10, 20, "x")], "k long, s long, e long, tag string")
        got = sorted(r["p"] for r in range_join(P, I, "p", "s", "e", 7, on="k").collect())
        assert got == [10, 20]

    def test_interval_spanning_buckets(self, spark):
        P = spark.createDataFrame([(1, 55)], "k long, p long")
        I = spark.createDataFrame([(1, 5, 95, "wide")], "k long, s long, e long, tag string")
        assert range_join(P, I, "p", "s", "e", 10, on="k").count() == 1

    def test_matches_plain_join(self, spark, lineitem):
        """bucketed plan ≡ naive non-equi join on real data."""
        us = F.unix_micros(F.col("l_shipdate").cast("timestamp"))
        li = lineitem.limit(500).select("l_orderkey", us.alias("us"))
        iv = lineitem.limit(50).select(
            F.col("l_orderkey").alias("k2"),
            us.alias("s"),
            (us + F.lit(30 * 86400_000_000)).alias("e"))
        fast = range_join(li.withColumn("k2", F.col("l_orderkey")), iv,
                          "us", "s", "e", bucket_width=30 * 86400_000_000, on="k2")
        naive = li.join(iv, (li.l_orderkey == iv.k2)
                        & (li.us >= iv.s) & (li.us <= iv.e))
        assert fast.count() == naive.count()


class TestSessionize:
    def test_sessions_from_bounded_stream(self, spark, tmp_loc):
        import pandas as pd

        from iceberg_cpp_spark.streaming.stateful import sessionize

        import datetime as dt

        rows = []
        # user 1: two sessions (gap > 60s between them); user 2: one
        for ts, u, v in [(0, 1, 1.0), (30, 1, 2.0), (50, 1, 3.0),
                         (200, 1, 4.0), (230, 1, 5.0),
                         (10, 2, 9.0)]:
            rows.append((u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts), v))
        src = os.path.join(tmp_loc, "sess_src")
        spark.createDataFrame(rows, "user_id long, ts timestamp, value double") \
            .write.parquet(src)
        stream = spark.readStream.schema("user_id long, ts timestamp, value double") \
            .parquet(src)
        q = (sessionize(stream, gap_seconds=60)
             .writeStream.format("memory").queryName("sessions")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r["user_id"], r["n_events"], r["sum_value"])
               for r in spark.sql("select * from sessions").collect()}
        # within one batch only the CLOSED session flushes: user 1's
        # first session (3 events); the open ones stay in state
        assert (1, 3, 6.0) in got


class TestSessionizeEventTime:
    def test_event_time_flushes_all_closed_sessions(self, spark, tmp_loc):
        import datetime as dt

        from iceberg_cpp_spark.streaming.stateful import sessionize

        rows = []
        for ts, u, v in [(0, 1, 1.0), (30, 1, 2.0), (50, 1, 3.0),
                         (200, 1, 4.0), (230, 1, 5.0),
                         (10, 2, 9.0), (500, 2, 1.0)]:
            rows.append((u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts), v))
        src = os.path.join(tmp_loc, "sess_et")
        spark.createDataFrame(rows, "user_id long, ts timestamp, value double") \
            .write.parquet(src)
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double").parquet(src)
        q = (sessionize(stream, gap_seconds=60, event_time=True)
             .writeStream.format("memory").queryName("sessions_et")
             .outputMode("update").trigger(availableNow=True).start())
        finished = q.awaitTermination(300)
        assert finished  # event-time timeouts terminate the bounded run
        got = {(r["user_id"], r["n_events"], r["sum_value"])
               for r in spark.sql("select * from sessions_et").collect()}
        # ALL sessions closed by the data clock flush deterministically:
        # user 1 session A (3 ev), user 2 session A (1 ev). The final
        # open sessions (u1: 2 ev @200s, u2: 1 ev @500s) stay in state
        # because the watermark stops at the max event time.
        assert (1, 3, 6.0) in got
        assert (2, 1, 9.0) in got
