"""ORC footer statistics → Iceberg DataFile bounds (VERDICT r10 task 2).

The reference's write-side Metrics contract (metrics.h:33-42) is
format-agnostic; pyarrow.orc exposes no column statistics, so
core/orc_footer.py parses the ORC PostScript + Footer protobufs
directly. These tests pin (a) the parser against Spark-written files in
every codec Spark can emit here, (b) the metrics dicts
collect_orc_metrics now builds (counts, null counts, bounds,
truncate-mode application), and (c) the actual point: an ORC-written
IceTable prunes files on a bounds predicate."""

import glob
import math
import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

import iceberg_cpp_spark.core.types as it
from iceberg_cpp_spark.core import orc_footer as of
from iceberg_cpp_spark.core.literals import from_bytes
from iceberg_cpp_spark.core.metrics import collect_orc_metrics, metrics_modes


@pytest.fixture(scope="module")
def typed_df(spark):
    return spark.range(0, 1000).select(
        F.col("id").cast("int").alias("i"),
        F.col("id").alias("l"),
        (F.col("id") * 1.5).alias("d"),
        F.concat(F.lit("doc-"), F.format_string("%04d", F.col("id"))).alias("s"),
        F.expr("timestampadd(SECOND, id, to_timestamp('2020-01-01 00:00:00'))")
        .alias("ts"),
        F.expr("date_add(to_date('2021-06-15'), cast(id as int))").alias("dt"),
        (F.col("id").cast("decimal(10,2)") / 4).cast("decimal(10,2)").alias("dec"),
        (F.col("id") % 2 == 0).alias("bo"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("nul"),
    )


TYPES = {"i": it.IntegerType(), "l": it.LongType(), "d": it.DoubleType(),
         "s": it.StringType(), "ts": it.TimestampType(), "dt": it.DateType(),
         "dec": it.DecimalType(10, 2), "bo": it.BooleanType(),
         "nul": it.LongType()}

# data truths for the typed_df above
TS_MIN_US = 1577836800000000        # 2020-01-01 00:00:00
TS_MAX_US = TS_MIN_US + 999 * 10**6  # +999 seconds
DT_MIN_DAYS = 18793                 # 2021-06-15
DT_MAX_DAYS = DT_MIN_DAYS + 999


class TestOrcFooterParser:
    @pytest.mark.parametrize("codec", ["snappy", "zlib", "zstd", "none"])
    def test_bounds_all_codecs(self, spark, tmp_loc, typed_df, codec):
        out = os.path.join(tmp_loc, codec)
        (typed_df.coalesce(1).write.mode("overwrite")
         .option("compression", codec).orc(out))
        path = glob.glob(out + "/*.orc")[0]
        footer = of.read_footer(path)
        assert footer.number_of_rows == 1000
        ids = of.column_ids(footer.types)
        assert set(ids) == set(TYPES)
        got = {n: of.stat_bounds(footer.statistics[tid], TYPES[n])
               for n, tid in ids.items()}
        assert got["i"] == (0, 999)
        assert got["l"] == (0, 999)
        assert got["d"] == (0.0, 1498.5)
        assert got["s"] == ("doc-0000", "doc-0999")
        assert got["dt"] == (DT_MIN_DAYS, DT_MAX_DAYS)
        assert got["dec"] == (Decimal("0"), Decimal("249.75"))
        assert got["bo"] == (False, True)
        assert got["nul"] == (1, 999)
        # timestamps may be widened to the enclosing millisecond —
        # valid inclusive bounds, never narrower than the data
        lo, hi = got["ts"]
        assert lo <= TS_MIN_US and hi >= TS_MAX_US
        assert TS_MIN_US - lo <= 1000 and hi - TS_MAX_US <= 1000
        # non-null counts: `nul` drops every 10th row
        assert footer.statistics[ids["nul"]].number_of_values == 900
        assert footer.statistics[ids["l"]].number_of_values == 1000

    def test_nested_struct_leaves(self, spark, tmp_loc):
        df = spark.range(0, 50).select(
            F.struct(F.col("id").alias("a"),
                     F.concat(F.lit("x"), F.col("id")).alias("b"))
            .alias("st"), F.col("id"))
        out = os.path.join(tmp_loc, "nested")
        df.coalesce(1).write.mode("overwrite").orc(out)
        footer = of.read_footer(glob.glob(out + "/*.orc")[0])
        ids = of.column_ids(footer.types)
        assert {"st.a", "st.b", "id"} == set(ids)
        assert of.stat_bounds(footer.statistics[ids["st.a"]],
                              it.LongType()) == (0, 49)

    def test_nan_double_gives_no_bounds(self, spark, tmp_loc):
        """ORC writers drop double min/max when a NaN was seen; if one
        ever leaks through, the harvest must still skip it (spec:
        bounds skip NaN)."""
        df = spark.range(0, 10).select(
            F.when(F.col("id") == 5, float("nan"))
            .otherwise(F.col("id") * 1.0).alias("d"))
        out = os.path.join(tmp_loc, "nan")
        df.coalesce(1).write.mode("overwrite").orc(out)
        footer = of.read_footer(glob.glob(out + "/*.orc")[0])
        lo, hi = of.stat_bounds(
            footer.statistics[of.column_ids(footer.types)["d"]],
            it.DoubleType())
        assert lo is None or not math.isnan(lo)
        assert hi is None or not math.isnan(hi)

    def test_not_an_orc_file_raises(self, tmp_loc):
        p = os.path.join(tmp_loc, "junk.orc")
        with open(p, "wb") as f:
            f.write(b"\x00" * 64)
        with pytest.raises(Exception):
            of.read_footer(p)


def _ice_schema():
    return it.Schema(fields=[
        it.NestedField(1, "i", it.IntegerType(), required=False),
        it.NestedField(2, "s", it.StringType(), required=False),
        it.NestedField(3, "nul", it.LongType(), required=False),
    ])


class TestCollectOrcMetrics:
    @pytest.fixture()
    def orc_file(self, spark, tmp_loc):
        df = spark.range(0, 100).select(
            F.col("id").cast("int").alias("i"),
            F.concat(F.lit("k"), F.format_string("%09d", F.col("id"))).alias("s"),
            F.when(F.col("id") < 10, None).otherwise(F.col("id")).alias("nul"))
        out = os.path.join(tmp_loc, "cm")
        df.coalesce(1).write.mode("overwrite").orc(out)
        return glob.glob(out + "/*.orc")[0]

    def test_full_metrics_dict(self, orc_file):
        sch = _ice_schema()
        m = collect_orc_metrics(None, [orc_file], sch)[orc_file]
        assert m["record_count"] == 100
        assert m["value_counts"] == {1: 100, 2: 100, 3: 100}
        assert m["null_value_counts"] == {1: 0, 2: 0, 3: 10}
        assert from_bytes(m["lower_bounds"][1], it.IntegerType()) == 0
        assert from_bytes(m["upper_bounds"][1], it.IntegerType()) == 99
        assert from_bytes(m["lower_bounds"][3], it.LongType()) == 10
        assert from_bytes(m["upper_bounds"][3], it.LongType()) == 99
        # default mode truncate(16): these strings are 10 chars, kept whole
        assert from_bytes(m["lower_bounds"][2], it.StringType()) == "k000000000"

    def test_truncate_mode_applies(self, orc_file):
        sch = _ice_schema()
        modes = metrics_modes(sch, {"write.metadata.metrics.default":
                                    "truncate(4)"})
        m = collect_orc_metrics(None, [orc_file], sch, modes=modes)[orc_file]
        lo = from_bytes(m["lower_bounds"][2], it.StringType())
        hi = from_bytes(m["upper_bounds"][2], it.StringType())
        assert lo == "k000"            # prefix: valid lower
        assert hi == "k001" and hi >= "k000000099"  # incremented prefix

    def test_counts_mode_drops_bounds(self, orc_file):
        sch = _ice_schema()
        modes = metrics_modes(sch, {"write.metadata.metrics.default": "counts"})
        m = collect_orc_metrics(None, [orc_file], sch, modes=modes)[orc_file]
        assert not m["lower_bounds"] and not m["upper_bounds"]
        assert m["null_value_counts"][3] == 10

    def test_schemaless_call_falls_back_to_counts(self, orc_file):
        m = collect_orc_metrics(None, [orc_file])[orc_file]
        assert m["record_count"] == 100
        assert not m["lower_bounds"]


class TestOrcBoundsPruning:
    def test_orc_written_table_prunes_on_bounds(self, spark, tmp_loc):
        """The r10-task-2 'done' bar: an ORC-written table prunes files
        on a bounds predicate. Three disjoint-range appends → three ORC
        files; a range filter plans exactly one of them."""
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex

        sch = it.Schema(fields=[
            it.NestedField(1, "k", it.LongType(), required=False),
            it.NestedField(2, "v", it.StringType(), required=False),
        ])
        t = IceTable.create(
            spark, os.path.join(tmp_loc, "torcprune"), sch,
            properties={"write.format.default": "orc"})
        for lo in (0, 1000, 2000):
            df = spark.range(lo, lo + 100).select(
                F.col("id").alias("k"),
                F.concat(F.lit("v"), F.col("id")).alias("v"))
            t = t.append(df.coalesce(1))
        files = list(t.scan().plan_files())
        assert len(files) == 3
        assert {x.file_format for x in files} == {"orc"}
        pruned = list(t.scan(
            filter=ex.and_(ex.gt_eq(ex.Reference("k"), 1000),
                           ex.lt(ex.Reference("k"), 1100))).plan_files())
        assert len(pruned) == 1, (
            "ORC bounds did not prune: metrics pruning is inert")
        df = t.scan(filter=ex.and_(ex.gt_eq(ex.Reference("k"), 1000),
                                   ex.lt(ex.Reference("k"), 1100))).to_df()
        assert df.count() == 100
        assert df.agg(F.min("k"), F.max("k")).collect()[0][0:2] == (1000, 1099)

    def test_orc_string_bounds_prune(self, spark, tmp_loc):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.plans import expressions as ex

        sch = it.Schema(fields=[
            it.NestedField(1, "name", it.StringType(), required=False),
        ])
        t = IceTable.create(
            spark, os.path.join(tmp_loc, "torcstr"), sch,
            properties={"write.format.default": "orc"})
        for prefix in ("aaa", "mmm", "zzz"):
            df = spark.createDataFrame(
                [(f"{prefix}-{j}",) for j in range(20)], schema="name string")
            t = t.append(df.coalesce(1))
        pruned = list(t.scan(
            filter=ex.eq(ex.Reference("name"), "mmm-7")).plan_files())
        assert len(pruned) == 1
        assert t.scan(filter=ex.eq(ex.Reference("name"), "mmm-7")) \
                .to_df().count() == 1


class TestOrcFooterRandomized:
    """Property-style roundtrip: random typed pyarrow tables → ORC →
    footer decode must reproduce the exact min/max/null-count that
    pyarrow computes from the data (zigzag negatives, unicode strings,
    int64 extremes, all-null and single-row shapes)."""

    def test_random_roundtrips(self, tmp_loc):
        import random

        import pyarrow as pa
        import pyarrow.orc as po

        rng = random.Random(20260815)
        for trial in range(25):
            n = rng.choice([1, 2, 17, 300])
            ints = [rng.choice([None, rng.randint(-2**62, 2**62)])
                    for _ in range(n)]
            dbls = [rng.choice([None, rng.uniform(-1e12, 1e12)])
                    for _ in range(n)]
            strs = [rng.choice([None, "", "é" * rng.randint(1, 5),
                                chr(0x10000 + rng.randint(0, 100)),
                                f"k{rng.randint(0, 9)}"])
                    for _ in range(n)]
            t = pa.table({"i": pa.array(ints, pa.int64()),
                          "d": pa.array(dbls, pa.float64()),
                          "s": pa.array(strs, pa.string())})
            p = os.path.join(tmp_loc, f"r{trial}.orc")
            po.write_table(t, p)
            footer = of.read_footer(p)
            assert footer.number_of_rows == n
            ids = of.column_ids(footer.types)

            live_i = [v for v in ints if v is not None]
            live_d = [v for v in dbls if v is not None]
            live_s = [v for v in strs if v is not None]
            st_i = footer.statistics[ids["i"]]
            st_d = footer.statistics[ids["d"]]
            st_s = footer.statistics[ids["s"]]
            assert st_i.number_of_values == len(live_i)
            assert st_d.number_of_values == len(live_d)
            assert st_s.number_of_values == len(live_s)
            lo, hi = of.stat_bounds(st_i, it.LongType())
            if live_i:
                assert (lo, hi) == (min(live_i), max(live_i))
            lo, hi = of.stat_bounds(st_d, it.DoubleType())
            if live_d:
                assert lo == pytest.approx(min(live_d))
                assert hi == pytest.approx(max(live_d))
            lo, hi = of.stat_bounds(st_s, it.StringType())
            if live_s and lo is not None:
                # ORC may omit string stats; when present they're exact
                assert (lo, hi) == (min(live_s), max(live_s))


class TestDistributedOrcHarvest:
    def test_executor_leg_equals_driver(self, spark, tmp_loc, monkeypatch):
        """Past DISTRIBUTED_THRESHOLD the ORC harvest ships to
        executors (mapInPandas + metrics JSON); results must equal the
        driver loop byte-for-byte."""
        import iceberg_cpp_spark.core.metrics as metrics

        sch = _ice_schema()
        paths = []
        for i in range(4):
            df = spark.range(i * 10, i * 10 + 10).select(
                F.col("id").cast("int").alias("i"),
                F.concat(F.lit("k"), F.col("id")).alias("s"),
                F.col("id").alias("nul"))
            out = os.path.join(tmp_loc, f"d{i}")
            df.coalesce(1).write.mode("overwrite").orc(out)
            paths.extend(glob.glob(out + "/*.orc"))
        driver = collect_orc_metrics(None, paths, sch)
        monkeypatch.setattr(metrics, "DISTRIBUTED_THRESHOLD", 1)
        dist = collect_orc_metrics(spark, paths, sch)
        assert driver == dist
