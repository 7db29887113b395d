"""plan_files_df — the uncollected scan plan (VERDICT r10 task 6 /
planning beyond 10^5 files): the whole plan stays a DataFrame so a
10^6-file table never materializes per-file Python objects on the
driver. These tests pin parity with plan_files() across partitioned,
filtered, and Avro-manifest tables, plus the aggregate-consumption
shape. The 200k-entry RSS bound lives in bench.py (ice_plan_200k)."""

import os

import pytest
from pyspark.sql import functions as F

import iceberg_cpp_spark.core.types as it
from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.plans import expressions as ex


def _mk(spark, loc, fmt_props=None, parts=3):
    sch = it.Schema([
        it.NestedField(1, "k", it.LongType(), True),
        it.NestedField(2, "cat", it.StringType(), False),
        it.NestedField(3, "v", it.DoubleType(), False),
    ])
    t = IceTable.create(spark, loc, sch, properties=fmt_props or {})
    for i in range(parts):
        df = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("k"),
            F.concat(F.lit("c"), (F.col("id") % 4)).alias("cat"),
            (F.col("id") * 0.5).alias("v"))
        t = t.append(df.coalesce(1))
    return t


def _parity(scan):
    tasks = scan.plan_files()
    rows = scan.plan_files_df().collect()
    want = {(t.file_path, t.file_format, t.record_count,
             t.file_size_in_bytes, t.sequence_number, t.spec_id)
            for t in tasks}
    got = {(r["file_path"], r["file_format"], r["record_count"],
            r["file_size_in_bytes"], r["sequence_number"], r["spec_id"])
           for r in rows}
    assert got == want and len(rows) == len(tasks)
    return len(tasks)


class TestPlanFilesDf:
    def test_parity_unfiltered_and_filtered(self, spark, tmp_loc):
        t = _mk(spark, os.path.join(tmp_loc, "t"))
        n_all = _parity(t.scan())
        assert n_all == 3
        n_f = _parity(t.scan(filter=ex.and_(
            ex.gt_eq(ex.Reference("k"), 100), ex.lt(ex.Reference("k"), 200))))
        assert n_f == 1  # bounds pruning must hold on the DF plane too

    def test_parity_avro_manifests(self, spark, tmp_loc):
        t = _mk(spark, os.path.join(tmp_loc, "ta"),
                fmt_props={"write.metadata.manifest-format": "avro"})
        _parity(t.scan())
        _parity(t.scan(filter=ex.lt(ex.Reference("k"), 100)))

    def test_empty_scan_yields_empty_df(self, spark, tmp_loc):
        sch = it.Schema([it.NestedField(1, "k", it.LongType(), True)])
        t = IceTable.create(spark, os.path.join(tmp_loc, "te"), sch)
        df = t.scan().plan_files_df()
        assert df.count() == 0
        assert set(df.columns) == {
            "file_path", "file_format", "record_count",
            "file_size_in_bytes", "partition_json", "sequence_number",
            "first_row_id", "spec_id"}

    def test_aggregate_consumption_no_collect(self, spark, tmp_loc):
        """The intended 10^6-file usage: per-partition rollups straight
        off the plan DF — no FileScanTask ever exists."""
        t = _mk(spark, os.path.join(tmp_loc, "tg"), parts=4)
        agg = (t.scan().plan_files_df()
               .agg(F.count("*").alias("files"),
                    F.sum("record_count").alias("rows"),
                    F.sum("file_size_in_bytes").alias("bytes"))
               .collect()[0])
        assert agg["files"] == 4 and agg["rows"] == 400
        assert agg["bytes"] > 0

    def test_partitioned_table_partition_json(self, spark, tmp_loc):
        from iceberg_cpp_spark.functions import transforms as tr
        from iceberg_cpp_spark.table import PartitionField, PartitionSpec

        sch = it.Schema([
            it.NestedField(1, "k", it.LongType(), True),
            it.NestedField(2, "cat", it.StringType(), False),
        ])
        spec = PartitionSpec([PartitionField(2, 1000, "cat",
                                             tr.IdentityTransform())])
        t = IceTable.create(spark, os.path.join(tmp_loc, "tp"), sch,
                            spec=spec)
        df = spark.range(0, 40).select(
            F.col("id").alias("k"),
            F.concat(F.lit("p"), (F.col("id") % 2)).alias("cat"))
        t = t.append(df)
        scan = t.scan(filter=ex.eq(ex.Reference("cat"), "p1"))
        _parity(scan)
        rows = scan.plan_files_df().collect()
        # string partition values serialize hex in partition_json
        # ("p1" → "7031"); the round-trip is covered by _parity above
        assert rows and all(r["partition_json"] == '{"cat": "7031"}'
                            for r in rows)

    def test_parity_mixed_manifest_formats(self, spark, tmp_loc):
        """A manifest-format flip mid-history leaves parquet AND Avro
        manifests in one snapshot; both legs must union."""
        t = _mk(spark, os.path.join(tmp_loc, "tm"), parts=2)
        t = t.update_properties(
            {"write.metadata.manifest-format": "avro"})
        df = spark.range(900, 950).select(
            F.col("id").alias("k"),
            F.concat(F.lit("c"), (F.col("id") % 4)).alias("cat"),
            (F.col("id") * 0.5).alias("v"))
        t = t.append(df.coalesce(1))
        import iceberg_cpp_spark.core.manifests as mf

        kinds = {m.manifest_path.rsplit(".", 1)[-1]
                 for m in mf.read_manifest_list(
                     t.current_snapshot().manifest_list)}
        assert kinds == {"parquet", "avro"}, kinds
        n = _parity(t.scan())
        assert n == 3
        _parity(t.scan(filter=ex.gt_eq(ex.Reference("k"), 900)))
