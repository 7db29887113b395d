"""r17 profiler, part 2: raw-write codec cost, DV scan path, dv delete
phases, cdc phases, bm25 add phases."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bench(label, fn, n=3):
    best = None
    for i in range(n):
        t0 = time.time()
        fn()
        el = time.time() - t0
        best = el if best is None or el < best else best
    print(f"  {best:7.3f}s  {label}")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def raw_write(spark):
    print("\n== raw parquet write of lineitem (min of 3) ==")
    li = entrymod._t(spark, SF_DIR, "lineitem")
    noop(li)  # warm the read

    def w(codec=None, opts=None):
        d = tempfile.mkdtemp(prefix="raww_")
        wr = li.write
        if codec:
            wr = wr.option("compression", codec)
        for k, v in (opts or {}).items():
            wr = wr.option(k, v)
        wr.mode("overwrite").parquet(os.path.join(d, "t"))
        import shutil
        shutil.rmtree(d, ignore_errors=True)

    bench("read-only (noop)", lambda: noop(li))
    bench("write zstd (session default)", lambda: w())
    bench("write snappy", lambda: w("snappy"))
    bench("write uncompressed", lambda: w("uncompressed"))
    bench("write zstd level 1", lambda: w(
        "zstd", {"parquet.compression.codec.zstd.level": "1"}))
    li32 = li.repartition(32)
    bench("write zstd 32 partitions", lambda: (
        li32.write.mode("overwrite").parquet(
            tempfile.mkdtemp(prefix="raww32_") + "/t")))


def dv_scan(spark):
    from iceberg_cpp_spark.plans import expressions as ex
    print("\n== DV scan decomposition ==")
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "dvp")
    t.append(li)
    t = t.delete_where(ex.gt(ex.Reference("l_quantity"), 45.0),
                       mode="deletion-vector")
    q = lambda: noop(t.to_df().groupBy("l_returnflag").agg(  # noqa: E731
        F.count("*").alias("n")))
    bench("scan with 1 DV", q, n=4)
    t2 = entrymod._fresh_table(spark, SF_DIR, li, "dvp2")
    t2.append(li)
    bench("scan no DV", lambda: noop(
        t2.to_df().groupBy("l_returnflag").agg(F.count("*").alias("n"))), n=4)


def dv_delete_phases(spark):
    from iceberg_cpp_spark.plans import expressions as ex
    from iceberg_cpp_spark.table import _build_and_write_dv_shards
    print("\n== dv delete phases ==")
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "dvd")
    t.append(li)
    expr = ex.gt(ex.Reference("l_quantity"), 45.0)
    t0 = time.time()
    fscan = t._branch_scan("main", filter=expr)
    affected = [x.file_path for x in fscan.plan_files()]
    t1 = time.time()
    print(f"  {t1-t0:7.3f}s  plan_files ({len(affected)} files)")
    from iceberg_cpp_spark.plans.spark_compiler import to_spark_column
    rows = (t._read_paths_rows(affected, fscan, with_meta=True)
            .filter(to_spark_column(expr, t.schema()))
            .select(F.regexp_replace(F.col("_file"), "^file:(//)?", "")
                    .alias("file_path"), F.col("_pos").alias("pos")))
    old_ptrs = {}
    t2 = time.time()
    shard_rows = _build_and_write_dv_shards(
        spark, rows, old_ptrs, os.path.join(t.location(), "deletes"))
    t3 = time.time()
    print(f"  {t3-t2:7.3f}s  _build_and_write_dv_shards "
          f"({len(shard_rows)} shards)")
    from iceberg_cpp_spark.table import DataOperation, _dv_data_files
    touched = {r["file_path"] for r in shard_rows}
    t4 = time.time()
    t._commit_files(_dv_data_files(shard_rows),
                    operation=DataOperation.DELETE, branch="main",
                    drop_dv_for=touched, require_live=touched,
                    read_snapshot_id=t._branch_head_id("main"))
    t5 = time.time()
    print(f"  {t5-t4:7.3f}s  _commit_files")


def bm25_phases(spark):
    import shutil
    from iceberg_cpp_spark.operators import retrieval as rt
    print("\n== bm25 build phases ==")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    root = tempfile.mkdtemp(prefix="bm25p_")
    t0 = time.time()
    idx = rt.Bm25Index.build(spark, os.path.join(root, "idx"), even)
    t1 = time.time()
    print(f"  {t1-t0:7.3f}s  build(even)")
    idx = idx.add(odd)
    t2 = time.time()
    print(f"  {t2-t1:7.3f}s  add(odd)")
    q = (docs.filter(F.col("doc_id") % 97 == 3)
         .select(F.col("doc_id").alias("query_id"),
                 F.expr("substring(text, 1, 60)").alias("query_text")))
    bench("search", lambda: noop(idx.search(q, k=5)), n=3)
    shutil.rmtree(root, ignore_errors=True)


def partition_pruned_phases(spark):
    print("\n== ice_partition_pruned phases ==")
    from iceberg_cpp_spark import IceTable
    from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec
    from iceberg_cpp_spark.core.types import schema_from_spark
    from iceberg_cpp_spark.functions import transforms as tr
    from iceberg_cpp_spark.plans import expressions as ex
    li = entrymod._t(spark, SF_DIR, "lineitem")
    schema = schema_from_spark(li.schema)
    sd = schema.find_field("l_shipdate")
    spec = PartitionSpec([PartitionField(sd.field_id, 1000, "ship_month",
                                         tr.MonthTransform())])
    loc = os.path.join(tempfile.mkdtemp(prefix="ice_ppp_"), "li")
    t0 = time.time()
    t = IceTable.create(spark, loc, schema, spec=spec)
    t1 = time.time()
    print(f"  {t1-t0:7.3f}s  create")
    t.append(li)
    t2 = time.time()
    print(f"  {t2-t1:7.3f}s  append (partitioned write)")
    import datetime as dt
    flt = ex.gt_eq(ex.Reference("l_shipdate"), dt.datetime(1996, 1, 1)) \
        & ex.lt(ex.Reference("l_shipdate"), dt.datetime(1997, 1, 1))
    bench("pruned scan agg", lambda: noop(
        t.scan(filter=flt).to_df().groupBy("l_returnflag")
        .agg(F.count("*").alias("n"),
             F.sum(entrymod._dec("l_quantity")).cast("double").alias("s"))),
        n=3)


def main():
    from iceberg_cpp_spark.session import get_spark
    spark = get_spark(app_name="profile-r17b")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod.queries()["q1_pricing_summary"](spark, SF_DIR) \
        .write.format("noop").mode("overwrite").save()
    names = sys.argv[1:] or ["raw_write", "dv_scan", "dv_delete_phases",
                             "bm25_phases", "partition_pruned_phases"]
    fns = {"raw_write": raw_write, "dv_scan": dv_scan,
           "dv_delete_phases": dv_delete_phases, "bm25_phases": bm25_phases,
           "partition_pruned_phases": partition_pruned_phases}
    for n in names:
        fns[n](spark)


if __name__ == "__main__":
    main()
