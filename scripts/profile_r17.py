"""r17 optimization-round phase profiler.

Breaks the expensive bench rows into their component phases (append,
DML, maintenance, final scan) and times each phase separately so the
optimization targets the phase that actually costs, per guide §1
("measure first"). Each phase is labelled via setJobDescription.

Run:  python scripts/profile_r17.py [row ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class P:
    def __init__(self, spark):
        self.spark = spark
        self.t0 = time.time()
        self.last = self.t0
        self.rows = []

    def mark(self, label):
        now = time.time()
        self.rows.append((label, now - self.last))
        self.last = now
        self.spark.sparkContext.setJobDescription(label)

    def report(self, name):
        total = time.time() - self.t0
        print(f"\n== {name}: {total:.3f}s total ==")
        for label, el in self.rows:
            print(f"  {el:7.3f}s  {label}")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def prof_merge_into(spark):
    p = P(spark)
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "mrg")
    p.mark("fresh_table")
    t.append(li)
    p.mark("append")
    key = ["l_orderkey", "l_linenumber"]
    upd = (li.filter("l_orderkey <= 100")
           .groupBy(*key)
           .agg(*[F.max(c).alias(c) for c in li.columns if c not in key])
           .select(*li.columns)
           .withColumn("l_returnflag", F.lit("Z")))
    ins = upd.withColumn("l_orderkey", F.col("l_orderkey") + 10_000_000)
    src = upd.unionByName(ins)
    t.merge_into(src, on=key)
    p.mark("merge_into")
    noop(t.to_df().groupBy("l_returnflag")
         .agg(F.count("*").alias("n"),
              F.sum(entrymod._dec("l_quantity")).cast("double").alias("s")))
    p.mark("final_scan")
    p.report("ice_merge_into")


def prof_merge_into_phases(spark):
    """merge_into decomposed further: checkpoint source, guard,
    discovery, rewrite+commit."""
    p = P(spark)
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "mrgp")
    t.append(li)
    p.mark("setup(append)")
    key = ["l_orderkey", "l_linenumber"]
    upd = (li.filter("l_orderkey <= 100")
           .groupBy(*key)
           .agg(*[F.max(c).alias(c) for c in li.columns if c not in key])
           .select(*li.columns)
           .withColumn("l_returnflag", F.lit("Z")))
    ins = upd.withColumn("l_orderkey", F.col("l_orderkey") + 10_000_000)
    source = upd.unionByName(ins)
    cols = [f.name for f in t.schema().fields]
    src = source.select(*cols).localCheckpoint(eager=True)
    p.mark("src localCheckpoint")
    t._guard_merge_cardinality(src, key)
    p.mark("cardinality guard")
    keys = src.select(*key).distinct()
    tgt_keys = (t._branch_scan("main").with_metadata_columns()
                .to_df().select("_file", *key))
    matched = tgt_keys.join(keys, key, "left_semi").localCheckpoint(eager=True)
    p.mark("matched localCheckpoint")
    affected = {t._plain_path(r["_file"]) for r in
                matched.select("_file").distinct().collect()}
    p.mark(f"affected collect ({len(affected)} files)")
    inserts = src.join(matched.select(*key).distinct(), key, "left_anti")
    affected_df = t._read_files_with_deletes(affected, branch="main")
    parts = [affected_df.join(keys, key, "left_anti"),
             affected_df.select(*key).join(src, key, "inner").select(*cols),
             inserts]
    merged = parts[0]
    for q in parts[1:]:
        merged = merged.unionByName(q)
    p.mark("plan build")
    new_files = t._write_data_files(merged)
    p.mark(f"_write_data_files ({len(new_files)} files)")
    from iceberg_cpp_spark.table import DataOperation
    t._commit_files(new_files, operation=DataOperation.OVERWRITE,
                    branch="main", carry_existing=True, drop_paths=affected,
                    read_snapshot_id=t._branch_head_id("main"))
    p.mark("_commit_files")
    p.report("merge_into phases")


def prof_compaction(spark):
    p = P(spark)
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "cmp")
    p.mark("fresh_table")
    for i in range(1, 5):
        t.append(li.filter(F.col("l_linenumber") == i))
        p.mark(f"append {i}")
    t.append(li.filter(F.col("l_linenumber") > 4))
    p.mark("append 5")
    t.rewrite_data_files(target_file_count=2)
    p.mark("rewrite_data_files")
    noop(t.to_df().groupBy("l_returnflag").agg(F.count("*").alias("n")))
    p.mark("final_scan")
    p.report("ice_compaction")


def prof_deletion_vector(spark):
    from iceberg_cpp_spark.plans import expressions as ex
    p = P(spark)
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "dv")
    t.append(li)
    p.mark("append")
    t = t.delete_where(ex.gt(ex.Reference("l_quantity"), 45.0),
                       mode="deletion-vector")
    p.mark("dv delete 1")
    t = t.delete_where(ex.lt(ex.Reference("l_quantity"), 3.0),
                       mode="deletion-vector")
    p.mark("dv delete 2")
    noop(t.to_df().groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(entrymod._dec("l_quantity")).cast("double").alias("s")))
    p.mark("final_scan")
    p.report("ice_deletion_vector")


def prof_cdc_apply(spark):
    p = P(spark)
    li = (entrymod._t(spark, SF_DIR, "lineitem")
          .groupBy("l_orderkey", "l_linenumber")
          .agg(F.max("l_quantity").alias("l_quantity"),
               F.max("l_returnflag").alias("l_returnflag"))
          .localCheckpoint(eager=True))
    p.mark("base localCheckpoint")
    t = entrymod._fresh_table(spark, SF_DIR, li, "cdc")
    t.append(li)
    p.mark("append")
    dels = (li.filter(F.col("l_returnflag") == "R")
            .withColumn("_op", F.lit("D")).withColumn("_seq", F.lit(1)))
    upds = (li.filter(F.col("l_returnflag") == "A")
            .withColumn("l_quantity", F.col("l_quantity") * 2)
            .withColumn("_op", F.lit("U")).withColumn("_seq", F.lit(2)))
    ins = (li.filter(F.col("l_orderkey") <= 100)
           .withColumn("l_orderkey", F.col("l_orderkey") + 50_000_000)
           .withColumn("_op", F.lit("I")).withColumn("_seq", F.lit(3)))
    t.apply_changes(dels.unionByName(upds).unionByName(ins),
                    on=["l_orderkey", "l_linenumber"], seq_col="_seq")
    p.mark("apply_changes")
    noop(t.to_df().groupBy("l_returnflag")
         .agg(F.count("*").alias("n"),
              F.sum(F.col("l_quantity").cast("decimal(18,2)"))
              .cast("double").alias("s")))
    p.mark("final_scan")
    p.report("ice_cdc_apply")


def prof_merge_sync(spark):
    from iceberg_cpp_spark import (MatchedClause, NotMatchedBySourceClause,
                                   NotMatchedClause)
    p = P(spark)
    o = entrymod._t(spark, SF_DIR, "orders")
    t = entrymod._fresh_table(spark, SF_DIR, o, "sync")
    t.append(o)
    p.mark("append")
    keep = o.filter("o_orderkey % 3 = 0") \
            .withColumn("o_orderpriority", F.lit("synced"))
    ins = keep.filter("o_orderkey < 1000") \
              .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    t.merge_into(
        keep.unionByName(ins), on=["o_orderkey"],
        when_matched=[MatchedClause("update")],
        when_not_matched=[NotMatchedClause()],
        when_not_matched_by_source=[
            NotMatchedBySourceClause("delete",
                                     condition="t.o_orderkey % 3 = 1"),
            NotMatchedBySourceClause(
                "update", assignments={"o_orderpriority": "'stale'"})])
    p.mark("merge_into(by_source)")
    noop(t.to_df().groupBy("o_orderstatus")
         .agg(F.count("*").alias("n")))
    p.mark("final_scan")
    p.report("ice_merge_sync")


def prof_roundtrip(spark):
    p = P(spark)
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "rt")
    p.mark("fresh_table")
    t.append(li)
    p.mark("append")
    noop(t.to_df().groupBy("l_returnflag")
         .agg(F.count("*").alias("n"),
              F.sum(entrymod._dec("l_extendedprice")).cast("double").alias("s")))
    p.mark("final_scan")
    p.report("ice_roundtrip_agg")


def prof_append_phases(spark):
    """append decomposed: parquet write, metrics, manifest+commit."""
    p = P(spark)
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "app")
    p.mark("fresh_table")
    new_files = t._write_data_files(li)
    p.mark(f"_write_data_files ({len(new_files)} files)")
    from iceberg_cpp_spark.table import DataOperation
    t._commit_files(new_files, operation=DataOperation.APPEND)
    p.mark("_commit_files")
    p.report("append phases")


def prof_write_phases(spark):
    """_write_data_files decomposed: spark parquet write vs metrics."""
    import tempfile
    p = P(spark)
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "wph")
    p.mark("fresh_table")
    write_dir = t.location_provider().new_data_dir()
    df = t._aligned_df(li)
    p.mark("align")
    df.write.mode("overwrite").parquet(write_dir)
    p.mark("parquet write")
    paths = []
    for root, _d, fs in os.walk(write_dir):
        paths += [os.path.join(root, fn) for fn in fs
                  if fn.endswith(".parquet")]
    paths.sort()
    from iceberg_cpp_spark.core.metrics import collect_metrics, metrics_modes
    schema = t.schema()
    m = collect_metrics(spark, paths, schema,
                        modes=metrics_modes(schema, t.properties()))
    p.mark(f"collect_metrics ({len(paths)} files)")
    assert m
    p.report("_write_data_files phases")


PROFILES = {
    "merge_into": prof_merge_into,
    "merge_phases": prof_merge_into_phases,
    "compaction": prof_compaction,
    "deletion_vector": prof_deletion_vector,
    "cdc_apply": prof_cdc_apply,
    "merge_sync": prof_merge_sync,
    "roundtrip": prof_roundtrip,
    "append_phases": prof_append_phases,
    "write_phases": prof_write_phases,
}


def main():
    from iceberg_cpp_spark.session import get_spark
    spark = get_spark(app_name="profile-r17")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    entrymod.queries()["q1_pricing_summary"](spark, SF_DIR) \
        .write.format("noop").mode("overwrite").save()
    names = sys.argv[1:] or list(PROFILES)
    for n in names:
        PROFILES[n](spark)


if __name__ == "__main__":
    main()
