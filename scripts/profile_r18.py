"""r18 optimization-round phase profiler.

Fine-grained phase timing for this round's targets (VERDICT r17 "Next
round" list): apply_changes internals (ice_cdc_apply), the partitioned
append's range-write sample pass (ice_partition_pruned), the ORC scan
path (ice_orc_data), and text_contamination. Each phase is labelled via
setJobDescription per guide §1.5.

Run:  python scripts/profile_r18.py [row ...]
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


def prof_cdc_phases(spark):
    """apply_changes broken into its internal phases (inlined from
    table.py so each job is timed separately)."""
    from pyspark.sql.window import Window
    p = P(spark)
    li = (entrymod._t(spark, SF_DIR, "lineitem")
          .groupBy("l_orderkey", "l_linenumber")
          .agg(F.max("l_quantity").alias("l_quantity"),
               F.max("l_returnflag").alias("l_returnflag"))
          .localCheckpoint(eager=True))
    p.mark("base localCheckpoint")
    t = entrymod._fresh_table(spark, SF_DIR, li, "cdcph")
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
    changes = dels.unionByName(upds).unionByName(ins)
    on = ["l_orderkey", "l_linenumber"]
    schema = t.schema()
    changes = changes.persist()
    bad = changes.filter(~F.col("_op").isin("I", "U", "D")
                         | F.col("_op").isNull()) \
                 .select("_op").limit(1).collect()
    assert not bad
    p.mark("op validation (materializes persist)")
    w = Window.partitionBy(*on).orderBy(F.col("_seq").desc())
    last = (changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn").persist())
    cols = [f.name for f in schema.fields]
    upserts = last.filter(F.col("_op") != "D").select(*cols)
    all_keys = last.select(*on).distinct()
    tgt = t._branch_scan("main").with_metadata_columns().to_df()
    affected = {
        t._plain_path(r["_file"])
        for r in tgt.select("_file", *on)
        .join(all_keys, on, "left_semi")
        .select("_file").distinct().collect()}
    p.mark(f"window dedup + affected discovery ({len(affected)} files)")
    affected_df = t._read_files_with_deletes(affected, branch="main")
    rewritten = affected_df.join(all_keys, on, "left_anti") \
                           .unionByName(upserts)
    new_files = t._write_data_files(rewritten)
    p.mark(f"rewrite write ({len(new_files)} files)")
    from iceberg_cpp_spark.table import DataOperation
    t = t._commit_files(new_files, operation=DataOperation.OVERWRITE,
                        branch="main", carry_existing=True,
                        drop_paths=affected,
                        read_snapshot_id=t._branch_head_id("main"))
    p.mark("commit")
    last.unpersist()
    changes.unpersist()
    noop(t.to_df().groupBy("l_returnflag")
         .agg(F.count("*").alias("n"),
              F.sum(F.col("l_quantity").cast("decimal(18,2)"))
              .cast("double").alias("sum_qty")))
    p.mark("final scan")
    p.report("ice_cdc_apply phases")


def prof_cdc_row(spark):
    """The bench row as-is, one phase per top-level statement."""
    p = P(spark)
    noop(entrymod.ice_cdc_apply(spark, SF_DIR))
    p.mark("whole row")
    p.report("ice_cdc_apply row")


def prof_partition_pruned(spark):
    from iceberg_cpp_spark import IceTable
    from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec
    from iceberg_cpp_spark.core.types import schema_from_spark
    from iceberg_cpp_spark.functions import transforms as tr
    from iceberg_cpp_spark.plans import expressions as ex
    import datetime as dt
    import tempfile

    p = P(spark)
    li = entrymod._t(spark, SF_DIR, "lineitem")
    schema = schema_from_spark(li.schema)
    sd = schema.find_field("l_shipdate")
    spec = PartitionSpec([PartitionField(sd.field_id, 1000, "ship_month",
                                         tr.MonthTransform())])
    loc = os.path.join(tempfile.mkdtemp(prefix="ice_ppph_"), "li")
    t = IceTable.create(spark, loc, schema, spec=spec)
    p.mark("create")
    t.append(li)
    p.mark("append (range distribution)")
    flt = ex.gt_eq(ex.Reference("l_shipdate"), dt.datetime(1996, 1, 1)) \
        & ex.lt(ex.Reference("l_shipdate"), dt.datetime(1997, 1, 1))
    noop(t.scan(filter=flt).to_df()
         .groupBy("l_returnflag")
         .agg(F.count("*").alias("n"),
              F.sum(entrymod._dec("l_quantity")).cast("double")
              .alias("sum_qty")))
    p.mark("pruned scan")
    p.report("ice_partition_pruned phases")


def prof_orc_data(spark):
    import glob as _glob
    import tempfile

    from iceberg_cpp_spark import IceTable
    from iceberg_cpp_spark.core.types import schema_from_spark
    from iceberg_cpp_spark.plans import expressions as ex

    p = P(spark)
    sup = entrymod._t(spark, SF_DIR, "supplier")
    schema = schema_from_spark(sup.schema)
    base = tempfile.mkdtemp(prefix="ice_orcph_")
    orc_dir = os.path.join(base, "orc")
    (sup.filter("s_suppkey % 2 = 0").coalesce(1)
     .write.mode("overwrite").orc(orc_dir))
    p.mark("spark orc write")
    t = IceTable.create(spark, os.path.join(base, "t"), schema)
    t = t.add_files(sorted(_glob.glob(os.path.join(orc_dir, "*.orc"))))
    p.mark("add_files (orc import)")
    t = t.append(sup.filter("s_suppkey % 2 = 1"))
    p.mark("parquet append")
    t = t.delete_where(ex.lt(ex.Reference("s_acctbal"), 0.0),
                       mode="merge-on-read")
    p.mark("MoR delete (spans formats)")
    noop(t.to_df()
         .groupBy("s_nationkey")
         .agg(F.count("*").cast("long").alias("n"),
              F.sum(entrymod._dec("s_acctbal")).cast("double")
              .alias("sum_bal")))
    p.mark("final scan")
    p.report("ice_orc_data phases")


def prof_text_contamination(spark):
    p = P(spark)
    noop(entrymod.text_contamination(spark, SF_DIR))
    p.mark("row")
    p.report("text_contamination")


def prof_merge_into_row(spark):
    p = P(spark)
    noop(entrymod.ice_merge_into(spark, SF_DIR))
    p.mark("whole row")
    p.report("ice_merge_into row")


PROFS = {
    "cdc_phases": prof_cdc_phases,
    "cdc_row": prof_cdc_row,
    "partition_pruned": prof_partition_pruned,
    "orc_data": prof_orc_data,
    "text_contamination": prof_text_contamination,
    "merge_row": prof_merge_into_row,
}


def main():
    from iceberg_cpp_spark.session import get_spark
    spark = get_spark(app_name="profile-r18")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(PROFS)
    # warmup
    entrymod.q1_pricing_summary(spark, SF_DIR).write.format("noop") \
        .mode("overwrite").save()
    for n in names:
        PROFS[n](spark)


if __name__ == "__main__":
    main()
