"""Capture the MERGE CoW rewrite's internal plan before/after the r17
single-pass change: the 'before' shape is reconstructed exactly as
_merge_into_impl built it pre-r17 (anti-join ∪ inner-join — two scans
of the affected files), the 'after' shape is what the code builds now.
Writes plans/r17/merge_rewrite_{before,after}.txt."""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r17")


def cap(df, name):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, name), "w") as fh:
        fh.write(buf.getvalue())
    print("wrote", name)


def main():
    os.makedirs(OUT, exist_ok=True)
    from iceberg_cpp_spark.session import get_spark
    spark = get_spark(app_name="merge-plans-r17")
    spark.sparkContext.setLogLevel("ERROR")
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "mplan")
    t.append(li)
    key = ["l_orderkey", "l_linenumber"]
    cols = [f.name for f in t.schema().fields]
    upd = (li.filter("l_orderkey <= 100")
           .groupBy(*key)
           .agg(*[F.max(c).alias(c) for c in li.columns if c not in key])
           .select(*li.columns)
           .withColumn("l_returnflag", F.lit("Z")))
    src = upd.select(*cols).localCheckpoint(eager=True)
    keys = src.select(*key).distinct()
    tgt_keys = (t._branch_scan("main").with_metadata_columns()
                .to_df().select("_file", *key))
    matched = tgt_keys.join(keys, key, "left_semi")
    affected = {t._plain_path(r["_file"]) for r in
                matched.select("_file").distinct().collect()}
    affected_df = t._read_files_with_deletes(affected, branch="main")

    # pre-r17 shape: two scans of the affected files
    before = (affected_df.join(keys, key, "left_anti")
              .unionByName(affected_df.select(*key).join(src, key, "inner")
                           .select(*cols)))
    cap(before, "merge_rewrite_before.txt")

    # r17 shape: one scan, left join + match flag
    s_a = src.withColumn("__merge_m", F.lit(True)).alias("s")
    t_a = affected_df.alias("t")
    jcond = F.lit(True)
    for k in key:
        jcond = jcond & (F.col(f"t.{k}") == F.col(f"s.{k}"))
    after = t_a.join(s_a, jcond, "left").select(*[
        (F.col(f"t.{c}") if c in key else
         F.when(F.col("__merge_m").isNotNull(), F.col(f"s.{c}"))
         .otherwise(F.col(f"t.{c}"))).alias(c)
        for c in cols])
    cap(after, "merge_rewrite_after.txt")


if __name__ == "__main__":
    main()
