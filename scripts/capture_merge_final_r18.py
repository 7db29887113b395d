"""r18 (VERDICT r17 task 4): capture the single-pass MERGE rewrite's
AQE FINAL plan — does the flagged source convert to a broadcast build
at bench scale, or does the two-sided Exchange survive execution?
Writes plans/r18/merge_rewrite_after_final.txt."""
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
    os.path.abspath(__file__))), "plans", "r18")


def main():
    os.makedirs(OUT, exist_ok=True)
    from iceberg_cpp_spark.session import get_spark
    from iceberg_cpp_spark.table import _acol
    spark = get_spark(app_name="merge-final-r18")
    spark.sparkContext.setLogLevel("ERROR")
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "mfinal")
    t.append(li)
    key = ["l_orderkey", "l_linenumber"]
    cols = [f.name for f in t.schema().fields]
    upd = (li.filter("l_orderkey <= 100")
           .groupBy(*key)
           .agg(*[F.max(c).alias(c) for c in li.columns if c not in key])
           .select(*li.columns)
           .withColumn("l_returnflag", F.lit("Z")))
    src = upd.select(*cols).localCheckpoint(eager=True)
    keys = src.select(*key)
    tgt_keys = (t._branch_scan("main").with_metadata_columns()
                .to_df().select("_file", *key))
    matched = tgt_keys.join(keys, key, "left_semi")
    affected = {t._plain_path(r["_file"]) for r in
                matched.select("_file").distinct().collect()}
    affected_df = t._read_files_with_deletes(affected, branch="main")
    s_a = src.withColumn("__merge_m", F.lit(True)).alias("s")
    t_a = affected_df.alias("t")
    jcond = F.lit(True)
    for k in key:
        jcond = jcond & (_acol("t", k) == _acol("s", k))
    after = t_a.join(s_a, jcond, "left").select(*[
        (_acol("t", c) if c in key else
         F.when(F.col("__merge_m").isNotNull(), _acol("s", c))
         .otherwise(_acol("t", c))).alias(c)
        for c in cols])
    # EXECUTE the same Dataset so ITS AdaptiveSparkPlan finalizes
    # (count() would spawn a separate pruned QueryExecution)
    n = len(after.toPandas())
    buf = io.StringIO()
    with redirect_stdout(buf):
        after.explain("formatted")
    with open(os.path.join(OUT, "merge_rewrite_after_final.txt"), "w") as fh:
        fh.write(f"-- captured AFTER execution (count={n}); "
                 f"AdaptiveSparkPlan below shows the FINAL plan\n")
        fh.write(buf.getvalue())
    print("rows:", n)
    print(buf.getvalue()[:2000])


if __name__ == "__main__":
    main()
