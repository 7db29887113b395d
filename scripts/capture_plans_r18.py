"""r18 plan captures: before/after pairs for every plane this round
touched. 'Before' shapes are reconstructed exactly as the pre-r18 code
built them (r17 precedent: scripts/capture_merge_plans_r17.py); 'after'
shapes are what the code builds now. Writes plans/r18/*.txt."""
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


def cap(df, name, note=""):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, name), "w") as fh:
        if note:
            fh.write(f"-- {note}\n")
        fh.write(buf.getvalue())
    print("wrote", name)


def contamination_pair(spark):
    from iceberg_cpp_spark.operators import text as tx
    from iceberg_cpp_spark.operators.partitioning import (
        spread_to_parallelism,
    )
    from iceberg_cpp_spark.operators.text import word_ngrams

    docs = entrymod._t(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    # pre-r18 shape: explode without per-row dedup + countDistinct agg
    c = spread_to_parallelism(corpus)
    b = spread_to_parallelism(bench)
    grams = c.select(F.col("doc_id"),
                     F.explode(word_ngrams(F.col("text"), 4)).alias("gram"))
    bg = (b.select(F.explode(word_ngrams(F.col("text"), 4)).alias("gram"))
          .distinct())
    before = (grams.join(F.broadcast(bg), "gram").groupBy("doc_id")
              .agg(F.countDistinct("gram").cast("int")
                   .alias("n_contaminated_grams")))
    cap(before, "text_contamination_before.txt",
        "pre-r18: countDistinct ships every (doc, gram) pair through "
        "the exchange")
    cap(tx.contamination(corpus, bench, n=4),
        "text_contamination_after.txt",
        "r18: array_distinct per row + plain count (map-side partial "
        "aggregation)")


def cdc_rewrite_pair(spark):
    """apply_changes' discovery + rewrite plane: all_keys with the old
    redundant .distinct() vs without."""
    li = (entrymod._t(spark, SF_DIR, "lineitem")
          .groupBy("l_orderkey", "l_linenumber")
          .agg(F.max("l_quantity").alias("l_quantity"),
               F.max("l_returnflag").alias("l_returnflag")))
    t = entrymod._fresh_table(spark, SF_DIR, li, "cdcplan")
    t.append(li)
    base = t.to_df()
    on = ["l_orderkey", "l_linenumber"]
    dels = (base.filter(F.col("l_returnflag") == "R")
            .withColumn("_op", F.lit("D")).withColumn("_seq", F.lit(1)))
    upds = (base.filter(F.col("l_returnflag") == "A")
            .withColumn("l_quantity", F.col("l_quantity") * 2)
            .withColumn("_op", F.lit("U")).withColumn("_seq", F.lit(2)))
    changes = dels.unionByName(upds).persist()
    from pyspark.sql.window import Window
    w = Window.partitionBy(*on).orderBy(F.col("_seq").desc())
    # pre-r18 shape: unconditional window + distinct over its keys
    last_before = (changes.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn").persist())
    cols = [f.name for f in t.schema().fields]
    tgt = t._branch_scan("main").with_metadata_columns().to_df()
    shapes = [
        ("before", last_before, last_before.select(*on).distinct(),
         "pre-r18: unconditional last-write-wins window + a redundant "
         "distinct over its (already unique) keys"),
        # r18 shape: the one-pass probe proves this batch key-unique,
        # so the window never runs and the keys skip the distinct
        ("after", changes, changes.select(*on),
         "r18: key-unique batch — no window, no distinct (probe-gated)"),
    ]
    for label, last, all_keys, note in shapes:
        upserts = last.filter(F.col("_op") != "D").select(*cols)
        discovery = (tgt.select("_file", *on)
                     .join(all_keys, on, "left_semi")
                     .select("_file").distinct())
        cap(discovery, f"ice_cdc_apply_discovery_{label}.txt",
            f"apply_changes affected-file discovery ({note})")
        affected = {t._plain_path(r["_file"]) for r in discovery.collect()}
        rewritten = (t._read_files_with_deletes(affected, branch="main")
                     .join(all_keys, on, "left_anti").unionByName(upserts))
        cap(rewritten, f"ice_cdc_apply_rewrite_{label}.txt",
            f"apply_changes rewrite plane ({note})")
    last_before.unpersist()
    changes.unpersist()


def partition_pruned_pair(spark):
    """The partitioned append's distribution plane: range (pre-r18
    default, sampling exchange) vs the size-gated hash fallback."""
    from iceberg_cpp_spark import IceTable
    from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec
    from iceberg_cpp_spark.core.types import schema_from_spark
    from iceberg_cpp_spark.functions import transforms as tr
    import tempfile

    li = entrymod._t(spark, SF_DIR, "lineitem")
    schema = schema_from_spark(li.schema)
    sd = schema.find_field("l_shipdate")
    spec = PartitionSpec([PartitionField(sd.field_id, 1000, "ship_month",
                                         tr.MonthTransform())])
    loc = os.path.join(tempfile.mkdtemp(prefix="ppplan_"), "li")
    t = IceTable.create(spark, loc, schema, spec=spec)
    df = t._aligned_df(li)
    pf = spec.fields[0]
    src = schema.find_field_by_id(pf.source_id)
    col = pf.transform.spark_column(F.col(src.name), src.field_type)
    df = df.withColumn("_p_" + pf.name, col)
    part = "_p_" + pf.name
    cap(df.repartitionByRange(part, src.name),
        "ice_partition_pruned_write_before.txt",
        "pre-r18 default: rangepartitioning exchange — the bounds "
        "SAMPLE pass evaluates the whole batch a second time")
    cap(df.repartition(part),
        "ice_partition_pruned_write_after.txt",
        "r18: sub-threshold default batches hash-distribute — same "
        "per-partition clustering, no sampling job")


def merge_discovery_pair(spark):
    """merge_into's matched-file discovery: keys with the old
    .distinct() (extra exchange) vs guard-proven unique keys."""
    li = entrymod._t(spark, SF_DIR, "lineitem")
    t = entrymod._fresh_table(spark, SF_DIR, li, "mdisc")
    t.append(li)
    key = ["l_orderkey", "l_linenumber"]
    upd = (li.filter("l_orderkey <= 100").groupBy(*key)
           .agg(*[F.max(c).alias(c) for c in li.columns if c not in key])
           .select(*li.columns).withColumn("l_returnflag", F.lit("Z")))
    src = upd.localCheckpoint(eager=True)
    tgt_keys = (t._branch_scan("main").with_metadata_columns()
                .to_df().select("_file", *key))
    cap(tgt_keys.join(src.select(*key).distinct(), key, "left_semi")
        .select("_file").distinct(),
        "ice_merge_into_discovery_before.txt",
        "pre-r18: keys side pays a distinct exchange although the "
        "cardinality guard proved uniqueness")
    cap(tgt_keys.join(src.select(*key), key, "left_semi")
        .select("_file").distinct(),
        "ice_merge_into_discovery_after.txt",
        "r18: guard-proven-unique keys broadcast directly")


def orc_mor_read_pair(spark):
    """_position_delete's read plane over a mixed parquet+ORC table:
    all columns through the opaque ORC leg vs predicate-pruned."""
    import glob
    import tempfile

    from iceberg_cpp_spark import IceTable
    from iceberg_cpp_spark.core.types import schema_from_spark
    from iceberg_cpp_spark.plans import expressions as ex
    from iceberg_cpp_spark.plans.spark_compiler import to_spark_column

    sup = entrymod._t(spark, SF_DIR, "supplier")
    schema = schema_from_spark(sup.schema)
    base = tempfile.mkdtemp(prefix="orcplan_")
    orc_dir = os.path.join(base, "orc")
    (sup.filter("s_suppkey % 2 = 0").coalesce(1)
     .write.mode("overwrite").orc(orc_dir))
    t = IceTable.create(spark, os.path.join(base, "t"), schema)
    t = t.add_files(sorted(glob.glob(os.path.join(orc_dir, "*.orc"))))
    t = t.append(sup.filter("s_suppkey % 2 = 1"))
    expr = ex.lt(ex.Reference("s_acctbal"), 0.0)
    sch = t.schema()
    fscan = t._branch_scan("main", filter=expr)
    affected = [x.file_path for x in fscan.plan_files()]
    sel = [F.regexp_replace(F.col("_file"), "^file:(//)?", "")
           .alias("file_path"), F.col("_pos").alias("pos")]
    cap(t._read_paths_rows(affected, fscan, with_meta=True)
        .filter(to_spark_column(expr, sch)).select(*sel),
        "ice_orc_data_mor_read_before.txt",
        "pre-r18: the opaque ORC need_meta leg decodes and ships "
        "EVERY column (see the mapInPandas output schema)")
    cap(t._read_paths_rows(affected, fscan, with_meta=True,
                           columns=t._predicate_columns(expr))
        .filter(to_spark_column(expr, sch)).select(*sel),
        "ice_orc_data_mor_read_after.txt",
        "r18: read pruned to the predicate column (s_acctbal) + "
        "synthesized _file/_pos")


def main():
    os.makedirs(OUT, exist_ok=True)
    from iceberg_cpp_spark.session import get_spark
    spark = get_spark(app_name="plans-r18")
    spark.sparkContext.setLogLevel("ERROR")
    contamination_pair(spark)
    cdc_rewrite_pair(spark)
    partition_pruned_pair(spark)
    merge_discovery_pair(spark)
    orc_mor_read_pair(spark)


if __name__ == "__main__":
    main()
