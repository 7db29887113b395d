"""r18 (ADVICE r17): the input-spread probe reads plan file metadata
instead of df.rdd — no job, no RDD-conversion plan analysis."""
from iceberg_cpp_spark.operators.partitioning import (
    scan_split_estimate,
    spread_to_parallelism,
)


def test_estimate_single_small_file(spark, documents):
    est = scan_split_estimate(documents)
    assert est is not None and est >= 1
    # one tiny file can never estimate above a handful of splits
    assert est <= 4


def test_estimate_none_for_local_relation(spark):
    df = spark.createDataFrame([(1,), (2,)], ["x"])
    assert scan_split_estimate(df) is None


def test_spread_small_scan_fans_out(spark, documents):
    par = spark.sparkContext.defaultParallelism
    out = spread_to_parallelism(documents.select("doc_id", "text"))
    assert out.rdd.getNumPartitions() == par
    assert out.count() == documents.count()


def test_spread_preserves_rows(spark, documents):
    a = sorted(r["doc_id"] for r in documents.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               spread_to_parallelism(documents.select("doc_id")).collect())
    assert a == b
