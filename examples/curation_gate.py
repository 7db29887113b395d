"""Expectations → write-audit-publish curation gate.

The promotion pattern a training-data pipeline runs on every batch:

    stage (WAP append, invisible to readers)
      → audit (declarative expectations over the STAGED table state)
        → publish on pass (metadata-only cherry-pick)
        → keep main untouched on fail, inspect the violations, retry.

Run: ``python examples/curation_gate.py``
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import iceberg_cpp_spark.core.types as it
from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.operators import expectations as xp
from iceberg_cpp_spark.session import get_spark


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="curation_gate_")

    sch = it.Schema([
        it.NestedField(1, "doc_id", it.LongType(), True),
        it.NestedField(2, "lang", it.StringType(), False),
        it.NestedField(3, "quality", it.DoubleType(), False),
    ])
    t = IceTable.create(
        spark, f"{root}/corpus", sch,
        properties={"write.wap.enabled": "true"})
    t = t.append(spark.createDataFrame(
        [(1, "en", 0.9), (2, "de", 0.8)],
        "doc_id long, lang string, quality double"))

    rules = [
        xp.not_null("doc_id"),
        xp.unique("doc_id"),
        xp.accepted_values("lang", ["en", "de", "fr"]),
        xp.in_range("quality", lo=0.0, hi=1.0),
    ]

    # ---- batch 1: clean → audited and published --------------------------
    good = spark.createDataFrame(
        [(3, "fr", 0.7), (4, "en", 0.95)],
        "doc_id long, lang string, quality double")
    res = xp.expectations_wap_gate(t, good, rules, wap_id="2026-08-15-a")
    print(f"batch 1 published={res.published}")
    res.report.show(truncate=False)
    t = res.table
    assert t.to_df().count() == 4

    # ---- batch 2: dirty → staged but NEVER visible on main ---------------
    bad = spark.createDataFrame(
        [(4, "xx", 1.7), (5, "en", 0.4)],   # dup id, bad lang, bad range
        "doc_id long, lang string, quality double")
    res = xp.expectations_wap_gate(t, bad, rules, wap_id="2026-08-15-b")
    print(f"batch 2 published={res.published} "
          f"failed={res.failed_rules()}")
    assert not res.published
    assert res.table.to_df().count() == 4  # main unchanged
    staged = res.table.scan(snapshot_id=res.staged_snapshot_id).to_df()
    xp.violations_df(
        staged, xp.accepted_values("lang", ["en", "de", "fr"])).show()

    # ---- fix and retry under a new wap id ---------------------------------
    fixed = bad.filter(F.col("doc_id") != 4) \
               .withColumn("lang", F.lit("en"))
    res = xp.expectations_wap_gate(res.table, fixed, rules,
                                   wap_id="2026-08-15-b-fixed")
    print(f"retry published={res.published}")
    assert res.published and res.table.to_df().count() == 5

    shutil.rmtree(root, ignore_errors=True)
    print("curation gate example OK")


if __name__ == "__main__":
    main()
