"""Lakehouse DML tour — the table-management surface a warehouse team
uses daily, end-to-end on one dimension + one fact table:

  SCD2 dimension load → update batch (close-and-insert versioning) →
  merge-on-read fact upsert (no file rewrites) → write-audit-publish
  staging (audit, then publish) → DV fold → spec view over the result →
  geo bbox scan with file pruning

Every step is metadata-governed (snapshots, manifests, CAS commits with
retry conflict validation) and each mutation is a single snapshot.

Run: python examples/lakehouse_dml.py   (local[*], ~1 min at sf0.001)
"""

import datetime as dt
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core import wkb
from iceberg_cpp_spark.operators import scd
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.session import get_spark
from iceberg_cpp_spark.views import IceView

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="lakehouse-dml-tour")
    root = tempfile.mkdtemp(prefix="lakehouse_")

    # --- 1. SCD2 customer dimension -----------------------------------
    cust = (spark.read.parquet(f"{SF_DIR}/customer.parquet")
            .select(F.col("c_custkey").alias("k"),
                    F.col("c_mktsegment").alias("segment"),
                    F.floor(F.col("c_acctbal") * 100).cast("long")
                    .alias("bal_cents")))
    src_sch = it.Schema([
        it.NestedField(1, "k", it.LongType(), True),
        it.NestedField(2, "segment", it.StringType(), False),
        it.NestedField(3, "bal_cents", it.LongType(), False),
    ])
    dim = IceTable.create(spark, f"{root}/dim_customer",
                          scd.scd2_schema(src_sch),
                          properties={"format-version": "3"})
    dim = dim.append(scd.scd2_init(cust, dt.datetime(2024, 1, 1)))
    # month-2 batch: every 9th customer moved segment
    batch = (cust.filter(F.col("k") % 9 == 0)
             .withColumn("segment", F.lit("MACHINERY")))
    dim = scd.scd2_apply(dim, batch, key=["k"],
                         effective=dt.datetime(2024, 2, 1))
    print("dimension rows (versions):", dim.to_df().count(),
          "| current:", dim.to_df().filter("_is_current").count())

    # --- 2. fact table with MoR upsert + WAP ---------------------------
    orders = (spark.read.parquet(f"{SF_DIR}/orders.parquet")
              .select("o_orderkey", "o_custkey", "o_totalprice"))
    fact = IceTable.create(
        spark, f"{root}/fact_orders",
        it.Schema([
            it.NestedField(1, "o_orderkey", it.LongType(), True),
            it.NestedField(2, "o_custkey", it.LongType(), False),
            it.NestedField(3, "o_totalprice", it.DoubleType(), False),
        ]),
        properties={"write.merge.mode": "merge-on-read",
                    "write.wap.enabled": "true"})
    fact = fact.append(orders)
    # price corrections arrive: MoR merge — no fact files rewritten
    fixes = (orders.filter(F.col("o_orderkey") % 1000 == 0)
             .withColumn("o_totalprice", F.col("o_totalprice") * 1.1))
    fact = fact.merge_into(fixes, on=["o_orderkey"])
    # a risky backfill stages behind an audit before publishing
    backfill = orders.select(F.col("o_orderkey") + 50_000_000,
                             "o_custkey", "o_totalprice").limit(100)
    fact = fact.append(backfill.toDF("o_orderkey", "o_custkey",
                                     "o_totalprice"),
                       wap_id="backfill-2024-02")
    staged = fact.wap_snapshot("backfill-2024-02")
    audit_count = fact.scan(snapshot_id=staged.snapshot_id).to_df().count()
    print("audit sees", audit_count, "rows; branch still at",
          fact.to_df().count())
    fact = fact.publish_wap("backfill-2024-02")
    # fold accumulated position deletes into DVs for scan-side speed
    fact = fact.rewrite_position_deletes()
    print("fact rows after publish + fold:", fact.to_df().count())

    # --- 3. spec view over the join -----------------------------------
    dim.create_or_replace_view("dim_customer")
    fact.create_or_replace_view("fact_orders")
    v = IceView.create(
        f"{root}/views/revenue_by_segment",
        """SELECT d.segment, COUNT(*) AS orders,
                  ROUND(SUM(f.o_totalprice), 2) AS revenue
           FROM fact_orders f
           JOIN dim_customer d ON d.k = f.o_custkey AND d._is_current
           GROUP BY d.segment ORDER BY revenue DESC""",
        it.Schema([it.NestedField(1, "segment", it.StringType(), False),
                   it.NestedField(2, "orders", it.LongType(), False),
                   it.NestedField(3, "revenue", it.DoubleType(), False)]))
    v.to_df(spark).show(truncate=False)

    # --- 4. geo: store office points, bbox-scan with file pruning ------
    offices = spark.createDataFrame(
        [(i, wkb.point_wkb(float(i * 30 - 150), float(i * 10 - 30)))
         for i in range(10)], "office_id long, geom binary")
    geo = IceTable.create(
        spark, f"{root}/offices",
        it.Schema([it.NestedField(1, "office_id", it.LongType(), True),
                   it.NestedField(2, "geom", it.GeometryType(), False)]),
        properties={"format-version": "3"})
    geo = geo.append(offices.repartitionByRange(4, "office_id"))
    hits = geo.scan(filter=ex.st_intersects(
        ex.Reference("geom"), (-60.0, -20.0, 60.0, 20.0)))
    print("offices in bbox:", sorted(
        r["office_id"] for r in hits.to_df().collect()),
        "| files scanned:", len(hits.plan_files()),
        "of", len(geo.scan().plan_files()))

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
