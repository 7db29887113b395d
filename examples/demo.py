"""End-to-end demo mirroring the reference's example/demo_example.cc:29-60
(RegisterTable → LoadTable → scan), then continuing into the write-side
capabilities the reference doesn't have.

Run: python examples/demo.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.session import get_spark
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def main() -> None:
    spark = get_spark(app_name="icespark-demo", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    warehouse = tempfile.mkdtemp(prefix="icespark_demo_")
    catalog = FileSystemCatalog(warehouse)

    # --- create + append (the reference's missing write path) ----------
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    catalog.create_namespace("demo")
    catalog.create_table("demo.lineitem", schema_from_spark(li.schema))
    t = catalog.load_table("demo.lineitem", spark=spark)
    t.append(li)
    print(f"appended {t.scan().count()} rows "
          f"(snapshot {t.current_snapshot().snapshot_id})")

    # --- demo_example.cc shape: RegisterTable + LoadTable + scan -------
    catalog.register_table("demo.lineitem_copy", t.metadata_location)
    t2 = catalog.load_table("demo.lineitem_copy", spark=spark)
    result = (
        t2.scan(filter=ex.eq(ex.Reference("l_returnflag"), "A"))
        .to_df()
        .groupBy("l_linestatus")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    print("scan of registered table (l_returnflag = 'A'):")
    result.show()

    # --- beyond the reference ------------------------------------------
    t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                   mode="merge-on-read")
    print(f"after merge-on-read delete: {t.to_df().count()} rows")
    t = t.delete_where(ex.gt(ex.Reference("l_quantity"), 49.0),
                       mode="deletion-vector")
    print(f"after deletion-vector delete: {t.to_df().count()} rows")
    t = t.rewrite_position_deletes()  # fold parquet deletes into DVs
    dvs = [d for d in t.scan().plan_deletes() if d.is_deletion_vector]
    print(f"after rewrite_position_deletes: {len(dvs)} deletion vectors, "
          f"{t.to_df().count()} rows")
    lineage = (t.scan().with_metadata_columns().to_df()
               .agg(F.countDistinct("_row_id").alias("ids"),
                    F.count("*").alias("rows")).first())
    print(f"row lineage: {lineage['ids']} distinct _row_id over "
          f"{lineage['rows']} rows")
    t.rewrite_data_files(target_file_count=2)
    print(f"after compaction: {len(t.scan().plan_files())} files, "
          f"{t.to_df().count()} rows")
    t.create_or_replace_view("li")
    spark.sql("SELECT l_returnflag, COUNT(*) n FROM li GROUP BY 1 ORDER BY 1").show()

    shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
