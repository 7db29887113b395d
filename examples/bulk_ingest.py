"""Million-file ingestion, transactionally.

The two r13 write planes composed the way a bulk-migration pipeline
uses them:

    1. ``commit_files_df`` — register a huge set of pre-existing data
       files from a DataFrame of descriptors: manifest shards are
       authored in executors, the driver never holds a per-file list.
    2. ``new_transaction()`` — group the registration with the
       follow-up curation DML (a DELETE of quarantined rows and a
       lineage property stamp) so readers see ALL of it or NONE of it,
       in one metadata-pointer commit.

Run: ``python examples/bulk_ingest.py``
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core import name_mapping as nm
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.session import get_spark


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bulk_ingest_")
    try:
        # --- the "existing corpus": parquet shards on shared storage
        src = spark.range(10_000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc-"), F.col("id")).alias("text"))
        src_dir = os.path.join(root, "incoming")
        src.repartition(16).write.parquet(src_dir)
        shard_paths = sorted(
            os.path.join(src_dir, f) for f in os.listdir(src_dir)
            if f.endswith(".parquet"))
        print(f"incoming shards: {len(shard_paths)}")

        # --- target table; foreign files resolve by name mapping
        t = IceTable.create(spark, os.path.join(root, "corpus"),
                            schema_from_spark(src.schema))
        t = t.update_properties({
            nm.PROPERTY_KEY:
                nm.NameMapping.from_schema(t.schema()).to_json_string(),
            "engine.read.name-based": "true"})

        # --- descriptors stay a DataFrame end-to-end. In a real
        # migration this comes from the storage inventory (counts from
        # a manifest of the old system); here we harvest footers in a
        # tiny Spark job for the demo.
        import pyarrow.parquet as pq

        desc = spark.createDataFrame(
            [(p, pq.read_metadata(p).num_rows, os.path.getsize(p))
             for p in shard_paths],
            "file_path string, record_count long, file_size_in_bytes long")

        # --- one transaction: register + quarantine + stamp
        txn = t.new_transaction()
        txn.commit_files_df(desc)
        txn.delete_where(ex.lt(ex.Reference("doc_id"), 100))
        txn.update_properties({"ingest.batch": "2026-08-15"})
        t = txn.commit()

        print("rows visible:", t.to_df().count())          # 9_900
        print("snapshots in the chain:",
              len(t.metadata.snapshots))
        print("batch stamp:", t.properties()["ingest.batch"])
        s = t.current_snapshot().summary
        print("summary:", {k: s[k] for k in
                           ("operation", "total-data-files",
                            "total-records")})
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
