"""v3 row lineage: first_row_id ranges assigned at commit, surfaced as
the `_row_id` / `_last_updated_sequence_number` metadata columns
(metadata_columns.h:42-96)."""

import os

from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core.types import schema_from_spark


class TestRowLineage:
    def test_row_ids_unique_and_dense(self, spark, tmp_loc, lineitem):
        li = lineitem.limit(500)
        t = IceTable.create(spark, os.path.join(tmp_loc, "trl"),
                            schema_from_spark(li.schema))
        t.append(li.limit(300))
        t.append(li.subtract(li.limit(300)).limit(200))
        n = t.to_df().count()
        df = t.scan().with_metadata_columns().to_df()
        stats = df.agg(
            F.countDistinct("_row_id").alias("d"),
            F.min("_row_id").alias("lo"), F.max("_row_id").alias("hi"),
            F.countDistinct("_last_updated_sequence_number").alias("seqs"),
        ).first()
        # ids are unique and cover exactly [0, total) — dense assignment
        assert stats["d"] == n and stats["lo"] == 0 and stats["hi"] == n - 1
        assert stats["seqs"] == 2  # one sequence number per append commit
        assert t.properties().get("engine.next-row-id") == str(n)

    def test_row_ids_stable_across_delete(self, spark, tmp_loc, lineitem):
        """MOR deletes must not renumber surviving rows."""
        from iceberg_cpp_spark.plans import expressions as ex

        li = lineitem.limit(400)
        t = IceTable.create(spark, os.path.join(tmp_loc, "trs"),
                            schema_from_spark(li.schema))
        t.append(li)
        before = {r["l_orderkey"]: r["_row_id"] for r in
                  (t.scan().with_metadata_columns().to_df()
                   .select("l_orderkey", "l_linenumber", "_row_id")
                   .withColumn("l_orderkey",
                               F.concat_ws("#", "l_orderkey", "l_linenumber"))
                   .collect())}
        t = t.delete_where(ex.eq(ex.Reference("l_returnflag"), "R"),
                           mode="deletion-vector")
        after = {r["l_orderkey"]: r["_row_id"] for r in
                 (t.scan().with_metadata_columns().to_df()
                  .select("l_orderkey", "l_linenumber", "_row_id")
                  .withColumn("l_orderkey",
                              F.concat_ws("#", "l_orderkey", "l_linenumber"))
                  .collect())}
        assert set(after).issubset(set(before))
        assert all(before[k] == v for k, v in after.items())
