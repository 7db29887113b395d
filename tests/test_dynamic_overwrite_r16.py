"""Dynamic partition overwrite (r16): ``overwrite_partitions``
replaces ONLY the partitions present in the batch — the
idempotent-backfill shape — and SQL INSERT OVERWRITE follows Spark's
own ``spark.sql.sources.partitionOverwriteMode`` switch (static =
whole-table, the pre-r16 behavior and Spark default; dynamic =
partition-scoped)."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceSqlEngine, IceTable
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.metadata import PartitionField
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.functions.transforms import from_string
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def _mk(spark, tmp_loc, name, transform="identity", source="grp"):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "id int, grp string, v int")
    schema = schema_from_spark(df.schema)
    src = schema.find_field(source)
    spec_name = source if transform == "identity" else \
        f"{source}_{transform.split('[')[0]}"
    from iceberg_cpp_spark.core.metadata import PartitionSpec

    spec = PartitionSpec(spec_id=0, fields=[PartitionField(
        source_id=src.field_id, field_id=1000, name=spec_name,
        transform=from_string(transform))])
    t = IceTable.create(spark, os.path.join(tmp_loc, name), schema,
                        spec=spec)
    t.append(df)
    return t


class TestOverwritePartitions:
    def test_only_touched_partitions_replace(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc, "dyn1")
        before = {f.file_path for f in t.scan().plan_files()}
        batch = spark.createDataFrame(
            [(9, "a", 90)], "id int, grp string, v int")
        t = t.overwrite_partitions(batch)
        got = {r["id"]: (r["grp"], r["v"]) for r in t.to_df().collect()}
        # partition 'a' fully replaced (ids 1,2 gone); 'b','c' intact
        assert got == {9: ("a", 90), 3: ("b", 30), 4: ("c", 40)}
        after = {f.file_path for f in t.scan().plan_files()}
        # untouched partitions keep their original files byte-for-byte
        kept = before & after
        assert kept, "untouched partition files were rewritten"
        assert t.current_snapshot().summary["overwrite-mode"] == \
            "dynamic"

    def test_idempotent_backfill(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc, "dyn2")
        batch = spark.createDataFrame(
            [(9, "b", 90), (10, "b", 100)], "id int, grp string, v int")
        t = t.overwrite_partitions(batch)
        t = t.overwrite_partitions(batch)  # replay: same result
        got = sorted(r["id"] for r in t.to_df().collect())
        assert got == [1, 2, 4, 9, 10]

    def test_bucket_transform_partitions(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc, "dyn3", transform="bucket[4]",
                source="id")
        n0 = t.to_df().count()
        # replace the bucket holding id=1 with a single row
        batch = spark.createDataFrame(
            [(1, "z", 99)], "id int, grp string, v int")
        t = t.overwrite_partitions(batch)
        rows = {r["id"]: r["grp"] for r in t.to_df().collect()}
        assert rows[1] == "z"
        # ids sharing id=1's bucket vanished with it; others survive
        assert len(rows) <= n0

    def test_unpartitioned_is_full_overwrite(self, spark, tmp_loc):
        df = spark.createDataFrame([(1, "a")], "id int, g string")
        t = IceTable.create(spark, os.path.join(tmp_loc, "dyn4"),
                            schema_from_spark(df.schema))
        t.append(df)
        t = t.overwrite_partitions(
            spark.createDataFrame([(9, "z")], "id int, g string"))
        assert [(r["id"], r["g"]) for r in t.to_df().collect()] == \
            [(9, "z")]

    def test_multi_spec_refuses(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc, "dyn5")
        t = t.update_spec([PartitionField(
            source_id=t.schema().find_field("id").field_id,
            field_id=0, name="id_bucket",
            transform=from_string("bucket[4]"))])
        t.append(spark.createDataFrame(
            [(7, "d", 70)], "id int, grp string, v int"))
        with pytest.raises(ValueError, match="older than the current"):
            t.overwrite_partitions(spark.createDataFrame(
                [(8, "d", 80)], "id int, grp string, v int"))


class TestSqlInsertOverwriteModes:
    def test_static_default_and_dynamic_conf(self, spark, tmp_loc):
        cat = FileSystemCatalog(f"{tmp_loc}/wh")
        cat.create_namespace("db")
        t = _mk(spark, tmp_loc, "dynsql")
        cat.register_table("db.p", t.metadata_location)
        eng = IceSqlEngine(spark, cat)
        old = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                             "static")
        try:
            # static (Spark default): whole table replaced
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           "static")
            eng.sql("INSERT OVERWRITE ice.db.p VALUES (9, 'a', 90)")
            assert eng.sql("SELECT count(*) AS n FROM ice.db.p") \
                .collect()[0]["n"] == 1
            # rebuild, then dynamic: only partition 'a' replaced
            eng.sql("INSERT INTO ice.db.p VALUES "
                    "(3, 'b', 30), (4, 'c', 40)")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           "dynamic")
            eng.sql("INSERT OVERWRITE ice.db.p VALUES (10, 'a', 100)")
            got = {r["id"]: r["grp"] for r in
                   eng.sql("SELECT * FROM ice.db.p").collect()}
            assert got == {10: "a", 3: "b", 4: "c"}
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           old)


class TestDayPartitionBackfill:
    def test_day_transform_backfill(self, spark, tmp_loc):
        # the canonical shape: re-run one day's batch, only that day's
        # files move (day transform → date-typed partition values must
        # match between the writer and the metadata probe)
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)

        df = spark.createDataFrame(
            [(1, "2024-03-01 10:00:00", 10.0),
             (2, "2024-03-01 11:00:00", 20.0),
             (3, "2024-03-02 09:00:00", 30.0)],
            "id int, ts string, v double").withColumn(
            "ts", F.to_timestamp("ts"))
        schema = schema_from_spark(df.schema)
        src = schema.find_field("ts")
        spec = PartitionSpec(spec_id=0, fields=[PartitionField(
            source_id=src.field_id, field_id=1000, name="ts_day",
            transform=from_string("day"))])
        t = IceTable.create(spark, os.path.join(tmp_loc, "dynday"),
                            schema, spec=spec)
        t.append(df)
        batch = spark.createDataFrame(
            [(9, "2024-03-01 23:00:00", 90.0)],
            "id int, ts string, v double").withColumn(
            "ts", F.to_timestamp("ts"))
        t = t.overwrite_partitions(batch)
        got = sorted(r["id"] for r in t.to_df().collect())
        assert got == [3, 9]  # day 03-01 replaced, 03-02 intact
