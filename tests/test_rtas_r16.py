"""RTAS — ``CREATE OR REPLACE TABLE ... AS SELECT`` (r16): the query's
schema replaces the columns AND its rows replace the data in ONE
atomic commit (a replace_columns + overwrite pair would tear). Iceberg
REPLACE TABLE field-ID rules: by-name ID continuity for unchanged /
promotable types, fresh IDs on incompatible changes (legal — no old
data survives), new required columns legal, history kept."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceSqlEngine, IceTable
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def _mk(spark, tmp_loc, name="rt"):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, name string, v float")
    t = IceTable.create(spark, os.path.join(tmp_loc, name),
                        schema_from_spark(df.schema))
    t.append(df)
    return t


class TestReplaceAsSelect:
    def test_one_atomic_commit_schema_and_data(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc)
        n_snaps = len(t.metadata.snapshots)
        old_schema_id = t.metadata.current_schema_id
        old_sid = t.current_snapshot().snapshot_id
        new = spark.createDataFrame(
            [(10, "x", 7), (20, "y", 8)],
            "id int, name string, rank int")  # v dropped, rank added
        t = t.replace_as_select(new)
        # exactly ONE new snapshot carries both the schema and the data
        assert len(t.metadata.snapshots) == n_snaps + 1
        assert t.metadata.current_schema_id == old_schema_id + 1
        assert t.current_snapshot().summary["replace-table"] == \
            "as-select"
        got = {r["id"]: (r["name"], r["rank"])
               for r in t.to_df().collect()}
        assert got == {10: ("x", 7), 20: ("y", 8)}
        # history kept: the pre-replace snapshot still reads its own
        # schema and data
        old = t.scan().use_snapshot(old_sid).to_df()
        assert set(old.columns) == {"id", "name", "v"}
        assert old.count() == 2

    def test_field_id_continuity_rules(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc, "rtid")
        ids = {f.name: f.field_id for f in t.schema().fields}
        new = spark.createDataFrame(
            [(1, 3.5, 7)],
            "id bigint, v double, name int")  # promote, promote, CHANGE
        # name string -> int is incompatible: fresh ID under the name
        t = t.replace_as_select(new.select("id", "name", "v"))
        got = {f.name: f for f in t.schema().fields}
        assert got["id"].field_id == ids["id"]      # int->long promote
        assert got["v"].field_id == ids["v"]        # float->double
        assert got["name"].field_id != ids["name"]  # string->int fresh
        assert isinstance(got["name"].field_type, it.IntegerType)

    def test_new_required_column_allowed(self, spark, tmp_loc):
        from pyspark.sql import types as T

        t = _mk(spark, tmp_loc, "rtreq")
        sch = T.StructType([
            T.StructField("id", T.IntegerType(), False),
            T.StructField("code", T.StringType(), False)])
        t = t.replace_as_select(
            spark.createDataFrame([(1, "c")], sch))
        f = t.schema().field_by_name("code")
        assert f.required  # legal: no old rows survive

    def test_identifier_field_cleared_when_dropped(self, spark,
                                                   tmp_loc):
        from pyspark.sql import types as T

        df = spark.createDataFrame(
            [], T.StructType([
                T.StructField("k", T.LongType(), False),
                T.StructField("v", T.StringType(), True)]))
        t = IceTable.create(spark, os.path.join(tmp_loc, "rtident"),
                            schema_from_spark(df.schema))
        t = t.set_identifier_fields(["k"])
        assert t.schema().identifier_field_ids
        t = t.replace_as_select(
            spark.createDataFrame([("a",)], "v string"))
        assert t.schema().identifier_field_ids == []

    def test_refuses_in_transaction(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc, "rttxn")
        txn = t.new_transaction()
        with pytest.raises(ValueError, match="transaction"):
            txn.working.replace_as_select(spark.range(1))
        txn.commit()


class TestSqlOrReplace:
    @pytest.fixture()
    def eng(self, spark, tmp_loc):
        cat = FileSystemCatalog(f"{tmp_loc}/wh")
        cat.create_namespace("db")
        e = IceSqlEngine(spark, cat)
        e.sql("CREATE TABLE ice.db.r AS "
              "SELECT 1 AS id, 'a' AS name")
        return e

    def test_sql_rtas(self, eng):
        eng.sql("CREATE OR REPLACE TABLE ice.db.r AS "
                "SELECT CAST(9 AS BIGINT) AS id, 2.5 AS score")
        got = eng.sql("SELECT * FROM ice.db.r").collect()
        assert len(got) == 1
        assert got[0]["id"] == 9 and float(got[0]["score"]) == 2.5
        # snapshots table shows history survived
        assert eng.sql("SELECT count(*) AS n FROM ice.db.r.snapshots") \
            .collect()[0]["n"] >= 2

    def test_sql_rtas_fresh_identifier_is_plain_ctas(self, eng):
        eng.sql("CREATE OR REPLACE TABLE ice.db.fresh AS "
                "SELECT 1 AS x")
        assert eng.sql("SELECT x FROM ice.db.fresh") \
            .collect()[0]["x"] == 1

    def test_sql_rtas_refusals(self, eng):
        with pytest.raises(ValueError, match="cannot be combined"):
            eng.sql("CREATE OR REPLACE TABLE IF NOT EXISTS ice.db.r "
                    "AS SELECT 1 AS x")
        with pytest.raises(ValueError, match="AS SELECT body"):
            eng.sql("CREATE OR REPLACE TABLE ice.db.r (id bigint)")
        with pytest.raises(ValueError, match="PARTITIONED"):
            eng.sql("CREATE OR REPLACE TABLE ice.db.r "
                    "PARTITIONED BY (id) AS SELECT 1 AS id")


class TestRtasReviewFindings:
    """Pins for the RTAS/dynamic-overwrite review pass."""

    def test_concurrent_commit_fails_loudly_no_tear(self, spark,
                                                    tmp_loc):
        # a concurrent append between load and commit must fail the
        # RTAS with a conflict error — never publish new-schema files
        # under the old schema (the silent-tear retry path)
        from iceberg_cpp_spark.table import ValidationError

        t = _mk(spark, tmp_loc, "rtrace")
        stale = IceTable.load(spark, os.path.dirname(
            t.metadata_location).rsplit("/metadata", 1)[0])
        t.append(spark.createDataFrame(
            [(9, "c", 9.5)], "id int, name string, v float"))
        with pytest.raises(Exception) as ei:
            stale.replace_as_select(spark.createDataFrame(
                [(1, 7)], "id int, rank int"))
        assert isinstance(ei.value, (ValidationError, ValueError)) or \
            "Commit" in type(ei.value).__name__
        # the published table is untouched by the failed replace
        fresh = IceTable.load(spark, os.path.dirname(
            t.metadata_location).rsplit("/metadata", 1)[0])
        assert set(fresh.to_df().columns) == {"id", "name", "v"}
        assert fresh.to_df().count() == 3

    def test_branch_replace_refuses(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc, "rtbr")
        t = t.create_branch("dev")
        with pytest.raises(ValueError, match="main only"):
            t.replace_as_select(spark.range(1), branch="dev")

    def test_duplicate_output_columns_refuse(self, spark, tmp_loc):
        t = _mk(spark, tmp_loc, "rtdup")
        with pytest.raises(ValueError, match="duplicate column"):
            t.replace_as_select(
                t.to_df().select("id", F.col("name").alias("id")))

    def test_partition_source_must_survive(self, spark, tmp_loc):
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)
        from iceberg_cpp_spark.functions.transforms import from_string

        df = spark.createDataFrame(
            [(1, "a", 1.0)], "id int, grp string, v double")
        schema = schema_from_spark(df.schema)
        spec = PartitionSpec(spec_id=0, fields=[PartitionField(
            source_id=schema.find_field("grp").field_id,
            field_id=1000, name="grp", transform=from_string("identity"))])
        t = IceTable.create(spark, os.path.join(tmp_loc, "rtspec"),
                            schema, spec=spec)
        t.append(df)
        # grp dropped -> refuse; grp retyped -> refuse (fresh id)
        with pytest.raises(ValueError, match="partition source"):
            t.replace_as_select(spark.createDataFrame(
                [(1, 2.0)], "id int, v double"))
        with pytest.raises(ValueError, match="partition source"):
            t.replace_as_select(spark.createDataFrame(
                [(1, 5, 2.0)], "id int, grp int, v double"))

    def test_identifier_cleared_when_column_goes_optional(self, spark,
                                                          tmp_loc):
        from pyspark.sql import types as T

        df = spark.createDataFrame(
            [], T.StructType([
                T.StructField("k", T.LongType(), False),
                T.StructField("v", T.StringType(), True)]))
        t = IceTable.create(spark, os.path.join(tmp_loc, "rtio"),
                            schema_from_spark(df.schema))
        t = t.set_identifier_fields(["k"])
        # SELECT output is nullable -> k goes optional -> identifier
        # metadata must clear (the spec requires identifiers required)
        t = t.replace_as_select(spark.createDataFrame(
            [(1, "a")], "k long, v string"))
        assert t.schema().identifier_field_ids == []
        assert not t.schema().field_by_name("k").required
