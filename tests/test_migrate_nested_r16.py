"""r16: the ``migrate`` procedure (in-place conversion of a path-based
parquet table, Spark-Iceberg migrate shape) and nested-field schema
evolution mutators (``add_column("addr.zip", ...)`` + dotted
RENAME/DROP COLUMN — the write-side twin of the reference's nested
field-ID projection, schema_util.h:35-79)."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceSqlEngine, IceTable
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


@pytest.fixture()
def cat(spark, tmp_loc):
    c = FileSystemCatalog(f"{tmp_loc}/wh")
    c.create_namespace("db")
    return c


class TestMigrate:
    def test_round_trip_in_place(self, spark, cat, tmp_loc):
        src = os.path.join(tmp_loc, "legacy_orders")
        df = spark.range(20).select(
            F.col("id"), (F.col("id") % 3).alias("grp"))
        df.repartition(3).write.parquet(src)
        before = sorted(
            os.path.join(src, f) for f in os.listdir(src)
            if f.endswith(".parquet"))
        mtimes = {p: os.path.getmtime(p) for p in before}
        eng = IceSqlEngine(spark, cat)
        got = eng.sql(f"CALL ice.system.migrate(table => 'db.legacy', "
                      f"source => '{src}')").collect()[0]
        assert got["migrated_files_count"] == len(before)
        assert got["migrated_rows_count"] == 20
        # the table reads the same rows through the Iceberg plane
        assert eng.sql("SELECT count(*) AS n FROM ice.db.legacy") \
            .collect()[0]["n"] == 20
        # in place: metadata grew NEXT to the data, files untouched
        t = cat.load_table("db.legacy", spark=spark)
        assert t.location() == src
        reg = {f.file_path for f in t.scan().plan_files()}
        assert reg == set(before)
        assert all(os.path.getmtime(p) == mtimes[p] for p in before)
        # old reads unchanged: the raw parquet files still read as-is
        assert spark.read.parquet(*before).count() == 20
        assert t.properties()["migrate.source"] == src

    def test_existing_table_refuses(self, spark, cat, tmp_loc):
        src = os.path.join(tmp_loc, "legacy2")
        spark.range(3).write.parquet(src)
        eng = IceSqlEngine(spark, cat)
        eng.sql(f"CALL ice.system.migrate(table => 'db.l2', "
                f"source => '{src}')")
        with pytest.raises(ValueError, match="already exists"):
            eng.sql(f"CALL ice.system.migrate(table => 'db.l2', "
                    f"source => '{src}')")

    def test_failure_leaves_no_poisoned_entry(self, spark, cat,
                                              tmp_loc):
        # a non-table file in the directory fails the add_files sniff;
        # the half-created catalog entry must be rolled back
        src = os.path.join(tmp_loc, "legacy3")
        spark.range(3).write.parquet(src)
        with open(os.path.join(src, "notes.txt"), "w") as fh:
            fh.write("not a data file")
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError):
            eng.sql(f"CALL ice.system.migrate(table => 'db.l3', "
                    f"source => '{src}')")
        assert not cat.table_exists("db.l3")

    def test_empty_source_refuses(self, spark, cat, tmp_loc):
        src = os.path.join(tmp_loc, "legacy_empty")
        os.makedirs(src)
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="no files"):
            eng.sql(f"CALL ice.system.migrate(table => 'db.l4', "
                    f"source => '{src}')")
        assert not cat.table_exists("db.l4")

    def test_hive_partitioned_source_refuses(self, spark, cat, tmp_loc):
        """r17 (VERDICT r16 item 1): a key=value directory layout
        carries its partition column in the PATHS, not the files —
        pre-r17 migrate silently dropped it (queries on the column
        break after conversion). Now it refuses loudly, naming the
        dropped column(s), for migrate AND add_files; no partial table
        is left behind."""
        src = os.path.join(tmp_loc, "legacy_hive")
        df = spark.range(30).select(
            F.col("id"), (F.col("id") % 3).alias("bucket_val"))
        df.write.partitionBy("bucket_val").parquet(src)
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="bucket_val"):
            eng.sql(f"CALL ice.system.migrate(table => 'db.lh', "
                    f"source => '{src}')")
        assert not cat.table_exists("db.lh")
        # same guard on CALL add_files
        eng.sql("CREATE TABLE ice.db.lh2 (id bigint) USING iceberg")
        with pytest.raises(ValueError, match="bucket_val"):
            eng.sql(f"CALL ice.system.add_files(table => 'db.lh2', "
                    f"source => '{src}')")


def _nested_table(spark, tmp_loc, name="nest"):
    df = spark.createDataFrame(
        [(1, ("x1", 10)), (2, ("x2", 20))],
        "id int, addr struct<street string, num int>")
    from iceberg_cpp_spark.core.types import schema_from_spark

    t = IceTable.create(spark, os.path.join(tmp_loc, name),
                        schema_from_spark(df.schema))
    t.append(df)
    return t, df


class TestNestedEvolution:
    def test_add_nested_column_old_files_null(self, spark, tmp_loc):
        t, df = _nested_table(spark, tmp_loc)
        t = t.add_column("addr.zip", it.LongType())
        # old rows read the new nested field as null (field-ID
        # projection fills it)
        rows = {r["id"]: r["addr"] for r in t.to_df().collect()}
        assert rows[1]["zip"] is None and rows[1]["street"] == "x1"
        # new writes carry it
        t.append(spark.createDataFrame(
            [(3, ("x3", 30, 99999))],
            "id int, addr struct<street string, num int, zip long>"))
        rows = {r["id"]: r["addr"] for r in t.to_df().collect()}
        assert rows[3]["zip"] == 99999 and rows[1]["zip"] is None
        # fresh field id registered past the old last_column_id
        zf = t.schema().find_field("addr.zip")
        assert zf is not None
        assert t.metadata.last_column_id >= zf.field_id

    def test_rename_nested_keeps_id_and_values(self, spark, tmp_loc):
        t, df = _nested_table(spark, tmp_loc, "nestr")
        old_id = t.schema().find_field("addr.num").field_id
        t = t.rename_column("addr.num", "house_no")
        assert t.schema().find_field("addr.num") is None
        f = t.schema().find_field("addr.house_no")
        assert f is not None and f.field_id == old_id
        # old files keep resolving by field ID under the new name
        rows = {r["id"]: r["addr"]["house_no"]
                for r in t.to_df().collect()}
        assert rows == {1: 10, 2: 20}

    def test_drop_nested_column(self, spark, tmp_loc):
        t, df = _nested_table(spark, tmp_loc, "nestd")
        t = t.drop_column("addr.num")
        assert t.schema().find_field("addr.num") is None
        rows = {r["id"]: r["addr"].asDict() for r in t.to_df().collect()}
        assert rows[1] == {"street": "x1"}

    def test_nested_rename_collision_refuses(self, spark, tmp_loc):
        t, _df = _nested_table(spark, tmp_loc, "nestc")
        with pytest.raises(ValueError, match="exists"):
            t.rename_column("addr.num", "street")

    def test_add_to_missing_parent_refuses(self, spark, tmp_loc):
        t, _df = _nested_table(spark, tmp_loc, "nestm")
        with pytest.raises(ValueError, match="parent"):
            t.add_column("nope.zip", it.LongType())

    def test_add_through_list_element_struct(self, spark, tmp_loc):
        from iceberg_cpp_spark.core.types import schema_from_spark

        df = spark.createDataFrame(
            [(1, [("a", 1)]), (2, [("b", 2), ("c", 3)])],
            "id int, items array<struct<sku string, qty int>>")
        t = IceTable.create(spark, os.path.join(tmp_loc, "nestl"),
                            schema_from_spark(df.schema))
        t.append(df)
        t = t.add_column("items.element.price", it.DoubleType())
        assert t.schema().find_field("items.element.price") is not None
        rows = {r["id"]: [e.asDict() for e in r["items"]]
                for r in t.to_df().collect()}
        assert rows[1] == [{"sku": "a", "qty": 1, "price": None}]

    def test_sql_nested_ddl(self, spark, cat, tmp_loc):
        t, _df = _nested_table(spark, tmp_loc, "nests")
        # register in the catalog so the SQL engine can load it
        cat.register_table("db.nests", t.metadata_location)
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.nests ADD COLUMN addr.zip long")
        eng.sql("ALTER TABLE ice.db.nests RENAME COLUMN addr.num "
                "TO house_no")
        t2 = cat.load_table("db.nests", spark=spark)
        assert t2.schema().find_field("addr.zip") is not None
        assert t2.schema().find_field("addr.house_no") is not None
        eng.sql("ALTER TABLE ice.db.nests DROP COLUMN addr.zip")
        t2 = cat.load_table("db.nests", spark=spark)
        assert t2.schema().find_field("addr.zip") is None
        got = eng.sql("SELECT addr.house_no AS hn FROM ice.db.nests "
                      "ORDER BY id").collect()
        assert [r["hn"] for r in got] == [10, 20]


class TestReplaceColumns:
    """r16: ALTER TABLE ... REPLACE COLUMNS — the whole top-level
    column list stated at once; by-name ID preservation, promotions,
    drops and fresh adds in ONE schema evolution."""

    def _tbl(self, spark, tmp_loc, name="repl"):
        from iceberg_cpp_spark.core.types import schema_from_spark

        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)],
            "id int, name string, score float")
        t = IceTable.create(spark, os.path.join(tmp_loc, name),
                            schema_from_spark(df.schema))
        t.append(df)
        return t

    def test_keep_promote_drop_add(self, spark, tmp_loc):
        t = self._tbl(spark, tmp_loc)
        ids_before = {f.name: f.field_id for f in t.schema().fields}
        t = t.replace_columns([
            ("id", it.LongType()),        # int -> long promotion
            ("name", it.StringType()),    # unchanged, ID kept
            ("note", it.StringType()),    # fresh add (score drops)
        ])
        got = {f.name: f for f in t.schema().fields}
        assert set(got) == {"id", "name", "note"}
        assert got["id"].field_id == ids_before["id"]
        assert got["name"].field_id == ids_before["name"]
        assert got["note"].field_id > max(ids_before.values())
        rows = {r["id"]: (r["name"], r["note"])
                for r in t.to_df().collect()}
        assert rows == {1: ("a", None), 2: ("b", None)}

    def test_bad_promotion_refuses(self, spark, tmp_loc):
        t = self._tbl(spark, tmp_loc, "repl2")
        with pytest.raises(ValueError, match="promotion"):
            t.replace_columns([("id", it.StringType())])

    def test_optional_to_required_refuses(self, spark, tmp_loc):
        t = self._tbl(spark, tmp_loc, "repl3")
        with pytest.raises(ValueError, match="required"):
            t.replace_columns([("name", it.StringType(), True)])

    def test_sql_replace_columns(self, spark, cat, tmp_loc):
        t = self._tbl(spark, tmp_loc, "repl4")
        cat.register_table("db.repl4", t.metadata_location)
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.repl4 REPLACE COLUMNS "
                "(id bigint, name string, tag string)")
        t2 = cat.load_table("db.repl4", spark=spark)
        assert {f.name for f in t2.schema().fields} == \
            {"id", "name", "tag"}
        got = eng.sql("SELECT id, tag FROM ice.db.repl4 "
                      "ORDER BY id").collect()
        assert [(r["id"], r["tag"]) for r in got] == [(1, None),
                                                      (2, None)]


class TestReviewFindingsR16:
    """Pins for the r16 review findings on migrate / register_table /
    nested DDL / REPLACE COLUMNS."""

    def test_migrate_failure_cleans_metadata_and_retry_works(
            self, spark, cat, tmp_loc):
        # first attempt fails mid-add_files; the rollback must remove
        # BOTH the catalog entry and the metadata dir it created inside
        # the source, so the corrected retry succeeds
        src = os.path.join(tmp_loc, "legacy_retry")
        spark.range(5).write.parquet(src)
        bad = os.path.join(src, "notes.csv")
        with open(bad, "w") as fh:
            fh.write("not,a,table\n")
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError):
            eng.sql(f"CALL ice.system.migrate(table => 'db.r1', "
                    f"source => '{src}')")
        assert not cat.table_exists("db.r1")
        assert not os.path.exists(os.path.join(src, "metadata"))
        os.remove(bad)
        got = eng.sql(f"CALL ice.system.migrate(table => 'db.r1', "
                      f"source => '{src}')").collect()[0]
        assert got["migrated_rows_count"] == 5

    def test_migrate_refuses_existing_metadata_dir(self, spark, cat,
                                                   tmp_loc):
        src = os.path.join(tmp_loc, "legacy_meta")
        spark.range(3).write.parquet(src)
        os.makedirs(os.path.join(src, "metadata"))
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="already carries"):
            eng.sql(f"CALL ice.system.migrate(table => 'db.r2', "
                    f"source => '{src}')")
        assert not cat.table_exists("db.r2")

    def test_register_staged_metadata_not_misparsed(self, spark, cat,
                                                    tmp_loc):
        # v0.staged.metadata.json (stage_create_table) must take the
        # copy path, not the vN chain fast path (which would hint at a
        # nonexistent v0.metadata.json — a poisoned entry)
        from iceberg_cpp_spark.core.types import schema_from_spark

        df = spark.createDataFrame([(1, "a")], "id long, data string")
        meta = cat.stage_create_table(
            "db.staged_t", schema_from_spark(df.schema))
        staged_loc = os.path.join(meta.location, "metadata",
                                  "v0.staged.metadata.json")
        cat.register_table("db.staged_reg", staged_loc)
        t = cat.load_table("db.staged_reg", spark=spark)
        assert t.to_df().count() == 0  # loads fine, empty table

    def test_add_column_implicit_element_duplicate_refuses(
            self, spark, tmp_loc):
        from iceberg_cpp_spark.core.types import schema_from_spark

        df = spark.createDataFrame(
            [(1, [("a", 1)])],
            "id int, items array<struct<sku string, qty int>>")
        t = IceTable.create(spark, os.path.join(tmp_loc, "dupel"),
                            schema_from_spark(df.schema))
        t.append(df)
        # 'items.qty' walks implicitly into the element struct where
        # 'qty' already exists — must refuse, not commit a struct with
        # two same-named fields
        with pytest.raises(ValueError, match="exists"):
            t.add_column("items.qty", it.LongType())
        with pytest.raises(ValueError, match="exists"):
            t.add_column("items.element.qty", it.LongType())

    def test_replace_columns_new_not_null_refuses(self, spark,
                                                  tmp_loc):
        from iceberg_cpp_spark.core.types import schema_from_spark

        df = spark.createDataFrame([(1, "a")], "id int, name string")
        t = IceTable.create(spark, os.path.join(tmp_loc, "rcnn"),
                            schema_from_spark(df.schema))
        t.append(df)
        with pytest.raises(ValueError, match="NOT NULL"):
            t.replace_columns([("id", it.IntegerType()),
                               ("brand_new", it.StringType(), True)])


class TestNestedInPlaceMutators:
    """r16 follow-up: type promotion and DROP NOT NULL reach nested
    fields through the same rebuild walker; write defaults stay
    top-level (the write-side fill only sees omitted top-level
    columns) and refuse loudly on a dotted name."""

    def _tbl(self, spark, tmp_loc, name):
        from pyspark.sql import types as T

        from iceberg_cpp_spark.core import types as ity
        from iceberg_cpp_spark.core.types import Schema

        schema = Schema([
            ity.NestedField(1, "id", ity.LongType(), True),
            ity.NestedField(2, "addr", ity.StructType([
                ity.NestedField(3, "num", ity.IntegerType(), True),
                ity.NestedField(4, "street", ity.StringType()),
            ])),
        ])
        t = IceTable.create(spark, os.path.join(tmp_loc, name), schema)
        # nullability must match the required fields exactly
        sch = T.StructType([
            T.StructField("id", T.LongType(), False),
            T.StructField("addr", T.StructType([
                T.StructField("num", T.IntegerType(), False),
                T.StructField("street", T.StringType(), True)]), True)])
        t.append(spark.createDataFrame([(1, (10, "x"))], sch))
        return t

    def test_nested_type_promotion(self, spark, tmp_loc):
        t = self._tbl(spark, tmp_loc, "npro")
        t = t.update_column_type("addr.num", it.LongType())
        f = t.schema().find_field("addr.num")
        assert isinstance(f.field_type, it.LongType)
        assert f.field_id == 3  # ID kept
        assert t.to_df().collect()[0]["addr"]["num"] == 10
        with pytest.raises(ValueError, match="promotion"):
            t.update_column_type("addr.street", it.LongType())

    def test_nested_drop_not_null(self, spark, tmp_loc):
        t = self._tbl(spark, tmp_loc, "nopt")
        assert t.schema().find_field("addr.num").required
        t = t.make_column_optional("addr.num")
        assert not t.schema().find_field("addr.num").required

    def test_nested_default_refuses(self, spark, tmp_loc):
        t = self._tbl(spark, tmp_loc, "ndef")
        with pytest.raises(ValueError, match="top-level"):
            t.update_column_default("addr.num", 5)

    def test_sql_nested_alter_column(self, spark, cat, tmp_loc):
        t = self._tbl(spark, tmp_loc, "nsql")
        cat.register_table("db.nsql", t.metadata_location)
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.nsql ALTER COLUMN addr.num "
                "TYPE bigint")
        eng.sql("ALTER TABLE ice.db.nsql ALTER COLUMN addr.num "
                "DROP NOT NULL")
        t2 = cat.load_table("db.nsql", spark=spark)
        f = t2.schema().find_field("addr.num")
        assert isinstance(f.field_type, it.LongType) and not f.required
        with pytest.raises(ValueError, match="top-level"):
            eng.sql("ALTER TABLE ice.db.nsql ALTER COLUMN addr.num "
                    "SET DEFAULT 5")


class TestNestedSqlTypes:
    """r16: nested column types in SQL DDL — struct<>/array<>/map<,>
    spellings parse in CREATE TABLE / ADD COLUMN / REPLACE COLUMNS
    (fresh collision-free subtree IDs), and SHOW CREATE TABLE /
    DESCRIBE render the runnable spelling instead of the spec JSON."""

    def test_create_show_create_round_trip(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("""CREATE TABLE ice.db.nt (
            id bigint NOT NULL,
            addr struct<num: int NOT NULL, street: string>,
            tags array<string>,
            attrs map<string, struct<v: double>>
        )""")
        stmt = eng.sql("SHOW CREATE TABLE ice.db.nt").collect()[0][0]
        assert "STRUCT<num: INT NOT NULL, street: STRING>" in stmt
        assert "ARRAY<STRING>" in stmt
        assert "MAP<STRING, STRUCT<v: DOUBLE>>" in stmt
        eng.sql(stmt.replace("ice.db.nt", "ice.db.nt2"))
        assert [f.to_json() for f in
                cat.load_table("db.nt2").schema().fields] == \
            [f.to_json() for f in
             cat.load_table("db.nt").schema().fields]
        # DML through the nested schema
        eng.sql("INSERT INTO ice.db.nt VALUES (1, "
                "named_struct('num', 5, 'street', 'x'), array('a'), "
                "map('k', named_struct('v', 1.5)))")
        got = eng.sql("SELECT addr.num AS n, tags[0] AS t0, "
                      "attrs['k'].v AS v FROM ice.db.nt").collect()[0]
        assert (got["n"], got["t0"], got["v"]) == (5, "a", 1.5)

    def test_describe_renders_spelling(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.nd (id bigint, "
                "addr struct<zip: bigint>)")
        rows = {r["col_name"]: r["data_type"]
                for r in eng.sql("DESCRIBE ice.db.nd").collect()}
        assert rows["addr"] == "struct<zip: bigint>"

    def test_add_column_struct_type(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.na (id bigint)")
        eng.sql("ALTER TABLE ice.db.na ADD COLUMN meta "
                "struct<k: string, n: bigint>")
        t = cat.load_table("db.na", spark=spark)
        f = t.schema().find_field("meta.k")
        assert f is not None
        # subtree ids are unique and above the table's prior ids
        import iceberg_cpp_spark.core.types as ity
        ids = []
        def walk(fields):
            for x in fields:
                ids.append(x.field_id)
                if isinstance(x.field_type, ity.StructType):
                    walk(x.field_type.fields)
        walk(t.schema().fields)
        assert len(ids) == len(set(ids))

    def test_replace_columns_nested_type(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.nr (id bigint, name string)")
        eng.sql("ALTER TABLE ice.db.nr REPLACE COLUMNS "
                "(id bigint, pair struct<a: int, b: int>)")
        t = cat.load_table("db.nr", spark=spark)
        assert {f.name for f in t.schema().fields} == {"id", "pair"}
        assert t.schema().find_field("pair.b") is not None


class TestReviewFindingsR16b:
    """Pins for the second review pass (nested SQL types batch)."""

    def test_replace_columns_restated_nested_keeps_ids(self, spark,
                                                       cat):
        # restating a nested column identically must be a no-op on its
        # subtree IDs (a re-parsed spelling carries fresh ids — the
        # structural compare must ignore them)
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.rk (id bigint, "
                "addr struct<num: int>)")
        before = cat.load_table("db.rk").schema() \
            .find_field("addr.num").field_id
        eng.sql("ALTER TABLE ice.db.rk REPLACE COLUMNS "
                "(id bigint, addr struct<num: int>)")
        sch = cat.load_table("db.rk").schema()
        assert sch.find_field("addr.num").field_id == before
        # a genuinely different nested type still refuses
        with pytest.raises(ValueError, match="promotion"):
            eng.sql("ALTER TABLE ice.db.rk REPLACE COLUMNS "
                    "(id bigint, addr struct<num: string>)")

    def test_create_last_column_id_covers_nested_ids(self, spark, cat):
        from iceberg_cpp_spark.core.types import max_assigned_field_id

        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.lci (id bigint, "
                "tags array<string>, kv map<string, int>)")
        t = cat.load_table("db.lci")
        assert t.metadata.last_column_id >= \
            max_assigned_field_id(t.schema().fields)

    def test_nested_iceberg_only_leaf_round_trips(self, spark, cat):
        # uuid/timestamptz leaves inside struct<> have no Spark DDL
        # type — the recursive parser resolves them per leaf, and the
        # SHOW CREATE output stays runnable
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.uq (id bigint, "
                "meta struct<u: uuid, ts: timestamptz>)")
        stmt = eng.sql("SHOW CREATE TABLE ice.db.uq").collect()[0][0]
        assert "UUID" in stmt and "TIMESTAMP_LTZ" in stmt
        eng.sql(stmt.replace("ice.db.uq", "ice.db.uq2"))
        assert [f.to_json() for f in
                cat.load_table("db.uq2").schema().fields] == \
            [f.to_json() for f in cat.load_table("db.uq").schema()
             .fields]

    def test_element_value_required_round_trips(self, spark, cat):
        from iceberg_cpp_spark.core import types as ity

        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.er (xs array<int NOT NULL>, "
                "kv map<string, bigint NOT NULL>)")
        t = cat.load_table("db.er")
        xs = t.schema().field_by_name("xs").field_type
        kv = t.schema().field_by_name("kv").field_type
        assert xs.element_required and kv.value_required
        stmt = eng.sql("SHOW CREATE TABLE ice.db.er").collect()[0][0]
        assert "ARRAY<INT NOT NULL>" in stmt
        assert "MAP<STRING, BIGINT NOT NULL>" in stmt
        eng.sql(stmt.replace("ice.db.er", "ice.db.er2"))
        t2 = cat.load_table("db.er2")
        assert t2.schema().field_by_name("xs").field_type \
            .element_required

    def test_struct_field_named_value_mutates(self, spark, tmp_loc):
        from iceberg_cpp_spark.core import types as ity
        from iceberg_cpp_spark.core.types import Schema

        schema = Schema([
            ity.NestedField(1, "metrics", ity.StructType([
                ity.NestedField(2, "value", ity.IntegerType(), True),
            ])),
        ])
        t = IceTable.create(spark, os.path.join(tmp_loc, "sfnv"),
                            schema)
        t = t.update_column_type("metrics.value", ity.LongType())
        f = t.schema().find_field("metrics.value")
        assert isinstance(f.field_type, ity.LongType)
        t = t.make_column_optional("metrics.value")
        assert not t.schema().find_field("metrics.value").required
        # and a fresh sibling makes the 'value' field droppable too
        t = t.add_column("metrics.keep", ity.StringType())
        t = t.drop_column("metrics.value")
        assert t.schema().find_field("metrics.value") is None

    def test_drop_last_struct_field_refuses(self, spark, tmp_loc):
        from iceberg_cpp_spark.core import types as ity
        from iceberg_cpp_spark.core.types import Schema

        schema = Schema([
            ity.NestedField(1, "m", ity.StructType([
                ity.NestedField(2, "value", ity.IntegerType()),
            ])),
        ])
        t = IceTable.create(spark, os.path.join(tmp_loc, "sfl"),
                            schema)
        with pytest.raises(ValueError, match="last field"):
            t.drop_column("m.value")
