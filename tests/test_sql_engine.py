"""Thin SQL front end (VERDICT r13 task 8): catalog identifiers
resolve to engine scans / spec views, everything else is spark.sql.
The reference exposes only a C++ API; this is the Spark-user surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceSqlEngine, IceTable
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "data", it.StringType(), False),
    ])


@pytest.fixture()
def cat(spark, tmp_loc):
    c = FileSystemCatalog(f"{tmp_loc}/wh")
    c.create_namespace("db")
    c.create_table("db.t", _schema())
    t = c.load_table("db.t", spark=spark)
    t.append(spark.range(6).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("data")))
    c.create_table("db.dim", _schema())
    d = c.load_table("db.dim", spark=spark)
    d.append(spark.createDataFrame(
        [(0, "even"), (1, "odd")], "id long, data string"))
    return c


class TestIceSqlEngine:
    def test_basic_select(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        got = eng.sql(
            "SELECT count(*) AS n, sum(id) AS s FROM ice.db.t "
            "WHERE id >= 2").collect()[0]
        assert (got["n"], got["s"]) == (4, 2 + 3 + 4 + 5)

    def test_join_and_repeated_identifier(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        got = eng.sql("""
            SELECT d.data AS parity, count(*) AS n
            FROM ice.db.t t JOIN ice.db.dim d ON t.id % 2 = d.id
            WHERE t.id < 4 AND t.id IN (SELECT id FROM ice.db.t)
            GROUP BY d.data ORDER BY parity
        """).collect()
        assert [(r["parity"], r["n"]) for r in got] == [
            ("even", 2), ("odd", 2)]

    def test_literals_never_bind(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        got = eng.sql(
            "SELECT 'ice.db.missing' AS s, count(*) AS n "
            "FROM ice.db.t").collect()[0]
        assert got["s"] == "ice.db.missing" and got["n"] == 6

    def test_unknown_identifier_loud(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="no such table or view"):
            eng.sql("SELECT * FROM ice.db.nope")

    def test_sees_engine_deletes(self, spark, cat):
        """The binding is an IceTable scan: MoR deletes, schema
        evolution, snapshot state all apply — not a raw parquet read."""
        t = cat.load_table("db.t", spark=spark)
        t.delete_where(ex.lt(ex.Reference("id"), 2))
        eng = IceSqlEngine(spark, cat)
        got = eng.sql(
            "SELECT min(id) AS lo FROM ice.db.t").collect()[0]
        assert got["lo"] == 2

    def test_spec_view_resolves_recursively(self, spark, cat):
        sch = it.Schema([it.NestedField(1, "id", it.LongType(), True)],
                        schema_id=0)
        cat.create_view("db.big", "SELECT id FROM ice.db.t WHERE id >= 3",
                        sch)
        cat.create_view("db.bigger",
                        "SELECT id FROM ice.db.big WHERE id >= 4", sch)
        eng = IceSqlEngine(spark, cat)
        got = eng.sql("SELECT count(*) AS n FROM ice.db.bigger"
                      ).collect()[0]
        assert got["n"] == 2  # ids 4, 5

    def test_custom_catalog_name_and_one_shot(self, spark, cat):
        from iceberg_cpp_spark.sql import sql as one_shot

        got = one_shot(spark, cat,
                       "SELECT count(*) AS n FROM lake.db.t",
                       catalog_name="lake").collect()[0]
        assert got["n"] == 6
        # the default prefix does NOT bind other dotted names: a plain
        # Spark temp view keeps working alongside
        spark.range(3).createOrReplaceTempView("plain")
        eng = IceSqlEngine(spark, cat)
        got = eng.sql("SELECT (SELECT count(*) FROM plain) AS a, "
                      "count(*) AS n FROM ice.db.t").collect()[0]
        assert (got["a"], got["n"]) == (3, 6)


class TestSqlTimeTravel:
    def test_version_as_of(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        first = t.current_snapshot().snapshot_id
        t.append(spark.createDataFrame([(100, "new")],
                                       "id long, data string"))
        got = eng.sql(
            f"SELECT count(*) AS n FROM ice.db.t "
            f"VERSION AS OF {first}").collect()[0]
        assert got["n"] == 6
        now = eng.sql("SELECT count(*) AS n FROM ice.db.t").collect()[0]
        assert now["n"] == 7
        # both bindings usable in ONE query
        both = eng.sql(f"""
            SELECT (SELECT count(*) FROM ice.db.t
                    FOR SYSTEM_VERSION AS OF {first}) AS old_n,
                   count(*) AS new_n
            FROM ice.db.t""").collect()[0]
        assert (both["old_n"], both["new_n"]) == (6, 7)

    def test_timestamp_as_of(self, spark, cat):
        from datetime import datetime, timezone

        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        ts_ms = t.current_snapshot().timestamp_ms
        t.append(spark.createDataFrame([(100, "new")],
                                       "id long, data string"))
        # exact-millisecond literal of the FIRST snapshot: as_of is a
        # <= comparison, so this pins snapshot 1 without racing the
        # second commit's wall clock
        lit = datetime.fromtimestamp(
            ts_ms / 1000, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S.%f")
        got = eng.sql(
            f"SELECT count(*) AS n FROM ice.db.t "
            f"TIMESTAMP AS OF '{lit}'").collect()[0]
        assert got["n"] == 6

    def test_time_travel_on_view_is_loud(self, spark, cat):
        sch = it.Schema([it.NestedField(1, "id", it.LongType(), True)],
                        schema_id=0)
        cat.create_view("db.v", "SELECT id FROM ice.db.t", sch)
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="time travel applies"):
            eng.sql("SELECT * FROM ice.db.v VERSION AS OF 1")


class TestSqlInsert:
    def test_insert_into_values_and_select(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("INSERT INTO ice.db.t VALUES (100, 'x'), (101, 'y')")
        got = eng.sql("SELECT count(*) AS n FROM ice.db.t").collect()[0]
        assert got["n"] == 8
        # SELECT body reading another catalog table, with casts
        eng.sql("INSERT INTO ice.db.t "
                "SELECT id + 200, upper(data) FROM ice.db.dim")
        rows = {(r["id"], r["data"])
                for r in eng.sql("SELECT id, data FROM ice.db.t "
                                 "WHERE id >= 200").collect()}
        assert rows == {(200, "EVEN"), (201, "ODD")}
        # append = one snapshot each, time-travel still sees history
        t = cat.load_table("db.t", spark=spark)
        assert len(t.snapshots()) == 3

    def test_insert_overwrite(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("INSERT OVERWRITE ice.db.dim VALUES (9, 'only')")
        rows = eng.sql("SELECT id, data FROM ice.db.dim").collect()
        assert [(r["id"], r["data"]) for r in rows] == [(9, "only")]

    def test_insert_guards(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="not a table"):
            eng.sql("INSERT INTO ice.db.nope VALUES (1, 'a')")
        with pytest.raises(ValueError, match="column count"):
            eng.sql("INSERT INTO ice.db.t VALUES (1)")


class TestSqlDml:
    """DELETE / UPDATE / MERGE / CTAS / DROP (r14): the WHERE clause
    parses through plans.sql_parser into the Expression DSL, so SQL
    deletes ride the SAME pruned metadata plane as the Python API."""

    def test_delete_where_prunes_untouched_files(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        # second append with a disjoint id range: the delete must carry
        # the first append's files untouched (the predicate reached
        # plan_files, not just the scan)
        t = cat.load_table("db.t", spark=spark)
        first = {f.file_path for f in t.scan().plan_files()}
        t.append(spark.createDataFrame(
            [(50, "hi"), (51, "hi")], "id long, data string"))
        eng.sql("DELETE FROM ice.db.t WHERE id >= 50 AND data LIKE 'h%'")
        t2 = cat.load_table("db.t", spark=spark)
        after = {f.file_path for f in t2.scan().plan_files()}
        assert sorted(r["id"] for r in
                      eng.sql("SELECT id FROM ice.db.t").collect()) \
            == [0, 1, 2, 3, 4, 5]
        # the first append's files survived byte-identical; the second
        # append's files are gone entirely
        assert after == first

    def test_delete_without_where_empties_table(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("DELETE FROM ice.db.dim")
        assert eng.sql("SELECT * FROM ice.db.dim").count() == 0

    def test_update_with_spark_expressions(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("UPDATE ice.db.t SET data = upper(data) "
                "WHERE id BETWEEN 1 AND 2")
        rows = {r["id"]: r["data"]
                for r in eng.sql("SELECT * FROM ice.db.t").collect()}
        assert rows[1] == "V1" and rows[2] == "V2" and rows[3] == "v3"

    def test_update_bad_expression_loud_even_on_no_match(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        from pyspark.errors import AnalysisException, ParseException

        with pytest.raises(ParseException):
            eng.sql("UPDATE ice.db.t SET data = 1 WHEN x WHERE id < 0")
        with pytest.raises(AnalysisException):
            eng.sql("UPDATE ice.db.t SET data = no_such_col WHERE id < 0")

    def test_merge_upsert_and_delete(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("""
            MERGE INTO ice.db.t t USING (
                SELECT * FROM VALUES (2, 'merged'), (100, 'new')
                    AS v(id, data)
            ) s ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """)
        rows = {r["id"]: r["data"]
                for r in eng.sql("SELECT * FROM ice.db.t").collect()}
        assert rows[2] == "merged" and rows[100] == "new" and len(rows) == 7
        # delete-only merge: key-only source is enough
        eng.sql("MERGE INTO ice.db.t t USING (SELECT 100 AS id) s "
                "ON t.id = s.id WHEN MATCHED THEN DELETE")
        assert eng.sql(
            "SELECT * FROM ice.db.t WHERE id = 100").count() == 0

    def test_merge_using_catalog_table(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("MERGE INTO ice.db.t t USING ice.db.dim d ON t.id = d.id "
                "WHEN MATCHED THEN UPDATE SET *")
        rows = {r["id"]: r["data"]
                for r in eng.sql("SELECT * FROM ice.db.t").collect()}
        assert rows[0] == "even" and rows[1] == "odd" and rows[2] == "v2"

    def test_merge_guards(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="different columns"):
            eng.sql("MERGE INTO ice.db.t t USING ice.db.dim d "
                    "ON t.id = d.data WHEN MATCHED THEN DELETE")
        with pytest.raises(ValueError, match="ON"):
            eng.sql("MERGE INTO ice.db.t t USING ice.db.dim d "
                    "WHEN MATCHED THEN DELETE")
        # ADVICE r14: each ON equality must compare target to source —
        # `t.id = t.id` is a degenerate no-op, not a key
        with pytest.raises(ValueError, match="must compare the target"):
            eng.sql("MERGE INTO ice.db.t t USING ice.db.dim d "
                    "ON t.id = t.id WHEN MATCHED THEN DELETE")
        with pytest.raises(ValueError, match="neither"):
            eng.sql("MERGE INTO ice.db.t t USING ice.db.dim d "
                    "ON bogus.id = d.id WHEN MATCHED THEN DELETE")
        # duplicate unconditional WHEN MATCHED clauses: the first makes
        # the second unreachable — refuse loudly, never last-wins
        with pytest.raises(ValueError, match="unreachable"):
            eng.sql("MERGE INTO ice.db.t t USING ice.db.dim d "
                    "ON t.id = d.id WHEN MATCHED THEN UPDATE SET * "
                    "WHEN MATCHED THEN DELETE")

    def test_merge_column_level_actions(self, spark, cat):
        """r15: WHEN MATCHED [AND cond] THEN UPDATE SET col = expr /
        WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs) — the
        canonical CDC-upsert shape (VERDICT r14 task 1)."""
        eng = IceSqlEngine(spark, cat)
        eng.sql("""
            MERGE INTO ice.db.t t USING (
                SELECT * FROM VALUES (1, 'del', 'D'), (2, 'upd', 'U'),
                    (200, 'new', 'I'), (201, 'skip', 'D')
                    AS v(id, data, op)
            ) s ON t.id = s.id
            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET data = concat(t.data, '+', s.data)
            WHEN NOT MATCHED AND s.op <> 'D' THEN
                INSERT (id, data) VALUES (s.id, upper(s.data))
        """)
        rows = {r["id"]: r["data"]
                for r in eng.sql("SELECT * FROM ice.db.t").collect()}
        assert 1 not in rows and 201 not in rows
        assert rows[2] == "v2+upd" and rows[200] == "NEW"
        assert rows[3] == "v3"  # untouched

    def test_merge_conditional_update_and_set_qualifiers(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        # SET target may be t-qualified; values mix t./s. references
        eng.sql("MERGE INTO ice.db.t t USING (SELECT 2 AS id, 'X' AS d) s"
                " ON t.id = s.id"
                " WHEN MATCHED AND t.data = 'v2' THEN"
                " UPDATE SET t.data = s.d")
        rows = {r["id"]: r["data"]
                for r in eng.sql("SELECT * FROM ice.db.t").collect()}
        assert rows[2] == "X"
        with pytest.raises(ValueError, match="duplicate SET target"):
            eng.sql("MERGE INTO ice.db.t t USING (SELECT 2 AS id) s "
                    "ON t.id = s.id WHEN MATCHED THEN "
                    "UPDATE SET data = 'a', data = 'b'")
        with pytest.raises(ValueError, match="cannot reference"):
            eng.sql("MERGE INTO ice.db.t t USING (SELECT 2 AS id, 'x' "
                    "AS data) s ON t.id = s.id WHEN NOT MATCHED THEN "
                    "INSERT (id, data) VALUES (s.id, t.data)")

    def test_ctas_and_drop(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.small AS "
                "SELECT id, upper(data) AS data FROM ice.db.t WHERE id < 2")
        got = {(r["id"], r["data"]) for r in
               eng.sql("SELECT * FROM ice.db.small").collect()}
        assert got == {(0, "V0"), (1, "V1")}
        with pytest.raises(ValueError, match="already exists"):
            eng.sql("CREATE TABLE ice.db.small AS SELECT 1 AS x")
        # idempotent spelling
        eng.sql("CREATE TABLE IF NOT EXISTS ice.db.small AS "
                "SELECT 1 AS x")
        assert eng.sql("SELECT count(*) AS n FROM ice.db.small") \
            .collect()[0]["n"] == 2
        eng.sql("DROP TABLE ice.db.small")
        assert not cat.table_exists("db.small")
        eng.sql("DROP TABLE IF EXISTS ice.db.small")
        with pytest.raises(ValueError, match="no such table"):
            eng.sql("DROP TABLE ice.db.small")

    def test_keywords_inside_literals_are_inert(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("UPDATE ice.db.t SET data = ' where when and ' "
                "WHERE id = 0")
        got = eng.sql("SELECT data FROM ice.db.t WHERE id = 0") \
            .collect()[0]["data"]
        assert got == " where when and "

    def test_dml_on_foreign_catalog_prefix_falls_through(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        # not our catalog name: the engine must not intercept it
        with pytest.raises(Exception):
            eng.sql("DELETE FROM other.db.t WHERE id = 1")


class TestSqlMetadataAndUtility:
    """Metadata tables via SQL (`ice.db.t.snapshots` — the Iceberg SQL
    convention) plus SHOW TABLES / SHOW NAMESPACES / DESCRIBE (r14)."""

    def test_metadata_tables_bind(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("INSERT INTO ice.db.t VALUES (50, 'x')")
        snaps = eng.sql("SELECT snapshot_id, operation "
                        "FROM ice.db.t.snapshots").collect()
        assert [s["operation"] for s in snaps] == ["append", "append"]
        assert eng.sql("SELECT * FROM ice.db.t.history").count() == 2
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t.files") \
            .collect()[0]["n"] >= 1
        # metadata and data tables compose in one query
        got = eng.sql("""
            SELECT s.operation, count(*) AS n
            FROM ice.db.t.snapshots s CROSS JOIN ice.db.t
            GROUP BY s.operation
        """).collect()[0]
        assert got["operation"] == "append" and got["n"] == 14

    def test_metadata_table_time_travel_is_loud(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="time travel"):
            eng.sql("SELECT * FROM ice.db.t.snapshots VERSION AS OF 1")

    def test_show_and_describe(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        rows = eng.sql("SHOW TABLES IN ice.db").collect()
        assert {(r["namespace"], r["tableName"]) for r in rows} \
            == {("db", "t"), ("db", "dim")}
        assert [r["namespace"] for r in
                eng.sql("SHOW NAMESPACES IN ice").collect()] == ["db"]
        desc = eng.sql("DESCRIBE ice.db.t").collect()
        assert [(r["col_name"], r["data_type"], r["nullable"])
                for r in desc] == [("id", "long", False),
                                   ("data", "string", True)]
        with pytest.raises(ValueError, match="not a table"):
            eng.sql("DESCRIBE ice.db.nope")


class TestSqlAlterAndCall:
    """ALTER TABLE evolution/refs clauses and CALL <cat>.system.<proc>
    maintenance procedures (r14) — each maps onto the corresponding
    IceTable method; unknown clauses/procs/arguments refuse loudly."""

    def test_alter_columns_and_properties(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t ADD COLUMN score DOUBLE")
        eng.sql("ALTER TABLE ice.db.t RENAME COLUMN data TO label")
        desc = [(r["col_name"], r["data_type"]) for r in
                eng.sql("DESCRIBE ice.db.t").collect()]
        assert desc == [("id", "long"), ("label", "string"),
                        ("score", "double")]
        # old rows read the new column as null through SQL
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t "
                       "WHERE score IS NULL").collect()[0]["n"] == 6
        eng.sql("ALTER TABLE ice.db.t SET TBLPROPERTIES "
                "('foo' = 'bar', 'x' = '1')")
        t = cat.load_table("db.t", spark=spark)
        assert t.properties()["foo"] == "bar"
        eng.sql("ALTER TABLE ice.db.t UNSET TBLPROPERTIES ('foo')")
        assert "foo" not in cat.load_table("db.t", spark=spark) \
            .properties()
        eng.sql("ALTER TABLE ice.db.t DROP COLUMN score")
        assert [r["col_name"] for r in
                eng.sql("DESCRIBE ice.db.t").collect()] == ["id", "label"]
        with pytest.raises(ValueError, match="unsupported ALTER"):
            eng.sql("ALTER TABLE ice.db.t CLUSTER BY id")

    def test_alter_refs(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        sid = cat.load_table("db.t", spark=spark) \
            .current_snapshot().snapshot_id
        eng.sql("ALTER TABLE ice.db.t CREATE BRANCH audit")
        eng.sql(f"ALTER TABLE ice.db.t CREATE TAG v1 "
                f"AS OF VERSION {sid}")
        refs = cat.load_table("db.t", spark=spark).metadata.refs
        assert refs["audit"].type == "branch"
        assert refs["v1"].type == "tag" and refs["v1"].snapshot_id == sid
        eng.sql("ALTER TABLE ice.db.t DROP BRANCH audit")
        assert "audit" not in cat.load_table("db.t", spark=spark) \
            .metadata.refs

    def test_call_maintenance_procs(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("INSERT INTO ice.db.t VALUES (100, 'x')")
        got = eng.sql("CALL ice.system.rewrite_manifests("
                      "table => 'db.t')").collect()
        assert got[0]["current_snapshot_id"] is not None
        got = eng.sql("CALL ice.system.rewrite_data_files("
                      "table => 'db.t', target_file_count => 1)")
        assert got.collect()[0]["current_snapshot_id"] is not None
        assert len(cat.load_table("db.t", spark=spark)
                   .scan().plan_files()) == 1
        got = eng.sql("CALL ice.system.expire_snapshots("
                      "table => 'db.t', retain_last => 1)").collect()
        assert got[0]["deleted_snapshots_count"] >= 1
        # orphan listing after expiry, dry run: returns locations only
        orphans = eng.sql("CALL ice.system.remove_orphan_files("
                          "table => 'db.t', dry_run => true)")
        assert orphans.columns == ["orphan_file_location"]

    def test_call_rollback(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        first = t.current_snapshot().snapshot_id
        eng.sql("INSERT INTO ice.db.t VALUES (100, 'x')")
        got = eng.sql(f"CALL ice.system.rollback_to_snapshot("
                      f"table => 'db.t', snapshot_id => {first})")
        assert got.collect()[0]["current_snapshot_id"] == first
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t") \
            .collect()[0]["n"] == 6

    def test_call_guards(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="unknown procedure"):
            eng.sql("CALL ice.system.nope(table => 'db.t')")
        with pytest.raises(ValueError, match="unknown argument"):
            eng.sql("CALL ice.system.rewrite_manifests("
                    "table => 'db.t', bogus => 1)")
        with pytest.raises(ValueError, match="needs snapshot_id"):
            eng.sql("CALL ice.system.rollback_to_snapshot("
                    "table => 'db.t')")
        with pytest.raises(ValueError, match="needs a table"):
            eng.sql("CALL ice.system.rewrite_manifests()")


class TestSqlChanges:
    """CDC reads through SQL: ``FROM ice.db.t CHANGES SINCE <id>`` /
    ``CHANGES BETWEEN <a> AND <b>`` bind the changelog rows (r14)."""

    def test_changes_since_and_between(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        s1 = t.current_snapshot().snapshot_id
        eng.sql("INSERT INTO ice.db.t VALUES (100, 'x')")
        s2 = cat.load_table("db.t", spark=spark) \
            .current_snapshot().snapshot_id
        eng.sql("DELETE FROM ice.db.t WHERE id = 0")
        got = [(r["_change_type"], r["id"]) for r in
               eng.sql(f"SELECT _change_type, id FROM ice.db.t "
                       f"CHANGES SINCE {s1} "
                       f"ORDER BY _change_ordinal, id").collect()]
        assert got == [("insert", 100), ("delete", 0)]
        got = [(r["_change_type"], r["id"]) for r in
               eng.sql(f"SELECT _change_type, id FROM ice.db.t "
                       f"CHANGES BETWEEN {s1} AND {s2}").collect()]
        assert got == [("insert", 100)]
        # changelog and current state compose in one query
        n = eng.sql(f"SELECT count(*) AS n FROM ice.db.t "
                    f"CHANGES SINCE {s1} c JOIN ice.db.t x "
                    f"ON c.id = x.id").collect()[0]["n"]
        assert n == 1  # id 0 was deleted; id 100 still live

    def test_changes_on_view_is_loud(self, spark, cat):
        sch = it.Schema([it.NestedField(1, "id", it.LongType(), True)],
                        schema_id=0)
        cat.create_view("db.cv", "SELECT id FROM ice.db.t", sch)
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="CHANGES applies"):
            eng.sql("SELECT * FROM ice.db.cv CHANGES SINCE 1")

    def test_version_as_of_ref_name(self, spark, cat):
        """Quoted VERSION AS OF names a branch or tag (the Iceberg SQL
        convention); digits pin a snapshot id."""
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t CREATE TAG stable")
        eng.sql("ALTER TABLE ice.db.t CREATE BRANCH dev")
        eng.sql("INSERT INTO ice.db.t VALUES (100, 'after-tag')")
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t "
                       "VERSION AS OF 'stable'").collect()[0]["n"] == 6
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t "
                       "VERSION AS OF 'dev'").collect()[0]["n"] == 6
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t") \
            .collect()[0]["n"] == 7
        with pytest.raises(ValueError, match="no such branch or tag"):
            eng.sql("SELECT * FROM ice.db.t VERSION AS OF 'nope'")


class TestSqlInsertNamedColumns:
    def test_named_columns_and_null_fill(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("INSERT INTO ice.db.t (data, id) VALUES ('named', 300)")
        row = eng.sql("SELECT * FROM ice.db.t WHERE id = 300") \
            .collect()[0]
        assert (row["id"], row["data"]) == (300, "named")
        # missing OPTIONAL column fills NULL
        eng.sql("INSERT INTO ice.db.t (id) VALUES (301)")
        row = eng.sql("SELECT * FROM ice.db.t WHERE id = 301") \
            .collect()[0]
        assert row["data"] is None

    def test_named_columns_write_default(self, spark, cat):
        from iceberg_cpp_spark.core import types as it

        t = cat.load_table("db.t", spark=spark)
        t.add_column("src", it.StringType(), default="backfill")
        eng = IceSqlEngine(spark, cat)
        eng.sql("INSERT INTO ice.db.t (id, data) VALUES (400, 'd')")
        row = eng.sql("SELECT * FROM ice.db.t WHERE id = 400") \
            .collect()[0]
        assert row["src"] == "backfill"

    def test_named_columns_guards(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="not in table"):
            eng.sql("INSERT INTO ice.db.t (nope) VALUES (1)")
        with pytest.raises(ValueError, match="required column"):
            eng.sql("INSERT INTO ice.db.t (data) VALUES ('x')")
        with pytest.raises(ValueError, match="duplicate"):
            eng.sql("INSERT INTO ice.db.t (id, id) VALUES (1, 2)")
        with pytest.raises(ValueError, match="body produces"):
            eng.sql("INSERT INTO ice.db.t (id) VALUES (1, 2)")
        # a parenthesized SUBQUERY body is not a column list
        eng.sql("INSERT INTO ice.db.t (SELECT id + 500, data "
                "FROM ice.db.dim)")
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t "
                       "WHERE id >= 500").collect()[0]["n"] == 2


class TestSqlCreateTableDdl:
    """CREATE TABLE with explicit column definitions and the Iceberg
    PARTITIONED BY transform spellings (years/months/days/hours(col),
    bucket(N, col), truncate(W, col), bare col = identity)."""

    def test_create_with_columns_and_partitioning(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("""
            CREATE TABLE ice.db.e (
                id BIGINT NOT NULL, name STRING,
                amount DECIMAL(10,2), ts TIMESTAMP
            ) PARTITIONED BY (days(ts), bucket(8, id))
        """)
        t = cat.load_table("db.e", spark=spark)
        assert [(f.name, f.field_type.to_json(), f.required)
                for f in t.schema().fields] == [
            ("id", "long", True), ("name", "string", False),
            ("amount", "decimal(10, 2)", False),
            ("ts", "timestamp", False)]
        assert [(p.name, p.transform.name)
                for p in t.metadata.spec().fields] == [
            ("ts_day", "day"), ("id_bucket", "bucket[8]")]
        eng.sql("INSERT INTO ice.db.e VALUES "
                "(1, 'a', 10.50, TIMESTAMP '2020-01-02T03:00:00'), "
                "(9, 'b', 2.25, TIMESTAMP '2021-06-01T00:00:00')")
        # partition pruning through the DDL-declared spec
        from iceberg_cpp_spark.plans import expressions as ex
        import datetime as dt

        t = cat.load_table("db.e", spark=spark)
        pruned = t.scan(filter=ex.lt(
            ex.Reference("ts"), dt.datetime(2020, 6, 1))).plan_files()
        assert len(pruned) == 1

    def test_ctas_partitioned(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.byname PARTITIONED BY (data) "
                "AS SELECT id, data FROM ice.db.dim")
        t = cat.load_table("db.byname", spark=spark)
        assert [(p.name, p.transform.name)
                for p in t.metadata.spec().fields] == [
            ("data", "identity")]
        assert t.to_df().count() == 2

    def test_create_table_guards(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="exactly one"):
            eng.sql("CREATE TABLE ice.db.g (id BIGINT) AS SELECT 1")
        with pytest.raises(ValueError, match="exactly one"):
            eng.sql("CREATE TABLE ice.db.g")
        with pytest.raises(ValueError, match="unknown column"):
            eng.sql("CREATE TABLE ice.db.g PARTITIONED BY (zz) "
                    "AS SELECT 1 AS a")
        with pytest.raises(ValueError, match="partition field entry"):
            eng.sql("CREATE TABLE ice.db.g (id BIGINT) "
                    "PARTITIONED BY (substr(id, 1))")


class TestSqlViewDdl:
    """CREATE [OR REPLACE] VIEW / DROP VIEW through SQL (r14): the
    stored SQL keeps its catalog identifiers, so resolution stays
    dynamic — the view reflects its sources' CURRENT state."""

    def test_create_query_replace_drop(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE VIEW ice.db.big AS "
                "SELECT id, data FROM ice.db.t WHERE id >= 3")
        assert eng.sql("SELECT count(*) AS n FROM ice.db.big") \
            .collect()[0]["n"] == 3
        # dynamic: new source rows show through
        eng.sql("INSERT INTO ice.db.t VALUES (50, 'x')")
        assert eng.sql("SELECT count(*) AS n FROM ice.db.big") \
            .collect()[0]["n"] == 4
        with pytest.raises(ValueError, match="already exists"):
            eng.sql("CREATE VIEW ice.db.big AS SELECT 1 AS x")
        eng.sql("CREATE OR REPLACE VIEW ice.db.big AS "
                "SELECT id FROM ice.db.t WHERE id >= 50")
        assert eng.sql("SELECT * FROM ice.db.big").collect()[0]["id"] \
            == 50
        # replace kept version history on the spec view
        assert len(cat.load_view("db.big").metadata.versions) == 2
        eng.sql("DROP VIEW ice.db.big")
        assert not cat.view_exists("db.big")
        eng.sql("DROP VIEW IF EXISTS ice.db.big")
        with pytest.raises(ValueError, match="no such view"):
            eng.sql("DROP VIEW ice.db.big")


class TestSqlHygiene:
    """r15: comment masking, injective temp-view naming with cleanup,
    backtick-quoted identifier parts (VERDICT r14 tasks 4-6)."""

    def test_comments_are_inert(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        # a comment naming a NON-EXISTENT table must not bind or error
        assert eng.sql("SELECT count(*) AS n -- ice.db.nope\n"
                       "FROM ice.db.t /* ice.db.also_nope */") \
            .collect()[0]["n"] == 6
        # '--' inside a string literal is NOT a comment
        assert eng.sql("SELECT '--x' AS s FROM ice.db.t LIMIT 1") \
            .collect()[0]["s"] == "--x"
        # nested block comments (Spark supports them; so do we)
        assert eng.sql("SELECT /* a /* nested */ b */ count(*) AS n "
                       "FROM ice.db.t").collect()[0]["n"] == 6
        with pytest.raises(ValueError, match="unterminated"):
            eng.sql("SELECT 1 /* oops")

    def test_comment_cannot_hide_dml_clause(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        # the commented-out WHERE must NOT apply; the real one must
        eng.sql("DELETE FROM ice.db.dim /* WHERE id = 0 */ WHERE id = 1")
        assert [r["id"] for r in
                eng.sql("SELECT id FROM ice.db.dim").collect()] == [0]
        # a trailing line comment after the statement is fine
        eng.sql("DELETE FROM ice.db.dim WHERE id = 0; -- done")
        assert eng.sql("SELECT * FROM ice.db.dim").count() == 0

    def test_no_temp_view_growth(self, spark, cat):
        eng = IceSqlEngine(spark, cat)

        def ice_views():
            return [t.name for t in spark.catalog.listTables()
                    if t.name.startswith("__ice_sql_")]

        for _ in range(3):
            df = eng.sql("SELECT t.id FROM ice.db.t t "
                         "JOIN ice.db.dim d ON t.id = d.id")
            # the returned frame stays usable after view cleanup
            # (spark.sql analyzes eagerly)
            assert df.count() == 2
        assert ice_views() == []

    def test_view_names_injective(self, spark, cat):
        """ADVICE r14: `db.t.snapshots` (metadata table) and a real
        table `db.t_snapshots` flatten to the same name — the digest
        suffix must keep them distinct inside ONE query."""
        eng = IceSqlEngine(spark, cat)
        cat.create_table("db.t_snapshots", _schema())
        tt = cat.load_table("db.t_snapshots", spark=spark)
        tt.append(spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, data string"))
        row = eng.sql(
            "SELECT (SELECT count(*) FROM ice.db.t.snapshots) AS ns, "
            "(SELECT count(*) FROM ice.db.t_snapshots) AS nt").collect()[0]
        assert row["ns"] == 1 and row["nt"] == 3

    def test_backtick_identifiers(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.`my-table` (id BIGINT, data STRING)")
        assert cat.table_exists("db.my-table")
        eng.sql("INSERT INTO ice.db.`my-table` VALUES (1, 'x'), (2, 'y')")
        assert eng.sql("SELECT count(*) AS n FROM ice.db.`my-table`") \
            .collect()[0]["n"] == 2
        eng.sql("DELETE FROM ice.db.`my-table` WHERE id = 1")
        assert [r["id"] for r in eng.sql(
            "SELECT id FROM ice.db.`my-table`").collect()] == [2]
        eng.sql("DROP TABLE ice.db.`my-table`")
        assert not cat.table_exists("db.my-table")
        with pytest.raises(ValueError, match="cannot contain a dot"):
            eng.sql("SELECT * FROM ice.db.`a.b`")


class TestSqlTransaction:
    """r15: txn-scoped SQL — multiple DML statements accumulate on a
    new_transaction() working copy and publish as ONE CAS, exactly
    like the Python mutators (VERDICT r14 task 7)."""

    def test_two_dml_one_cas(self, spark, cat):
        import glob
        import os

        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        meta_glob = os.path.join(t.location(), "metadata",
                                 "*.metadata.json*")
        before_meta = len(glob.glob(meta_glob))
        txn = t.new_transaction()
        eng.sql("INSERT INTO ice.db.t VALUES (100, 'x')", txn=txn)
        eng.sql("DELETE FROM ice.db.t WHERE id = 0", txn=txn)
        # txn-scoped reads see the pending chain ...
        inside = eng.sql("SELECT id FROM ice.db.t WHERE id >= 100",
                         txn=txn).count()
        assert inside == 1
        # ... the committed table does not, yet
        assert eng.sql("SELECT id FROM ice.db.t WHERE id >= 100") \
            .count() == 0
        txn.commit()
        rows = sorted(r["id"] for r in
                      eng.sql("SELECT id FROM ice.db.t").collect())
        assert rows == [1, 2, 3, 4, 5, 100]
        # one snapshot per statement on the chain, ONE metadata CAS
        t2 = cat.load_table("db.t", spark=spark)
        assert len(t2.snapshots()) == 3
        assert len(glob.glob(meta_glob)) == before_meta + 1

    def test_merge_composes_in_txn(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        txn = t.new_transaction()
        eng.sql("UPDATE ice.db.t SET data = 'zz' WHERE id = 5", txn=txn)
        eng.sql("MERGE INTO ice.db.t t USING (SELECT 5 AS id, 'm' AS d) s"
                " ON t.id = s.id"
                " WHEN MATCHED AND t.data = 'zz' THEN UPDATE SET data = s.d",
                txn=txn)
        txn.commit()
        rows = {r["id"]: r["data"]
                for r in eng.sql("SELECT * FROM ice.db.t").collect()}
        # the merge saw the txn's pending update ('zz'), so its
        # condition matched and rewrote to 'm'
        assert rows[5] == "m"

    def test_non_composable_statements_refuse(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        txn = t.new_transaction()
        with pytest.raises(ValueError, match="cannot run inside"):
            eng.sql("CREATE TABLE ice.db.zz (id BIGINT)", txn=txn)
        with pytest.raises(ValueError, match="cannot run inside"):
            eng.sql("DROP TABLE ice.db.dim", txn=txn)
        with pytest.raises(ValueError, match="composes writes to ONE"):
            eng.sql("DELETE FROM ice.db.dim WHERE id = 0", txn=txn)
        with pytest.raises(ValueError, match="time travel"):
            eng.sql("SELECT * FROM ice.db.t VERSION AS OF 1", txn=txn)
        # the txn is still usable after the refusals
        eng.sql("INSERT INTO ice.db.t VALUES (7, 'ok')", txn=txn)
        txn.commit()
        assert eng.sql("SELECT * FROM ice.db.t WHERE id = 7").count() == 1


class TestDescribeExtended:
    """r15: DESCRIBE [TABLE] EXTENDED and SHOW CREATE TABLE — the
    operator-facing metadata surface (VERDICT r14 task 8)."""

    @pytest.fixture()
    def part_cat(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.p (id BIGINT NOT NULL, ts TIMESTAMP,"
                " data STRING) PARTITIONED BY (days(ts), bucket(4, id))")
        eng.sql("ALTER TABLE ice.db.p SET TBLPROPERTIES "
                "('write.merge.mode' = 'merge-on-read')")
        return cat

    def test_describe_extended_golden(self, spark, part_cat):
        eng = IceSqlEngine(spark, part_cat)
        rows = {r["col_name"]: r["data_type"] for r in
                eng.sql("DESCRIBE EXTENDED ice.db.p").collect()}
        assert rows["id"] == "long" and rows["ts"] == "timestamp"
        t0 = part_cat.load_table("db.p", spark=spark)
        assert rows["Format Version"] == str(t0.metadata.format_version)
        assert rows["Partition Spec"] == "(days(ts), bucket(4, id))"
        assert rows["Sort Order"] == "(unsorted)"
        assert "write.merge.mode" in rows["Properties"]
        assert rows["Current Snapshot ID"] == ""  # no data yet
        t = part_cat.load_table("db.p", spark=spark)
        assert rows["Location"] == t.location()
        # plain DESCRIBE keeps the column-only shape
        plain = eng.sql("DESCRIBE ice.db.p").collect()
        assert [r["col_name"] for r in plain] == ["id", "ts", "data"]

    def test_show_create_table_golden(self, spark, part_cat):
        eng = IceSqlEngine(spark, part_cat)
        stmt = eng.sql("SHOW CREATE TABLE ice.db.p") \
            .collect()[0]["createtab_stmt"]
        assert stmt == (
            "CREATE TABLE ice.db.p (\n"
            "  id BIGINT NOT NULL,\n"
            "  ts TIMESTAMP,\n"
            "  data STRING)\n"
            "USING iceberg\n"
            "PARTITIONED BY (days(ts), bucket(4, id))\n"
            "TBLPROPERTIES (\n"
            "  'write.merge.mode' = 'merge-on-read')")

    def test_show_create_round_trips(self, spark, part_cat):
        """The emitted statement RUNS and reproduces schema + spec."""
        eng = IceSqlEngine(spark, part_cat)
        stmt = eng.sql("SHOW CREATE TABLE ice.db.p") \
            .collect()[0]["createtab_stmt"]
        stmt2 = stmt.replace("ice.db.p", "ice.db.p2", 1) \
            .replace("TBLPROPERTIES", "XX", 1).split("\nXX")[0]
        eng.sql(stmt2)
        a = part_cat.load_table("db.p", spark=spark)
        b = part_cat.load_table("db.p2", spark=spark)
        assert [(f.name, str(f.field_type), f.required)
                for f in a.schema().fields] == \
            [(f.name, str(f.field_type), f.required)
             for f in b.schema().fields]
        assert [str(f.transform) for f in a.spec().fields] == \
            [str(f.transform) for f in b.spec().fields]


class TestSqlTruncate:
    def test_truncate_table(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        pre = t.current_snapshot().snapshot_id
        eng.sql("TRUNCATE TABLE ice.db.t")
        assert eng.sql("SELECT * FROM ice.db.t").count() == 0
        # metadata-plane: history kept, pre-truncate snapshot readable
        assert eng.sql(
            f"SELECT * FROM ice.db.t VERSION AS OF {pre}").count() == 6
        with pytest.raises(ValueError, match="not a table"):
            eng.sql("TRUNCATE TABLE ice.db.nope")

    def test_truncate_composes_in_txn(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        txn = t.new_transaction()
        eng.sql("TRUNCATE TABLE ice.db.t", txn=txn)
        eng.sql("INSERT INTO ice.db.t VALUES (1, 'fresh')", txn=txn)
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t").collect()[0]["n"] == 6
        txn.commit()
        rows = eng.sql("SELECT id, data FROM ice.db.t").collect()
        assert [(r["id"], r["data"]) for r in rows] == [(1, "fresh")]


class TestSqlSpecAndSortEvolution:
    """r15: ALTER TABLE ADD/DROP PARTITION FIELD (metadata-only
    partition evolution) and WRITE ORDERED BY / WRITE UNORDERED
    (sort-order evolution — future writes cluster by the new order)."""

    def test_add_and_drop_partition_field(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t ADD PARTITION FIELD bucket(4, id)")
        t = cat.load_table("db.t", spark=spark)
        assert [str(f.transform) for f in t.spec().fields] == ["bucket[4]"]
        # old files keep reading; new appends partition by the new spec
        eng.sql("INSERT INTO ice.db.t VALUES (50, 'p')")
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t "
                       "WHERE id = 50").collect()[0]["n"] == 1
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t") \
            .collect()[0]["n"] == 7
        with pytest.raises(ValueError, match="already exists"):
            eng.sql("ALTER TABLE ice.db.t "
                    "ADD PARTITION FIELD bucket(4, id)")
        eng.sql("ALTER TABLE ice.db.t DROP PARTITION FIELD bucket(4, id)")
        t = cat.load_table("db.t", spark=spark)
        assert t.spec().fields == []
        with pytest.raises(ValueError, match="no such partition field"):
            eng.sql("ALTER TABLE ice.db.t DROP PARTITION FIELD id")
        with pytest.raises(ValueError, match="unknown column"):
            eng.sql("ALTER TABLE ice.db.t ADD PARTITION FIELD nope")

    def test_write_ordered_by(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t WRITE ORDERED BY data DESC, "
                "id ASC NULLS LAST")
        t = cat.load_table("db.t", spark=spark)
        so = t.sort_order()
        assert [(f.source_id, f.direction, f.null_order)
                for f in so.fields] == [
            (2, "desc", "nulls-last"), (1, "asc", "nulls-last")]
        # DESCRIBE EXTENDED reflects it
        rows = {r["col_name"]: r["data_type"] for r in
                eng.sql("DESCRIBE EXTENDED ice.db.t").collect()}
        assert rows["Sort Order"] == ("data DESC NULLS LAST, "
                                      "id ASC NULLS LAST")
        # a new append actually clusters by the order (file min/max of
        # the first sort key don't interleave within a file)
        eng.sql("INSERT INTO ice.db.t SELECT id + 100, data FROM ice.db.t")
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t") \
            .collect()[0]["n"] == 12
        eng.sql("ALTER TABLE ice.db.t WRITE UNORDERED")
        t = cat.load_table("db.t", spark=spark)
        assert t.sort_order().is_unsorted

    def test_sort_order_transform_term(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t WRITE ORDERED BY truncate(1, data)")
        t = cat.load_table("db.t", spark=spark)
        assert [str(f.transform) for f in t.sort_order().fields] == \
            ["truncate[1]"]

    def test_spec_and_sort_ddl_refuse_in_txn(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        txn = t.new_transaction()
        with pytest.raises(ValueError, match="not transaction-aware"):
            eng.sql("ALTER TABLE ice.db.t ADD PARTITION FIELD "
                    "bucket(4, id)", txn=txn)
        with pytest.raises(ValueError, match="not transaction-aware"):
            eng.sql("ALTER TABLE ice.db.t WRITE ORDERED BY id", txn=txn)


class TestSqlTypePromotion:
    """r15: ALTER COLUMN ... TYPE — Iceberg promotion rules, metadata
    only; old files read widened through Spark's parquet type widening."""

    def test_int_to_long_reads_old_files(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.pr (k INT, f REAL, d DECIMAL(5,2))")
        eng.sql("INSERT INTO ice.db.pr VALUES (7, 1.5, 9.25)")
        eng.sql("ALTER TABLE ice.db.pr ALTER COLUMN k TYPE BIGINT")
        eng.sql("ALTER TABLE ice.db.pr ALTER COLUMN f TYPE DOUBLE")
        eng.sql("ALTER TABLE ice.db.pr ALTER COLUMN d TYPE DECIMAL(10,2)")
        t = cat.load_table("db.pr", spark=spark)
        assert [str(f.field_type.to_json())
                for f in t.schema().fields] == \
            ["long", "double", "decimal(10, 2)"]
        # the field IDs survived the promotion (evolution, not re-add)
        assert [f.field_id for f in t.schema().fields] == [1, 2, 3]
        row = eng.sql("SELECT * FROM ice.db.pr").collect()[0]
        assert (row["k"], row["f"], float(row["d"])) == (7, 1.5, 9.25)
        # post-promotion writes mix with pre-promotion files
        eng.sql("INSERT INTO ice.db.pr VALUES (8000000000, 2.5, 100.00)")
        assert eng.sql("SELECT sum(k) AS s FROM ice.db.pr") \
            .collect()[0]["s"] == 8000000007

    def test_invalid_promotions_refuse(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.pr2 (k BIGINT, s STRING)")
        for bad in ["ALTER COLUMN k TYPE INT",        # narrowing
                    "ALTER COLUMN s TYPE BIGINT",     # cross-family
                    "ALTER COLUMN k TYPE STRING"]:
            with pytest.raises(ValueError, match="invalid type promotion"):
                eng.sql(f"ALTER TABLE ice.db.pr2 {bad}")
        with pytest.raises(ValueError, match="no such column"):
            eng.sql("ALTER TABLE ice.db.pr2 ALTER COLUMN zz TYPE BIGINT")

    def test_drop_not_null_and_set_not_null(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE TABLE ice.db.pr3 (k BIGINT NOT NULL, s STRING)")
        eng.sql("ALTER TABLE ice.db.pr3 ALTER COLUMN k DROP NOT NULL")
        t = cat.load_table("db.pr3", spark=spark)
        assert not t.schema().find_field("k").required
        with pytest.raises(ValueError, match="SET NOT NULL is not"):
            eng.sql("ALTER TABLE ice.db.pr3 ALTER COLUMN s SET NOT NULL")


class TestCommentInjectionEquivalence:
    def test_random_comment_injection_preserves_results(self, spark, cat):
        """Property: injecting line/block comments at random token
        boundaries never changes a query's result (comments are
        stripped in the same scan that masks literals)."""
        import random

        rng = random.Random(3)
        eng = IceSqlEngine(spark, cat)
        base = ("SELECT t.id, upper(t.data) AS u FROM ice.db.t t "
                "WHERE t.id >= 1 AND t.data LIKE 'v%' ORDER BY t.id")
        want = [tuple(r) for r in eng.sql(base).collect()]
        assert want  # non-trivial
        for trial in range(6):
            tokens = base.split(" ")
            out = []
            for tok in tokens:
                out.append(tok)
                r = rng.random()
                if r < 0.15:
                    out.append("/* ice.db.bogus 'quote */")
                elif r < 0.25:
                    out.append("-- ice.db.other\n")
            q = " ".join(out)
            got = [tuple(r) for r in eng.sql(q).collect()]
            assert got == want, f"trial {trial} diverged for: {q!r}"


class TestIdentifierFieldsAndDefaults:
    """r15: SET/DROP IDENTIFIER FIELDS (row-identity metadata → the
    default MERGE key) and ALTER COLUMN SET/DROP DEFAULT (v3 write
    defaults on existing columns)."""

    def test_identifier_fields_ddl_and_default_merge_key(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t SET IDENTIFIER FIELDS id")
        t = cat.load_table("db.t", spark=spark)
        assert t.identifier_field_names() == ["id"]
        rows = {r["col_name"]: r["data_type"] for r in
                eng.sql("DESCRIBE EXTENDED ice.db.t").collect()}
        assert rows["Identifier Fields"] == "id"
        # merge WITHOUT on: keys default to the identifier fields
        src = spark.createDataFrame([(2, "via-id"), (300, "new")],
                                    "id long, data string")
        t = t.merge_into(src)
        got = {r["id"]: r["data"] for r in t.to_df().collect()}
        assert got[2] == "via-id" and got[300] == "new"
        # dropping an identifier column refuses; clearing unblocks it
        with pytest.raises(ValueError, match="identifier field"):
            t.drop_column("id")
        eng.sql("ALTER TABLE ice.db.t DROP IDENTIFIER FIELDS")
        t = cat.load_table("db.t", spark=spark)
        assert t.identifier_field_names() == []
        with pytest.raises(ValueError, match="needs `on`"):
            t.merge_into(src)

    def test_identifier_field_rules(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        # data is optional in the fixture schema → refuses
        with pytest.raises(ValueError, match="must be required"):
            eng.sql("ALTER TABLE ice.db.t SET IDENTIFIER FIELDS data")
        eng.sql("CREATE TABLE ice.db.fi (k BIGINT NOT NULL, "
                "f DOUBLE NOT NULL)")
        with pytest.raises(ValueError, match="float/double"):
            eng.sql("ALTER TABLE ice.db.fi SET IDENTIFIER FIELDS f")
        with pytest.raises(ValueError, match="no such column"):
            eng.sql("ALTER TABLE ice.db.fi SET IDENTIFIER FIELDS zz")

    def test_set_default_applies_to_named_insert(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t ALTER COLUMN data SET DEFAULT 'dflt'")
        eng.sql("INSERT INTO ice.db.t (id) VALUES (77)")
        assert eng.sql("SELECT data FROM ice.db.t WHERE id = 77") \
            .collect()[0]["data"] == "dflt"
        eng.sql("ALTER TABLE ice.db.t ALTER COLUMN data DROP DEFAULT")
        eng.sql("INSERT INTO ice.db.t (id) VALUES (78)")
        assert eng.sql("SELECT data FROM ice.db.t WHERE id = 78") \
            .collect()[0]["data"] is None
        # identifier metadata and defaults survive other evolutions
        eng.sql("ALTER TABLE ice.db.t SET IDENTIFIER FIELDS id")
        eng.sql("ALTER TABLE ice.db.t ADD COLUMN extra BIGINT")
        t = cat.load_table("db.t", spark=spark)
        assert t.identifier_field_names() == ["id"]


def test_explain_passes_through(spark, cat):
    """EXPLAIN works for free: identifiers rewrite anywhere in the
    text, Spark owns the statement."""
    eng = IceSqlEngine(spark, cat)
    plan = eng.sql("EXPLAIN SELECT count(*) FROM ice.db.t "
                   "WHERE id > 1").collect()[0][0]
    assert "Physical Plan" in plan


class TestSqlBranchSuffix:
    """r15: `<table>.branch_<name>` targets (the Spark-Iceberg suffix
    convention) — DML commits to the branch, reads bind its head, main
    is untouched (the WAP shape through plain SQL)."""

    def test_branch_dml_and_read(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t CREATE BRANCH audit")
        eng.sql("INSERT INTO ice.db.t.branch_audit VALUES (900, 'staged')")
        eng.sql("DELETE FROM ice.db.t.branch_audit WHERE id = 0")
        eng.sql("UPDATE ice.db.t.branch_audit SET data = upper(data) "
                "WHERE id = 1")
        eng.sql("""
            MERGE INTO ice.db.t.branch_audit t
            USING (SELECT 2 AS id, 'm' AS d) s ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET data = s.d
        """)
        # the branch sees all four statements...
        got = {r["id"]: r["data"] for r in eng.sql(
            "SELECT * FROM ice.db.t.branch_audit").collect()}
        assert got[900] == "staged" and 0 not in got
        assert got[1] == "V1" and got[2] == "m"
        # ...main saw none of it
        main = {r["id"]: r["data"]
                for r in eng.sql("SELECT * FROM ice.db.t").collect()}
        assert 900 not in main and main[0] == "v0" and main[1] == "v1"
        # suffix and VERSION AS OF 'name' agree
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t "
                       "VERSION AS OF 'audit'").collect()[0]["n"] == \
            eng.sql("SELECT count(*) AS n FROM ice.db.t.branch_audit"
                    ).collect()[0]["n"]

    def test_unknown_branch_is_loud(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="no such branch"):
            eng.sql("SELECT * FROM ice.db.t.branch_nope")
        # a real table named like the suffix wins over the convention
        cat.create_table("db.branch_x", _schema())
        tt = cat.load_table("db.branch_x", spark=spark)
        tt.append(spark.createDataFrame([(1, "real")],
                                        "id long, data string"))
        assert eng.sql("SELECT data FROM ice.db.branch_x") \
            .collect()[0]["data"] == "real"

    def test_write_to_unknown_branch_is_loud(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="no such branch"):
            eng.sql("INSERT INTO ice.db.t.branch_typo VALUES (1, 'x')")

    def test_fast_forward_publishes_branch(self, spark, cat):
        """Stage on a branch, audit, publish: CALL fast_forward moves
        main to the branch head iff main is its ancestor."""
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t CREATE BRANCH stage")
        eng.sql("INSERT INTO ice.db.t.branch_stage VALUES (901, 'wap')")
        assert eng.sql("SELECT * FROM ice.db.t WHERE id = 901") \
            .count() == 0
        row = eng.sql("CALL ice.system.fast_forward(table => 'db.t', "
                      "branch => 'main', to => 'stage')").collect()[0]
        assert row["branch_updated"] == "main"
        assert eng.sql("SELECT data FROM ice.db.t WHERE id = 901") \
            .collect()[0]["data"] == "wap"
        # DIVERGED refs refuse in both directions: advance each ref
        # past the common head independently
        eng.sql("INSERT INTO ice.db.t VALUES (902, 'ahead')")
        eng.sql("INSERT INTO ice.db.t.branch_stage VALUES (903, 'side')")
        for br, to in (("main", "stage"), ("stage", "main")):
            with pytest.raises(ValueError, match="not an ancestor"):
                eng.sql(f"CALL ice.system.fast_forward(table => 'db.t', "
                        f"branch => '{br}', to => '{to}')")
        with pytest.raises(ValueError, match="no such ref"):
            eng.sql("CALL ice.system.fast_forward(table => 'db.t', "
                    "branch => 'main', to => 'nope')")


class TestReviewRegressionPins:
    """r15 review findings, pinned: CASE WHEN inside MERGE clauses,
    identifier/default invariants, partition-name collisions, branch
    TRUNCATE, malformed ORDERED BY entries."""

    def test_case_when_inside_merge_clauses(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("""
            MERGE INTO ice.db.t t USING (
                SELECT * FROM VALUES (1, 'A'), (2, 'B') AS v(id, op)
            ) s ON t.id = s.id
            WHEN MATCHED AND CASE WHEN s.op = 'A' THEN true
                                  ELSE false END THEN
                UPDATE SET data = CASE WHEN s.op = 'A' THEN 'hit'
                                       ELSE 'miss' END
        """)
        rows = {r["id"]: r["data"]
                for r in eng.sql("SELECT * FROM ice.db.t").collect()}
        assert rows[1] == "hit" and rows[2] == "v2"  # clause 1 only

    def test_identifier_field_cannot_go_nullable(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t SET IDENTIFIER FIELDS id")
        with pytest.raises(ValueError, match="identifier field"):
            eng.sql("ALTER TABLE ice.db.t ALTER COLUMN id DROP NOT NULL")

    def test_default_must_cast_to_column_type(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="does not cast"):
            eng.sql("ALTER TABLE ice.db.t ALTER COLUMN id "
                    "SET DEFAULT 'lots'")

    def test_partition_field_name_collision(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t ADD PARTITION FIELD bucket(4, id)")
        with pytest.raises(ValueError, match="name collision"):
            eng.sql("ALTER TABLE ice.db.t "
                    "ADD PARTITION FIELD bucket(8, id)")

    def test_truncate_branch_suffix(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("ALTER TABLE ice.db.t CREATE BRANCH wip")
        eng.sql("TRUNCATE TABLE ice.db.t.branch_wip")
        assert eng.sql("SELECT * FROM ice.db.t.branch_wip").count() == 0
        assert eng.sql("SELECT * FROM ice.db.t").count() == 6

    def test_malformed_ordered_by_is_loud(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="ORDERED BY entry"):
            eng.sql("ALTER TABLE ice.db.t WRITE ORDERED BY id,")


def test_create_and_drop_namespace(spark, cat):
    eng = IceSqlEngine(spark, cat)
    eng.sql("CREATE NAMESPACE ice.db2")
    assert cat.namespace_exists("db2")
    eng.sql("CREATE NAMESPACE IF NOT EXISTS ice.db2")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE NAMESPACE ice.db2")
    eng.sql("CREATE TABLE ice.db2.t2 (id BIGINT)")
    with pytest.raises(ValueError, match="not empty"):
        eng.sql("DROP NAMESPACE ice.db2")
    # plain DROP keeps the data dir (Iceberg convention); PURGE removes
    eng.sql("DROP TABLE ice.db2.t2 PURGE")
    eng.sql("DROP NAMESPACE ice.db2")
    assert not cat.namespace_exists("db2")
    eng.sql("DROP NAMESPACE IF EXISTS ice.db2")
    with pytest.raises(ValueError, match="no such namespace"):
        eng.sql("DROP NAMESPACE ice.db2")


def test_delete_where_in_subquery(spark, cat):
    """DELETE ... WHERE col IN (SELECT ...) maps onto the delete-only
    MERGE: keyed discovery stays the semi-join, untouched files are
    carried, and duplicate/NULL subquery keys behave like SQL IN."""
    eng = IceSqlEngine(spark, cat)
    eng.sql("DELETE FROM ice.db.t WHERE id IN "
            "(SELECT id FROM ice.db.dim WHERE data = 'odd')")
    assert sorted(r["id"] for r in
                  eng.sql("SELECT id FROM ice.db.t").collect()) == \
        [0, 2, 3, 4, 5]
    # qualified column + duplicates + NULLs in the subquery
    eng.sql("DELETE FROM ice.db.t WHERE t.id IN (SELECT x FROM VALUES "
            "(2), (2), (CAST(NULL AS BIGINT)) AS v(x))")
    assert sorted(r["id"] for r in
                  eng.sql("SELECT id FROM ice.db.t").collect()) == \
        [0, 3, 4, 5]
    with pytest.raises(ValueError, match="one-column"):
        eng.sql("DELETE FROM ice.db.t WHERE id IN "
                "(SELECT id, data FROM ice.db.dim)")
    # general subquery predicates still refuse loudly (not prunable)
    with pytest.raises(ValueError):
        eng.sql("DELETE FROM ice.db.t WHERE EXISTS "
                "(SELECT 1 FROM ice.db.dim)")


def test_show_tblproperties(spark, cat):
    eng = IceSqlEngine(spark, cat)
    eng.sql("ALTER TABLE ice.db.t SET TBLPROPERTIES ('a.b' = 'c')")
    props = {r["key"]: r["value"] for r in
             eng.sql("SHOW TBLPROPERTIES ice.db.t").collect()}
    assert props["a.b"] == "c"


def test_update_where_in_subquery(spark, cat):
    eng = IceSqlEngine(spark, cat)
    eng.sql("UPDATE ice.db.t SET data = concat(data, '!') WHERE id IN "
            "(SELECT id FROM ice.db.dim)")
    rows = {r["id"]: r["data"]
            for r in eng.sql("SELECT * FROM ice.db.t").collect()}
    assert rows[0] == "v0!" and rows[1] == "v1!" and rows[2] == "v2"
    with pytest.raises(ValueError, match="one-column"):
        eng.sql("UPDATE ice.db.t SET data = 'x' WHERE id IN "
                "(SELECT id, data FROM ice.db.dim)")


class TestSecondReviewPins:
    """Second-review findings (r15): subquery-DML edges + REST drop."""

    def test_update_in_subquery_key_ref_and_duplicates(self, spark, cat):
        # duplicate subquery keys must NOT duplicate target rows, and
        # SET values may reference the key column bare
        eng = IceSqlEngine(spark, cat)
        eng.sql("UPDATE ice.db.t SET data = concat('k', cast(id AS "
                "string)) WHERE id IN (SELECT x FROM VALUES (2), (2) "
                "AS v(x))")
        rows = [(r["id"], r["data"]) for r in eng.sql(
            "SELECT * FROM ice.db.t WHERE id = 2").collect()]
        assert rows == [(2, "k2")]
        assert eng.sql("SELECT * FROM ice.db.t").count() == 6

    def test_compound_in_subquery_falls_through_loudly(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError):
            eng.sql("DELETE FROM ice.db.t WHERE id IN (SELECT id FROM "
                    "ice.db.dim) OR id IN (SELECT id FROM ice.db.dim)")

    def test_foreign_qualifier_falls_through(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        # bogus qualifier / nested path must NOT silently bind a
        # top-level column — the restricted parser refuses instead
        with pytest.raises(ValueError):
            eng.sql("DELETE FROM ice.db.t WHERE x.id IN "
                    "(SELECT id FROM ice.db.dim)")

    def test_backtick_namespace(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE NAMESPACE ice.`my-ns`")
        assert cat.namespace_exists("my-ns")
        eng.sql("DROP NAMESPACE ice.`my-ns`")
        assert not cat.namespace_exists("my-ns")


class TestSqlProceduresR15:
    """ancestors_of / register_table / add_files /
    create_changelog_view + SHOW PARTITIONS / SHOW VIEWS."""

    def test_ancestors_of(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("INSERT INTO ice.db.t VALUES (100, 'x')")
        rows = eng.sql(
            "CALL ice.system.ancestors_of(table => 'db.t')").collect()
        t = cat.load_table("db.t", spark=spark)
        assert [r["snapshot_id"] for r in rows][0] == \
            t.current_snapshot().snapshot_id
        assert len(rows) == 2  # fixture append + the INSERT
        assert rows[0]["timestamp_ms"] >= rows[1]["timestamp_ms"]
        older = rows[1]["snapshot_id"]
        got = eng.sql(f"CALL ice.system.ancestors_of(table => 'db.t', "
                      f"snapshot_id => {older})").collect()
        assert [r["snapshot_id"] for r in got] == [older]
        with pytest.raises(ValueError, match="snapshot not found"):
            eng.sql("CALL ice.system.ancestors_of(table => 'db.t', "
                    "snapshot_id => 12345)")

    def test_register_table(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        got = eng.sql(
            f"CALL ice.system.register_table(table => 'db.t2', "
            f"metadata_file => '{t.metadata_location}')").collect()[0]
        assert got["current_snapshot_id"] == \
            t.current_snapshot().snapshot_id
        assert got["total_records_count"] == 6
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t2") \
            .collect()[0]["n"] == 6
        with pytest.raises(ValueError, match="already exists"):
            eng.sql(f"CALL ice.system.register_table(table => 'db.t', "
                    f"metadata_file => '{t.metadata_location}')")

    def test_add_files(self, spark, cat, tmp_loc):
        src = f"{tmp_loc}/loose"
        spark.range(4).select(
            F.col("id"), F.lit("ext").alias("data")) \
            .repartition(2).write.parquet(src)
        eng = IceSqlEngine(spark, cat)
        got = eng.sql(f"CALL ice.system.add_files(table => 'db.t', "
                      f"source => '{src}')").collect()[0]
        assert got["added_files_count"] >= 1
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t") \
            .collect()[0]["n"] == 10
        import os as _os
        empty = f"{tmp_loc}/empty_dir"
        _os.makedirs(empty, exist_ok=True)
        with pytest.raises(ValueError, match="no files"):
            eng.sql(f"CALL ice.system.add_files(table => 'db.t', "
                    f"source => '{empty}')")

    def test_create_changelog_view(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        first = t.current_snapshot().snapshot_id
        eng.sql("INSERT INTO ice.db.t VALUES (100, 'x')")
        eng.sql("DELETE FROM ice.db.t WHERE id = 0")
        name = eng.sql(
            f"CALL ice.system.create_changelog_view(table => 'db.t', "
            f"changelog_view => 'tchg', start_snapshot_id => {first})"
        ).collect()[0]["changelog_view"]
        assert name == "tchg"
        # the view OUTLIVES the CALL statement and is plain-SQL
        # queryable in the session
        got = {(r["_change_type"], r["id"]) for r in spark.sql(
            "SELECT _change_type, id FROM tchg").collect()}
        assert ("insert", 100) in got
        assert ("delete", 0) in got
        spark.catalog.dropTempView("tchg")
        # default view name: <table>_changes
        name = eng.sql(
            "CALL ice.system.create_changelog_view(table => 'db.t')"
        ).collect()[0]["changelog_view"]
        assert name == "t_changes"
        assert spark.sql("SELECT count(*) AS n FROM t_changes") \
            .collect()[0]["n"] > 0
        spark.catalog.dropTempView("t_changes")

    def test_show_partitions(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        # unpartitioned: per-spec rollup rows, no partition column
        got = eng.sql("SHOW PARTITIONS ice.db.t").collect()
        assert sum(r["record_count"] for r in got) == 6
        assert "partition" not in got[0].asDict()
        eng.sql("CREATE TABLE ice.db.pt PARTITIONED BY "
                "(bucket(4, id)) AS SELECT id, data FROM ice.db.t")
        rows = eng.sql("SHOW PARTITIONS ice.db.pt").collect()
        assert sum(r["record_count"] for r in rows) == 6
        assert len(rows) >= 2  # 6 ids over 4 buckets
        assert all(r["partition"]["id_bucket"] is not None
                   for r in rows)

    def test_show_views(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        assert eng.sql("SHOW VIEWS IN ice.db").collect() == []
        eng.sql("CREATE VIEW ice.db.v AS SELECT id FROM ice.db.t")
        vs = eng.sql("SHOW VIEWS IN ice.db").collect()
        assert [(r["namespace"], r["viewName"]) for r in vs] == \
            [("db", "v")]
        # unscoped: walks every namespace
        vs = eng.sql("SHOW VIEWS IN ice").collect()
        assert [r["viewName"] for r in vs] == ["v"]

    def test_procedures_refuse_in_txn(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        txn = t.new_transaction()
        with pytest.raises(ValueError, match="cannot run inside"):
            eng.sql("CALL ice.system.register_table(table => 'db.t3', "
                    f"metadata_file => '{t.metadata_location}')",
                    txn=txn)


class TestSqlProcedureReviewPins:
    """Review findings on the r15 procedure batch: hidden-path
    add_files leak, register_table poisoning, nested-namespace SHOW."""

    def test_add_files_skips_hidden_path_components(self, spark, cat,
                                                    tmp_loc):
        import os as _os
        src = f"{tmp_loc}/loose2"
        spark.range(3).select(
            F.col("id"), F.lit("ok").alias("data")) \
            .coalesce(1).write.parquet(src)
        # simulate a crashed write: a valid parquet under _temporary
        # must NOT register (only dot-prefixed names are hidden to
        # glob; every path component must be checked)
        stale_dir = f"{src}/_temporary/0"
        _os.makedirs(stale_dir, exist_ok=True)
        spark.range(100, 103).select(
            F.col("id"), F.lit("stale").alias("data")) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{stale_dir}/task")
        eng = IceSqlEngine(spark, cat)
        eng.sql(f"CALL ice.system.add_files(table => 'db.t', "
                f"source => '{src}')")
        got = eng.sql("SELECT count(*) AS n FROM ice.db.t "
                      "WHERE data = 'stale'").collect()[0]["n"]
        assert got == 0
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t") \
            .collect()[0]["n"] == 9  # 6 fixture + 3 imported

    def test_register_table_bad_path_leaves_no_entry(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        with pytest.raises(ValueError, match="cannot read"):
            eng.sql("CALL ice.system.register_table(table => 'db.r2', "
                    "metadata_file => '/nope/v1.metadata.json')")
        assert not cat.table_exists("db.r2")  # not poisoned
        t = cat.load_table("db.t", spark=spark)
        eng.sql(f"CALL ice.system.register_table(table => 'db.r2', "
                f"metadata_file => '{t.metadata_location}')")
        assert eng.sql("SELECT count(*) AS n FROM ice.db.r2") \
            .collect()[0]["n"] == 6

    def test_show_walks_nested_namespaces(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        cat.create_namespace("db.inner")
        cat.create_table("db.inner.t2", _schema())
        eng.sql("CREATE VIEW ice.db.inner.v2 AS "
                "SELECT id FROM ice.db.t")
        tabs = {(r["namespace"], r["tableName"]) for r in
                eng.sql("SHOW TABLES IN ice").collect()}
        assert ("db.inner", "t2") in tabs and ("db", "t") in tabs
        views = {(r["namespace"], r["viewName"]) for r in
                 eng.sql("SHOW VIEWS IN ice").collect()}
        assert views == {("db.inner", "v2")}

    def test_add_files_glob_source_skips_hidden(self, spark, cat,
                                                tmp_loc):
        import os as _os
        src = f"{tmp_loc}/gsrc"
        spark.range(2).select(
            F.col("id"), F.lit("g").alias("data")) \
            .coalesce(1).write.parquet(src)
        stale = f"{src}/_temporary/1"
        _os.makedirs(stale, exist_ok=True)
        spark.range(500, 502).select(
            F.col("id"), F.lit("stale").alias("data")) \
            .coalesce(1).write.mode("overwrite").parquet(f"{stale}/t")
        eng = IceSqlEngine(spark, cat)
        # GLOB form: hidden components below the static prefix must
        # still be excluded
        eng.sql(f"CALL ice.system.add_files(table => 'db.t', "
                f"source => '{src}/**/*.parquet')")
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t "
                       "WHERE data = 'stale'").collect()[0]["n"] == 0
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t "
                       "WHERE data = 'g'").collect()[0]["n"] == 2


class TestAllMetadataTables:
    """all_files / all_manifests / all_entries / metadata_log_entries:
    history-wide metadata tables (manifest-path-deduped, the Iceberg
    all_* convention) bound by SQL suffix."""

    def test_all_files_sees_dropped_history(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        live_before = {r["file_path"] for r in t.files_df().collect()}
        # CoW delete rewrites files: current `files` shrinks to the
        # new set, `all_files` still lists the dropped originals
        eng.sql("DELETE FROM ice.db.t WHERE id <= 1")
        t = cat.load_table("db.t", spark=spark)
        live = {r["file_path"] for r in t.files_df().collect()}
        all_rows = {r["file_path"]
                    for r in t.all_files_df().collect()}
        assert live_before - live  # something was dropped
        assert (live_before | live) <= all_rows
        # SQL suffix binding, composable with aggregation
        n = eng.sql("SELECT count(DISTINCT file_path) AS n "
                    "FROM ice.db.t.all_files").collect()[0]["n"]
        assert n == len(all_rows)

    def test_all_manifests_and_entries(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        eng.sql("INSERT INTO ice.db.t VALUES (50, 'x')")
        t = cat.load_table("db.t", spark=spark)
        rows = t.all_manifests_df().select(
            "manifest_path", "reference_snapshot_id").collect()
        sids = {r["reference_snapshot_id"] for r in rows}
        assert sids == {s.snapshot_id for s in t.metadata.snapshots}
        # all_entries >= entries (history includes superseded rows)
        n_all = eng.sql("SELECT count(*) AS n FROM "
                        "ice.db.t.all_entries").collect()[0]["n"]
        n_cur = eng.sql("SELECT count(*) AS n FROM "
                        "ice.db.t.entries").collect()[0]["n"]
        assert n_all >= n_cur > 0

    def test_metadata_log_entries(self, spark, cat):
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        rows = eng.sql("SELECT * FROM ice.db.t.metadata_log_entries "
                       "ORDER BY timestamp_ms").collect()
        assert rows[-1]["file"] == t.metadata_location
        assert len(rows) == len(t.metadata.metadata_log) + 1

    def test_position_deletes_table(self, spark, cat):
        from iceberg_cpp_spark.plans import expressions as ex

        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        # empty before any MoR delete
        assert t.position_deletes_df().count() == 0
        t = t.delete_where(ex.eq(ex.Reference("id"), 2),
                           mode="merge-on-read")
        rows = eng.sql("SELECT * FROM ice.db.t.position_deletes "
                       "ORDER BY file_path, pos").collect()
        assert len(rows) == 1
        assert rows[0]["delete_file_path"].endswith(".parquet")
        # DV leg: fold the parquet delete into a deletion vector —
        # same logical rows, now decoded from the puffin pointer
        t = t.rewrite_position_deletes()
        rows = eng.sql("SELECT * FROM ice.db.t.position_deletes "
                       "ORDER BY file_path, pos").collect()
        assert len(rows) == 1
        assert rows[0]["delete_file_path"].endswith(".puffin")
        # the deleted row's file/pos pair is consistent across legs
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t "
                       "WHERE id = 2").collect()[0]["n"] == 0

    def test_all_entries_inheritance_and_avro(self, spark, cat):
        from iceberg_cpp_spark.plans import expressions as ex

        # commit_files_df shards store NULL snapshot/sequence; the
        # all_entries rows must inherit from the manifest-list row
        t = cat.load_table("db.t", spark=spark)
        import pyarrow as pa
        import pyarrow.parquet as pq
        p = f"{t.location()}/ext0.parquet"
        pq.write_table(pa.table({
            "id": pa.array([900], pa.int64()),
            "data": pa.array(["x"])}), p)
        desc = spark.createDataFrame(
            [(p, 1, 300)], "file_path string, record_count long, "
                           "file_size_in_bytes long")
        t = t.commit_files_df(desc)
        sid = t.current_snapshot().snapshot_id
        row = [r for r in t.all_entries_df().collect()
               if r["file_path"] == p]
        assert row and row[0]["snapshot_id"] == sid
        assert row[0]["sequence_number"] == \
            t.current_snapshot().sequence_number
        # Avro-manifest table: all_* must not hit the parquet reader
        cat.create_table("db.av", it.Schema([
            it.NestedField(1, "id", it.LongType(), True)]),
            properties={"write.metadata.manifest-format": "avro"})
        ta = cat.load_table("db.av", spark=spark)
        ta.append(spark.range(3).select("id"))
        ta = cat.load_table("db.av", spark=spark)
        assert ta.all_manifests_df().count() >= 1
        assert ta.all_entries_df().count() == \
            ta.all_files_df().count() >= 1

    def test_position_deletes_joins_files(self, spark, cat):
        from iceberg_cpp_spark.plans import expressions as ex

        t = cat.load_table("db.t", spark=spark)
        t = t.delete_where(ex.eq(ex.Reference("id"), 4),
                           mode="merge-on-read")
        # delete_file_path is the plain path form the manifests store
        pd_df = t.position_deletes_df()
        del_paths = {r["delete_file_path"] for r in pd_df.collect()}
        mf_paths = {r["file_path"] for r in t.files_df().collect()
                    if r["content"] != 0}
        assert del_paths and del_paths <= mf_paths

    def test_rollback_to_timestamp_and_set_current(self, spark, cat):
        from datetime import datetime, timezone

        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        first = t.current_snapshot()
        eng.sql("INSERT INTO ice.db.t VALUES (100, 'x')")
        t = cat.load_table("db.t", spark=spark)
        second = t.current_snapshot().snapshot_id
        # a timestamp between the two commits rolls back to the first
        ts = datetime.fromtimestamp(
            (first.timestamp_ms + 1) / 1000.0,
            tz=timezone.utc).isoformat()
        got = eng.sql(f"CALL ice.system.rollback_to_timestamp("
                      f"table => 'db.t', timestamp => '{ts}')"
                      ).collect()[0]
        assert got["current_snapshot_id"] == first.snapshot_id
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t"
                       ).collect()[0]["n"] == 6
        # roll FORWARD again (not an ancestor move: set_current)
        got = eng.sql(f"CALL ice.system.set_current_snapshot("
                      f"table => 'db.t', snapshot_id => {second})"
                      ).collect()[0]
        assert got["current_snapshot_id"] == second
        assert eng.sql("SELECT count(*) AS n FROM ice.db.t"
                       ).collect()[0]["n"] == 7
        with pytest.raises(ValueError, match="no snapshot at or"):
            eng.sql("CALL ice.system.rollback_to_timestamp("
                    "table => 'db.t', "
                    "timestamp => '1990-01-01T00:00:00')")

    def test_files_manifests_df_avro_and_empty(self, spark, cat):
        # empty table: files_df returns the fixed reduced schema so
        # the same query is valid before and after the first commit
        cat.create_table("db.e2", _schema())
        te = cat.load_table("db.e2", spark=spark)
        assert te.files_df().filter("content != 0").count() == 0
        assert te.manifests_df().count() == 0
        # Avro-metadata table: files/manifests must not hit the
        # parquet reader, and live counts match the scan
        cat.create_table("db.av2", _schema(), properties={
            "write.metadata.manifest-format": "avro"})
        ta = cat.load_table("db.av2", spark=spark)
        ta.append(spark.range(4).select(
            F.col("id"), F.lit("v").alias("data")))
        ta = cat.load_table("db.av2", spark=spark)
        assert ta.files_df().count() == \
            len(ta.scan().plan_files())
        assert ta.manifests_df().count() >= 1
        assert {r["content"] for r in ta.files_df().collect()} == {0}

    def test_rollback_to_timestamp_ignores_staged(self, spark, cat):
        from datetime import datetime, timezone

        # a NEWER snapshot on a side branch must not win max(): the
        # ancestry-scoped candidate set picks main's own lineage
        eng = IceSqlEngine(spark, cat)
        t = cat.load_table("db.t", spark=spark)
        head = t.current_snapshot()
        t.create_branch("stage")
        t.append(spark.createDataFrame([(500, "staged")],
                                       "id long, data string"),
                 branch="stage")
        t = cat.load_table("db.t", spark=spark)
        staged_ts = max(s.timestamp_ms for s in t.metadata.snapshots)
        ts = datetime.fromtimestamp(
            (staged_ts + 1000) / 1000.0, tz=timezone.utc).isoformat()
        got = eng.sql(f"CALL ice.system.rollback_to_timestamp("
                      f"table => 'db.t', timestamp => '{ts}')"
                      ).collect()[0]
        assert got["current_snapshot_id"] == head.snapshot_id
