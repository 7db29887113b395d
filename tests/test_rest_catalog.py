"""REST catalog client ↔ conformance server (reference pairing:
catalog/rest_catalog + test/rest_catalog_test.cc). The commit path is
the real REST model: requirements + synthesized update actions POSTed,
server re-applies through TableMetadataBuilder, 409 on conflicts."""

import os

import pytest

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.sources.catalog import (
    AlreadyExistsError,
    CommitFailedError,
    NoSuchTableError,
)
from iceberg_cpp_spark.sources.rest_catalog import (
    RestCatalog,
    serve_rest_catalog,
    synthesize_updates,
)

SCHEMA = it.Schema([
    it.NestedField(1, "id", it.LongType(), required=True),
    it.NestedField(2, "name", it.StringType()),
])


@pytest.fixture()
def rest(tmp_loc):
    server, uri = serve_rest_catalog()
    yield RestCatalog(uri), tmp_loc
    server.shutdown()


class TestNamespaces:
    def test_crud(self, rest):
        cat, _ = rest
        cat.create_namespace("db", {"owner": "tests"})
        assert cat.namespace_exists("db")
        assert cat.list_namespaces() == ["db"]
        assert cat.get_namespace_properties("db") == {"owner": "tests"}
        cat.update_namespace_properties("db", {"x": "1"}, removals=["owner"])
        assert cat.get_namespace_properties("db") == {"x": "1"}
        with pytest.raises(AlreadyExistsError):
            cat.create_namespace("db")
        cat.drop_namespace("db")
        assert not cat.namespace_exists("db")


class TestTables:
    def test_create_load_list_drop(self, rest):
        cat, loc = rest
        cat.create_namespace("db")
        cat.create_table("db.t", SCHEMA, location=os.path.join(loc, "t"))
        assert cat.table_exists("db.t")
        assert cat.list_tables("db") == ["db.t"]
        meta, mloc = cat.load_metadata("db.t")
        assert meta.schema() == SCHEMA
        assert "v1.metadata.json" in mloc
        cat.drop_table("db.t")
        with pytest.raises(NoSuchTableError):
            cat.load_metadata("db.t")

    def test_commit_via_rest_updates(self, spark, rest, lineitem):
        """Full engine flow: create through the catalog, append twice,
        delete — every commit travels as REST updates; reads come back
        from server-held metadata."""
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        cat, loc = rest
        cat.create_namespace("db")
        li = lineitem.limit(300)
        cat.create_table("db.li", schema_from_spark(li.schema),
                         location=os.path.join(loc, "li"))
        t = cat.load_table("db.li", spark=spark)
        t.append(li.limit(200))
        t.append(li.subtract(li.limit(200)).limit(100))
        # a fresh client sees the committed state
        t2 = cat.load_table("db.li", spark=spark)
        assert t2.to_df().count() == 300
        assert len(t2.metadata.snapshots) == 2
        t2.delete_where(ex.gt(ex.Reference("l_quantity"), 40.0),
                        mode="deletion-vector")
        assert cat.load_table("db.li", spark=spark).to_df().count() == \
            li.filter("l_quantity <= 40").count()

    def test_conflict_is_409_and_retry_rebases(self, spark, rest, lineitem):
        """Two stale clients: the engine's commit retry refreshes and
        rebases, so BOTH appends land (second not lost, no error)."""
        from iceberg_cpp_spark.core.types import schema_from_spark

        cat, loc = rest
        cat.create_namespace("db")
        li = lineitem.limit(100)
        cat.create_table("db.c", schema_from_spark(li.schema),
                         location=os.path.join(loc, "c"))
        a = cat.load_table("db.c", spark=spark)
        b = cat.load_table("db.c", spark=spark)
        a.append(li.limit(60))
        b.append(li.subtract(li.limit(60)).limit(40))  # stale base -> 409 -> rebase
        assert cat.load_table("db.c", spark=spark).to_df().count() == 100

    def test_multi_snapshot_transaction_via_rest(self, spark, rest,
                                                 lineitem):
        """A multi-action Transaction publishes a CHAIN of snapshots in
        one REST commit — synthesize_updates must emit one add-snapshot
        per pending snapshot (sequence-ordered) plus the ref move, and
        the server-applied result must match the working state."""
        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.plans import expressions as ex

        cat, loc = rest
        cat.create_namespace("db")
        li = lineitem.limit(100)
        cat.create_table("db.tx", schema_from_spark(li.schema),
                         location=os.path.join(loc, "tx"))
        t = cat.load_table("db.tx", spark=spark)
        t = t.append(li.limit(40))
        txn = t.new_transaction()
        txn.append(li.subtract(li.limit(40)).limit(30))
        txn.delete_where(ex.gt(ex.Reference("l_quantity"), 45.0))
        txn.update_properties({"txn.rest": "yes"})
        out = txn.commit()
        fresh = cat.load_table("db.tx", spark=spark)
        assert len(fresh.metadata.snapshots) == 3  # base + 2 txn snaps
        assert fresh.to_df().count() == out.to_df().count()
        assert fresh.properties()["txn.rest"] == "yes"
        want = li.limit(40).unionByName(
            li.subtract(li.limit(40)).limit(30)).filter(
            "l_quantity <= 45.0").count()
        assert fresh.to_df().count() == want

    def test_register_table(self, spark, rest, lineitem):
        from iceberg_cpp_spark import IceTable
        from iceberg_cpp_spark.core.types import schema_from_spark

        cat, loc = rest
        cat.create_namespace("db")
        li = lineitem.limit(50)
        t = IceTable.create(spark, os.path.join(loc, "ext"),
                            schema_from_spark(li.schema))
        t.append(li)
        cat.register_table("db.ext", t.metadata_location)
        assert cat.load_table("db.ext", spark=spark).to_df().count() == 50


class TestSynthesizeUpdates:
    def test_diff_covers_commit_shapes(self, rest):
        import dataclasses

        from iceberg_cpp_spark.core import updates as up

        cat, loc = rest
        cat.create_namespace("db")
        base = cat.create_table("db.s", SCHEMA, location=os.path.join(loc, "s"))
        new = dataclasses.replace(
            base, properties={**base.properties, "k": "v"},
            default_sort_order_id=base.default_sort_order_id)
        ups = synthesize_updates(base, new)
        assert any(isinstance(u, up.SetProperties) for u in ups)
        # round-trips through the wire format
        for u in ups:
            assert up.update_from_json(up.update_to_json(u)).action == u.action

    def test_diff_carries_ref_retention(self, rest):
        """A retention-policy edit on an UNMOVED ref must synthesize a
        set-snapshot-ref action that carries the retention fields
        through the wire format — the REST spec's SetSnapshotRefUpdate
        optional fields (dropping them would silently reset branch
        retention on every REST commit)."""
        import dataclasses

        from iceberg_cpp_spark.core import updates as up
        from iceberg_cpp_spark.core.metadata import Snapshot, SnapshotRef

        cat, loc = rest
        cat.create_namespace("dbr")
        base = cat.create_table("dbr.s", SCHEMA,
                                location=os.path.join(loc, "rr"))
        snap = Snapshot(snapshot_id=7, sequence_number=1, timestamp_ms=1,
                        manifest_list="/x/ml.avro",
                        summary={"operation": "append"})
        ref = SnapshotRef(7, type="branch", min_snapshots_to_keep=4,
                          max_snapshot_age_ms=1000, max_ref_age_ms=2000)
        with_ref = dataclasses.replace(
            base, snapshots=[snap], refs={"audit": ref})
        ups = synthesize_updates(base, with_ref)
        sets = [u for u in ups if isinstance(u, up.SetSnapshotRef)]
        assert len(sets) == 1 and sets[0].min_snapshots_to_keep == 4
        wire = up.update_from_json(up.update_to_json(sets[0]))
        assert (wire.min_snapshots_to_keep, wire.max_snapshot_age_ms,
                wire.max_ref_age_ms) == (4, 1000, 2000)
        # retention-only edit (same snapshot) still diffs
        relaxed = dataclasses.replace(
            with_ref, refs={"audit": dataclasses.replace(
                ref, min_snapshots_to_keep=9)})
        again = [u for u in synthesize_updates(with_ref, relaxed)
                 if isinstance(u, up.SetSnapshotRef)]
        assert len(again) == 1 and again[0].min_snapshots_to_keep == 9

    def test_diff_covers_partition_statistics(self, rest):
        """A REST-committed compute_partition_statistics must not lose
        its pointer: the base→new diff synthesizes set/remove
        partition-statistics actions symmetrically with table stats."""
        import dataclasses

        from iceberg_cpp_spark.core import updates as up

        cat, loc = rest
        cat.create_namespace("dbp")
        base = cat.create_table("dbp.s", SCHEMA,
                                location=os.path.join(loc, "ps"))
        entry = {"snapshot-id": 42, "statistics-path": "/x/ps.parquet",
                 "file-size-in-bytes": 10}
        sentry = {"snapshot-id": 42, "statistics-path": "/x/s.puffin",
                  "file-size-in-bytes": 11, "file-footer-size-in-bytes": 0,
                  "blob-metadata": []}
        new = dataclasses.replace(base, partition_statistics=[entry],
                                  statistics=[sentry])
        ups = synthesize_updates(base, new)
        assert any(isinstance(u, up.SetPartitionStatistics) and
                   u.partition_statistics == entry for u in ups)
        assert any(isinstance(u, up.SetStatistics) for u in ups)
        for u in ups:
            assert up.update_from_json(up.update_to_json(u)).action == u.action
        # removal direction
        back = synthesize_updates(new, base)
        assert any(isinstance(u, up.RemovePartitionStatistics) and
                   u.snapshot_id == 42 for u in back)


class TestPagination:
    """REST spec pagination (pageToken / pageSize / next-page-token) on
    the list endpoints — a 10^5-table namespace never arrives as one
    response body; the client drains pages transparently."""

    def test_paged_listing_server_and_client(self):
        from iceberg_cpp_spark.core import types as it
        from iceberg_cpp_spark.sources.rest_catalog import (
            RestCatalog, serve_rest_catalog)

        server, uri = serve_rest_catalog()
        try:
            cat = RestCatalog(uri)
            cat.create_namespace("ns")
            sch = it.Schema([it.NestedField(1, "x", it.LongType(), True)])
            for i in range(7):
                cat.create_table(f"ns.t{i}", sch)
            # raw paged requests: 3 pages of <=3
            j1 = cat._request("GET", "/v1/namespaces/ns/tables?pageSize=3")
            assert len(j1["identifiers"]) == 3
            assert j1["next-page-token"] == "3"
            j2 = cat._request(
                "GET", "/v1/namespaces/ns/tables?pageSize=3&pageToken=3")
            assert len(j2["identifiers"]) == 3
            j3 = cat._request(
                "GET",
                f"/v1/namespaces/ns/tables?pageSize=3"
                f"&pageToken={j2['next-page-token']}")
            assert len(j3["identifiers"]) == 1
            assert "next-page-token" not in j3
            # client drains every page transparently (small page bound)
            cat.PAGE_SIZE = 2
            assert cat.list_tables("ns") == [f"ns.t{i}" for i in range(7)]
            # unpaged requests still return everything (pageSize absent)
            j = cat._request("GET", "/v1/namespaces/ns/tables")
            assert len(j["identifiers"]) == 7
            # views + namespaces use the same machinery
            cat.create_view("ns.v1", "SELECT 1 AS n", sch)
            cat.create_view("ns.v2", "SELECT 2 AS n", sch)
            assert cat.list_views("ns") == ["ns.v1", "ns.v2"]
            assert "ns" in cat.list_namespaces()
        finally:
            server.shutdown()


class TestSqlOverRest:
    """The SQL front end against the REST catalog: RENAME TO (the one
    statement FileSystemCatalog refuses — identifiers ARE directories
    there) plus the read/DML surface through a pointer-mapping
    catalog (r14)."""

    def test_rename_to_and_dml(self, rest, spark):
        from iceberg_cpp_spark import IceSqlEngine

        cat, loc = rest
        cat.create_namespace("db")
        cat.create_table("db.t", SCHEMA, location=os.path.join(loc, "t"))
        eng = IceSqlEngine(spark, cat)
        eng.sql("INSERT INTO ice.db.t VALUES (1, 'a'), (2, 'b')")
        eng.sql("DELETE FROM ice.db.t WHERE id = 1")
        eng.sql("ALTER TABLE ice.db.t RENAME TO ice.db.t2")
        assert not cat.table_exists("db.t")
        rows = eng.sql("SELECT id, name FROM ice.db.t2").collect()
        assert [(r["id"], r["name"]) for r in rows] == [(2, "b")]
        with pytest.raises(ValueError, match="no such table"):
            eng.sql("SELECT * FROM ice.db.t")

    def test_r15_statements_over_rest(self, rest, spark):
        """r15 surface through the pointer catalog: namespace DDL,
        txn-scoped SQL (one REST commit), branch staging + publish."""
        import os as _os

        from iceberg_cpp_spark import IceSqlEngine

        cat, loc = rest
        eng = IceSqlEngine(spark, cat)
        eng.sql("CREATE NAMESPACE ice.r15")
        assert cat.namespace_exists("r15")
        cat.create_table("r15.t", SCHEMA,
                         location=_os.path.join(loc, "r15t"))
        eng.sql("INSERT INTO ice.r15.t VALUES (1, 'a'), (2, 'b')")
        # txn: two statements, one REST commit
        t = cat.load_table("r15.t", spark=spark)
        txn = t.new_transaction()
        eng.sql("INSERT INTO ice.r15.t VALUES (3, 'c')", txn=txn)
        eng.sql("DELETE FROM ice.r15.t WHERE id = 1", txn=txn)
        txn.commit()
        assert sorted(r["id"] for r in eng.sql(
            "SELECT id FROM ice.r15.t").collect()) == [2, 3]
        # branch staging + fast_forward publish
        eng.sql("ALTER TABLE ice.r15.t CREATE BRANCH stage")
        eng.sql("INSERT INTO ice.r15.t.branch_stage VALUES (9, 'z')")
        assert eng.sql("SELECT * FROM ice.r15.t WHERE id = 9").count() == 0
        eng.sql("CALL ice.system.fast_forward(table => 'r15.t', "
                "branch => 'main', to => 'stage')")
        assert eng.sql("SELECT * FROM ice.r15.t WHERE id = 9").count() == 1
        # conditional-clause MERGE
        eng.sql("MERGE INTO ice.r15.t t USING (SELECT 9 AS id, 'D' AS op)"
                " s ON t.id = s.id WHEN MATCHED AND s.op = 'D' THEN DELETE")
        assert eng.sql("SELECT * FROM ice.r15.t WHERE id = 9").count() == 0
        # second-review pin: SQL DROP TABLE passes purge= — the REST
        # catalog must accept it (it crashed before the fix)
        eng.sql("DROP TABLE ice.r15.t")
        assert not cat.table_exists("r15.t")


class TestMultiTableTransaction:
    """Atomic cross-table commits through the REST CommitTransaction
    route: all tables move or none do."""

    @pytest.fixture()
    def two_tables(self, rest, spark):
        cat, loc = rest
        cat.create_namespace("db")
        cat.create_table("db.a", SCHEMA, location=os.path.join(loc, "a"))
        cat.create_table("db.b", SCHEMA, location=os.path.join(loc, "b"))
        for n in ("a", "b"):
            cat.load_table(f"db.{n}", spark=spark).append(
                spark.createDataFrame([(1, n)], "id long, name string"))
        return cat

    def test_atomic_cross_table_commit(self, rest, spark, two_tables):
        from iceberg_cpp_spark import MultiTableTransaction

        cat = two_tables
        mtx = MultiTableTransaction(cat)
        mtx.table("db.a", spark=spark)  # working view
        mtx.transaction("db.a", spark=spark).append(
            spark.createDataFrame([(2, "a2")], "id long, name string"))
        from iceberg_cpp_spark.plans import expressions as ex

        mtx.transaction("db.b", spark=spark).delete_where(
            ex.eq(ex.Reference("id"), 1))
        # pending chains invisible before commit
        assert cat.load_table("db.a", spark=spark).to_df().count() == 1
        assert cat.load_table("db.b", spark=spark).to_df().count() == 1
        # pending views visible through the txn
        assert mtx.table("db.a", spark=spark).to_df().count() == 2
        mtx.commit()
        assert cat.load_table("db.a", spark=spark).to_df().count() == 2
        assert cat.load_table("db.b", spark=spark).to_df().count() == 0
        with pytest.raises(ValueError, match="already committed"):
            mtx.commit()

    def test_conflict_fails_whole_batch_then_rebases(self, rest, spark,
                                                     two_tables):
        from iceberg_cpp_spark import MultiTableTransaction

        cat = two_tables
        mtx = MultiTableTransaction(cat)
        mtx.transaction("db.a", spark=spark).append(
            spark.createDataFrame([(2, "a2")], "id long, name string"))
        mtx.transaction("db.b", spark=spark).append(
            spark.createDataFrame([(2, "b2")], "id long, name string"))
        # concurrent writer moves db.b's head AFTER the txn opened:
        # the batch CAS fails once, every table rebases, retry lands
        cat.load_table("db.b", spark=spark).append(
            spark.createDataFrame([(9, "race")], "id long, name string"))
        mtx.commit()
        a = cat.load_table("db.a", spark=spark).to_df().count()
        b_rows = {r["id"] for r in cat.load_table("db.b", spark=spark)
                  .to_df().collect()}
        assert a == 2
        assert b_rows == {1, 2, 9}  # race row AND txn row both present

    def test_untouched_table_skips_rebase_on_sibling_conflict(
            self, rest, spark, two_tables):
        """A conflict on db.b must not re-author db.a's pending chain:
        db.a's head never moved, so its rebase is a no-op and the
        already-authored snapshot (id + manifest list) publishes as-is
        (VERDICT r15 item 7)."""
        from iceberg_cpp_spark import MultiTableTransaction

        cat = two_tables
        mtx = MultiTableTransaction(cat)
        mtx.transaction("db.a", spark=spark).append(
            spark.createDataFrame([(2, "a2")], "id long, name string"))
        mtx.transaction("db.b", spark=spark).append(
            spark.createDataFrame([(2, "b2")], "id long, name string"))
        pend_a = mtx.transaction("db.a", spark=spark).working.metadata
        a_sid = pend_a.current_snapshot_id
        a_mlist = pend_a.current_snapshot().manifest_list
        # concurrent writer races db.b ONLY
        cat.load_table("db.b", spark=spark).append(
            spark.createDataFrame([(9, "race")], "id long, name string"))
        mtx.commit()
        meta_a, _ = cat.load_metadata("db.a")
        assert meta_a.current_snapshot_id == a_sid
        assert meta_a.current_snapshot().manifest_list == a_mlist
        # and db.b both landed the race row and the txn row
        b_rows = {r["id"] for r in cat.load_table("db.b", spark=spark)
                  .to_df().collect()}
        assert b_rows == {1, 2, 9}

    def test_all_or_nothing_on_server(self, rest, spark, two_tables):
        # a requirement failure on ONE table must leave BOTH untouched:
        # drive the route directly with a stale snapshot assertion
        from iceberg_cpp_spark.sources.catalog import AssertRefSnapshotId

        cat = two_tables
        ma, _ = cat.load_metadata("db.a")
        mb, _ = cat.load_metadata("db.b")
        good_a = ma.current_snapshot_id
        with pytest.raises(CommitFailedError):
            cat.commit_transaction([
                ("db.a", [AssertRefSnapshotId("main", good_a)], ma),
                ("db.b", [AssertRefSnapshotId("main", -42)], mb),
            ])
        # nothing moved on either table
        assert cat.load_metadata("db.a")[0].current_snapshot_id == good_a
        assert cat.load_metadata("db.b")[0].current_snapshot_id == \
            mb.current_snapshot_id

    def test_filesystem_catalog_refuses(self, tmp_loc):
        from iceberg_cpp_spark import MultiTableTransaction
        from iceberg_cpp_spark.sources.catalog import FileSystemCatalog

        with pytest.raises(ValueError, match="multi-table"):
            MultiTableTransaction(FileSystemCatalog(f"{tmp_loc}/wh2"))

    def test_sql_across_tables_one_commit(self, rest, spark,
                                          two_tables):
        """eng.sql(stmt, txn=mtx): DML on DIFFERENT tables composes
        into ONE atomic REST commit; txn reads see pending chains."""
        from iceberg_cpp_spark import IceSqlEngine, MultiTableTransaction

        cat = two_tables
        eng = IceSqlEngine(spark, cat)
        mtx = MultiTableTransaction(cat)
        eng.sql("INSERT INTO ice.db.a VALUES (2, 'a2')", txn=mtx)
        eng.sql("DELETE FROM ice.db.b WHERE id = 1", txn=mtx)
        # pending visible inside the txn scope, invisible outside
        assert eng.sql("SELECT count(*) AS n FROM ice.db.a",
                       txn=mtx).collect()[0]["n"] == 2
        assert eng.sql("SELECT count(*) AS n FROM ice.db.a") \
            .collect()[0]["n"] == 1
        # a cross-table JOIN inside the scope reads both pending chains
        n = eng.sql("SELECT count(*) AS n FROM ice.db.a a "
                    "LEFT JOIN ice.db.b b ON a.id = b.id",
                    txn=mtx).collect()[0]["n"]
        assert n == 2
        mtx.commit()
        assert eng.sql("SELECT count(*) AS n FROM ice.db.a") \
            .collect()[0]["n"] == 2
        assert eng.sql("SELECT count(*) AS n FROM ice.db.b") \
            .collect()[0]["n"] == 0
        # DDL still refuses in txn scope
        mtx2 = MultiTableTransaction(cat)
        with pytest.raises(ValueError, match="cannot run inside"):
            eng.sql("DROP TABLE ice.db.b", txn=mtx2)

    def test_closed_mtx_refuses_reads_and_dml(self, rest, spark,
                                              two_tables):
        from iceberg_cpp_spark import IceSqlEngine, MultiTableTransaction

        cat = two_tables
        eng = IceSqlEngine(spark, cat)
        mtx = MultiTableTransaction(cat)
        eng.sql("INSERT INTO ice.db.a VALUES (2, 'a2')", txn=mtx)
        mtx.commit()
        # a committed handle must not serve stale working-chain reads
        with pytest.raises(ValueError, match="already committed"):
            eng.sql("SELECT * FROM ice.db.a", txn=mtx)
        with pytest.raises(ValueError, match="already committed"):
            eng.sql("INSERT INTO ice.db.a VALUES (3, 'x')", txn=mtx)

    def test_show_tables_no_duplicates_nested_rest(self, rest, spark):
        """RestCatalog.list_namespaces returns DESCENDANTS (not direct
        children) — the SHOW walk must still list each table once."""
        from iceberg_cpp_spark import IceSqlEngine

        cat, loc = rest
        cat.create_namespace("db")
        cat.create_namespace("db.inner")
        cat.create_table("db.t", SCHEMA, location=os.path.join(loc, "t"))
        cat.create_table("db.inner.t2", SCHEMA,
                         location=os.path.join(loc, "t2"))
        eng = IceSqlEngine(spark, cat)
        rows = [(r["namespace"], r["tableName"]) for r in
                eng.sql("SHOW TABLES IN ice").collect()]
        assert sorted(rows) == [("db", "t"), ("db.inner", "t2")]
