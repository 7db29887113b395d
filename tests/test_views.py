"""Iceberg View spec (v1) — versioned SQL views.

The reference has no view surface (its only 'view' hits are
std::string_view); iceberg_cpp_spark/views.py exceeds it with the
published View spec: spec metadata JSON, immutable versions with SQL
representations, version log, history trimming, CAS'd replace, view
time travel, and filesystem + REST catalog integration."""
import json
import os

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.sources.catalog import (AlreadyExistsError,
                                               CommitFailedError,
                                               FileSystemCatalog,
                                               NoSuchViewError)
from iceberg_cpp_spark.views import (IceView, SQLRepresentation,
                                     ViewMetadata, ViewVersion)


def _schema():
    return it.Schema([it.NestedField(1, "n", it.LongType(), True)],
                     schema_id=0)


class TestViewMetadata:
    def test_json_roundtrip(self, tmp_loc):
        v = IceView.create(f"{tmp_loc}/v", "SELECT 1 AS n", _schema(),
                           properties={"k": "1"})
        j = v.metadata.to_json()
        assert j["format-version"] == 1
        assert j["current-version-id"] == 1
        assert j["versions"][0]["representations"][0] == {
            "type": "sql", "sql": "SELECT 1 AS n", "dialect": "spark"}
        rt = ViewMetadata.from_json(json.loads(json.dumps(j)))
        assert rt.view_uuid == v.metadata.view_uuid
        assert rt.current_version().representations[0].sql == "SELECT 1 AS n"
        assert rt.properties == {"k": "1"}

    def test_unknown_format_version_raises(self):
        with pytest.raises(ValueError, match="format-version"):
            ViewMetadata.from_json({"format-version": 2})

    def test_history_trimming_keeps_recent_and_current(self, tmp_loc):
        v = IceView.create(f"{tmp_loc}/v", "SELECT 0 AS n", _schema(),
                           properties={"version.history.num-entries": "3"})
        for i in range(1, 7):
            v = v.replace(f"SELECT {i} AS n")
        ids = sorted(x.version_id for x in v.metadata.versions)
        assert ids == [5, 6, 7]          # most recent 3 of 7
        assert v.metadata.current_version_id == 7
        assert [e["version-id"] for e in v.metadata.version_log] == [5, 6, 7]

    def test_version_log_tracks_swaps(self, tmp_loc):
        v = IceView.create(f"{tmp_loc}/v", "SELECT 0 AS n", _schema())
        v = v.replace("SELECT 1 AS n")
        assert [e["version-id"] for e in v.metadata.version_log] == [1, 2]
        assert v.metadata.current_version().summary["operation"] == "replace"
        assert v.metadata.version_by_id(1).summary["operation"] == "create"


class TestViewFilesystemProtocol:
    def test_create_load_replace_time_travel(self, spark, tmp_loc):
        spark.range(6).createOrReplaceTempView("vt_base")
        v = IceView.create(f"{tmp_loc}/v",
                           "SELECT COUNT(*) AS n FROM vt_base", _schema())
        assert v.to_df(spark).collect()[0]["n"] == 6
        v = v.replace("SELECT COUNT(*) * 10 AS n FROM vt_base")
        assert v.to_df(spark).collect()[0]["n"] == 60
        assert v.to_df(spark, version_id=1).collect()[0]["n"] == 6
        loaded = IceView.load(f"{tmp_loc}/v")
        assert loaded.metadata.current_version_id == 2
        assert len(loaded.metadata.versions) == 2

    def test_concurrent_replace_cas(self, tmp_loc):
        v = IceView.create(f"{tmp_loc}/v", "SELECT 1 AS n", _schema())
        stale = IceView.load(f"{tmp_loc}/v")
        v.replace("SELECT 2 AS n")
        with pytest.raises((CommitFailedError, FileExistsError)):
            stale.replace("SELECT 3 AS n")
        assert IceView.load(f"{tmp_loc}/v").sql_for("spark") == "SELECT 2 AS n"

    def test_missing_dialect_raises(self, tmp_loc):
        v = IceView.create(f"{tmp_loc}/v", "SELECT 1", _schema(),
                           dialect="trino")
        with pytest.raises(ValueError, match="no 'spark' representation"):
            v.sql_for("spark")

    def test_replace_with_new_schema(self, tmp_loc):
        v = IceView.create(f"{tmp_loc}/v", "SELECT 1 AS n", _schema())
        sch2 = it.Schema([it.NestedField(1, "n", it.LongType(), True),
                          it.NestedField(2, "m", it.LongType(), True)])
        v = v.replace("SELECT 1 AS n, 2 AS m", schema=sch2)
        assert v.metadata.schema().field_by_name("m") is not None
        assert len(v.metadata.schemas) == 2

    def test_load_non_view_raises(self, tmp_loc):
        with pytest.raises(FileNotFoundError):
            IceView.load(f"{tmp_loc}/nope")


class TestViewFilesystemCatalog:
    def test_crud_and_table_disjointness(self, spark, tmp_loc):
        cat = FileSystemCatalog(f"{tmp_loc}/wh")
        cat.create_namespace("ns")
        t = cat.create_table("ns.t", _schema())
        v = cat.create_view("ns.v", "SELECT 1 AS n", _schema())
        assert cat.list_views("ns") == ["ns.v"]
        assert cat.list_tables("ns") == ["ns.t"]  # views not listed
        assert cat.view_exists("ns.v") and not cat.view_exists("ns.t")
        loaded = cat.load_view("ns.v")
        assert loaded.metadata.view_uuid == v.metadata.view_uuid
        with pytest.raises(AlreadyExistsError):
            cat.create_view("ns.v", "SELECT 2", _schema())
        with pytest.raises(AlreadyExistsError):
            cat.create_view("ns.t", "SELECT 2", _schema())  # name is a table
        assert cat.drop_view("ns.v")
        assert cat.list_views("ns") == []
        with pytest.raises(NoSuchViewError):
            cat.load_view("ns.v")

    def test_view_over_ice_table(self, spark, tmp_loc):
        cat = FileSystemCatalog(f"{tmp_loc}/wh")
        cat.create_namespace("ns")
        sch = it.Schema([it.NestedField(1, "id", it.LongType(), True)])
        t = IceTable.create(spark, f"{tmp_loc}/wh/ns/data_t", sch)
        t = t.append(spark.range(5).select("id"))
        t.create_or_replace_view("vt_data")
        v = cat.create_view(
            "ns.agg_v", "SELECT COUNT(*) AS n FROM vt_data", _schema())
        assert v.to_df(spark).collect()[0]["n"] == 5


class TestViewRestCatalog:
    @pytest.fixture()
    def cat(self):
        from iceberg_cpp_spark.sources.rest_catalog import (
            RestCatalog, serve_rest_catalog)

        server, uri = serve_rest_catalog()
        c = RestCatalog(uri)
        c.create_namespace("ns")
        yield c
        server.shutdown()

    def test_create_load_list_drop(self, cat):
        v = cat.create_view("ns.v", "SELECT 1 AS n", _schema())
        assert v.metadata.current_version_id == 1
        assert cat.list_views("ns") == ["ns.v"]
        loaded = cat.load_view("ns.v")
        assert loaded.metadata.view_uuid == v.metadata.view_uuid
        cat.drop_view("ns.v")
        assert cat.list_views("ns") == []

    def test_replace_appends_version_and_swaps(self, cat):
        cat.create_view("ns.v", "SELECT 1 AS n", _schema())
        v2 = cat.replace_view("ns.v", "SELECT 2 AS n")
        assert v2.metadata.current_version_id == 2
        assert v2.sql_for("spark", version_id=1) == "SELECT 1 AS n"
        assert v2.sql_for("spark") == "SELECT 2 AS n"

    def test_replace_with_schema_adds_schema(self, cat):
        cat.create_view("ns.v", "SELECT 1 AS n", _schema())
        sch2 = it.Schema([it.NestedField(1, "n", it.LongType(), True),
                          it.NestedField(2, "m", it.LongType(), True)])
        v2 = cat.replace_view("ns.v", "SELECT 1 AS n, 2 AS m", schema=sch2)
        assert len(v2.metadata.schemas) == 2
        assert v2.metadata.schema().field_by_name("m") is not None

    def test_uuid_requirement_conflict_409(self, cat):
        cat.create_view("ns.v", "SELECT 1 AS n", _schema())
        body = {"requirements": [{"type": "assert-view-uuid",
                                  "uuid": "wrong-uuid"}],
                "updates": []}
        with pytest.raises(CommitFailedError, match="uuid"):
            cat._request("POST", "/v1/namespaces/ns/views/v", body)

    def test_view_name_collides_with_table_409(self, cat):
        cat.create_table("ns.t", _schema())
        with pytest.raises(Exception, match="exists"):
            cat.create_view("ns.t", "SELECT 1", _schema())


class TestRename:
    def test_fs_table_rename_refuses_loudly(self, tmp_loc):
        cat = FileSystemCatalog(f"{tmp_loc}/wh")
        cat.create_namespace("ns")
        cat.create_table("ns.t", _schema())
        with pytest.raises(NotImplementedError, match="identifier"):
            cat.rename_table("ns.t", "ns.t2")

    def test_fs_view_rename_moves_and_rewrites_location(self, tmp_loc):
        cat = FileSystemCatalog(f"{tmp_loc}/wh")
        cat.create_namespace("ns")
        cat.create_view("ns.v", "SELECT 1 AS n", _schema())
        cat.rename_view("ns.v", "ns.v2")
        assert cat.list_views("ns") == ["ns.v2"]
        v = cat.load_view("ns.v2")
        assert v.metadata.location.endswith("/ns/v2")
        assert v.sql_for("spark") == "SELECT 1 AS n"
        with pytest.raises(NoSuchViewError):
            cat.load_view("ns.v")

    def test_rest_rename_table_and_view(self):
        from iceberg_cpp_spark.sources.rest_catalog import (
            RestCatalog, serve_rest_catalog)

        server, uri = serve_rest_catalog()
        try:
            cat = RestCatalog(uri)
            cat.create_namespace("ns")
            cat.create_table("ns.t", _schema())
            cat.rename_table("ns.t", "ns.t2")
            assert cat.list_tables("ns") == ["ns.t2"]
            cat.create_view("ns.v", "SELECT 1 AS n", _schema())
            cat.rename_view("ns.v", "ns.v2")
            assert cat.list_views("ns") == ["ns.v2"]
            # collisions 409 / missing 404 surface as errors
            with pytest.raises(Exception, match="exists"):
                cat.rename_table("ns.t2", "ns.v2")
            with pytest.raises(Exception, match="not found"):
                cat.rename_table("ns.gone", "ns.x")
        finally:
            server.shutdown()


class TestMaterializedView:
    """mview.py — view + storage table with snapshot-based freshness
    (the Iceberg materialized-view direction)."""

    def _src(self, spark, loc, n=6):
        sch = it.Schema([it.NestedField(1, "k", it.LongType(), True),
                         it.NestedField(2, "v", it.LongType(), False)])
        t = IceTable.create(spark, loc, sch)
        return t.append(spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))

    def test_create_refresh_staleness(self, spark, tmp_loc):
        from iceberg_cpp_spark.mview import IceMaterializedView

        src = self._src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv",
            "SELECT v, COUNT(*) AS n FROM src_t GROUP BY v",
            {"src_t": src})
        assert mv.is_fresh()
        assert {(r["v"], r["n"]) for r in mv.to_df().collect()} == {
            (0, 2), (1, 2), (2, 2)}
        # no-op refresh: same storage snapshot, no job
        snap0 = mv.storage.current_snapshot().snapshot_id
        assert mv.refresh().storage.current_snapshot().snapshot_id == snap0
        # source moves -> stale; stale read serves the OLD result
        src = src.append(spark.range(6, 12).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
        mv.sources["src_t"] = src
        assert not mv.is_fresh()
        assert sum(r["n"] for r in mv.to_df().collect()) == 6
        # allow_stale=False refreshes first
        assert sum(r["n"] for r in
                   mv.to_df(allow_stale=False).collect()) == 12
        assert mv.is_fresh()

    def test_load_and_not_mv_error(self, spark, tmp_loc):
        from iceberg_cpp_spark.mview import IceMaterializedView

        src = self._src(spark, f"{tmp_loc}/src")
        IceMaterializedView.create(
            spark, f"{tmp_loc}/mv",
            "SELECT COUNT(*) AS n FROM src_t", {"src_t": src})
        mv = IceMaterializedView.load(spark, f"{tmp_loc}/mv",
                                      {"src_t": src})
        assert mv.to_df().collect()[0]["n"] == 6
        # the refresh state is readable from plain view metadata
        assert any(k.startswith("refresh.") for k in
                   mv.view.metadata.properties)
        plain = IceView.create(f"{tmp_loc}/plainv", "SELECT 1 AS n",
                               _schema())
        with pytest.raises(ValueError, match="not a materialized view"):
            IceMaterializedView.load(spark, f"{tmp_loc}/plainv",
                                     {"src_t": src})

    def test_multi_source_freshness(self, spark, tmp_loc):
        from iceberg_cpp_spark.mview import IceMaterializedView

        a = self._src(spark, f"{tmp_loc}/a")
        b = self._src(spark, f"{tmp_loc}/b", n=3)
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv",
            "SELECT (SELECT COUNT(*) FROM a_t) + "
            "(SELECT COUNT(*) FROM b_t) AS n",
            {"a_t": a, "b_t": b})
        assert mv.to_df().collect()[0]["n"] == 9
        b = b.append(spark.range(100, 101).select(
            F.col("id").alias("k"), F.lit(0).alias("v")))
        mv.sources["b_t"] = b
        assert not mv.is_fresh()   # ONE source moving is enough
        mv = mv.refresh()
        assert mv.to_df().collect()[0]["n"] == 10


class TestIncrementalMvRefresh:
    """Incremental materialized-view maintenance (VERDICT r10 task 4):
    single-source distributive GROUP BY + append-only source history →
    refresh() scans ONLY the appended files and merges per-group
    partials; anything else falls back to the always-correct full
    recompute."""

    def _src(self, spark, loc, lo=0, hi=6):
        sch = it.Schema([it.NestedField(1, "k", it.LongType(), True),
                         it.NestedField(2, "v", it.LongType(), False)])
        t = IceTable.create(spark, loc, sch)
        return t.append(spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))

    SQL = ("SELECT v, COUNT(*) AS n, SUM(k) AS sum_k, MIN(k) AS min_k, "
           "MAX(k) AS max_k FROM src_t GROUP BY v")

    def test_classifier_matrix(self):
        from iceberg_cpp_spark.mview import classify_incremental as cl

        ok = cl(self.SQL, {"src_t"})
        assert ok["source"] == "src_t" and ok["keys"] == ["v"]
        assert ok["merge"] == {"n": "sum", "sum_k": "sum",
                               "min_k": "min", "max_k": "max"}
        where = cl("SELECT v, COUNT(*) AS n FROM src_t WHERE k > 2 "
                   "GROUP BY v", {"src_t"})
        assert where is not None
        # AVG decomposes to (SUM, COUNT) partials in the storage SQL
        avg = cl("SELECT v, AVG(k) AS a FROM src_t GROUP BY v",
                 {"src_t"})
        assert avg["avg"] == {"a": "k"}
        assert avg["merge"] == {"a__sum": "sum", "a__cnt": "sum"}
        assert "sum(k) AS a__sum" in avg["storage_sql"]
        assert "count(k) AS a__cnt" in avg["storage_sql"]
        # rejections: each must fall back to full recompute
        assert cl("SELECT v, AVG(*) AS a FROM src_t GROUP BY v",
                  {"src_t"}) is None
        assert cl("SELECT v, COUNT(*) AS n FROM src_t GROUP BY v "
                  "HAVING COUNT(*) > 1", {"src_t"}) is None
        assert cl("SELECT a.v, COUNT(*) AS n FROM src_t a JOIN o b "
                  "ON a.k = b.k GROUP BY a.v", {"src_t", "o"}) is None
        assert cl("SELECT DISTINCT v FROM src_t GROUP BY v",
                  {"src_t"}) is None
        assert cl("SELECT COUNT(*) AS n FROM other GROUP BY v",
                  {"src_t"}) is None
        assert cl("SELECT v + 1 AS w, COUNT(*) AS n FROM src_t "
                  "GROUP BY v + 1", {"src_t"}) is None  # computed key
        assert cl("SELECT v FROM src_t GROUP BY v", {"src_t"}) is None
        # no aggregate at all: nothing to merge
        # GROUP BY expressions NOT surfaced as select keys: the merged
        # re-group by output keys alone would collapse distinct groups
        assert cl("SELECT COUNT(*) AS n FROM src_t GROUP BY k",
                  {"src_t"}) is None
        assert cl("SELECT v, COUNT(*) AS n FROM src_t GROUP BY v, k",
                  {"src_t"}) is None

    def test_incremental_scans_only_new_files(self, spark, tmp_loc):
        """The r10-task-4 'done' bar: after a pure append, refresh()
        must not touch the pre-existing data files — proven by deleting
        them from disk before the refresh."""
        from iceberg_cpp_spark.mview import IceMaterializedView

        src = self._src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.SQL, {"src_t": src})
        old_files = [f.file_path for f in src.scan().plan_files()]
        assert old_files
        src = src.append(spark.range(6, 12).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
        mv.sources["src_t"] = src
        for p in old_files:  # a full recompute would now blow up
            os.remove(p)
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental"
        got = {r["v"]: (r["n"], r["sum_k"], r["min_k"], r["max_k"])
               for r in mv.to_df().collect()}
        # merged over k in 0..11 grouped by k % 3
        assert got == {0: (4, 0 + 3 + 6 + 9, 0, 9),
                       1: (4, 1 + 4 + 7 + 10, 1, 10),
                       2: (4, 2 + 5 + 8 + 11, 2, 11)}
        assert mv.is_fresh()
        # second refresh: metadata-only no-op
        assert mv.refresh().last_refresh_mode == "noop"

    def test_incremental_matches_full(self, spark, tmp_loc):
        """Same appends, two MVs: the incremental result must equal a
        forced full recompute bit-for-bit."""
        from iceberg_cpp_spark.mview import IceMaterializedView

        src = self._src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.SQL, {"src_t": src})
        for lo in (20, 40):
            src = src.append(spark.range(lo, lo + 7).select(
                F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
            mv.sources["src_t"] = src
            mv = mv.refresh()
            assert mv.last_refresh_mode == "incremental"
        inc = {tuple(r) for r in mv.to_df().collect()}
        mv = mv.refresh(force=True)
        assert mv.last_refresh_mode == "full"
        assert {tuple(r) for r in mv.to_df().collect()} == inc
        # r15 (ADVICE r14): delta temp views are unique-named AND
        # dropped once the refresh resolves — no session-catalog growth
        leftovers = [t.name for t in spark.catalog.listTables()
                     if t.name.startswith("__mv_delta")]
        assert leftovers == []

    def test_delete_in_history_group_targeted(self, spark, tmp_loc):
        """MIN/MAX views through a delete used to FULL-recompute; since
        r14 they take the group-targeted recompute path (the exact
        result is unchanged — pinned here)."""
        from iceberg_cpp_spark.mview import IceMaterializedView
        from iceberg_cpp_spark.plans import expressions as ex

        src = self._src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.SQL, {"src_t": src})
        src = src.append(spark.range(6, 9).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
        src = src.delete_where(ex.eq(ex.Reference("k"), 1))
        mv.sources["src_t"] = src
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental-retract-groups"
        got = {r["v"]: r["n"] for r in mv.to_df().collect()}
        assert got == {0: 3, 1: 2, 2: 3}  # k=1 gone

    def test_where_clause_applies_to_delta(self, spark, tmp_loc):
        from iceberg_cpp_spark.mview import IceMaterializedView

        src = self._src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv",
            "SELECT v, COUNT(*) AS n FROM src_t WHERE k >= 4 GROUP BY v",
            {"src_t": src})
        src = src.append(spark.range(6, 10).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
        mv.sources["src_t"] = src
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental"
        assert sum(r["n"] for r in mv.to_df().collect()) == 6  # k in 4..9

    def test_avg_incremental_scans_only_new_files(self, spark, tmp_loc):
        """AVG maintained via (SUM, COUNT) partials: after a pure
        append the refresh must not touch pre-existing data files
        (proven by deleting them), and to_df() must serve the exact
        avg over the merged history."""
        from iceberg_cpp_spark.mview import IceMaterializedView

        sql = ("SELECT v, AVG(k) AS avg_k, COUNT(*) AS n "
               "FROM src_t WHERE k >= 1 GROUP BY v")
        src = self._src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", sql, {"src_t": src})
        # storage holds partials, the view serves the avg column
        assert set(mv.storage.to_df().columns) == {
            "v", "avg_k__sum", "avg_k__cnt", "n"}
        assert set(mv.to_df().columns) == {"v", "avg_k", "n"}
        old_files = [f.file_path for f in src.scan().plan_files()]
        src = src.append(spark.range(6, 12).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
        mv.sources["src_t"] = src
        for p in old_files:
            os.remove(p)
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental"
        got = {r["v"]: (r["avg_k"], r["n"])
               for r in mv.to_df().collect()}
        # k in 1..11 grouped by k % 3 (k=0 filtered by WHERE)
        assert got == {0: ((3 + 6 + 9) / 3, 3),
                       1: ((1 + 4 + 7 + 10) / 4, 4),
                       2: ((2 + 5 + 8 + 11) / 4, 4)}

    def test_avg_forced_full_keeps_partials(self, spark, tmp_loc):
        """force=True recomputes through the storage SQL so the
        partial columns survive and later increments stay valid;
        load() reclassifies from the SQL alone."""
        from iceberg_cpp_spark.mview import IceMaterializedView

        sql = "SELECT v, AVG(k) AS avg_k FROM src_t GROUP BY v"
        src = self._src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", sql, {"src_t": src})
        mv = mv.refresh(force=True)
        assert mv.last_refresh_mode == "full"
        assert "avg_k__sum" in mv.storage.to_df().columns
        mv = IceMaterializedView.load(spark, f"{tmp_loc}/mv",
                                      {"src_t": mv.sources["src_t"]})
        src = mv.sources["src_t"].append(spark.range(6, 9).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
        mv.sources["src_t"] = src
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental"
        got = {r["v"]: r["avg_k"] for r in mv.to_df().collect()}
        assert got == {0: (0 + 3 + 6) / 3, 1: (1 + 4 + 7) / 3,
                       2: (2 + 5 + 8) / 3}

    def test_uncovered_group_key_full_recompute(self, spark, tmp_loc):
        """`GROUP BY k` with no k select item must NOT take the
        incremental path (the output re-group would collapse all
        groups into one row) — full recompute, correct contents."""
        from iceberg_cpp_spark.mview import IceMaterializedView

        sql = "SELECT COUNT(*) AS n FROM src_t GROUP BY k"
        src = self._src(spark, f"{tmp_loc}/src")  # k 0..5 distinct
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", sql, {"src_t": src})
        src = src.append(spark.range(6, 9).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
        mv.sources["src_t"] = src
        mv = mv.refresh()
        assert mv.last_refresh_mode == "full"
        rows = mv.to_df().collect()
        assert len(rows) == 9 and all(r["n"] == 1 for r in rows)

    RETRACT_SQL = ("SELECT v, COUNT(*) AS n, SUM(k) AS sum_k, "
                   "AVG(k) AS avg_k FROM src_t GROUP BY v")

    def test_retract_refresh_scans_only_changed_files(self, spark,
                                                      tmp_loc):
        """Deletes in the history + retractable aggregates: refresh
        pulls the changelog's +/- delta — proven delta-only by removing
        the UNTOUCHED batch's files from disk — and matches the exact
        recompute."""
        from iceberg_cpp_spark.mview import IceMaterializedView
        from iceberg_cpp_spark.plans import expressions as ex

        src = self._src(spark, f"{tmp_loc}/src")           # k 0..5
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.RETRACT_SQL, {"src_t": src})
        b1_files = [f.file_path for f in src.scan().plan_files()]
        src = src.append(spark.range(10, 16).select(       # second file
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
        mv.sources["src_t"] = src
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental"
        # CoW delete rewrites ONLY the second batch's file
        src = src.delete_where(ex.gt_eq(ex.Reference("k"), 14))
        mv.sources["src_t"] = src
        for p in b1_files:  # untouched by the delete: delta never reads
            os.remove(p)
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental-retract"
        got = {r["v"]: (r["n"], r["sum_k"], r["avg_k"])
               for r in mv.to_df().collect()}
        ks = [k for k in list(range(6)) + list(range(10, 14))]
        want = {}
        for v in (0, 1, 2):
            grp = [k for k in ks if k % 3 == v]
            want[v] = (len(grp), sum(grp), sum(grp) / len(grp))
        assert got == want

    def test_retract_drops_dead_groups(self, spark, tmp_loc):
        from iceberg_cpp_spark.mview import IceMaterializedView
        from iceberg_cpp_spark.plans import expressions as ex

        src = self._src(spark, f"{tmp_loc}/src")  # v = k % 3, k 0..5
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.RETRACT_SQL, {"src_t": src})
        src = src.delete_where(ex.eq(ex.Reference("v"), 1))
        mv.sources["src_t"] = src
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental-retract"
        got = {r["v"] for r in mv.to_df().collect()}
        assert got == {0, 2}  # group v=1 died and must NOT linger
        # and the values equal a forced full recompute
        inc = {tuple(r) for r in mv.to_df().collect()}
        assert {tuple(r) for r in
                mv.refresh(force=True).to_df().collect()} == inc

    def test_retract_needs_count_star(self, spark, tmp_loc):
        """SUM-only views can't tell a dead group from a zero-sum one,
        so they are NOT retractable via negated partials — since r14
        deletes route them through the group-targeted recompute (which
        re-aggregates affected groups from the source, so dead groups
        vanish exactly)."""
        from iceberg_cpp_spark.mview import (IceMaterializedView,
                                             classify_incremental)
        from iceberg_cpp_spark.plans import expressions as ex

        sql = "SELECT v, SUM(k) AS sum_k FROM src_t GROUP BY v"
        assert not classify_incremental(sql, {"src_t"})["retractable"]
        src = self._src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", sql, {"src_t": src})
        src = src.delete_where(ex.eq(ex.Reference("k"), 1))
        mv.sources["src_t"] = src
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental-retract-groups"
        got = {r["v"]: r["sum_k"] for r in mv.to_df().collect()}
        assert got == {0: 0 + 3, 1: 4, 2: 2 + 5}

    def test_retract_minmax_not_retractable(self, spark, tmp_loc):
        """MIN/MAX aren't retractable via negated partials (the deleted
        value may have been the extreme) — they classify as
        non-retractable and take the group-targeted path instead."""
        from iceberg_cpp_spark.mview import classify_incremental

        plan = classify_incremental(self.SQL, {"src_t"})
        assert plan is not None and not plan["retractable"]
        assert plan["key_cols"] == ["v"]

    def test_multi_source_stays_full(self, spark, tmp_loc):
        from iceberg_cpp_spark.mview import IceMaterializedView

        a = self._src(spark, f"{tmp_loc}/a")
        b = self._src(spark, f"{tmp_loc}/b", hi=3)
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv",
            "SELECT (SELECT COUNT(*) FROM a_t) + "
            "(SELECT COUNT(*) FROM b_t) AS n",
            {"a_t": a, "b_t": b})
        a2 = a.append(spark.range(100, 103).select(
            F.col("id").alias("k"), F.lit(0).alias("v")))
        mv.sources["a_t"] = a2
        mv = mv.refresh()
        assert mv.last_refresh_mode == "full"
        assert mv.to_df().collect()[0]["n"] == 12

    def test_qualified_source_reference_falls_back(self, spark, tmp_loc):
        """``WHERE src_t.k >= 4`` keeps naming the source outside the
        FROM clause — the incremental rewrite can't redirect it, so the
        classifier must refuse and refresh() must full-recompute
        (correctly)."""
        from iceberg_cpp_spark.mview import (IceMaterializedView,
                                             classify_incremental)

        sql = ("SELECT v, COUNT(*) AS n FROM src_t "
               "WHERE src_t.k >= 4 GROUP BY v")
        assert classify_incremental(sql, {"src_t"}) is None
        src = self._src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(spark, f"{tmp_loc}/mv", sql,
                                        {"src_t": src})
        src = src.append(spark.range(6, 10).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
        mv.sources["src_t"] = src
        mv = mv.refresh()
        assert mv.last_refresh_mode == "full"
        assert sum(r["n"] for r in mv.to_df().collect()) == 6

    def test_retract_over_transaction_chain(self, spark, tmp_loc):
        """A source maintained by a multi-action TRANSACTION (one
        publish carrying an append + a delete snapshot) refreshes
        through the retraction path and matches the recompute."""
        from iceberg_cpp_spark.mview import IceMaterializedView
        from iceberg_cpp_spark.plans import expressions as ex

        src = self._src(spark, f"{tmp_loc}/src")  # k 0..5, v = k % 3
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.RETRACT_SQL, {"src_t": src})
        txn = src.new_transaction()
        txn.append(spark.range(10, 13).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))
        txn.delete_where(ex.eq(ex.Reference("k"), 1))
        src = txn.commit()
        mv.sources["src_t"] = src
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental-retract"
        inc = {tuple(r) for r in mv.to_df().collect()}
        assert {tuple(r) for r in
                mv.refresh(force=True).to_df().collect()} == inc
        assert sum(r["n"] for r in mv.to_df().collect()) == 8

    def test_randomized_retract_equals_full(self, spark, tmp_loc):
        """Property sweep over a MIXED append/delete history: the
        retraction-maintained MV must equal a forced full recompute
        after every step (group deaths, re-births, delete-only and
        append-only steps all occur in the sequence)."""
        import random

        from iceberg_cpp_spark.mview import IceMaterializedView
        from iceberg_cpp_spark.plans import expressions as ex

        rng = random.Random(20260815)
        src = self._src(spark, f"{tmp_loc}/src", lo=0, hi=6)
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.RETRACT_SQL, {"src_t": src})
        base = 100
        for step in range(5):
            if rng.random() < 0.5:
                n = rng.randint(1, 8)
                rows = [(base + i, rng.randint(0, 2)) for i in range(n)]
                base += 100
                src = src.append(
                    spark.createDataFrame(rows, "k long, v long"))
            else:
                live = [r["k"] for r in src.to_df().collect()]
                if not live:
                    continue
                cut = rng.choice(live)
                src = src.delete_where(ex.gt_eq(ex.Reference("k"), cut))
            mv.sources["src_t"] = src
            mv = mv.refresh()
            assert mv.last_refresh_mode in (
                "incremental", "incremental-retract"), f"step {step}"
            inc = {tuple(r) for r in mv.to_df().collect()}
            full = {tuple(r) for r in
                    mv.refresh(force=True).to_df().collect()}
            assert inc == full, f"step {step}: {inc ^ full}"

    def test_randomized_incremental_equals_full(self, spark, tmp_loc):
        """Property sweep: random append sequences (varying sizes,
        skewed keys, negative values, all-new and all-repeat groups)
        maintained incrementally must equal a forced full recompute
        after every step."""
        import random

        from iceberg_cpp_spark.mview import IceMaterializedView

        rng = random.Random(20260815)
        src = self._src(spark, f"{tmp_loc}/src", lo=0, hi=5)
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.SQL, {"src_t": src})
        base = 100
        for step in range(4):
            n = rng.randint(1, 12)
            rows = [(rng.choice([base + i, rng.randint(-50, 0)]),
                     rng.randint(0, 2)) for i in range(n)]
            base += 100
            src = src.append(spark.createDataFrame(rows, "k long, v long"))
            mv.sources["src_t"] = src
            mv = mv.refresh()
            assert mv.last_refresh_mode == "incremental", f"step {step}"
            inc = {tuple(r) for r in mv.to_df().collect()}
            full = {tuple(r) for r in
                    mv.refresh(force=True).to_df().collect()}
            assert inc == full, f"step {step}: {inc ^ full}"


class TestMvRetractGroups:
    """MIN/MAX through a deleting history (VERDICT r13 task 5): the
    refresh recomputes ONLY the affected groups — the changed rows'
    group keys push into the source scan as a file-pruning predicate —
    instead of a full recompute."""

    MINMAX_SQL = ("SELECT v, MIN(k) AS min_k, MAX(k) AS max_k, "
                  "COUNT(*) AS n FROM src_t GROUP BY v")

    def _part_src(self, spark, loc):
        from iceberg_cpp_spark.core.metadata import (PartitionField,
                                                     PartitionSpec)
        from iceberg_cpp_spark.functions import transforms as tr

        sch = it.Schema([it.NestedField(1, "k", it.LongType(), True),
                         it.NestedField(2, "v", it.LongType(), False)])
        spec = PartitionSpec(spec_id=0, fields=[PartitionField(
            source_id=2, field_id=1000, name="v",
            transform=tr.IdentityTransform())])
        t = IceTable.create(spark, loc, sch, spec=spec)
        return t.append(spark.range(0, 6).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")))

    def test_minmax_delete_scans_only_affected_group(self, spark,
                                                     tmp_loc):
        """Proven group-pruned the hard way: the files of the UNTOUCHED
        partition are removed from disk before the refresh — a full
        (or unpruned) recompute would crash. (The k=4 CoW delete
        rewrites the v=1 AND v=2 files — their k-bounds both admit 4 —
        so v=0 is the provably-unread partition.)"""
        from iceberg_cpp_spark.mview import IceMaterializedView
        from iceberg_cpp_spark.plans import expressions as ex

        src = self._part_src(spark, f"{tmp_loc}/src")  # v=k%3, k 0..5
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.MINMAX_SQL, {"src_t": src})
        src = src.delete_where(ex.eq(ex.Reference("k"), 4))
        mv.sources["src_t"] = src
        for f in src.scan().plan_files():
            if f.partition.get("v") == 0:
                os.remove(f.file_path)
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental-retract-groups"
        got = {r["v"]: (r["min_k"], r["max_k"], r["n"])
               for r in mv.to_df().collect()}
        assert got == {0: (0, 3, 2), 1: (1, 1, 1), 2: (2, 5, 2)}

    def test_minmax_group_dies_and_null_keys(self, spark, tmp_loc):
        """An affected group left EMPTY vanishes (full-recompute
        parity), and NULL group keys take the null-safe path."""
        from iceberg_cpp_spark.mview import IceMaterializedView
        from iceberg_cpp_spark.plans import expressions as ex

        sch = it.Schema([it.NestedField(1, "k", it.LongType(), True),
                         it.NestedField(2, "v", it.LongType(), False)])
        t = IceTable.create(spark, f"{tmp_loc}/src", sch)
        t = t.append(spark.createDataFrame(
            [(0, 0), (1, 0), (2, 1), (3, None), (4, None)],
            "k long, v long"))
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.MINMAX_SQL, {"src_t": t})
        # kill ALL of group v=1 and one row of the NULL group
        t = t.delete_where(ex.or_(ex.eq(ex.Reference("v"), 1),
                                  ex.eq(ex.Reference("k"), 4)))
        mv.sources["src_t"] = t
        mv = mv.refresh()
        assert mv.last_refresh_mode == "incremental-retract-groups"
        got = {r["v"]: (r["min_k"], r["max_k"], r["n"])
               for r in mv.to_df().collect()}
        assert got == {0: (0, 1, 2), None: (3, 3, 1)}

    def test_minmax_matches_full_recompute_property(self, spark,
                                                    tmp_loc):
        """Randomized mixed append/delete history: the group-targeted
        path must equal a forced full recompute after every step."""
        import random

        from iceberg_cpp_spark.mview import IceMaterializedView
        from iceberg_cpp_spark.plans import expressions as ex

        rng = random.Random(14)
        src = self._part_src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", self.MINMAX_SQL, {"src_t": src})
        nxt = 100
        for step in range(5):
            if rng.random() < 0.5:
                src = src.append(spark.range(nxt, nxt + 4).select(
                    F.col("id").alias("k"),
                    (F.col("id") % 3).alias("v")))
                nxt += 4
            else:
                live = [r["k"] for r in src.to_df().collect()]
                kill = rng.choice(live)
                src = src.delete_where(ex.eq(ex.Reference("k"), kill))
            mv.sources["src_t"] = src
            mv = mv.refresh()
            assert mv.last_refresh_mode in (
                "incremental", "incremental-retract-groups"), f"step {step}"
            got = sorted(tuple(r) for r in mv.to_df().collect())
            src.create_or_replace_view("src_t")
            want = sorted(tuple(r) for r in
                          spark.sql(self.MINMAX_SQL).collect())
            assert got == want, f"step {step}"

    def test_keyless_minmax_keeps_full_recompute(self, spark, tmp_loc):
        """Group-key-less shape (key not selected): classifier rejects
        it, refresh stays the always-correct full recompute."""
        from iceberg_cpp_spark.mview import (IceMaterializedView,
                                             classify_incremental)
        from iceberg_cpp_spark.plans import expressions as ex

        sql = "SELECT MIN(k) AS min_k FROM src_t GROUP BY v"
        assert classify_incremental(sql, {"src_t"}) is None
        src = self._part_src(spark, f"{tmp_loc}/src")
        mv = IceMaterializedView.create(
            spark, f"{tmp_loc}/mv", sql, {"src_t": src})
        src = src.delete_where(ex.eq(ex.Reference("k"), 4))
        mv.sources["src_t"] = src
        mv = mv.refresh()
        assert mv.last_refresh_mode == "full"
        assert sorted(r["min_k"] for r in mv.to_df().collect()) == [
            0, 1, 2]
