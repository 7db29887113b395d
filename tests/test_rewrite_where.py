"""File-scoped compaction (rewrite_data_files(where=...)): the
predicate selects candidate FILES via pruning; every row of a selected
file rewrites (none filtered), deletes fold in, untouched files carry
by pointer — the only compaction shape that works at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceSqlEngine
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.metadata import (PartitionField,
                                             PartitionSpec)
from iceberg_cpp_spark.functions.transforms import from_string
from iceberg_cpp_spark.plans import expressions as ex
from iceberg_cpp_spark.sources.catalog import FileSystemCatalog


def _schema():
    return it.Schema([
        it.NestedField(1, "id", it.LongType(), True),
        it.NestedField(2, "grp", it.StringType()),
    ])


@pytest.fixture()
def cat(spark, tmp_loc):
    c = FileSystemCatalog(f"{tmp_loc}/wh")
    c.create_namespace("db")
    return c


def _partitioned(spark, cat, name="db.p", rows=24):
    spec = PartitionSpec([PartitionField(
        source_id=2, field_id=1000, name="grp",
        transform=from_string("identity"))])
    cat.create_table(name, _schema(), spec=spec)
    t = cat.load_table(name, spark=spark)
    df = spark.range(rows).select(
        F.col("id"),
        F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                     (F.col("id") % 3 + 1).cast("int")).alias("grp"))
    # several appends -> several small files per partition
    for k in range(3):
        t.append(df.filter(F.col("id") % 3 == k))
    return cat.load_table(name, spark=spark)


class TestRewriteWhere:
    def test_compacts_only_matching_partition(self, spark, cat):
        t = _partitioned(spark, cat)
        before = {f.file_path for f in t.scan().plan_files()}
        a_before = {f.file_path for f in t.scan(
            filter=ex.eq(ex.Reference("grp"), "a")).plan_files()}
        t2 = t.rewrite_data_files(
            where=ex.eq(ex.Reference("grp"), "a"), target_file_count=1)
        after = {f.file_path for f in t2.scan().plan_files()}
        a_after = {f.file_path for f in t2.scan(
            filter=ex.eq(ex.Reference("grp"), "a")).plan_files()}
        # untouched partitions keep their exact files
        assert before - a_before <= after
        # the matched partition re-clustered to one file
        assert len(a_after) == 1 and not (a_after & a_before)
        # every row preserved (file-scoped, never row-filtered)
        assert t2.to_df().count() == 24
        assert t2.scan(filter=ex.eq(ex.Reference("grp"), "a")) \
            .to_df().count() == 8

    def test_folds_deletes_on_candidates(self, spark, cat):
        t = _partitioned(spark, cat, name="db.d")
        t = t.delete_where(ex.eq(ex.Reference("id"), 3),
                           mode="merge-on-read")  # grp 'a' row
        t2 = t.rewrite_data_files(
            where=ex.eq(ex.Reference("grp"), "a"), target_file_count=1)
        got = sorted(r["id"] for r in t2.scan(
            filter=ex.eq(ex.Reference("grp"), "a")).to_df().collect())
        assert 3 not in got and len(got) == 7
        assert t2.to_df().count() == 23

    def test_no_match_is_noop(self, spark, cat):
        t = _partitioned(spark, cat, name="db.n")
        sid = t.current_snapshot().snapshot_id
        t2 = t.rewrite_data_files(
            where=ex.eq(ex.Reference("grp"), "zzz"))
        assert t2.current_snapshot().snapshot_id == sid

    def test_concurrent_append_elsewhere_rebases(self, spark, cat):
        t = _partitioned(spark, cat, name="db.c")
        stale = cat.load_table("db.c", spark=spark)
        # concurrent append into ANOTHER partition moves the head
        t.append(spark.createDataFrame([(100, "b")],
                                       "id long, grp string"))
        t2 = stale.rewrite_data_files(
            where=ex.eq(ex.Reference("grp"), "a"), target_file_count=1)
        # overwrite-shaped conflict rules: both land
        assert t2.to_df().count() == 25

    def test_sql_call_with_where(self, spark, cat):
        t = _partitioned(spark, cat, name="db.s")
        eng = IceSqlEngine(spark, cat)
        got = eng.sql("CALL ice.system.rewrite_data_files("
                      "table => 'db.s', target_file_count => 1, "
                      "where => 'grp = ''a''')").collect()[0]
        assert got["current_snapshot_id"] is not None
        t2 = cat.load_table("db.s", spark=spark)
        assert len(t2.scan(filter=ex.eq(ex.Reference("grp"), "a"))
                   .plan_files()) == 1
        assert t2.to_df().count() == 24
