"""r18 size-gated write distribution (VERDICT r17 task 2).

A partitioned append whose batch is smaller than
``engine.write.range-min-bytes`` (default 512 MB) and whose table sets
NO explicit ``write.distribution-mode`` falls back from range to hash
distribution — same per-partition clustering, no range-sampling pass.
An explicit mode (or an over-threshold batch) keeps the old behavior
bit-for-bit.
"""
import os

import pytest
# Spark 4: concrete DataFrames are pyspark.sql.classic.dataframe.DataFrame
# (the pyspark.sql.DataFrame import is the abstract base) — the spy must
# patch the class whose methods actually dispatch.
from pyspark.sql.classic.dataframe import DataFrame
from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core.metadata import PartitionField, PartitionSpec
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.functions import transforms as tr
from iceberg_cpp_spark.table import _plan_size_estimate


def _partitioned_table(spark, tmp_loc, df, properties=None):
    schema = schema_from_spark(df.schema)
    rf = schema.find_field("l_returnflag")
    spec = PartitionSpec([PartitionField(rf.field_id, 1000, "rf",
                                         tr.IdentityTransform())])
    return IceTable.create(spark, os.path.join(tmp_loc, "t"), schema,
                           spec=spec, properties=properties)


class _DistSpy:
    """Record which distribution repartition the write used."""

    def __init__(self, monkeypatch):
        self.calls = []
        orig_range = DataFrame.repartitionByRange
        orig_hash = DataFrame.repartition

        def spy_range(df, *a, **k):
            self.calls.append("range")
            return orig_range(df, *a, **k)

        def spy_hash(df, *a, **k):
            self.calls.append("hash")
            return orig_hash(df, *a, **k)

        monkeypatch.setattr(DataFrame, "repartitionByRange", spy_range)
        monkeypatch.setattr(DataFrame, "repartition", spy_hash)


def test_small_default_append_uses_hash(spark, tmp_loc, lineitem,
                                        monkeypatch):
    t = _partitioned_table(spark, tmp_loc, lineitem)
    spy = _DistSpy(monkeypatch)
    t.append(lineitem)
    assert "hash" in spy.calls and "range" not in spy.calls
    assert t.to_df().count() == lineitem.count()


def test_explicit_range_property_is_honored(spark, tmp_loc, lineitem,
                                            monkeypatch):
    t = _partitioned_table(
        spark, tmp_loc, lineitem,
        properties={"write.distribution-mode": "range"})
    spy = _DistSpy(monkeypatch)
    t.append(lineitem)
    assert "range" in spy.calls


def test_over_threshold_default_keeps_range(spark, tmp_loc, lineitem,
                                            monkeypatch):
    # force the gate shut: every batch counts as "big"
    t = _partitioned_table(
        spark, tmp_loc, lineitem,
        properties={"engine.write.range-min-bytes": "1"})
    spy = _DistSpy(monkeypatch)
    t.append(lineitem)
    assert "range" in spy.calls


def test_results_identical_between_modes(spark, tmp_loc, lineitem):
    small = lineitem.filter(F.col("l_orderkey") < 2000)
    a = _partitioned_table(spark, os.path.join(tmp_loc, "a"), small)
    a.append(small)
    b = _partitioned_table(
        spark, os.path.join(tmp_loc, "b"), small,
        properties={"write.distribution-mode": "range"})
    b.append(small)
    cols = small.columns
    ra = sorted(map(tuple, a.to_df().select(*cols).collect()))
    rb = sorted(map(tuple, b.to_df().select(*cols).collect()))
    assert ra == rb


def test_plan_size_estimate_sanity(spark, lineitem):
    est = _plan_size_estimate(lineitem)
    assert est is not None and 0 < est < 1 << 40
    # a localCheckpoint-backed plan must not report a tiny bogus size
    # that would flip a big batch to hash: either a real number or None
    ck = lineitem.limit(10).localCheckpoint(eager=True)
    est_ck = _plan_size_estimate(ck)
    assert est_ck is None or est_ck > 0


@pytest.mark.parametrize("mode", ["hash", "none"])
def test_explicit_other_modes_still_work(spark, tmp_loc, lineitem, mode):
    small = lineitem.filter(F.col("l_orderkey") < 500)
    t = _partitioned_table(
        spark, os.path.join(tmp_loc, mode), small,
        properties={"write.distribution-mode": mode})
    t.append(small)
    assert t.to_df().count() == small.count()
