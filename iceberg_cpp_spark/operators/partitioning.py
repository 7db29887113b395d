"""Input-spread helper for CPU-heavy opaque Python stages.

A single unsplittable parquet file (or one row group) collapses a scan
to one task, serializing per-payload codec/gram work on one core while
the rest of the cluster idles (optimization guide §2.5 "input skew").
``spread_to_parallelism`` round-robin-repartitions ONLY when the scan
has fewer splits than the session parallelism — at production scale
(many files / row groups) it is a no-op and adds no shuffle.

r18 (ADVICE r17): the split-count probe no longer touches ``df.rdd`` —
the RDD conversion forced a full plan analysis per benchmarked query.
The count is estimated from the plan's input files (driver metadata,
no Spark job) with Spark's own maxSplitBytes formula; the RDD probe
remains only as the fallback for non-file-backed plans.
"""
from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame

_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024
_DEFAULT_OPEN_COST = 4 * 1024 * 1024


def _conf_bytes(spark, key: str, default: int) -> int:
    try:
        return int(spark.conf.get(key))
    except Exception:
        # unit-suffixed values ("128m") or unset: the guard only needs
        # the right order of magnitude — use the Spark default
        return default


def scan_split_estimate(df: DataFrame) -> Optional[int]:
    """Estimated scan split count from the plan's input files — driver
    metadata only, no job, no RDD conversion. None when the plan is not
    file-backed (caller falls back to the RDD probe)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        p = uri
        if p.startswith("file:"):
            p = p[5:]
            while p.startswith("//"):
                p = p[1:]
        try:
            total += os.stat(p).st_size
        except OSError:
            return None
    spark = df.sparkSession
    par = max(1, spark.sparkContext.defaultParallelism)
    max_part = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes",
                           _DEFAULT_MAX_PARTITION_BYTES)
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes",
                            _DEFAULT_OPEN_COST)
    charged = total + open_cost * len(files)
    max_split = min(max_part, max(open_cost, -(-charged // par)))
    return max(1, -(-charged // max(1, max_split)))


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session parallelism when (and
    only when) the scan plans fewer splits. Results are row-identical;
    only placement changes."""
    n = df.sparkSession.sparkContext.defaultParallelism
    est = scan_split_estimate(df)
    if est is None:
        est = df.rdd.getNumPartitions()
    return df.repartition(n) if est < n else df
