"""SparkSession factory with the engine's required configs.

- UTC session timezone (temporal transforms per Iceberg spec).
- Parquet field-id write+read: the engine's answer to the reference's
  field-ID-based column resolution (schema_util.h:91-93) — Spark's
  parquet reader resolves by ``parquet.field.id`` when enabled, giving
  rename-safe schema evolution natively.
- AQE on (runtime re-plan, skew-join handling at scale).
- zstd parquet compression (matches reference default,
  table_properties.h:127-129).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "iceberg-cpp-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or min(int(cpus), 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r18: preferSortMergeJoin=false REVERTED (VERDICT r17 task 3).
        # Evidence: with the flag on vs off, the initial plans of ALL
        # 145 declared queries are IDENTICAL — zero ShuffledHashJoins
        # either way (join-node diff recorded in OPTIMIZATION_r18.md)
        # — so the flag bought nothing here while carrying SHJ's
        # no-sort-spill build risk on skewed builds at scale. Join
        # strategy is chosen deliberately per query instead (broadcast
        # hints; AQE converts the rest at runtime).
        .config("spark.sql.parquet.fieldId.write.enabled", "true")
        .config("spark.sql.parquet.fieldId.read.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return b.getOrCreate()


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine configs to a caller-provided
    session (the driver passes its own)."""
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.parquet.fieldId.write.enabled", "true"),
        ("spark.sql.parquet.fieldId.read.enabled", "true"),
        ("spark.sql.python.filterPushdown.enabled", "true"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
