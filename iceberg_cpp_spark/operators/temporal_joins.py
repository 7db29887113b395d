"""Temporal join operators Spark lacks as builtins: as-of join and
bucketed range (interval) join.

Both are compositions of existing DataFrame ops (no UDFs, no driver
loops), designed so the only shuffle is on the join key:

- asof_join: union the two sides tagged, one window pass per key ordered
  by time carries the latest right-side values forward onto left rows.
  O(n log n) within key partitions, single shuffle, no n² and no
  per-row python. Skew on hot keys is AQE's skew-join territory.
- range_join: equi-join disguised via interval bucketing — each right
  interval explodes into the fixed-width buckets it overlaps, the left
  side computes its bucket, the equi-join on (key, bucket) prunes the
  cross product, and the exact predicate filters the remainder.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: Optional[list[str]] = None,
              tolerance: Optional[Column] = None,
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (direction='backward'; 'forward' takes the
    next one at-or-after) within the same ``by`` key.

    Implementation: tag + union + last_value IGNORE NULLS over a window
    ordered by (on, side) — right rows sort before left rows at equal
    timestamps so exact matches are visible.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    lcols = left.columns

    l_tag = left.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"), F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    r_tag = right.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    u = l_tag.unionByName(r_tag)
    if direction == "backward":
        w = (Window.partitionBy("_k").orderBy(F.asc("_t"), F.asc("_side"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = [F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
                   for c in rcols]
        r_time = F.last(F.when(F.col("_side") == 0, F.col("_t")),
                        ignorenulls=True).over(w)
    else:
        w = (Window.partitionBy("_k").orderBy(F.desc("_t"), F.asc("_side"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = [F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
                   for c in rcols]
        r_time = F.last(F.when(F.col("_side") == 0, F.col("_t")),
                        ignorenulls=True).over(w)
    out = (
        u.select("*")
        .withColumns({f"_r_{c}": col for c, col in zip(rcols, carried)})
        .withColumn("_rt", r_time)
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        within = (F.col("_t") - F.col("_rt") <= tolerance) if direction == "backward" \
            else (F.col("_rt") - F.col("_t") <= tolerance)
        out = out.withColumns({
            f"_r_{c}": F.when(within, F.col(f"_r_{c}")) for c in rcols})
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_r_{c}").alias(c) for c in rcols],
    )


def range_join(left: DataFrame, right: DataFrame, left_point: str,
               right_start: str, right_end: str, bucket_width: int,
               on: Optional[str] = None) -> DataFrame:
    """Join left points into right [start, end] intervals (inclusive)
    without a cross join: intervals explode into the long-valued buckets
    they span, points compute one bucket, and the equi-join on bucket
    (plus optional key ``on``) bounds the candidate set. ``bucket_width``
    is in the column's native units (e.g. µs for timestamps) and should
    be ≳ the typical interval length so explosion stays small."""
    lp = F.col(left_point).cast("long")
    rs = F.col(right_start).cast("long")
    re_ = F.col(right_end).cast("long")
    l_b = left.withColumn("_bucket", F.floor(lp / bucket_width))
    r_b = right.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(rs / bucket_width), F.floor(re_ / bucket_width))),
    )
    keys = ["_bucket"] + ([on] if on else [])
    joined = l_b.join(r_b, on=keys)
    return (
        joined.filter((F.col(left_point) >= F.col(right_start))
                      & (F.col(left_point) <= F.col(right_end)))
        .drop("_bucket")
    )
