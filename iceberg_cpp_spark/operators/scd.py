"""Slowly-changing-dimension (SCD Type 2) maintenance over IceTable.

The reference has no write path at all (type_fwd.h:153-157 leaves
AppendFiles unimplemented); this engine's DML layer (merge_into /
update_where) already exceeds it, and SCD2 is the dimension-table
pattern those primitives don't directly express: a changed key CLOSES
the current row (valid_to, is_current=false) AND INSERTS a fresh one —
two output rows per matched key, which plain MERGE (one row per match)
can't produce.

Scale shape (same contract as merge_into): change detection is one
left join of the update batch against CURRENT rows only, pruned to key
+ tracked columns + ``_file``; only files that contain a matched
current row are rewritten (copy-on-write); unmatched files are
untouched; inserts append. One snapshot per batch, committed with the
snapshot-isolation retry validation (table.py `_validate_rebase`).

Determinism: the caller supplies the batch's effective timestamp — no
wall-clock inside the transform, so replays and repartitions produce
identical dimensions.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_FROM = "_valid_from"
VALID_TO = "_valid_to"
IS_CURRENT = "_is_current"

SCD_COLS = (VALID_FROM, VALID_TO, IS_CURRENT)


def scd2_schema(schema):
    """The dimension schema for a source row schema: source fields plus
    the three SCD bookkeeping fields (spec'd as timestamptz + boolean)."""
    from iceberg_cpp_spark.core import types as it

    next_id = max(f.field_id for f in schema.fields) + 1
    return it.Schema(
        list(schema.fields) + [
            it.NestedField(next_id, VALID_FROM, it.TimestampTzType(), True),
            it.NestedField(next_id + 1, VALID_TO, it.TimestampTzType(), False),
            it.NestedField(next_id + 2, IS_CURRENT, it.BooleanType(), True),
        ], schema_id=schema.schema_id)


def scd2_init(rows: DataFrame, effective) -> DataFrame:
    """Initial dimension load: every row current as of ``effective``."""
    return rows.select(
        "*",
        F.lit(effective).cast("timestamp").alias(VALID_FROM),
        F.lit(None).cast("timestamp").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )


def scd2_apply(table, updates: DataFrame, key: list[str], effective,
               tracked: Optional[list[str]] = None,
               branch: str = "main",
               summary_extras: Optional[dict] = None,
               pre_check=None):
    """Apply one update batch to an SCD2 dimension table.

    - key absent from the dimension → insert a new current row;
    - key present and any ``tracked`` column changed (null-safe) →
      close the current row at ``effective`` and insert the new
      version;
    - unchanged keys → untouched (their files are not rewritten).

    ``updates`` carries the source columns (no SCD columns); keys must
    be unique per batch (standard MERGE cardinality rule — validated
    with a 1-row probe). ``tracked`` defaults to every non-key source
    column. Returns the committed table.
    """
    from iceberg_cpp_spark.table import DataOperation

    schema = table.schema()
    src_cols = [f.name for f in schema.fields if f.name not in SCD_COLS]
    for c in key:
        if c not in src_cols:
            raise ValueError(f"SCD key column not in dimension: {c}")
    for c in SCD_COLS:
        if schema.find_field(c) is None:
            raise ValueError(
                f"not an SCD2 dimension (missing {c}); create the table "
                "with scd2_schema() and load it with scd2_init()")
    tracked = tracked or [c for c in src_cols if c not in key]
    eff = F.lit(effective).cast("timestamp")

    # deterministic source (the merge_into materialization rule: the
    # discovery join and the rewrite must see identical rows)
    src = updates.select(*src_cols).localCheckpoint(eager=True)
    dup = (src.groupBy(*key).count().filter(F.col("count") > 1)
           .limit(1).collect())
    if dup:
        raise ValueError(
            f"duplicate key in SCD2 update batch: "
            f"{tuple(dup[0][c] for c in key)}")

    # discovery joins NULL-SAFELY on the keys (a NULL key is a valid
    # dimension member and must version like any other); match detection
    # uses `_file` — never null on the dimension side — not a key column
    cur = (table._branch_scan(branch).with_metadata_columns().to_df()
           .filter(F.col(IS_CURRENT))
           .select("_file", *[F.col(c).alias(f"_ck_{c}") for c in key],
                   *[F.col(c).alias(f"_cur_{c}") for c in tracked]))

    changed_expr = None
    for c in tracked:
        ne = ~F.expr(f"`{c}` <=> `_cur_{c}`")
        changed_expr = ne if changed_expr is None else (changed_expr | ne)
    joined = (src.join(cur, on=[F.expr(f"`{c}` <=> `_ck_{c}`")
                                for c in key], how="left")
              .localCheckpoint(eager=True))
    new_keys = joined.filter(F.col("_file").isNull()).select(*src_cols)
    changed = joined.filter(F.col("_file").isNotNull()
                            & (changed_expr if changed_expr is not None
                               else F.lit(False)))
    affected = {table._plain_path(r["_file"])
                for r in changed.select("_file").distinct().collect()}
    inserts = scd2_init(new_keys.unionByName(changed.select(*src_cols)),
                        effective)

    if not affected:
        if inserts.isEmpty():
            return table
        new_files = table._write_data_files(inserts)
        return table._commit_files(
            new_files, operation=DataOperation.APPEND, branch=branch,
            summary_extras={"scd2.batch": "insert-only",
                            **(summary_extras or {})},
            pre_check=pre_check)

    closing_keys = changed.select(*key).localCheckpoint(eager=True)
    affected_df = table._read_files_with_deletes(affected, branch=branch)
    # `_matched` marker: a key column can legitimately be NULL, so
    # "did the null-safe join match" must come from an always-non-null
    # column on the keyed side, not from a key's null-ness
    keyed = closing_keys.select(
        *[F.col(c).alias(f"_k_{c}") for c in key],
        F.lit(True).alias("_matched"))
    rewritten = (affected_df.join(
        F.broadcast(keyed),
        on=[F.expr(f"`{c}` <=> `_k_{c}`") for c in key], how="left")
        .withColumn(
            "_close",
            F.col(IS_CURRENT) & F.coalesce(F.col("_matched"), F.lit(False)))
        .select(*[c for c in src_cols],
                F.col(VALID_FROM),
                F.when(F.col("_close"), eff)
                 .otherwise(F.col(VALID_TO)).alias(VALID_TO),
                F.when(F.col("_close"), F.lit(False))
                 .otherwise(F.col(IS_CURRENT)).alias(IS_CURRENT)))
    out = rewritten.unionByName(inserts)
    new_files = table._write_data_files(out)
    return table._commit_files(
        new_files, operation=DataOperation.OVERWRITE, branch=branch,
        carry_existing=True, drop_paths=affected,
        summary_extras={"scd2.batch": "close-and-insert",
                        **(summary_extras or {})},
        pre_check=pre_check,
        read_snapshot_id=table._branch_head_id(branch))
