"""Snapshot changelog (CDC) reads.

The reference carries the snapshot log (table_metadata.h:104-107) and
reserves changelog metadata columns (metadata_columns.h:84-96) but has
no change-reader. This implements the standard Iceberg changelog
semantics Spark-natively:

- per commit in (from, to]: rows of data files ADDED by the commit are
  ``insert`` rows; rows of data files REMOVED are ``delete`` rows;
  position-delete files added by the commit mark the matched rows of
  surviving files as ``delete``.
- copy-on-write rewrites therefore emit carry-over delete+insert pairs
  for unchanged rows (exactly as engine changelogs do); ``net=True``
  cancels identical pairs within the range, leaving the net row delta.

Scale shape: each commit's diff is a file-set difference computed from
manifests (metadata-scale); row reads are plain pruned parquet scans
unioned lazily, and the net-cancel is one hash aggregation over the
change rows — no driver-side row handling.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_cpp_spark.core import manifests as mf
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.streaming.incremental import (
    _snapshot_file_formats,
    read_data_paths,
    snapshot_diff_files,
)
from iceberg_cpp_spark.table import IceTable

CHANGE_TYPE = "_change_type"
COMMIT_SNAPSHOT = "_commit_snapshot_id"
COMMIT_ORDER = "_change_ordinal"


def _delete_files(table: IceTable, snapshot_id: Optional[int]) -> set[str]:
    """Parquet position-delete files live in a snapshot (DVs excluded —
    they are positional too but puffin-encoded; see _dv_pointers)."""
    if snapshot_id is None:
        return set()
    snap = table.metadata.snapshot_by_id(snapshot_id)
    out: set[str] = set()
    schema = table.schema()
    meta = table.metadata
    for m in mf.read_manifest_list(snap.manifest_list):
        if m.content == mf.MANIFEST_CONTENT_DATA:
            continue  # position deletes live in DELETE manifests only
        spec = meta.spec_by_id(m.partition_spec_id)
        for e in mf.read_manifest(m.manifest_path, spec, schema, manifest=m):
            if (e.is_live and e.data_file.content == mf.CONTENT_POSITION_DELETES
                    and e.data_file.file_format != "puffin"):
                out.add(e.data_file.file_path)
    return out


#: {referenced data file: (puffin_path, offset, length)} — DV pointer map.
DvPointers = dict[str, tuple[str, int, int]]


def _dv_pointers(table: IceTable, snapshot_id: Optional[int]) -> DvPointers:
    """{referenced data file: (puffin_path, offset, length)} for every
    live deletion vector in a snapshot.  POINTERS only — blob bytes are
    never read on the driver (same 100 TB rule as the scan plane,
    `table.py` `_apply_deletes`); executors fetch + decode lazily per
    worker via ``_decode_dv_pointer_cached``."""
    if snapshot_id is None:
        return {}
    snap = table.metadata.snapshot_by_id(snapshot_id)
    out: DvPointers = {}
    schema = table.schema()
    meta = table.metadata
    for m in mf.read_manifest_list(snap.manifest_list):
        if m.content == mf.MANIFEST_CONTENT_DATA:
            continue  # DVs live in DELETE manifests only
        spec = meta.spec_by_id(m.partition_spec_id)
        for e in mf.read_manifest(m.manifest_path, spec, schema, manifest=m):
            d = e.data_file
            if (e.is_live and d.content == mf.CONTENT_POSITION_DELETES
                    and d.file_format == "puffin" and d.referenced_data_file):
                out[d.referenced_data_file] = (
                    d.file_path, d.content_offset or 0,
                    d.content_size_in_bytes or 0)
    return out


def _dv_member_udf(spark, pointers: DvPointers):
    """Boolean pandas UDF: is (file, pos) marked deleted in the vectors
    `pointers` refers to?  Only the O(#files × ~100B) pointer map is
    broadcast; each executor reads + decodes just the blobs for files it
    actually scans (lru per worker) — no blob bytes through the driver
    or the broadcast."""
    bc = spark.sparkContext.broadcast(pointers)

    @F.pandas_udf("boolean")
    def member(file_s, pos_s):
        import numpy as np
        import pandas as pd

        from iceberg_cpp_spark.core.puffin import _decode_dv_pointer_cached

        files = file_s.str.replace(r"^file:(//)?", "", regex=True).to_numpy()
        out = np.zeros(len(files), dtype=bool)
        positions = pos_s.to_numpy(dtype=np.int64)
        for fp in pd.unique(files):
            ptr = bc.value.get(fp)
            if ptr is None:
                continue
            m = files == fp
            out[m] = np.isin(positions[m].astype(np.uint64),
                             _decode_dv_pointer_cached(*ptr))
        return pd.Series(out)

    return member


def changes(table: IceTable, from_snapshot_id: Optional[int] = None,
            to_snapshot_id: Optional[int] = None, net: bool = False) -> DataFrame:
    """Change rows for every commit in ``(from_snapshot_id,
    to_snapshot_id]``, with ``_change_type`` ('insert' | 'delete'),
    ``_commit_snapshot_id`` and ``_change_ordinal`` columns."""
    spark = table.spark
    meta = table.metadata
    to_id = to_snapshot_id if to_snapshot_id is not None else (
        table.current_snapshot().snapshot_id if table.current_snapshot() else None)
    if to_id is None:
        raise ValueError("table has no snapshots")

    # walk parent links from `to` back to (exclusive) `from`
    chain = []
    cur = meta.snapshot_by_id(to_id)
    while cur is not None and cur.snapshot_id != from_snapshot_id:
        chain.append(cur)
        cur = (meta.snapshot_by_id(cur.parent_snapshot_id)
               if cur.parent_snapshot_id is not None else None)
    if from_snapshot_id is not None and cur is None:
        raise ValueError(
            f"snapshot {from_snapshot_id} is not an ancestor of {to_id}")
    chain.reverse()

    spark_schema = it.to_spark_schema(table.schema())
    cols = [f.name for f in spark_schema.fields]
    parts: list[DataFrame] = []
    prev_id = from_snapshot_id
    for ordinal, snap in enumerate(chain):
        # manifest-level diff: only manifests that CHANGED between the
        # two snapshots decode (r13 — an append commit over a 10^6-file
        # table reads one new manifest, never two full table listings)
        added_m, removed_m = snapshot_diff_files(table, prev_id,
                                                 snap.snapshot_id)
        added = sorted(added_m)
        removed = sorted(removed_m)
        fmts = {**removed_m, **added_m}
        new_pos_deletes = sorted(
            _delete_files(table, snap.snapshot_id) - _delete_files(table, prev_id))
        prev_dvs = _dv_pointers(table, prev_id)
        cur_dvs = _dv_pointers(table, snap.snapshot_id)
        # A rewritten DV lives at a new (puffin, offset) — pointer
        # inequality over-approximates content change (a byte-identical
        # rewrite is included but yields zero delete rows downstream,
        # since _rows already masks the prev vector).
        changed_dvs = {p: ptr for p, ptr in cur_dvs.items()
                       if prev_dvs.get(p) != ptr}
        after: set = set()
        if new_pos_deletes or changed_dvs:
            # only delete-carrying commits need the full live map (fmt
            # lookup + liveness for files their delete rows reference)
            cur_fmts = _snapshot_file_formats(table, snap.snapshot_id)
            fmts = {**removed_m, **cur_fmts}
            after = set(cur_fmts)

        def tag(df: DataFrame, kind: str) -> DataFrame:
            return df.select(
                *cols,
                F.lit(kind).alias(CHANGE_TYPE),
                F.lit(snap.snapshot_id).alias(COMMIT_SNAPSHOT),
                F.lit(ordinal).alias(COMMIT_ORDER),
            )

        prev_deletes = _delete_files(table, prev_id)

        def _rows(paths: list[str], mask_deleted: bool) -> DataFrame:
            """Read data-file rows (format-dispatched parquet/Avro legs,
            same as the scan plane); with mask_deleted, drop positions
            already dead in the BEFORE state. Delete files store plain
            (spec-compliant) paths while `_metadata.file_path` yields a
            file:/ URI — read_data_paths normalizes `_f` on every leg."""
            df = read_data_paths(table, paths, fmts, spark_schema,
                                 need_meta=True)
            if mask_deleted and prev_deletes:
                dels = (spark.read.parquet(*sorted(prev_deletes))
                        .select(F.regexp_replace(F.col("file_path"),
                                                 "^file:(//)?", "")
                                .alias("file_path"), "pos"))
                df = df.join(
                    F.broadcast(dels),
                    (df["_f"] == dels["file_path"]) & (df["_p"] == dels["pos"]),
                    "left_anti")
            if mask_deleted and prev_dvs:
                dead = _dv_member_udf(spark, prev_dvs)
                df = df.filter(~dead(F.col("_f"), F.col("_p")))
            return df

        if added:
            parts.append(tag(_rows(added, False).drop("_f", "_p"), "insert"))
        if removed:
            parts.append(tag(_rows(removed, True).drop("_f", "_p"), "delete"))
        if new_pos_deletes:
            # matched (file, pos) rows of files still live become deletes
            dels = (spark.read.parquet(*new_pos_deletes)
                    .select(F.regexp_replace(F.col("file_path"),
                                             "^file:(//)?", "")
                            .alias("file_path"), "pos"))
            # the semi-join below can only hit rows of files the delete
            # rows REFERENCE — read those, not the whole live set (the
            # referenced list is bounded by the delete batch)
            ref = {r["file_path"] for r in
                   dels.select("file_path").distinct().collect()}
            live = sorted(ref & after)
            if live:
                data = _rows(live, True)
                hit = data.join(
                    F.broadcast(dels),
                    (data["_f"] == dels["file_path"]) & (data["_p"] == dels["pos"]),
                    "left_semi").drop("_f", "_p")
                parts.append(tag(hit, "delete"))
        if changed_dvs:
            # a rewritten DV supersedes its predecessor: the commit's
            # delete rows are positions in the NEW vector but not the old
            live = sorted(after & set(changed_dvs))
            if live:
                data = _rows(live, True)  # masks prev parquet deletes + prev DVs
                in_cur = _dv_member_udf(spark, changed_dvs)
                hit = data.filter(in_cur(F.col("_f"), F.col("_p"))) \
                          .drop("_f", "_p")
                parts.append(tag(hit, "delete"))
        prev_id = snap.snapshot_id

    if not parts:
        empty = spark.createDataFrame([], spark_schema)
        return empty.select(
            "*", F.lit("insert").alias(CHANGE_TYPE),
            F.lit(0).cast("long").alias(COMMIT_SNAPSHOT),
            F.lit(0).alias(COMMIT_ORDER)).limit(0)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if net:
        # cancel identical insert/delete pairs: one hash-agg, keep surplus
        counts = (out.groupBy(*cols).agg(
            F.sum(F.when(F.col(CHANGE_TYPE) == "insert", 1).otherwise(0)).alias("_ins"),
            F.sum(F.when(F.col(CHANGE_TYPE) == "delete", 1).otherwise(0)).alias("_del"),
            F.max(COMMIT_SNAPSHOT).alias(COMMIT_SNAPSHOT),
            F.max(COMMIT_ORDER).alias(COMMIT_ORDER),
        ))
        surplus = counts.withColumn("_net", F.col("_ins") - F.col("_del")) \
                        .filter(F.col("_net") != 0)
        ins = (surplus.filter(F.col("_net") > 0)
               .withColumn("_r", F.explode(F.sequence(F.lit(1), F.col("_net"))))
               .select(*cols, F.lit("insert").alias(CHANGE_TYPE),
                       COMMIT_SNAPSHOT, COMMIT_ORDER))
        dels = (surplus.filter(F.col("_net") < 0)
                .withColumn("_r", F.explode(F.sequence(F.lit(1), -F.col("_net"))))
                .select(*cols, F.lit("delete").alias(CHANGE_TYPE),
                        COMMIT_SNAPSHOT, COMMIT_ORDER))
        out = ins.unionByName(dels)
    return out
