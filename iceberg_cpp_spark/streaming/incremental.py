"""Incremental + streaming reads.

The reference has no streaming executor — its incremental unit is the
snapshot (snapshot log, table_metadata.h:104-107). This module supplies
both halves Spark-natively:

- incremental_read: the files added between two snapshots, as a
  DataFrame (changelog-style append reads; exact parity with what an
  engine built on the reference would diff from manifest lists).
- stream_events: Structured Streaming over a directory of files with
  watermarked tumbling-window aggregation (the standard late-data
  pattern); runs with availableNow for bounded verification.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_cpp_spark.core import manifests as mf
from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.table import IceTable


def _snapshot_file_formats(table: IceTable,
                           snapshot_id: Optional[int]) -> dict[str, str]:
    """{data file path: file_format} for a snapshot's live data files —
    the format is needed because tables can mix parquet and imported
    Avro data files (reference file_reader.h:100-113 dispatches by
    format), so every row-read plane must dispatch too."""
    if snapshot_id is None:
        return {}
    snap = table.metadata.snapshot_by_id(snapshot_id)
    if snap is None:
        raise ValueError(f"snapshot not found: {snapshot_id}")
    out: dict[str, str] = {}
    schema = table.schema()
    meta = table.metadata
    for m in mf.read_manifest_list(snap.manifest_list):
        spec = meta.spec_by_id(m.partition_spec_id)
        for e in mf.read_manifest(m.manifest_path, spec, schema, manifest=m):
            if e.is_live and e.data_file.content == mf.CONTENT_DATA:
                out[e.data_file.file_path] = (
                    e.data_file.file_format or "parquet").lower()
    return out


def _snapshot_files(table: IceTable, snapshot_id: Optional[int]) -> set[str]:
    return set(_snapshot_file_formats(table, snapshot_id))


def _manifest_map(table: IceTable, snapshot_id: Optional[int]) -> dict:
    if snapshot_id is None:
        return {}
    snap = table.metadata.snapshot_by_id(snapshot_id)
    if snap is None:
        raise ValueError(f"snapshot not found: {snapshot_id}")
    return {m.manifest_path: m
            for m in mf.read_manifest_list(snap.manifest_list)}


def _entries_fmt(table: IceTable, manifests) -> dict[str, str]:
    out: dict[str, str] = {}
    schema = table.schema()
    meta = table.metadata
    for m in manifests:
        if m.content != mf.MANIFEST_CONTENT_DATA:
            continue
        spec = meta.spec_by_id(m.partition_spec_id)
        for e in mf.read_manifest(m.manifest_path, spec, schema,
                                  manifest=m):
            if e.is_live and e.data_file.content == mf.CONTENT_DATA:
                out[e.data_file.file_path] = (
                    e.data_file.file_format or "parquet").lower()
    return out


def snapshot_diff_files(table: IceTable, prev_id: Optional[int],
                        cur_id: Optional[int]
                        ) -> tuple[dict[str, str], dict[str, str]]:
    """(added, removed) as {data file path: format} between two
    snapshots — decoding entries of CHANGED manifests only. Manifests
    are immutable files, so one present in BOTH snapshots cannot
    contribute to the diff; an append over a 10^6-file table decodes
    ONE new manifest instead of walking the whole table twice (the
    boundary the full `_snapshot_file_formats` walk has)."""
    pm = _manifest_map(table, prev_id)
    cm = _manifest_map(table, cur_id)
    prev_only = [m for p, m in pm.items() if p not in cm]
    cur_only = [m for p, m in cm.items() if p not in pm]
    a = _entries_fmt(table, cur_only)
    r = _entries_fmt(table, prev_only)
    added = {p: f for p, f in a.items() if p not in r}
    removed = {p: f for p, f in r.items() if p not in a}
    return added, removed


def read_data_paths(table: IceTable, paths: list[str],
                    fmts: dict[str, str], spark_schema,
                    need_meta: bool = False) -> DataFrame:
    """Format-dispatched union read of table data files, mirroring
    TableScan.to_df's parquet/Avro legs (reference
    file_reader.h:100-113). With ``need_meta`` each leg carries
    ``_f`` (spec path, file: scheme stripped) and ``_p`` (row position
    within the file) so delete/DV masking composes identically across
    formats."""
    from pyspark.sql import types as T

    spark = table.spark
    if need_meta:
        out_schema = T.StructType(
            list(spark_schema.fields)
            + [T.StructField("_f", T.StringType()),
               T.StructField("_p", T.LongType())])
    else:
        out_schema = spark_schema
    if not paths:
        return spark.createDataFrame([], out_schema)
    by_fmt: dict[str, list[str]] = {}
    for p in paths:
        by_fmt.setdefault(fmts.get(p, "parquet"), []).append(p)
    unknown = sorted(set(by_fmt) - {"parquet", "avro", "orc"})
    if unknown:
        raise NotImplementedError(
            f"no row reader for data-file format(s) {unknown} on the "
            "incremental/changelog plane")
    legs: list[DataFrame] = []
    if by_fmt.get("parquet"):
        df = spark.read.schema(spark_schema).parquet(
            *sorted(by_fmt["parquet"]))
        if need_meta:
            df = df.select(
                "*",
                F.regexp_replace(F.col("_metadata.file_path"),
                                 "^file:(//)?", "").alias("_f"),
                F.col("_metadata.row_index").alias("_p"))
        legs.append(df)
    if by_fmt.get("avro"):
        leg = table.scan()._read_avro_paths(
            spark, table.schema(), spark_schema,
            sorted(by_fmt["avro"]), need_meta)
        if need_meta:
            leg = (leg.withColumnRenamed("_file", "_f")
                   .withColumnRenamed("_pos", "_p"))
        legs.append(leg)
    if by_fmt.get("orc"):
        leg = table.scan()._read_orc_paths(
            spark, table.schema(), spark_schema,
            sorted(by_fmt["orc"]), need_meta)
        if need_meta:
            leg = (leg.withColumnRenamed("_file", "_f")
                   .withColumnRenamed("_pos", "_p"))
        legs.append(leg)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def incremental_read(table: IceTable, from_snapshot_id: Optional[int],
                     to_snapshot_id: Optional[int] = None) -> DataFrame:
    """Rows in files added after ``from_snapshot_id`` up to
    ``to_snapshot_id`` (default: current). The append-only changelog:
    reading only the NEW files, not a diff of row sets."""
    to_id = to_snapshot_id if to_snapshot_id is not None else (
        table.current_snapshot().snapshot_id if table.current_snapshot() else None)
    # manifest-level diff: only CHANGED manifests decode (an append on a
    # 10^6-file table reads one small manifest, not the whole listing)
    added, _removed = snapshot_diff_files(table, from_snapshot_id, to_id)
    spark_schema = it.to_spark_schema(table.schema())
    return read_data_paths(table, sorted(added), added, spark_schema)


def _stream_id(checkpoint_dir: str) -> str:
    """Stable identity for one streaming query across restarts: Spark's
    own persisted query id (``<checkpoint>/metadata``). Losing the
    checkpoint generates a NEW query id, so replays after checkpoint loss
    degrade to at-least-once (possible duplicates) — never to silent
    data loss, which is what a path-derived id would cause when a wiped
    checkpoint renumbers batches containing genuinely new rows below the
    table's old watermark. Falls back to a path hash only if the
    metadata file is unreadable (same failure mode as Iceberg's sink)."""
    import json
    import os

    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return json.load(f)["id"]
    except (OSError, ValueError, KeyError):
        import hashlib

        return hashlib.sha1(
            os.path.abspath(checkpoint_dir).encode()).hexdigest()[:16]


def _last_committed_batch(table: IceTable, stream_id: str) -> int:
    """Highest batch id this stream has committed, from snapshot
    summaries (the Iceberg sink's replay-dedup scheme: commit metadata,
    not an external registry, is the source of truth). -1 if none.
    Caveat (same as Iceberg's): expire_snapshots dropping EVERY snapshot
    of a stream forgets its watermark — keep_last >= 1 retains it."""
    last = -1
    for s in table.metadata.snapshots:
        if s.summary.get("streaming.source-id") == stream_id:
            try:
                last = max(last, int(s.summary["streaming.batch-id"]))
            except (KeyError, ValueError):
                pass
    return last


def append_stream(stream_df, table: IceTable, checkpoint_dir: str,
                  trigger_available_now: bool = True):
    """Structured-Streaming sink into an IceTable: each micro-batch is
    one atomic append snapshot (foreachBatch — the standard Spark
    pattern for transactional sinks). Combined with incremental_read
    this gives an end-to-end exactly-once pipeline: stream in →
    snapshots → incremental consumers.

    Exactly-once, not at-least-once: after a crash between a table
    commit and the checkpoint write, Spark REPLAYS the last micro-batch.
    The sink records (stream-id, batch-id) in each snapshot summary and
    skips any batch at or below the stream's committed watermark, so the
    replay is a no-op instead of a duplicate append.

    Returns the StreamingQuery; caller awaits termination."""
    state: dict = {}

    def commit_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # query id is written by start(); resolve lazily on first batch
        sid = state.setdefault("sid", _stream_id(checkpoint_dir))
        fresh = lambda: batch_id > _last_committed_batch(table, sid)
        table.refresh()
        if not fresh():
            return  # checkpoint replay after restart — already committed
        # pre_check re-verifies the watermark inside the CAS retry loop:
        # a zombie driver racing its replacement loses the CAS, refreshes,
        # sees the batch committed, and abandons instead of re-appending
        table.append(batch_df, summary_extras={
            "streaming.source-id": sid, "streaming.batch-id": str(batch_id)},
            pre_check=fresh)

    writer = stream_df.writeStream.foreachBatch(commit_batch) \
        .option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def scd2_stream(stream_df, table: IceTable, key: list[str],
                checkpoint_dir: str, effective_col: str,
                tracked=None, trigger_available_now: bool = True):
    """Streaming SCD Type 2 sink: each micro-batch versions the
    dimension through operators/scd.scd2_apply — changed keys close
    their current row and insert the new version, one snapshot per
    batch.

    ``effective_col`` is an event-time column in the stream: the
    batch's effective timestamp is its MAX, so a checkpoint replay
    re-derives the identical timestamp (no wall clock — the scd2
    determinism rule). Within a batch, the LATEST row per key (by
    ``effective_col``) wins. Replayed batches are skipped via the same
    snapshot-summary watermark as append_stream."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iceberg_cpp_spark.operators import scd

    state: dict = {}

    def apply_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sid = state.setdefault("sid", _stream_id(checkpoint_dir))
        fresh = lambda: batch_id > _last_committed_batch(table, sid)
        table.refresh()
        if not fresh():
            return
        eff = batch_df.agg(F.max(effective_col)).collect()[0][0]
        w = Window.partitionBy(*key).orderBy(F.col(effective_col).desc())
        # the event-time column is often ALSO a dimension attribute
        # (e.g. updated_at) — only strip it when the dimension schema
        # doesn't carry it, else scd2_apply's projection would miss it
        dim_cols = {f.name for f in table.schema().fields}
        drop_cols = (["_rn"] if effective_col in dim_cols
                     else ["_rn", effective_col])
        deduped = (batch_df.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop(*drop_cols))
        scd.scd2_apply(table, deduped, key=key, effective=eff,
                       tracked=tracked, summary_extras={
                           "streaming.source-id": sid,
                           "streaming.batch-id": str(batch_id)},
                       pre_check=fresh)

    writer = stream_df.writeStream.foreachBatch(apply_batch) \
        .option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_stream(stream_df, table: IceTable, on: list[str],
                  checkpoint_dir: str,
                  trigger_available_now: bool = True):
    """Streaming MERGE INTO (the CDC-apply pattern): each micro-batch is
    deduplicated on the merge keys (last row wins within the batch) and
    upserted into the table as one copy-on-write snapshot. Replayed
    batches are skipped via the same snapshot-summary watermark as
    append_stream (a replayed MERGE is value-idempotent but would still
    burn a needless file rewrite)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    state: dict = {}

    def apply_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sid = state.setdefault("sid", _stream_id(checkpoint_dir))
        fresh = lambda: batch_id > _last_committed_batch(table, sid)
        table.refresh()
        if not fresh():
            return
        w = Window.partitionBy(*on).orderBy(F.monotonically_increasing_id().desc())
        deduped = (batch_df.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn"))
        table.merge_into(deduped, on=on, summary_extras={
            "streaming.source-id": sid, "streaming.batch-id": str(batch_id)},
            pre_check=fresh)

    writer = stream_df.writeStream.foreachBatch(apply_batch) \
        .option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_apply_stream(stream_df, table: IceTable, on: list,
                     checkpoint_dir: str, op_col: str = "_op",
                     seq_col=None, trigger_available_now: bool = True):
    """Streaming CDC apply: each micro-batch of 'I'/'U'/'D' change rows
    becomes ONE copy-on-write snapshot via IceTable.apply_changes.
    Replay-deduped with the same snapshot-summary batch watermark as
    append_stream/upsert_stream (re-checked inside the CAS retry)."""
    state: dict = {}

    def apply_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sid = state.setdefault("sid", _stream_id(checkpoint_dir))
        fresh = lambda: batch_id > _last_committed_batch(table, sid)
        table.refresh()
        if not fresh():
            return
        table.apply_changes(batch_df, on=on, op_col=op_col,
                            seq_col=seq_col, summary_extras={
                                "streaming.source-id": sid,
                                "streaming.batch-id": str(batch_id)},
                            pre_check=fresh)

    writer = stream_df.writeStream.foreachBatch(apply_batch) \
        .option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_ingest_stream(stream_df, target: IceTable, store: IceTable,
                        checkpoint_dir: str, text_col: str = "text",
                        id_col: str = "doc_id", num_perm: int = 128,
                        bands: int = 32, shingle_width: int = 3,
                        trigger_available_now: bool = True):
    """Streaming ingestion with STORE-BACKED near-dedup: each
    micro-batch is deduped against the persisted LSH bucket store
    (``operators/dedup.py minhash_incremental_dedup`` — the existing
    corpus is never re-hashed) plus itself; survivors append to the
    TARGET table as one snapshot and their buckets publish to the STORE
    with an insert-only MERGE.

    Replay safety is two-layered and ORDER-SENSITIVE: the dedup
    decision and the target append run BEFORE the store publish —
    publishing first would make a replayed batch see its own buckets
    and drop every row (silent data loss). The target carries the
    (stream-id, batch-id) snapshot-summary watermark (same scheme as
    append_stream) so a replayed batch never re-appends, and the store
    publish is key-idempotent (re-inserting the same buckets inserts
    nothing) and re-run even on the replay-skip path — so a crash
    between the two commits converges on replay instead of corrupting
    either table."""
    from iceberg_cpp_spark.operators.dedup import (
        minhash_incremental_candidates, minhash_publish_buckets)

    state: dict = {}

    def ingest_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sid = state.setdefault("sid", _stream_id(checkpoint_dir))
        fresh = lambda: batch_id > _last_committed_batch(target, sid)
        target.refresh()
        store.refresh()
        survivors, new_rows = minhash_incremental_candidates(
            store, batch_df, text_col=text_col, id_col=id_col,
            num_perm=num_perm, bands=bands, shingle_width=shingle_width)
        # the decision and the publish rows must not recompute between
        # the two commits (nondeterministic sources) — pin them
        survivors = survivors.localCheckpoint(eager=True)
        new_rows = new_rows.localCheckpoint(eager=True)
        if fresh():
            target.append(survivors, summary_extras={
                "streaming.source-id": sid,
                "streaming.batch-id": str(batch_id)},
                pre_check=fresh)
        # ALWAYS publish (even when the append was replay-skipped): a
        # crash after the target commit but before the publish leaves
        # the store behind; the replay path heals it idempotently
        minhash_publish_buckets(store, new_rows)

    writer = stream_df.writeStream.foreachBatch(ingest_batch) \
        .option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events(spark, source_dir: str, schema: str,
                  ts_col: str = "ts", value_col: str = "value",
                  window: str = "1 hour", watermark: str = "2 hours",
                  group_col: str = "event_type") -> DataFrame:
    """Watermarked tumbling-window aggregation over a file stream.
    Returns the streaming DataFrame; caller picks sink + trigger
    (tests use ``availableNow`` + memory sink for bounded runs)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(group_col))
        .agg(
            F.count("*").alias("n_events"),
            # decimal sum: exact and partition-order independent, so the
            # result is deterministic across core counts (float policy)
            F.sum(F.col(value_col).cast("decimal(28,10)"))
            .cast("double").alias("sum_value"),
        )
    )
