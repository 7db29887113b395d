"""Spark Python DataSource ("icecpp"): the engine's table format as a
first-class `spark.read.format(...)` source/sink.

This is the DSv2-style integration surface the reference leaves to
"the engine embedding the SDK" (its C-ABI ArrowArrayStream hand-off,
table_scan.cc:139-163) — realized here with Spark 4's Python DataSource
API:

- batch read with partition-per-FileScanTask, manifest pruning driven
  by pushed filters (``pushFilters``); merge-on-read deletes applied
  per partition (parquet position deletes + deletion vectors as one
  original-position mask, then equality deletes as sequence-gated
  arrow anti-joins);
- transactional batch write (append/overwrite): executors stream Arrow
  batches into parquet files with Iceberg field-id metadata, the driver
  commits ONE snapshot from the collected commit messages (exactly the
  AppendFiles two-phase shape, transaction.h:31-51);
- streaming source: snapshot-sequence offsets; each microbatch reads
  files whose sequence number falls in (start, end]. Two planes: the
  DEFAULT full reader decodes in executors (bin-packed partitions, no
  driver prefetch — Trigger.AvailableNow over a huge commit behaves
  like a batch scan), while `max-files-per-trigger` routes to the
  simple prefetching reader whose sub-commit {"seq","idx"} cursor
  implements per-trigger backpressure (replayable via
  ``readBetweenOffsets``).

Usage::

    spark.dataSource.register(IcebergCppDataSource)
    df = spark.read.format("icecpp").load("/path/to/table")
    df.write.format("icecpp").mode("append").save("/path/to/table")
    s = spark.readStream.format("icecpp").load("/path/to/table")
"""

from __future__ import annotations

import os
import uuid as uuid_mod
from dataclasses import dataclass, field as dc_field
from typing import Iterator, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    StringStartsWith,
    WriterCommitMessage,
)

from iceberg_cpp_spark.plans import expressions as ex


def _load_table(options):
    from iceberg_cpp_spark.table import IceTable

    path = options.get("path")
    if not path:
        raise ValueError("icecpp requires a table path: .load('/path/to/table')")
    return IceTable.load(None, path)


def _reader_parallelism(options) -> int:
    """Cluster parallelism as seen from a DataSource planning hook.

    Spark 4 runs ``partitions()`` in a dedicated planner Python worker
    where no SparkSession exists (ADVICE r17), so the session probe the
    r17 maxSplitBytes formula used silently fell back to 1 and the
    scale-adaptive fan-out never engaged on the raw ``spark.read`` path
    (measured: a 64-file table read as 3 tasks). Resolution order:

    1. the ``default-parallelism`` read option — the engine's own scan
       plane (`_to_df_via_datasource`) ships the live session's value;
    2. an active session (covers environments that still plan on the
       driver);
    3. ``$SPARK_GRAFT_CPUS`` — the harness-level core count, inherited
       by the planner worker's environment;
    4. 1 (the pre-r17 behavior: one bin per 128 MB target).
    """
    opt = options.get("default-parallelism")
    if opt:
        return max(1, int(opt))
    try:
        from pyspark.sql import SparkSession as _SS
        _sess = _SS.getActiveSession()
        if _sess is not None:
            return max(1, int(_sess.sparkContext.defaultParallelism))
    except Exception:
        pass
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return 1


def _split_sizing(options, props, total_charged: int, par: int
                  ) -> tuple[int, int]:
    """(effective split target, open cost) — Spark's own maxSplitBytes
    formula, ``min(target, max(openCost, bytesPerCore))``, shared by the
    batch reader and the streaming full reader (VERDICT r17 task 5) so
    both planes fan a sub-target table out across the cluster instead
    of packing it into one task. ``total_charged`` must already include
    the per-file open cost."""
    target = int(options.get(
        "split-target-bytes",
        props.get("read.split.target-size", str(128 * 1024 * 1024))))
    open_cost = int(options.get(
        "open-cost-bytes",
        props.get("read.split.open-file-cost", str(4 * 1024 * 1024))))
    return (min(target, max(open_cost, -(-total_charged // max(1, par)))),
            open_cost)


def _pack_by_bytes(items, size_of, target: int, open_cost: int) -> list:
    """First-fit bin packing of an ordered item list into ~target-byte
    bins, every item charged ``open_cost`` on top of its size —
    deterministic given the input order."""
    bins: list = []
    cur: list = []
    cur_bytes = 0
    for item in items:
        charged = (size_of(item) or 0) + open_cost
        if cur and cur_bytes + charged > target:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(item)
        cur_bytes += charged
    if cur:
        bins.append(cur)
    return bins


def _make_scan(table, options, flt=None):
    """Scan honoring the reader's time-travel options. Used by both
    partitions() and schema() so the FILES and the SCHEMA pin the same
    snapshot (time travel must not read snapshot files with the head
    schema's field ids/defaults)."""
    scan = table.scan(filter=flt)
    if options.get("snapshot-id"):
        scan = scan.use_snapshot(int(options["snapshot-id"]))
    if options.get("branch"):
        scan = scan.use_ref(options["branch"])
    if options.get("as-of-timestamp-ms"):
        scan = scan.as_of(int(options["as-of-timestamp-ms"]))
    return scan


def _filter_to_expr(f) -> Optional[ex.Expression]:
    """DSv2 Filter → engine expression. Only top-level single-column
    filters arrive here (Spark pre-splits the AND)."""
    col = ".".join(f.attribute)
    r = ex.Reference(col)
    if isinstance(f, EqualTo):
        return ex.eq(r, f.value)
    if isinstance(f, GreaterThan):
        return ex.gt(r, f.value)
    if isinstance(f, GreaterThanOrEqual):
        return ex.gt_eq(r, f.value)
    if isinstance(f, LessThan):
        return ex.lt(r, f.value)
    if isinstance(f, LessThanOrEqual):
        return ex.lt_eq(r, f.value)
    if isinstance(f, In):
        return ex.in_(r, list(f.value))
    if isinstance(f, IsNull):
        return ex.is_null(r)
    if isinstance(f, IsNotNull):
        return ex.not_null(r)
    if isinstance(f, StringStartsWith):
        return ex.starts_with(r, f.value)
    return None


def _cast_to_declared(tbl, spark_schema):
    """Cast a parquet-read Arrow table to the declared source schema.
    Files store tz-adjusted timestamps; the declared Spark schema may be
    NTZ — Spark's runner asserts batch schema == declared schema, so the
    tz must be dropped here (wall-clock values are unchanged)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(spark_schema)
    if tbl.schema != target:
        tbl = tbl.cast(target)
    return tbl


@dataclass
class ScanPartition(InputPartition):
    # one or more data files bin-packed to ~split-target bytes: at
    # 10^6-file scale one-partition-per-file would mean 10^6 python
    # tasks; packing keeps task count proportional to DATA size.
    # Each entry: (file_path, file_sequence_number, dv_blob) where
    # dv_blob = (puffin path, blob offset, blob length) or None.
    files: list = dc_field(default_factory=list)
    pos_delete_paths: list = dc_field(default_factory=list)
    # equality deletes: (path, delete sequence number, [key column names])
    eq_deletes: list = dc_field(default_factory=list)
    # v3 initial-defaults: (column name, default value, added-at sequence)
    column_defaults: list = dc_field(default_factory=list)
    # logical column name -> iceberg field id (read-side resolution is
    # by field ID, schema_util.h:91-93 — name is only the fallback for
    # imported ID-less files)
    field_ids: dict = dc_field(default_factory=dict)
    # schema.name-mapping.default JSON (if set on the table): lets the
    # name fallback resolve mapped ALIASES in ID-less files, matching
    # the native TableScan path
    name_mapping_json: Optional[str] = None


@dataclass
class FilesCommit(WriterCommitMessage):
    paths: list = dc_field(default_factory=list)


class IcebergCppReader(DataSourceReader):
    def __init__(self, options, schema):
        self.options = options
        self.spark_schema = schema
        self.pushed: list[ex.Expression] = []

    def pushFilters(self, filters):
        for f in filters:
            e = _filter_to_expr(f)
            if e is not None:
                self.pushed.append(e)
            # every filter is still re-applied by Spark (we prune FILES
            # with it; row-level residual evaluation stays in Spark)
            yield f

    def partitions(self):
        table = _load_table(self.options)
        flt: ex.Expression = ex.TrueExp()
        for e in self.pushed:
            flt = e if isinstance(flt, ex.TrueExp) else (flt & e)
        scan = _make_scan(table, self.options,
                          None if isinstance(flt, ex.TrueExp) else flt)
        deletes = scan.plan_deletes()
        pos = [d.file_path for d in deletes
               if d.content == 1 and not d.is_deletion_vector]
        dvs = {d.referenced_data_file: (d.file_path, d.content_offset,
                                        d.content_size_in_bytes)
               for d in deletes if d.is_deletion_vector}
        # the SNAPSHOT's schema, not the head's: time-travel scans must
        # resolve field ids / eq-delete key names / defaults as of the
        # pinned snapshot
        schema = scan.read_schema()
        eq = []
        for d in deletes:
            if d.content == 2:  # CONTENT_EQUALITY_DELETES
                cols = [schema.find_field_by_id(fid).name
                        for fid in d.equality_ids]
                eq.append((d.file_path, d.sequence_number, cols))
        props = table.properties()
        defaults = [
            (f.name, f.initial_default,
             int(props.get(f"engine.default-added-seq.{f.field_id}", "-1")))
            for f in schema.fields if f.initial_default is not None]
        fids = {f.name: f.field_id for f in schema.fields}
        from iceberg_cpp_spark.core import name_mapping as nm

        mapping_json = props.get(nm.PROPERTY_KEY)
        # bin-pack files into ~split-target-byte partitions (first-fit
        # over the path-sorted task list — deterministic): task count
        # tracks data volume, not file count. The EFFECTIVE target is
        # Spark's own maxSplitBytes formula (r17, guide §2 "scale-
        # adaptive partitioning"): min(target, max(openCost,
        # bytesPerCore)) with every file charged openCost — so a table
        # smaller than one split still fans out across the cluster
        # (the old fixed 128 MB target packed ANY sub-128 MB table
        # into ONE task), while at real scale bytesPerCore exceeds the
        # target and nothing changes. Formula + packing shared with the
        # streaming full reader (_split_sizing/_pack_by_bytes).
        tasks = sorted(scan.plan_files(), key=lambda t: t.file_path)
        par = _reader_parallelism(self.options)
        open_probe = int(self.options.get(
            "open-cost-bytes",
            props.get("read.split.open-file-cost", str(4 * 1024 * 1024))))
        total = sum((t.file_size_in_bytes or 0) + open_probe for t in tasks)
        target, open_cost = _split_sizing(self.options, props, total, par)
        return [
            ScanPartition(
                files=[(t.file_path, t.sequence_number,
                        dvs.get(t.file_path)) for t in bin_tasks],
                pos_delete_paths=pos, eq_deletes=eq,
                column_defaults=defaults, field_ids=fids,
                name_mapping_json=mapping_json)
            for bin_tasks in _pack_by_bytes(
                tasks, lambda t: t.file_size_in_bytes, target, open_cost)
        ]

    def read(self, partition: ScanPartition):
        # one task reads every bin-packed file of the partition; delete
        # tables (position + equality keys) are loaded ONCE and reused
        # across the packed files — never re-read per data file
        eq_keys_cache: dict = {}
        pos_dels = None
        if partition.pos_delete_paths:
            import pyarrow.parquet as pq

            pos_dels = pq.read_table(partition.pos_delete_paths,
                                     columns=["file_path", "pos"])
        for file_path, file_seq, dv_blob in partition.files:
            tbl = self._read_one(partition, file_path, file_seq, dv_blob,
                                 eq_keys_cache, pos_dels)
            for batch in tbl.to_batches(max_chunksize=65536):
                yield batch

    def _read_one(self, partition: ScanPartition, file_path: str,
                  file_seq: int, dv_blob, eq_keys_cache: dict,
                  pos_dels=None):
        import pyarrow as pa
        import pyarrow.parquet as pq

        names = [f.name for f in self.spark_schema.fields]
        pf = pq.ParquetFile(file_path)
        arrow_schema = pf.schema_arrow
        # resolve columns by parquet field-id metadata (files are written
        # with field IDs); name is only the fallback for imported ID-less
        # files — so renamed columns keep reading data written under the
        # old name, matching the native TableScan path
        pq_by_id: dict[int, str] = {}
        for af in arrow_schema:
            raw = (af.metadata or {}).get(b"PARQUET:field_id")
            if raw is not None:
                try:
                    pq_by_id[int(raw)] = af.name
                except ValueError:
                    pass
        present = set(arrow_schema.names)
        mapping = None
        if partition.name_mapping_json:
            from iceberg_cpp_spark.core import name_mapping as nm

            mapping = nm.NameMapping.from_json_string(
                partition.name_mapping_json)
        resolve: dict[str, str] = {}  # logical name -> physical column
        for n in names:
            fid = partition.field_ids.get(n)
            if fid is not None and fid in pq_by_id:
                resolve[n] = pq_by_id[fid]
            elif mapping is not None and not pq_by_id and fid is not None:
                # ID-less file + name mapping: the MAPPING has priority
                # over a same-named file column (a rename-swap after
                # import may bind this file name to a DIFFERENT field
                # id) — resolve exclusively via the mapped aliases, the
                # rule Iceberg applies whenever a mapping is present
                alias = next((a for a in mapping.names_for(fid)
                              if a in present), None)
                if alias is not None:
                    resolve[n] = alias
            elif (mapping is None and n in present
                  and (not pq_by_id or fid is None)):
                resolve[n] = n
        tbl = pq.read_table(file_path, columns=list(resolve.values()))
        physical_to_logical = {v: k for k, v in resolve.items()}
        tbl = tbl.rename_columns(
            [physical_to_logical[c] for c in tbl.column_names])
        # schema evolution: files predating a column read null — or the
        # column's v3 initial-default when this file is older than it
        defaults = {n: v for n, v, gate in partition.column_defaults
                    if file_seq <= gate}
        for n in names:
            if n not in resolve:
                v = defaults.get(n)
                col = (pa.nulls(tbl.num_rows) if v is None
                       else pa.array([v] * tbl.num_rows))
                tbl = tbl.append_column(n, col)
        tbl = _cast_to_declared(tbl.select(names), self.spark_schema)
        dead: set = set()
        if pos_dels is not None:
            import pyarrow.compute as pc

            uri = "file:" + file_path
            mask = pc.is_in(
                pos_dels.column("file_path"),
                value_set=pa.array([file_path, uri,
                                    "file://" + file_path]))
            dead.update(pos_dels.filter(mask).column("pos").to_pylist())
        if dv_blob is not None:
            from iceberg_cpp_spark.core import puffin as pf

            path, off, length = dv_blob
            dead.update(pf.parse_dv_blob(pf.read_blob(
                path, pf.BlobMetadata(type=pf.DELETION_VECTOR_V1,
                                      offset=off, length=length)))
                .to_array().tolist())
        if dead:
            # all delete kinds refer to ORIGINAL file positions: one take
            import numpy as np

            keep = np.setdiff1d(np.arange(tbl.num_rows, dtype=np.int64),
                                np.fromiter(dead, dtype=np.int64, count=len(dead)))
            tbl = tbl.take(keep)
        for path, seq, cols in sorted(partition.eq_deletes, key=lambda e: e[1]):
            # sequence visibility: a delete only hits OLDER data files
            # (same rule as TableScan._apply_deletes). Null-safe key
            # matching per spec: NULL delete keys match NULL row values —
            # arrow's hash join drops nulls, so null-bearing delete rows
            # go through an explicit is_null-aware mask instead.
            if file_seq >= seq:
                continue
            import pyarrow.compute as pc

            ck = (path, tuple(cols))
            if ck not in eq_keys_cache:
                eq_keys_cache[ck] = (pq.read_table(path, columns=cols)
                                     .group_by(cols).aggregate([]))
            keys = eq_keys_cache[ck]
            valid = None
            for c in cols:
                m = pc.is_valid(keys.column(c))
                valid = m if valid is None else pc.and_(valid, m)
            clean = keys.filter(valid)
            withnull = keys.filter(pc.invert(valid))
            if clean.num_rows:
                tbl = tbl.join(clean, keys=cols, join_type="left anti")
            for row in withnull.to_pylist():
                hit = None
                for c in cols:
                    v = row[c]
                    m = (pc.is_null(tbl.column(c)) if v is None
                         else pc.fill_null(pc.equal(tbl.column(c), v), False))
                    hit = m if hit is None else pc.and_(hit, m)
                if hit is not None:
                    tbl = tbl.filter(pc.invert(hit))
        return tbl


class IcebergCppWriter(DataSourceArrowWriter):
    """Fanout writer: each executor splits its Arrow batches by
    partition tuple (the table's transforms applied per batch) and
    streams one parquet file per live partition; the driver commits ONE
    snapshot from all commit messages (AppendFiles two-phase shape,
    transaction.h:31-51)."""

    def __init__(self, options, overwrite: bool):
        self.options = options
        self.overwrite = overwrite
        table = _load_table(options)  # driver-side validation
        self.location = table.location()
        schema = table.schema()
        self.field_ids = {f.name: f.field_id for f in schema.fields}
        # picklable partition recipe: (partition name, source column,
        # transform string, source IcebergType)
        self.part_fields = []
        for pf in table.spec().fields:
            src = schema.find_field_by_id(pf.source_id)
            self.part_fields.append(
                (pf.name, src.name, str(pf.transform), src.field_type))
        self.write_dir = os.path.join(
            self.location, "data", uuid_mod.uuid4().hex)

    def _partition_codes(self, batch):
        """Per-row partition tuples for one arrow batch."""
        from iceberg_cpp_spark.functions.transforms import from_string

        cols = []
        for _name, src, tstr, stype in self.part_fields:
            t = from_string(tstr)
            vals = batch.column(src).to_pylist()
            cols.append([t.pyvalue(v, stype) for v in vals])
        return list(zip(*cols)) if cols else [()] * batch.num_rows

    def _arrow_schema(self, batch):
        import pyarrow as pa

        fields = []
        for f in batch.schema:
            fid = self.field_ids.get(f.name)
            md = {b"PARQUET:field_id": str(fid).encode()} if fid else None
            fields.append(pa.field(f.name, f.type, f.nullable, metadata=md))
        return pa.schema(fields)

    def write(self, iterator) -> FilesCommit:
        """Executor-side: one open ParquetWriter per partition tuple."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.write_dir, exist_ok=True)
        writers: dict = {}  # partition tuple -> (path, ParquetWriter, n)
        schema = None
        for batch in iterator:
            if schema is None:
                schema = self._arrow_schema(batch)
            batch = batch.cast(schema)
            if not self.part_fields:
                groups = {(): batch}
            else:
                codes = self._partition_codes(batch)
                idx: dict = {}
                for i, key in enumerate(codes):
                    idx.setdefault(key, []).append(i)
                groups = {k: batch.take(pa.array(v)) for k, v in idx.items()}
            for key, part in groups.items():
                if key not in writers:
                    path = os.path.join(
                        self.write_dir, f"part-{uuid_mod.uuid4().hex}.parquet")
                    writers[key] = [path, pq.ParquetWriter(
                        path, schema, compression="zstd"), 0]
                ent = writers[key]
                if isinstance(part, pa.Table):
                    for b in part.to_batches():
                        ent[1].write_batch(b)
                else:
                    ent[1].write_batch(part)
                ent[2] += part.num_rows
        out = []
        pnames = [p[0] for p in self.part_fields]
        for key, (path, w, n) in writers.items():
            w.close()
            if n:
                out.append({"path": path,
                            "partition": dict(zip(pnames, key))})
        return FilesCommit(paths=out)

    def commit(self, messages) -> None:
        """Driver-side: ONE snapshot for all executor files (two-phase
        commit; the table's CAS protects against concurrent writers)."""
        self._commit_messages(messages)

    def _commit_messages(self, messages, summary_extras=None,
                         pre_check=None) -> None:
        from iceberg_cpp_spark.core import manifests as mf
        from iceberg_cpp_spark.core.metadata import DataOperation
        from iceberg_cpp_spark.core.metrics import collect_metrics

        table = _load_table(self.options)
        entries = sorted((e for m in messages if m for e in m.paths),
                         key=lambda e: e["path"])
        if not entries:
            return
        metrics = collect_metrics(None, [e["path"] for e in entries],
                                  table.schema())
        files = []
        for e in entries:
            p = e["path"]
            m = metrics[p]
            files.append(mf.DataFile(
                content=mf.CONTENT_DATA, file_path=p, file_format="parquet",
                partition=e.get("partition", {}), record_count=m["record_count"],
                file_size_in_bytes=os.path.getsize(p),
                column_sizes=m.get("column_sizes", {}),
                value_counts=m.get("value_counts", {}),
                null_value_counts=m.get("null_value_counts", {}),
                nan_value_counts=m.get("nan_value_counts", {}),
                lower_bounds=m.get("lower_bounds", {}),
                upper_bounds=m.get("upper_bounds", {}),
                split_offsets=m.get("split_offsets", []),
            ))
        op = DataOperation.OVERWRITE if self.overwrite else DataOperation.APPEND
        table._commit_files(files, operation=op,
                            carry_existing=not self.overwrite,
                            summary_extras=summary_extras,
                            pre_check=pre_check)

    def abort(self, messages) -> None:
        self._remove_files(messages)

    def _remove_files(self, messages) -> None:
        for m in messages:
            if not m:
                continue
            for e in m.paths:
                try:
                    os.remove(e["path"] if isinstance(e, dict) else e)
                except OSError:
                    pass


class IcebergCppStreamWriter(IcebergCppWriter, DataSourceStreamArrowWriter):
    """`df.writeStream.format("icecpp")` sink: executors reuse the batch
    fanout writer per micro-batch; the driver commits ONE append snapshot
    per micro-batch stamped with (streaming.source-id, batch-id) — the
    same exactly-once watermark as streaming/incremental.append_stream,
    re-checked inside the CAS retry, so checkpoint replays and zombie
    drivers are swallowed instead of double-appended. The replayed
    batch's freshly-written duplicate files are removed.

    The watermark identity is, in order: an explicit
    `.option("streaming-source-id", ...)`; else Spark's persisted query
    id from the checkpoint (`<checkpointLocation>/metadata`) — so a lost
    checkpoint yields a NEW id and degrades to at-least-once duplicates,
    never silent data loss from renumbered batches. With NEITHER
    visible the sink raises: a constant identity shared by every query
    writing the table would make independent streams share one batch-id
    watermark, silently skipping the lower-numbered stream's batches
    (data loss). Set the option explicitly when the checkpoint comes
    from session defaults instead of a writer option."""

    def __init__(self, options):
        IcebergCppWriter.__init__(self, options, overwrite=False)
        self._sid_cache: dict = {}
        # eager identity validation (ADVICE r06): a missing watermark
        # identity must fail at query START. The former lazy raise fired
        # at the first commit(), AFTER executors had written the whole
        # micro-batch's data files — orphaning them on disk on every
        # restart of a misconfigured query. Only the checkpoint-metadata
        # READ stays lazy (Spark writes that file at query start, after
        # this constructor runs).
        if self.options.get("streaming-source-id") is None and not (
                self.options.get("checkpointlocation")
                or self.options.get("checkpointLocation")):
            raise ValueError(
                "icecpp streaming sink needs a watermark identity: "
                "pass .option('checkpointLocation', ...) on the "
                "writer or .option('streaming-source-id', <unique>) "
                "— without one, concurrent queries writing this "
                "table would share a batch-id watermark and "
                "silently skip each other's batches")

    def _stream_id(self) -> str:
        sid = self._sid_cache.get("sid")
        if sid is None:
            sid = self.options.get("streaming-source-id")
            if sid is None:
                from iceberg_cpp_spark.streaming.incremental import (
                    _stream_id as ckpt_stream_id)

                # resolved lazily at first commit: Spark writes the
                # metadata file at query start, before any batch
                sid = ckpt_stream_id(
                    self.options.get("checkpointlocation")
                    or self.options.get("checkpointLocation"))
            self._sid_cache["sid"] = sid
        return sid

    def commit(self, messages, batchId: int) -> None:
        from iceberg_cpp_spark.streaming.incremental import (
            _last_committed_batch)

        sid = self._stream_id()
        abandoned = {}

        def fresh() -> bool:
            # re-load metadata on every evaluation: inside the CAS retry
            # the relevant state is whatever the WINNING committer wrote
            t = _load_table(self.options)
            ok = batchId > _last_committed_batch(t, sid)
            if not ok:
                abandoned["x"] = True
            return ok

        if not fresh():
            self._remove_files(messages)  # replay: drop duplicate files
            return
        self._commit_messages(
            messages,
            summary_extras={"streaming.source-id": sid,
                            "streaming.batch-id": str(batchId)},
            pre_check=fresh)
        if abandoned:
            # CAS lost to a concurrent committer of the same batch: the
            # commit was abandoned inside the retry loop — this run's
            # duplicate files must not be left orphaned
            self._remove_files(messages)

    def abort(self, messages, batchId: int) -> None:
        self._remove_files(messages)


class IcebergCppStreamReader(SimpleDataSourceStreamReader):
    """Snapshot-sequence offsets with sub-commit backpressure.

    An offset is ``{"seq": s}`` (every file with sequence_number <= s
    consumed) or ``{"seq": s, "idx": i}`` (all sequences < s consumed,
    plus the first i files — (seq, path)-sorted — of sequence s): the
    latter lets ``max-files-per-trigger`` split one large commit across
    several microbatches instead of prefetching a whole commit's files
    driver-side. Deterministic replay between any two offsets."""

    def __init__(self, options, schema):
        self.options = options
        self.spark_schema = schema

    def initialOffset(self) -> dict:
        if self.options.get("starting-sequence") is not None:
            return {"seq": int(self.options["starting-sequence"])}
        return {"seq": 0}

    @staticmethod
    def _all_files(table) -> list[tuple[int, str]]:
        """(sequence_number, path) for every live data file, sorted —
        the global cursor order offsets index into."""
        return sorted(((t.sequence_number or 0), t.file_path)
                      for t in table.scan().plan_files())

    @staticmethod
    def _pos(files: list[tuple[int, str]], off: dict) -> int:
        s, idx = off.get("seq", 0), off.get("idx")
        if idx is None:
            return sum(1 for q, _ in files if q <= s)
        return sum(1 for q, _ in files if q < s) + idx

    def _rows(self, paths: list[str]):
        """Materialized list of Arrow RecordBatches (Spark's prefetch
        cache shallow-copies the iterator, so it must not be a
        generator; and the source runner passes pyarrow batches through
        to the JVM untouched — no per-row python conversion)."""
        import pyarrow.parquet as pq

        names = [f.name for f in self.spark_schema.fields]
        batches = []
        for p in paths:
            tbl = _cast_to_declared(pq.read_table(p, columns=names),
                                    self.spark_schema)
            batches.extend(tbl.to_batches(max_chunksize=65536))
        return iter(batches)

    def read(self, start: dict):
        table = _load_table(self.options)
        files = self._all_files(table)
        rem = files[self._pos(files, start):]
        if not rem:
            return iter([]), start
        mft = self.options.get("max-files-per-trigger")
        take = rem[:max(1, int(mft))] if mft is not None else rem
        last = take[-1][0]
        n_last = sum(1 for q, _ in take if q == last)
        if start.get("idx") is not None and start.get("seq", 0) == last:
            n_last += start["idx"]
        end = {"seq": last, "idx": n_last}
        return self._rows([p for _, p in take]), end

    def readBetweenOffsets(self, start: dict, end: dict):
        table = _load_table(self.options)
        files = self._all_files(table)
        lo, hi = self._pos(files, start), self._pos(files, end)
        return self._rows([p for _, p in files[lo:hi]])

    def commit(self, end: dict) -> None:
        pass


@dataclass
class StreamFilesPartition(InputPartition):
    """One executor task of a streaming micro-batch: a bin-packed slice
    of the batch's new data files."""

    paths: list = dc_field(default_factory=list)


class IcebergCppFullStreamReader(DataSourceStreamReader):
    """Executor-parallel streaming source — the DEFAULT when no
    ``max-files-per-trigger`` is set.

    Offsets are snapshot sequence numbers (stateless: the engine's
    offset log supplies ``start``; ``latestOffset`` just reads the
    table head). ``partitions(start, end)`` bin-packs the files in
    (start, end] to ~split-target bytes, and ``read`` decodes them IN
    EXECUTORS — no driver-side data prefetch at all. That makes one
    Trigger.AvailableNow batch over an arbitrarily large commit behave
    like a batch scan (parallel tasks, flat driver memory), which is
    the scale-correct answer to the prefetch problem the
    SimpleDataSourceStreamReader contract creates: Spark's
    AvailableNowDataStreamWrapper captures ONE latestOffset per run
    for Python sources (no SupportsAdmissionControl bridge), so a
    per-trigger file cap cannot split an availableNow run into several
    batches — verified empirically; with a cap set the run stops after
    the first capped batch. Hence the routing: cap set → the simple
    prefetching reader (sub-commit cursor backpressure for
    processing-time triggers); no cap → this reader."""

    def __init__(self, options, schema):
        self.options = options
        self.spark_schema = schema

    def initialOffset(self) -> dict:
        if self.options.get("starting-sequence") is not None:
            return {"seq": int(self.options["starting-sequence"])}
        return {"seq": 0}

    def latestOffset(self) -> dict:
        table = _load_table(self.options)
        files = IcebergCppStreamReader._all_files(table)
        return {"seq": max((q for q, _ in files), default=0)}

    def partitions(self, start: dict, end: dict):
        table = _load_table(self.options)
        # ONE plan_files pass per micro-batch (ADVICE r06): the sorted
        # (seq, path) cursor order AND the path→size map both derive
        # from the same planning result — metadata was previously read
        # twice per trigger
        tasks = list(table.scan().plan_files())
        files = sorted(((t.sequence_number or 0), t.file_path)
                       for t in tasks)
        sizes = {t.file_path: t.file_size_in_bytes for t in tasks}
        # offsets may carry the simple reader's sub-commit {"seq","idx"}
        # cursor (a checkpoint written before the cap option was
        # dropped) — _pos understands both forms
        lo = IcebergCppStreamReader._pos(files, start)
        hi = IcebergCppStreamReader._pos(files, end)
        # r18 (VERDICT r17 task 5): the batch reader's maxSplitBytes
        # sizing, via the SHARED helpers — a micro-batch smaller than
        # one split target fans out across the cluster instead of
        # decoding serially in one task; at scale bytesPerCore exceeds
        # the target and nothing changes
        batch = [p for _q, p in files[lo:hi]]
        props = table.properties()
        par = _reader_parallelism(self.options)
        open_probe = int(self.options.get(
            "open-cost-bytes",
            props.get("read.split.open-file-cost", str(4 * 1024 * 1024))))
        total = sum(sizes.get(p) or 0 for p in batch) \
            + open_probe * len(batch)
        target, open_cost = _split_sizing(self.options, props, total, par)
        return [StreamFilesPartition(paths=bin_paths)
                for bin_paths in _pack_by_bytes(
                    batch, lambda p: sizes.get(p), target, open_cost)]

    def read(self, partition: StreamFilesPartition):
        """Executor-side: same plain-file read + declared-schema cast as
        the simple reader's ``_rows`` (streaming reads are append reads
        of freshly written files)."""
        import pyarrow.parquet as pq

        names = [f.name for f in self.spark_schema.fields]
        for p in partition.paths:
            tbl = _cast_to_declared(pq.read_table(p, columns=names),
                                    self.spark_schema)
            for batch in tbl.to_batches(max_chunksize=65536):
                yield batch

    def commit(self, end: dict) -> None:
        pass


class IcebergCppDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "icecpp"

    def schema(self):
        from iceberg_cpp_spark.core import types as it

        # SAME dtypes as the native to_df path's to_spark_schema:
        # iceberg `timestamp` (no tz) stays TimestampNTZType, so a
        # table's dtype does not flip when the file count crosses the
        # datasource threshold. _cast_to_declared drops the files' UTC
        # tz to NTZ wall-clock at read time. Time-travel options pin the
        # SNAPSHOT's schema (read_schema), matching the native path.
        # Field-id METADATA is stripped: the streaming runner asserts
        # declared schema == arrow-round-tripped schema, and arrow drops
        # Spark metadata.
        scan = _make_scan(_load_table(self.options), self.options)
        from iceberg_cpp_spark.core.metrics import schema_has_variant

        if schema_has_variant(scan.read_schema()):
            # this source decodes with pyarrow, which cannot open
            # variant-bearing parquet — fail here with a clear message
            # instead of a Thrift LogicalType error mid-scan
            raise NotImplementedError(
                "the icecpp Python DataSource cannot read tables with "
                "variant columns (pyarrow has no variant decoder); use "
                "IceTable.load(...).to_df() — the JVM plane reads them")
        return it.strip_field_metadata(it.to_spark_schema(scan.read_schema()))

    def reader(self, schema) -> IcebergCppReader:
        return IcebergCppReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> IcebergCppWriter:
        return IcebergCppWriter(self.options, overwrite)

    def streamReader(self, schema) -> IcebergCppFullStreamReader:
        """Default streaming source: executor-parallel full reader. A
        `max-files-per-trigger` cap (or `streaming-reader=simple`)
        routes to the simple prefetching reader instead — the cap is a
        driver-prefetch backpressure knob and only that reader's
        sub-commit cursor can honor it."""
        from pyspark.errors import PySparkNotImplementedError

        if (self.options.get("max-files-per-trigger") is not None
                or self.options.get("streaming-reader", "").lower()
                == "simple"):
            raise PySparkNotImplementedError(  # → simpleStreamReader
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader"},
            )
        return IcebergCppFullStreamReader(self.options, schema)

    def simpleStreamReader(self, schema) -> IcebergCppStreamReader:
        return IcebergCppStreamReader(self.options, schema)

    def streamWriter(self, schema, overwrite: bool) -> IcebergCppStreamWriter:
        if overwrite:
            raise ValueError(
                "icecpp streaming sink supports append mode only")
        return IcebergCppStreamWriter(self.options)
