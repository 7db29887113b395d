"""Manifest + manifest-list model, stored as Parquet.

Capability parity with the reference's ManifestEntry/DataFile
(manifest_entry.h:61-313), ManifestFile/PartitionFieldSummary
(manifest_list.h:43-201), ManifestReader/Writer + ManifestListReader/
Writer (manifest_reader.h, manifest_writer.h) and InheritableMetadata
(inheritable_metadata.h:40-90 — null snapshot/sequence numbers in
entries inherit from the manifest; spec_id stamped from the manifest).

Container format: the reference stores these as Avro per the Iceberg
spec; this engine stores the SAME logical rows as Parquet, which Spark
reads natively and prunes — manifests are themselves DataFrames
(SURVEY.md §7 "metadata is data"). All spec fields are kept: status,
content, partition tuple (typed struct), per-column value/null/nan
counts and spec-encoded lower/upper bounds, split info, equality_ids,
sequence numbers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field
from typing import Any, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.literals import from_bytes, to_bytes
from iceberg_cpp_spark.core.metadata import PartitionSpec

# manifest_entry.h: ManifestStatus / FileContent
STATUS_EXISTING = 0
STATUS_ADDED = 1
STATUS_DELETED = 2

CONTENT_DATA = 0
CONTENT_POSITION_DELETES = 1
CONTENT_EQUALITY_DELETES = 2

# manifest_list.h ManifestContent
MANIFEST_CONTENT_DATA = 0
MANIFEST_CONTENT_DELETES = 1


@dataclass
class DataFile:
    """manifest_entry.h:61-270."""

    content: int
    file_path: str
    file_format: str
    partition: dict[str, Any]
    record_count: int
    file_size_in_bytes: int
    column_sizes: dict[int, int] = dc_field(default_factory=dict)
    value_counts: dict[int, int] = dc_field(default_factory=dict)
    null_value_counts: dict[int, int] = dc_field(default_factory=dict)
    nan_value_counts: dict[int, int] = dc_field(default_factory=dict)
    lower_bounds: dict[int, bytes] = dc_field(default_factory=dict)
    upper_bounds: dict[int, bytes] = dc_field(default_factory=dict)
    split_offsets: list[int] = dc_field(default_factory=list)
    equality_ids: list[int] = dc_field(default_factory=list)
    sort_order_id: Optional[int] = None
    referenced_data_file: Optional[str] = None
    # v3 deletion vectors: blob location inside a puffin file
    content_offset: Optional[int] = None
    content_size_in_bytes: Optional[int] = None
    # v3 row lineage: _row_id of this file's first row
    first_row_id: Optional[int] = None

    def stats(self) -> dict:
        """Shape consumed by pruning.InclusiveMetricsEvaluator."""
        return {
            "record_count": self.record_count,
            "value_counts": self.value_counts,
            "null_value_counts": self.null_value_counts,
            "nan_value_counts": self.nan_value_counts,
            "lower_bounds": self.lower_bounds,
            "upper_bounds": self.upper_bounds,
        }


@dataclass
class ManifestEntry:
    """manifest_entry.h:276-313."""

    status: int
    data_file: DataFile
    snapshot_id: Optional[int] = None
    sequence_number: Optional[int] = None
    file_sequence_number: Optional[int] = None

    @property
    def is_live(self) -> bool:
        return self.status in (STATUS_EXISTING, STATUS_ADDED)


@dataclass
class PartitionFieldSummary:
    """manifest_list.h:43-73."""

    contains_null: bool = False
    contains_nan: Optional[bool] = None
    lower_bound: Optional[bytes] = None
    upper_bound: Optional[bytes] = None


@dataclass
class ManifestFile:
    """manifest_list.h:76-201."""

    manifest_path: str
    manifest_length: int
    partition_spec_id: int
    content: int = MANIFEST_CONTENT_DATA
    sequence_number: int = 0
    min_sequence_number: int = 0
    added_snapshot_id: int = 0
    added_files_count: int = 0
    existing_files_count: int = 0
    deleted_files_count: int = 0
    added_rows_count: int = 0
    existing_rows_count: int = 0
    deleted_rows_count: int = 0
    partitions: list[PartitionFieldSummary] = dc_field(default_factory=list)
    # v3 row lineage: starting row id for the manifest's ADDED data files
    # (spec field id 520; null for delete manifests / pre-v3 metadata)
    first_row_id: Optional[int] = None
    # v3 encryption key metadata (spec field id 519; unencrypted → null)
    key_metadata: Optional[bytes] = None

    @property
    def has_added_files(self) -> bool:
        return self.added_files_count > 0

    @property
    def has_live_files(self) -> bool:
        return self.added_files_count + self.existing_files_count > 0


# ---------------------------------------------------------------------------
# Arrow schemas for the parquet containers
# ---------------------------------------------------------------------------

def _counts_map() -> pa.DataType:
    return pa.map_(pa.int32(), pa.int64())


def _bounds_map() -> pa.DataType:
    return pa.map_(pa.int32(), pa.binary())


def _arrow_type(t: it.IcebergType) -> pa.DataType:
    """Iceberg type → arrow type for partition-tuple columns."""
    if isinstance(t, it.BooleanType):
        return pa.bool_()
    if isinstance(t, it.IntegerType):
        return pa.int32()
    if isinstance(t, (it.LongType, it.TimeType)):
        return pa.int64()
    if isinstance(t, it.FloatType):
        return pa.float32()
    if isinstance(t, it.DoubleType):
        return pa.float64()
    if isinstance(t, it.DateType):
        return pa.date32()
    if isinstance(t, it.TimestampType):
        return pa.timestamp("us")
    if isinstance(t, it.TimestampTzType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(t, (it.StringType, it.UuidType)):
        return pa.string()
    if isinstance(t, (it.BinaryType, it.FixedType)):
        return pa.binary()
    if isinstance(t, it.DecimalType):
        return pa.decimal128(t.precision, t.scale)
    raise ValueError(f"no arrow mapping for partition type {t!r}")


def partition_arrow_struct(spec: "PartitionSpec", schema: it.Schema) -> Optional[pa.DataType]:
    """Typed ``partition`` struct for a spec — written alongside
    ``partition_json`` so Spark can prune manifest entries with plain
    Column filters (distributed scan planning at 100 TB file counts)."""
    if not spec.fields:
        return None
    types = _partition_types(spec, schema)
    return pa.struct([pa.field(pf.name, _arrow_type(types[pf.name])) for pf in spec.fields])


def manifest_arrow_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field("status", pa.int32()),
            pa.field("snapshot_id", pa.int64()),
            pa.field("sequence_number", pa.int64()),
            pa.field("file_sequence_number", pa.int64()),
            pa.field("content", pa.int32()),
            pa.field("file_path", pa.string()),
            pa.field("file_format", pa.string()),
            pa.field("spec_id", pa.int32()),
            pa.field("partition_json", pa.string()),  # typed decode via spec
            pa.field("record_count", pa.int64()),
            pa.field("file_size_in_bytes", pa.int64()),
            pa.field("column_sizes", _counts_map()),
            pa.field("value_counts", _counts_map()),
            pa.field("null_value_counts", _counts_map()),
            pa.field("nan_value_counts", _counts_map()),
            pa.field("lower_bounds", _bounds_map()),
            pa.field("upper_bounds", _bounds_map()),
            pa.field("split_offsets", pa.list_(pa.int64())),
            pa.field("equality_ids", pa.list_(pa.int32())),
            pa.field("sort_order_id", pa.int32()),
            pa.field("referenced_data_file", pa.string()),
            pa.field("content_offset", pa.int64()),
            pa.field("content_size_in_bytes", pa.int64()),
            pa.field("first_row_id", pa.int64()),
        ]
    )


def manifest_list_arrow_schema() -> pa.Schema:
    summary = pa.struct(
        [
            pa.field("contains_null", pa.bool_()),
            pa.field("contains_nan", pa.bool_()),
            pa.field("lower_bound", pa.binary()),
            pa.field("upper_bound", pa.binary()),
        ]
    )
    return pa.schema(
        [
            pa.field("manifest_path", pa.string()),
            pa.field("manifest_length", pa.int64()),
            pa.field("partition_spec_id", pa.int32()),
            pa.field("content", pa.int32()),
            pa.field("sequence_number", pa.int64()),
            pa.field("min_sequence_number", pa.int64()),
            pa.field("added_snapshot_id", pa.int64()),
            pa.field("added_files_count", pa.int32()),
            pa.field("existing_files_count", pa.int32()),
            pa.field("deleted_files_count", pa.int32()),
            pa.field("added_rows_count", pa.int64()),
            pa.field("existing_rows_count", pa.int64()),
            pa.field("deleted_rows_count", pa.int64()),
            pa.field("partitions", pa.list_(summary)),
        ]
    )


# ---------------------------------------------------------------------------
# Partition tuple serde (typed via the spec's result types)
# ---------------------------------------------------------------------------

def _partition_types(spec: PartitionSpec, schema: it.Schema) -> dict[str, it.IcebergType]:
    out = {}
    for pf in spec.fields:
        src = schema.find_field_by_id(pf.source_id)
        if src is None:
            raise ValueError(f"partition source field not found: {pf.source_id}")
        out[pf.name] = pf.transform.result_type(src.field_type)
    return out


def partition_to_json(partition: dict[str, Any], spec: PartitionSpec, schema: it.Schema) -> str:
    """Encode a partition tuple as JSON with spec-encoded binary values
    hex-wrapped — lossless for every partition-able type."""
    import json

    types = _partition_types(spec, schema)
    enc = {}
    for name, v in partition.items():
        if v is None:
            enc[name] = None
        else:
            enc[name] = to_bytes(v, types[name]).hex()
    return json.dumps(enc, sort_keys=True)


def partition_from_json(s: Optional[str], spec: PartitionSpec, schema: it.Schema) -> dict[str, Any]:
    import json

    if not s or s == "{}":
        # unpartitioned fast path: planning calls this once per file,
        # so 10^5-file plans must not pay json+type-map work per row
        return {}
    types = _partition_types(spec, schema)
    raw = json.loads(s)
    out = {}
    for name, hx in raw.items():
        if hx is None:
            out[name] = None
        elif name in types:
            out[name] = from_bytes(bytes.fromhex(hx), types[name])
        else:
            out[name] = None
    return out


# ---------------------------------------------------------------------------
# Writers / readers (driver-side pyarrow; manifests are metadata-scale)
# ---------------------------------------------------------------------------

class ManifestWriter:
    """manifest_writer.h:36-158 equivalent. Container is Parquet by
    default (this engine's native format, distributed-prunable) or spec
    Avro (``format="avro"``) for interop with other Iceberg engines.
    ``version`` selects the Avro layout (manifest_writer.h:63
    MakeV1Writer / :70 MakeV2Writer / :77 MakeV3Writer): v1 for
    v1-pinned consumers — data manifests only, per v1_metadata.cc
    ManifestFileAdapterV1; v3 adds key_metadata + explicit DV/row-
    lineage fields per v3_metadata.cc ManifestEntryAdapterV3."""

    def __init__(self, path: str, spec: PartitionSpec, schema: it.Schema,
                 snapshot_id: int, content: int = MANIFEST_CONTENT_DATA,
                 format: str = "parquet", version: int = 2):
        if version == 1 and content != MANIFEST_CONTENT_DATA:
            raise ValueError("cannot store delete manifests in a v1 table")
        self.path = path
        self.spec = spec
        self.schema = schema
        self.snapshot_id = snapshot_id
        self.content = content
        self.format = format
        self.version = version
        self.entries: list[ManifestEntry] = []

    def add(self, entry: ManifestEntry) -> None:
        self.entries.append(entry)

    def add_file(self, data_file: DataFile, sequence_number: Optional[int] = None) -> None:
        self.entries.append(
            ManifestEntry(
                status=STATUS_ADDED,
                data_file=data_file,
                snapshot_id=self.snapshot_id,
                sequence_number=sequence_number,
            )
        )

    def close(self) -> ManifestFile:
        if self.format == "avro":
            self._write_avro()
        else:
            self._write_parquet()

        # partition summaries (PartitionFieldSummary per spec field)
        summaries = []
        types = _partition_types(self.spec, self.schema)
        for pf in self.spec.fields:
            t = types[pf.name]
            vals = [e.data_file.partition.get(pf.name) for e in self.entries if e.is_live]
            nn = [v for v in vals if v is not None]
            # keep the definite False for NaN-capable types — None means
            # "unknown" and would disable NaN-based manifest pruning
            if isinstance(t, (it.FloatType, it.DoubleType)):
                contains_nan = any(isinstance(v, float) and v != v for v in nn)
            else:
                contains_nan = None
            lo = hi = None
            if nn:
                try:
                    lo, hi = min(nn), max(nn)
                except TypeError:
                    lo = hi = None
            summaries.append(
                PartitionFieldSummary(
                    contains_null=any(v is None for v in vals),
                    contains_nan=contains_nan,
                    lower_bound=to_bytes(lo, t) if lo is not None else None,
                    upper_bound=to_bytes(hi, t) if hi is not None else None,
                )
            )
        seqs = [e.sequence_number for e in self.entries if e.sequence_number is not None]
        # v3 row lineage: the manifest's first_row_id is the smallest id
        # its ADDED data files draw from (entries carry explicit ids, so
        # reader-side inheritance never has to assign)
        rids = [e.data_file.first_row_id for e in self.entries
                if e.status == STATUS_ADDED
                and e.data_file.content == CONTENT_DATA
                and e.data_file.first_row_id is not None]
        return ManifestFile(
            manifest_path=self.path,
            manifest_length=os.path.getsize(self.path),
            partition_spec_id=self.spec.spec_id,
            content=self.content,
            sequence_number=max(seqs, default=0),
            min_sequence_number=min(seqs, default=0),
            added_snapshot_id=self.snapshot_id,
            added_files_count=sum(1 for e in self.entries if e.status == STATUS_ADDED),
            existing_files_count=sum(1 for e in self.entries if e.status == STATUS_EXISTING),
            deleted_files_count=sum(1 for e in self.entries if e.status == STATUS_DELETED),
            added_rows_count=sum(e.data_file.record_count for e in self.entries if e.status == STATUS_ADDED),
            existing_rows_count=sum(e.data_file.record_count for e in self.entries if e.status == STATUS_EXISTING),
            deleted_rows_count=sum(e.data_file.record_count for e in self.entries if e.status == STATUS_DELETED),
            partitions=summaries,
            first_row_id=min(rids) if rids else None,
        )

    def _write_avro(self) -> None:
        """Spec-compliant Avro manifest (Iceberg spec §Manifests);
        readable by any Iceberg engine. Reference: manifest_writer.cc +
        avro adapters."""
        import json as _json

        from iceberg_cpp_spark.core import avro as av

        entry_schema = av.manifest_entry_avro_schema(
            self.spec, self.schema, version=self.version)
        records = []
        for e in self.entries:
            f = e.data_file
            data_file = {
                "file_path": f.file_path,
                "file_format": f.file_format.upper(),
                "partition": {pf.name: f.partition.get(pf.name)
                              for pf in self.spec.fields},
                "record_count": f.record_count,
                "file_size_in_bytes": f.file_size_in_bytes,
                "column_sizes": f.column_sizes or None,
                "value_counts": f.value_counts or None,
                "null_value_counts": f.null_value_counts or None,
                "nan_value_counts": f.nan_value_counts or None,
                "lower_bounds": f.lower_bounds or None,
                "upper_bounds": f.upper_bounds or None,
                "split_offsets": f.split_offsets or None,
                "sort_order_id": f.sort_order_id,
            }
            if self.version == 1:
                # deprecated field, REQUIRED by the v1 schema; always a
                # default, never read back (v1_metadata.cc:66-70)
                data_file["block_size_in_bytes"] = 64 * 1024 * 1024
                data_file["key_metadata"] = None
                records.append({
                    "status": e.status,
                    # required in v1 (no metadata inheritance)
                    "snapshot_id": e.snapshot_id
                    if e.snapshot_id is not None else self.snapshot_id,
                    "data_file": data_file,
                })
                continue
            data_file.update({
                "content": f.content,
                "equality_ids": f.equality_ids or None,
                "referenced_data_file": f.referenced_data_file,
                "content_offset": f.content_offset,
                "content_size_in_bytes": f.content_size_in_bytes,
                "first_row_id": f.first_row_id,
            })
            records.append({
                "status": e.status,
                "snapshot_id": e.snapshot_id,
                "sequence_number": e.sequence_number,
                "file_sequence_number": e.file_sequence_number,
                "data_file": data_file,
            })
        meta = {
            "schema": _json.dumps(self.schema.to_json()),
            "schema-id": str(self.schema.schema_id),
            "partition-spec": _json.dumps([pf.to_json() for pf in self.spec.fields]),
            "partition-spec-id": str(self.spec.spec_id),
            "format-version": str(self.version),
        }
        if self.version >= 2:
            meta["content"] = ("data" if self.content == MANIFEST_CONTENT_DATA
                               else "deletes")
        av.write_avro(self.path, entry_schema, records,
                      metadata={k: v.encode() for k, v in meta.items()})

    def _write_parquet(self) -> None:
        arrow_schema = manifest_arrow_schema()
        pstruct = partition_arrow_struct(self.spec, self.schema)
        if pstruct is not None:
            arrow_schema = arrow_schema.append(pa.field("partition", pstruct))
        rows = {name: [] for name in arrow_schema.names}
        for e in self.entries:
            if pstruct is not None:
                rows["partition"].append(e.data_file.partition)
            f = e.data_file
            rows["status"].append(e.status)
            rows["snapshot_id"].append(e.snapshot_id)
            rows["sequence_number"].append(e.sequence_number)
            rows["file_sequence_number"].append(e.file_sequence_number)
            rows["content"].append(f.content)
            rows["file_path"].append(f.file_path)
            rows["file_format"].append(f.file_format)
            rows["spec_id"].append(self.spec.spec_id)
            rows["partition_json"].append(partition_to_json(f.partition, self.spec, self.schema))
            rows["record_count"].append(f.record_count)
            rows["file_size_in_bytes"].append(f.file_size_in_bytes)
            rows["column_sizes"].append(list(f.column_sizes.items()) or None)
            rows["value_counts"].append(list(f.value_counts.items()) or None)
            rows["null_value_counts"].append(list(f.null_value_counts.items()) or None)
            rows["nan_value_counts"].append(list(f.nan_value_counts.items()) or None)
            rows["lower_bounds"].append(list(f.lower_bounds.items()) or None)
            rows["upper_bounds"].append(list(f.upper_bounds.items()) or None)
            rows["split_offsets"].append(f.split_offsets or None)
            rows["equality_ids"].append(f.equality_ids or None)
            rows["sort_order_id"].append(f.sort_order_id)
            rows["referenced_data_file"].append(f.referenced_data_file)
            rows["content_offset"].append(f.content_offset)
            rows["content_size_in_bytes"].append(f.content_size_in_bytes)
            rows["first_row_id"].append(f.first_row_id)
        table = pa.Table.from_pydict(rows, schema=arrow_schema)
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        pq.write_table(table, self.path, compression="zstd")


def read_manifest(path: str, spec: PartitionSpec, schema: it.Schema,
                  manifest: Optional[ManifestFile] = None) -> list[ManifestEntry]:
    """ManifestReader::Entries with InheritableMetadata applied
    (inheritable_metadata.cc: null snapshot/sequence numbers inherit
    from the manifest). Container format is sniffed: spec Avro
    manifests (written by this engine or any other Iceberg engine)
    and this engine's Parquet manifests both read through here."""
    from iceberg_cpp_spark.core import avro as av

    if av.is_avro(path):
        return av.manifest_entries_from_avro(path, manifest=manifest)
    table = pq.read_table(path)
    out: list[ManifestEntry] = []
    for row in table.to_pylist():
        df = DataFile(
            content=row["content"],
            file_path=row["file_path"],
            file_format=row["file_format"],
            partition=partition_from_json(row["partition_json"], spec, schema),
            record_count=row["record_count"],
            file_size_in_bytes=row["file_size_in_bytes"],
            column_sizes=dict(row["column_sizes"] or []),
            value_counts=dict(row["value_counts"] or []),
            null_value_counts=dict(row["null_value_counts"] or []),
            nan_value_counts=dict(row["nan_value_counts"] or []),
            lower_bounds=dict(row["lower_bounds"] or []),
            upper_bounds=dict(row["upper_bounds"] or []),
            split_offsets=row["split_offsets"] or [],
            equality_ids=row["equality_ids"] or [],
            sort_order_id=row["sort_order_id"],
            referenced_data_file=row["referenced_data_file"],
            content_offset=row.get("content_offset"),
            content_size_in_bytes=row.get("content_size_in_bytes"),
            first_row_id=row.get("first_row_id"),
        )
        snap = row["snapshot_id"]
        seq = row["sequence_number"]
        fseq = row["file_sequence_number"]
        if manifest is not None:
            if snap is None:
                snap = manifest.added_snapshot_id
            if seq is None and row["status"] != STATUS_EXISTING:
                seq = manifest.sequence_number
            if fseq is None and row["status"] != STATUS_EXISTING:
                fseq = manifest.sequence_number
        out.append(
            ManifestEntry(
                status=row["status"],
                data_file=df,
                snapshot_id=snap,
                sequence_number=seq,
                file_sequence_number=fseq,
            )
        )
    return out


class ManifestListWriter:
    """manifest_writer.cc:153-186 equivalent; parquet container by
    default, spec Avro with ``format="avro"``. ``version`` selects the
    Avro layout (manifest_writer.h:123 MakeV1Writer / :131 MakeV2Writer
    / :139 MakeV3Writer): v1 rejects delete manifests and writes the v1
    field names/metadata (v1_metadata.cc ManifestFileAdapterV1); v3
    writes ``first_row_id`` (field id 520, v3_metadata.cc
    ManifestFileAdapterV3)."""

    def __init__(self, path: str, snapshot_id: int, sequence_number: int,
                 format: str = "parquet",
                 parent_snapshot_id: Optional[int] = None,
                 version: int = 2, next_row_id: Optional[int] = None):
        self.path = path
        self.snapshot_id = snapshot_id
        self.sequence_number = sequence_number
        self.format = format
        self.version = version
        self.parent_snapshot_id = parent_snapshot_id
        # v3 row lineage: the snapshot's starting row id — written as the
        # 'first-row-id' metadata key, and the base from which data
        # manifests lacking an explicit first_row_id are assigned at
        # write time (v3_metadata.cc ManifestFileAdapterV3::Append)
        self.next_row_id = next_row_id
        # set by close(): the first row id AFTER every span this writer
        # assigned — the table's new next-row-id per the spec rule (sum
        # of added+existing rows of assigned manifests). Callers that
        # advance engine.next-row-id must take max(own, this) so spans
        # reserved for writer-unassigned (e.g. foreign/rewritten)
        # manifests are never re-issued to a later append.
        self.assigned_next_row_id: Optional[int] = next_row_id
        self.manifests: list[ManifestFile] = []

    def add(self, mf: ManifestFile) -> None:
        if self.version == 1 and mf.content != MANIFEST_CONTENT_DATA:
            raise ValueError("cannot store delete manifests in a v1 table")
        self.manifests.append(mf)

    def close(self) -> None:
        if self.format == "avro":
            self._write_avro()
        else:
            self._write_parquet()

    def _write_avro(self) -> None:
        from iceberg_cpp_spark.core import avro as av

        records = []
        running = self.next_row_id
        for m in self.manifests:
            parts = [
                {"contains_null": s.contains_null,
                 "contains_nan": s.contains_nan,
                 "lower_bound": s.lower_bound,
                 "upper_bound": s.upper_bound}
                for s in m.partitions
            ] or None
            if self.version == 1:
                records.append({
                    "manifest_path": m.manifest_path,
                    "manifest_length": m.manifest_length,
                    "partition_spec_id": m.partition_spec_id,
                    "added_snapshot_id": m.added_snapshot_id,
                    "added_data_files_count": m.added_files_count,
                    "existing_data_files_count": m.existing_files_count,
                    "deleted_data_files_count": m.deleted_files_count,
                    "added_rows_count": m.added_rows_count,
                    "existing_rows_count": m.existing_rows_count,
                    "deleted_rows_count": m.deleted_rows_count,
                    "partitions": parts,
                })
                continue
            rec = {
                "manifest_path": m.manifest_path,
                "manifest_length": m.manifest_length,
                "partition_spec_id": m.partition_spec_id,
                "content": m.content,
                "sequence_number": m.sequence_number,
                "min_sequence_number": m.min_sequence_number,
                "added_snapshot_id": m.added_snapshot_id,
                "added_files_count": m.added_files_count,
                "existing_files_count": m.existing_files_count,
                "deleted_files_count": m.deleted_files_count,
                "added_rows_count": m.added_rows_count,
                "existing_rows_count": m.existing_rows_count,
                "deleted_rows_count": m.deleted_rows_count,
                "partitions": parts,
            }
            if self.version >= 3:
                frid = m.first_row_id
                if (m.content == MANIFEST_CONTENT_DATA and frid is None
                        and running is not None):
                    # writer-unassigned data manifest (e.g. a rewrite
                    # carrying only EXISTING entries): assign from the
                    # snapshot base and reserve its row span, mirroring
                    # ManifestFileAdapterV3::Append/GetFirstRowId
                    # (entry-level explicit ids still take precedence
                    # over this inheritance base at read time)
                    frid = running
                    running += ((m.added_rows_count or 0)
                                + (m.existing_rows_count or 0))
                    self.assigned_next_row_id = running
                rec["first_row_id"] = frid
                rec["key_metadata"] = m.key_metadata
            records.append(rec)
        meta = {
            "snapshot-id": str(self.snapshot_id),
            "format-version": str(self.version),
        }
        if self.version >= 2:
            meta["sequence-number"] = str(self.sequence_number)
        if self.version == 1 or self.version >= 3:
            # v1 AND v3 write the key unconditionally, "null" when absent
            # (v1_metadata.cc / v3_metadata.cc ManifestFileAdapter::Init)
            meta["parent-snapshot-id"] = (
                str(self.parent_snapshot_id)
                if self.parent_snapshot_id is not None else "null")
        elif self.parent_snapshot_id is not None:
            meta["parent-snapshot-id"] = str(self.parent_snapshot_id)
        if self.version >= 3:
            meta["first-row-id"] = (str(self.next_row_id)
                                    if self.next_row_id is not None else "null")
        av.write_avro(self.path,
                      av.manifest_list_avro_schema(version=self.version),
                      records,
                      metadata={k: v.encode() for k, v in meta.items()})

    def _write_parquet(self) -> None:
        rows = {name: [] for name in manifest_list_arrow_schema().names}
        for m in self.manifests:
            rows["manifest_path"].append(m.manifest_path)
            rows["manifest_length"].append(m.manifest_length)
            rows["partition_spec_id"].append(m.partition_spec_id)
            rows["content"].append(m.content)
            rows["sequence_number"].append(m.sequence_number)
            rows["min_sequence_number"].append(m.min_sequence_number)
            rows["added_snapshot_id"].append(m.added_snapshot_id)
            rows["added_files_count"].append(m.added_files_count)
            rows["existing_files_count"].append(m.existing_files_count)
            rows["deleted_files_count"].append(m.deleted_files_count)
            rows["added_rows_count"].append(m.added_rows_count)
            rows["existing_rows_count"].append(m.existing_rows_count)
            rows["deleted_rows_count"].append(m.deleted_rows_count)
            rows["partitions"].append(
                [
                    {
                        "contains_null": s.contains_null,
                        "contains_nan": s.contains_nan,
                        "lower_bound": s.lower_bound,
                        "upper_bound": s.upper_bound,
                    }
                    for s in m.partitions
                ]
                or None
            )
        table = pa.Table.from_pydict(rows, schema=manifest_list_arrow_schema())
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        pq.write_table(table, self.path, compression="zstd")


def read_manifest_list(path: str) -> list[ManifestFile]:
    from iceberg_cpp_spark.core import avro as av

    if av.is_avro(path):
        return av.manifest_list_from_avro(path)
    table = pq.read_table(path)
    out = []
    for row in table.to_pylist():
        out.append(
            ManifestFile(
                manifest_path=row["manifest_path"],
                manifest_length=row["manifest_length"],
                partition_spec_id=row["partition_spec_id"],
                content=row["content"],
                sequence_number=row["sequence_number"],
                min_sequence_number=row["min_sequence_number"],
                added_snapshot_id=row["added_snapshot_id"],
                added_files_count=row["added_files_count"],
                existing_files_count=row["existing_files_count"],
                deleted_files_count=row["deleted_files_count"],
                added_rows_count=row["added_rows_count"],
                existing_rows_count=row["existing_rows_count"],
                deleted_rows_count=row["deleted_rows_count"],
                partitions=[
                    PartitionFieldSummary(
                        contains_null=s["contains_null"],
                        contains_nan=s["contains_nan"],
                        lower_bound=s["lower_bound"],
                        upper_bound=s["upper_bound"],
                    )
                    for s in (row["partitions"] or [])
                ],
            )
        )
    return out
