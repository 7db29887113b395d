"""Table metadata model + JSON serde (+gzip), snapshots, refs, specs.

Capability parity with the reference's ``TableMetadata``
(table_metadata.h:69-140), ``Snapshot``/``SnapshotRef`` (snapshot.h:
224-259, 64-118), ``PartitionSpec``/``PartitionField`` (partition_field.
h:36-76), ``SortOrder``/``SortField`` (sort_order.h:37-66), the JSON
(de)serialization in json_internal.cc:393-1150, and the gzip-sniffing
read/write path of TableMetadataUtil (table_metadata.cc:165-220 — codec
detected from a ``.gz.metadata.json`` filename).

Pure Python — metadata is driver-side, exactly as in the reference.
"""

from __future__ import annotations

import gzip
import json
import uuid as uuid_mod
from dataclasses import dataclass, field as dc_field
from typing import Any, Optional

from iceberg_cpp_spark.core.types import Schema
from iceberg_cpp_spark.functions import transforms as tr

MAIN_BRANCH = "main"
INITIAL_SEQUENCE_NUMBER = 0


# --------------------------------------------------------------------------
# Partition spec / sort order
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class PartitionField:
    """source column (by field id) + transform → named partition field
    (partition_field.h:36-76)."""

    source_id: int
    field_id: int
    name: str
    transform: tr.Transform

    def to_json(self) -> dict:
        return {
            "source-id": self.source_id,
            "field-id": self.field_id,
            "name": self.name,
            "transform": str(self.transform),
        }

    @staticmethod
    def from_json(j: dict) -> "PartitionField":
        return PartitionField(
            source_id=j["source-id"],
            field_id=j["field-id"],
            name=j["name"],
            transform=tr.from_string(j["transform"]),
        )


PARTITION_DATA_ID_START = 1000


class PartitionSpec:
    def __init__(self, fields: list[PartitionField], spec_id: int = 0):
        self.spec_id = spec_id
        self.fields = list(fields)

    @property
    def is_unpartitioned(self) -> bool:
        return not any(not isinstance(f.transform, tr.VoidTransform) for f in self.fields)

    def to_json(self) -> dict:
        return {"spec-id": self.spec_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(j: dict) -> "PartitionSpec":
        return PartitionSpec(
            [PartitionField.from_json(f) for f in j.get("fields", [])],
            spec_id=j.get("spec-id", 0),
        )

    @staticmethod
    def unpartitioned() -> "PartitionSpec":
        return PartitionSpec([], spec_id=0)

    def __eq__(self, other):
        return (
            isinstance(other, PartitionSpec)
            and self.spec_id == other.spec_id
            and self.fields == other.fields
        )

    def __repr__(self):
        return f"PartitionSpec(spec_id={self.spec_id}, fields={self.fields})"


@dataclass(frozen=True)
class SortField:
    """transform + direction + null order per field (sort_field.h:37-66)."""

    source_id: int
    transform: tr.Transform
    direction: str = "asc"  # asc | desc
    null_order: str = "nulls-first"  # nulls-first | nulls-last

    def to_json(self) -> dict:
        return {
            "source-id": self.source_id,
            "transform": str(self.transform),
            "direction": self.direction,
            "null-order": self.null_order,
        }

    @staticmethod
    def from_json(j: dict) -> "SortField":
        return SortField(
            source_id=j["source-id"],
            transform=tr.from_string(j["transform"]),
            direction=j.get("direction", "asc"),
            null_order=j.get("null-order", "nulls-first"),
        )


class SortOrder:
    UNSORTED_ORDER_ID = 0

    def __init__(self, fields: list[SortField], order_id: int = 0):
        self.order_id = order_id
        self.fields = list(fields)

    @property
    def is_unsorted(self) -> bool:
        return not self.fields

    def to_json(self) -> dict:
        return {"order-id": self.order_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(j: dict) -> "SortOrder":
        return SortOrder(
            [SortField.from_json(f) for f in j.get("fields", [])],
            order_id=j.get("order-id", 0),
        )

    @staticmethod
    def unsorted() -> "SortOrder":
        return SortOrder([], order_id=SortOrder.UNSORTED_ORDER_ID)

    def __eq__(self, other):
        return (
            isinstance(other, SortOrder)
            and self.order_id == other.order_id
            and self.fields == other.fields
        )


# --------------------------------------------------------------------------
# Snapshots & refs
# --------------------------------------------------------------------------

class DataOperation:
    """Snapshot summary `operation` values (snapshot.h:195-216)."""

    APPEND = "append"
    REPLACE = "replace"
    OVERWRITE = "overwrite"
    DELETE = "delete"


@dataclass
class Snapshot:
    """snapshot.h:224-259."""

    snapshot_id: int
    sequence_number: int
    timestamp_ms: int
    manifest_list: str
    summary: dict[str, str] = dc_field(default_factory=dict)
    parent_snapshot_id: Optional[int] = None
    schema_id: Optional[int] = None
    # format-version 1 allows an inline `manifests` array instead of a
    # manifest-list file (spec v1; json_internal.cc snapshot parsing)
    manifests: Optional[list[str]] = None

    @property
    def operation(self) -> Optional[str]:
        return self.summary.get("operation")

    def to_json(self) -> dict:
        j: dict[str, Any] = {
            "snapshot-id": self.snapshot_id,
            "sequence-number": self.sequence_number,
            "timestamp-ms": self.timestamp_ms,
            "summary": self.summary,
        }
        if self.manifest_list:
            j["manifest-list"] = self.manifest_list
        elif self.manifests is not None:
            j["manifests"] = self.manifests
        if self.parent_snapshot_id is not None:
            j["parent-snapshot-id"] = self.parent_snapshot_id
        if self.schema_id is not None:
            j["schema-id"] = self.schema_id
        return j

    @staticmethod
    def from_json(j: dict) -> "Snapshot":
        if "manifest-list" not in j and "manifests" not in j:
            raise ValueError("snapshot missing both manifest-list and manifests")
        return Snapshot(
            snapshot_id=j["snapshot-id"],
            sequence_number=j.get("sequence-number", 0),
            timestamp_ms=j["timestamp-ms"],
            manifest_list=j.get("manifest-list", ""),
            summary=j.get("summary", {}),
            parent_snapshot_id=j.get("parent-snapshot-id"),
            schema_id=j.get("schema-id"),
            manifests=j.get("manifests"),
        )


@dataclass(frozen=True)
class SnapshotRef:
    """Branch/tag reference (snapshot.h:64-118)."""

    snapshot_id: int
    type: str = "branch"  # branch | tag
    min_snapshots_to_keep: Optional[int] = None
    max_snapshot_age_ms: Optional[int] = None
    max_ref_age_ms: Optional[int] = None

    def to_json(self) -> dict:
        j: dict[str, Any] = {"snapshot-id": self.snapshot_id, "type": self.type}
        if self.min_snapshots_to_keep is not None:
            j["min-snapshots-to-keep"] = self.min_snapshots_to_keep
        if self.max_snapshot_age_ms is not None:
            j["max-snapshot-age-ms"] = self.max_snapshot_age_ms
        if self.max_ref_age_ms is not None:
            j["max-ref-age-ms"] = self.max_ref_age_ms
        return j

    @staticmethod
    def from_json(j: dict) -> "SnapshotRef":
        return SnapshotRef(
            snapshot_id=j["snapshot-id"],
            type=j.get("type", "branch"),
            min_snapshots_to_keep=j.get("min-snapshots-to-keep"),
            max_snapshot_age_ms=j.get("max-snapshot-age-ms"),
            max_ref_age_ms=j.get("max-ref-age-ms"),
        )


# --------------------------------------------------------------------------
# Table metadata
# --------------------------------------------------------------------------

DEFAULT_FORMAT_VERSION = 2
SUPPORTED_FORMAT_VERSIONS = (1, 2, 3)


@dataclass
class TableMetadata:
    """table_metadata.h:69-140 — the full metadata document."""

    format_version: int = DEFAULT_FORMAT_VERSION
    table_uuid: str = ""
    location: str = ""
    last_sequence_number: int = INITIAL_SEQUENCE_NUMBER
    last_updated_ms: int = 0
    last_column_id: int = 0
    schemas: list[Schema] = dc_field(default_factory=list)
    current_schema_id: int = 0
    partition_specs: list[PartitionSpec] = dc_field(default_factory=list)
    default_spec_id: int = 0
    last_partition_id: int = PARTITION_DATA_ID_START - 1
    properties: dict[str, str] = dc_field(default_factory=dict)
    current_snapshot_id: Optional[int] = None
    snapshots: list[Snapshot] = dc_field(default_factory=list)
    snapshot_log: list[dict] = dc_field(default_factory=list)  # {timestamp-ms, snapshot-id}
    metadata_log: list[dict] = dc_field(default_factory=list)  # {timestamp-ms, metadata-file}
    sort_orders: list[SortOrder] = dc_field(default_factory=list)
    default_sort_order_id: int = 0
    refs: dict[str, SnapshotRef] = dc_field(default_factory=dict)
    statistics: list[dict] = dc_field(default_factory=list)
    partition_statistics: list[dict] = dc_field(default_factory=list)
    next_row_id: int = 0

    # --- lookups (table_metadata.cc) -----------------------------------
    def schema(self) -> Schema:
        s = self.schema_by_id(self.current_schema_id)
        if s is None:
            raise ValueError(f"current schema not found: {self.current_schema_id}")
        return s

    def schema_by_id(self, schema_id: Optional[int]) -> Optional[Schema]:
        for s in self.schemas:
            if s.schema_id == schema_id:
                return s
        return None

    def spec(self) -> PartitionSpec:
        s = self.spec_by_id(self.default_spec_id)
        if s is None:
            raise ValueError(f"default spec not found: {self.default_spec_id}")
        return s

    def spec_by_id(self, spec_id: int) -> Optional[PartitionSpec]:
        for s in self.partition_specs:
            if s.spec_id == spec_id:
                return s
        return None

    def sort_order(self) -> SortOrder:
        for s in self.sort_orders:
            if s.order_id == self.default_sort_order_id:
                return s
        return SortOrder.unsorted()

    def snapshot_by_id(self, snapshot_id: int) -> Optional[Snapshot]:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        return None

    def current_snapshot(self) -> Optional[Snapshot]:
        if self.current_snapshot_id is None or self.current_snapshot_id == -1:
            return None
        return self.snapshot_by_id(self.current_snapshot_id)

    def ref(self, name: str) -> Optional[SnapshotRef]:
        return self.refs.get(name)

    def snapshot_as_of(self, timestamp_ms: int) -> Optional[Snapshot]:
        """Time travel by timestamp: latest snapshot at or before ts."""
        best: Optional[Snapshot] = None
        for s in self.snapshots:
            if s.timestamp_ms <= timestamp_ms and (best is None or s.timestamp_ms > best.timestamp_ms):
                best = s
        return best

    # --- serde (json_internal.cc:943-1150) ------------------------------
    def to_json(self) -> dict:
        j: dict[str, Any] = {
            "format-version": self.format_version,
            "table-uuid": self.table_uuid,
            "location": self.location,
            "last-sequence-number": self.last_sequence_number,
            "last-updated-ms": self.last_updated_ms,
            "last-column-id": self.last_column_id,
            "current-schema-id": self.current_schema_id,
            "schemas": [s.to_json() for s in self.schemas],
            "default-spec-id": self.default_spec_id,
            "partition-specs": [s.to_json() for s in self.partition_specs],
            "last-partition-id": self.last_partition_id,
            "default-sort-order-id": self.default_sort_order_id,
            "sort-orders": [s.to_json() for s in self.sort_orders],
            "properties": self.properties,
            "current-snapshot-id": self.current_snapshot_id if self.current_snapshot_id is not None else -1,
            "snapshots": [s.to_json() for s in self.snapshots],
            "snapshot-log": self.snapshot_log,
            "metadata-log": self.metadata_log,
            "refs": {k: v.to_json() for k, v in self.refs.items()},
        }
        if self.format_version >= 3:
            j["next-row-id"] = self.next_row_id
        if self.format_version == 1:
            # v1 readers require the singular `schema`/`partition-spec`
            # keys (spec Table Metadata v1); keep the plural lists too,
            # as v1-writing engines do for forward compatibility
            cur = next((s for s in self.schemas
                        if s.schema_id == self.current_schema_id), None)
            if cur is not None:
                j["schema"] = cur.to_json()
            spec = next((s for s in self.partition_specs
                         if s.spec_id == self.default_spec_id), None)
            if spec is not None:
                j["partition-spec"] = [f.to_json() for f in spec.fields]
        if self.statistics:
            j["statistics"] = self.statistics
        if self.partition_statistics:
            j["partition-statistics"] = self.partition_statistics
        return j

    @staticmethod
    def from_json(j: dict) -> "TableMetadata":
        fv = j.get("format-version")
        if fv not in SUPPORTED_FORMAT_VERSIONS:
            raise ValueError(f"unsupported format version: {fv}")
        if fv == 1 and "schemas" not in j:
            # v1 allows a bare `schema` field
            schemas = [Schema.from_json(j["schema"])] if "schema" in j else []
            current_schema_id = schemas[0].schema_id if schemas else 0
        else:
            if "schemas" not in j or not j["schemas"]:
                raise ValueError("missing schemas")
            schemas = [Schema.from_json(s) for s in j["schemas"]]
            current_schema_id = j["current-schema-id"]
        if all(s.schema_id != current_schema_id for s in schemas):
            raise ValueError(f"current schema not found: {current_schema_id}")
        if fv == 1 and "partition-specs" not in j and "partition-spec" in j:
            specs = [PartitionSpec([PartitionField.from_json(f) for f in j["partition-spec"]], spec_id=0)]
            default_spec_id = 0
        else:
            specs = [PartitionSpec.from_json(s) for s in j.get("partition-specs", [])]
            default_spec_id = j.get("default-spec-id", 0)
        sort_orders = [SortOrder.from_json(s) for s in j.get("sort-orders", [])]
        if fv >= 2 and "sort-orders" not in j:
            raise ValueError("missing sort orders")
        # v2 requires explicit partition-specs and last-partition-id
        # (reference json_internal.cc / table_metadata_test expectations)
        if fv >= 2 and "partition-specs" not in j:
            raise ValueError("missing partition specs")
        if fv >= 2 and "last-partition-id" not in j:
            raise ValueError("missing last-partition-id")
        cs = j.get("current-snapshot-id", -1)
        return TableMetadata(
            format_version=fv,
            table_uuid=j.get("table-uuid", ""),
            location=j.get("location", ""),
            last_sequence_number=j.get("last-sequence-number", 0),
            last_updated_ms=j.get("last-updated-ms", 0),
            last_column_id=j.get("last-column-id", 0),
            schemas=schemas,
            current_schema_id=current_schema_id,
            partition_specs=specs,
            default_spec_id=default_spec_id,
            last_partition_id=j.get("last-partition-id", PARTITION_DATA_ID_START - 1),
            properties=j.get("properties", {}),
            current_snapshot_id=None if cs in (None, -1) else cs,
            snapshots=[Snapshot.from_json(s) for s in j.get("snapshots", [])],
            snapshot_log=j.get("snapshot-log", []),
            metadata_log=j.get("metadata-log", []),
            sort_orders=sort_orders,
            default_sort_order_id=j.get("default-sort-order-id", 0),
            refs={k: SnapshotRef.from_json(v) for k, v in j.get("refs", {}).items()},
            statistics=j.get("statistics", []),
            partition_statistics=j.get("partition-statistics", []),
            next_row_id=j.get("next-row-id", 0),
        )


# --------------------------------------------------------------------------
# File read/write with gzip codec sniffing (table_metadata.cc:165-220)
# --------------------------------------------------------------------------

def read_table_metadata(path: str, io=None) -> TableMetadata:
    from iceberg_cpp_spark.core.io import default_io

    raw = (io or default_io()).read_bytes(path)
    if path.endswith(".gz.metadata.json") or raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    return TableMetadata.from_json(json.loads(raw.decode("utf-8")))


def write_table_metadata(meta: TableMetadata, path: str, exclusive: bool = False,
                         io=None) -> None:
    """Write metadata JSON through FileIO. With ``exclusive=True`` the
    version-file creation itself is the compare-and-swap: creation fails
    with FileExistsError if a concurrent writer won the version, closing
    the check-then-replace TOCTOU window."""
    from iceberg_cpp_spark.core.io import default_io

    data = json.dumps(meta.to_json(), indent=2).encode("utf-8")
    if path.endswith(".gz.metadata.json"):
        data = gzip.compress(data)
    (io or default_io()).write_bytes(path, data, exclusive=exclusive)


def new_table_uuid() -> str:
    return str(uuid_mod.uuid4())
