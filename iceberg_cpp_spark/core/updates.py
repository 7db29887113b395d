"""TableUpdate hierarchy + TableMetadataBuilder (reference
table_update.h:41-360, table_metadata.h:161-406).

Every mutation is a declarative ``TableUpdate`` that (a) applies itself
to a ``TableMetadataBuilder`` and (b) generates the optimistic-
concurrency ``Requirement`` guarding it (table_requirements.h:43-90).
The builder records the update log, validates on ``build()``, and the
catalog CAS-commits with the collected requirements — the REST-catalog
commit model, filesystem-backed.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field, replace as dc_replace
from typing import Any, Optional

from iceberg_cpp_spark.core.metadata import (
    MAIN_BRANCH,
    PartitionSpec,
    Snapshot,
    SnapshotRef,
    SortOrder,
    TableMetadata,
    new_table_uuid,
)
from iceberg_cpp_spark.core.types import Schema
from iceberg_cpp_spark.sources.catalog import (
    AssertCurrentSchemaId,
    AssertDefaultSpecId,
    AssertRefSnapshotId,
    AssertTableUUID,
    Requirement,
)


class TableUpdate:
    """table_update.h:41 — one declarative metadata mutation."""

    action: str = ""

    def apply_to(self, b: "TableMetadataBuilder") -> None:
        raise NotImplementedError

    def generate_requirements(self, base: Optional[TableMetadata]) -> list[Requirement]:
        return []


@dataclass
class AssignUuid(TableUpdate):
    uuid: str
    action = "assign-uuid"

    def apply_to(self, b):
        b._set(table_uuid=self.uuid)

    def generate_requirements(self, base):
        return [AssertTableUUID(base.table_uuid)] if base and base.table_uuid else []


@dataclass
class UpgradeFormatVersion(TableUpdate):
    format_version: int
    action = "upgrade-format-version"

    def apply_to(self, b):
        if self.format_version < b.metadata.format_version:
            raise ValueError("cannot downgrade format version")
        b._set(format_version=self.format_version)


@dataclass
class AddSchema(TableUpdate):
    schema: Schema
    action = "add-schema"

    def apply_to(self, b):
        if any(s.schema_id == self.schema.schema_id for s in b.metadata.schemas):
            raise ValueError(f"schema id exists: {self.schema.schema_id}")
        b._set(schemas=b.metadata.schemas + [self.schema],
               last_column_id=max(b.metadata.last_column_id, self.schema.highest_field_id()))


@dataclass
class SetCurrentSchema(TableUpdate):
    schema_id: int
    action = "set-current-schema"

    def apply_to(self, b):
        if b.metadata.schema_by_id(self.schema_id) is None:
            raise ValueError(f"schema not found: {self.schema_id}")
        b._set(current_schema_id=self.schema_id)

    def generate_requirements(self, base):
        return [AssertCurrentSchemaId(base.current_schema_id)] if base else []


@dataclass
class AddPartitionSpec(TableUpdate):
    spec: PartitionSpec
    action = "add-spec"

    def apply_to(self, b):
        if any(s.spec_id == self.spec.spec_id for s in b.metadata.partition_specs):
            raise ValueError(f"spec id exists: {self.spec.spec_id}")
        last = max([f.field_id for f in self.spec.fields] + [b.metadata.last_partition_id])
        b._set(partition_specs=b.metadata.partition_specs + [self.spec],
               last_partition_id=last)


@dataclass
class SetDefaultSpec(TableUpdate):
    spec_id: int
    action = "set-default-spec"

    def apply_to(self, b):
        if b.metadata.spec_by_id(self.spec_id) is None:
            raise ValueError(f"spec not found: {self.spec_id}")
        b._set(default_spec_id=self.spec_id)

    def generate_requirements(self, base):
        return [AssertDefaultSpecId(base.default_spec_id)] if base else []


@dataclass
class AddSortOrder(TableUpdate):
    sort_order: SortOrder
    action = "add-sort-order"

    def apply_to(self, b):
        if any(s.order_id == self.sort_order.order_id for s in b.metadata.sort_orders):
            raise ValueError(f"sort order id exists: {self.sort_order.order_id}")
        b._set(sort_orders=b.metadata.sort_orders + [self.sort_order])


@dataclass
class SetDefaultSortOrder(TableUpdate):
    order_id: int
    action = "set-default-sort-order"

    def apply_to(self, b):
        if all(s.order_id != self.order_id for s in b.metadata.sort_orders):
            raise ValueError(f"sort order not found: {self.order_id}")
        b._set(default_sort_order_id=self.order_id)


@dataclass
class AddSnapshot(TableUpdate):
    snapshot: Snapshot
    action = "add-snapshot"

    def apply_to(self, b):
        m = b.metadata
        if m.snapshot_by_id(self.snapshot.snapshot_id) is not None:
            raise ValueError(f"snapshot id exists: {self.snapshot.snapshot_id}")
        if self.snapshot.sequence_number <= m.last_sequence_number and m.format_version > 1:
            raise ValueError("snapshot sequence number must advance")
        b._set(snapshots=m.snapshots + [self.snapshot],
               last_sequence_number=self.snapshot.sequence_number,
               last_updated_ms=self.snapshot.timestamp_ms)


@dataclass
class SetSnapshotRef(TableUpdate):
    ref_name: str
    snapshot_id: int
    type: str = "branch"
    # retention policy riding on the ref (REST SetSnapshotRefUpdate
    # optional fields; overrides the history.expire.* table defaults)
    min_snapshots_to_keep: Optional[int] = None
    max_snapshot_age_ms: Optional[int] = None
    max_ref_age_ms: Optional[int] = None
    action = "set-snapshot-ref"

    def apply_to(self, b):
        m = b.metadata
        if m.snapshot_by_id(self.snapshot_id) is None:
            raise ValueError(f"snapshot not found: {self.snapshot_id}")
        refs = dict(m.refs)
        # moving a ref's head must not silently reset its retention
        # policy (Java SnapshotProducer copies it from the base ref):
        # explicit fields win, otherwise the existing ref's carry over
        old = m.refs.get(self.ref_name)
        inherit = old if (old is not None and old.type == self.type) else None

        def _pick(new, attr):
            return new if new is not None else (
                getattr(inherit, attr) if inherit is not None else None)

        refs[self.ref_name] = SnapshotRef(
            self.snapshot_id, type=self.type,
            min_snapshots_to_keep=_pick(self.min_snapshots_to_keep,
                                        "min_snapshots_to_keep"),
            max_snapshot_age_ms=_pick(self.max_snapshot_age_ms,
                                      "max_snapshot_age_ms"),
            max_ref_age_ms=_pick(self.max_ref_age_ms, "max_ref_age_ms"))
        out = {"refs": refs}
        if self.ref_name == MAIN_BRANCH:
            out["current_snapshot_id"] = self.snapshot_id
            out["snapshot_log"] = m.snapshot_log + [{
                "timestamp-ms": m.last_updated_ms, "snapshot-id": self.snapshot_id}]
        b._set(**out)

    def generate_requirements(self, base):
        old = base.ref(self.ref_name) if base else None
        return [AssertRefSnapshotId(self.ref_name, old.snapshot_id if old else None)]


@dataclass
class RemoveSnapshots(TableUpdate):
    snapshot_ids: list[int]
    action = "remove-snapshots"

    def apply_to(self, b):
        drop = set(self.snapshot_ids)
        m = b.metadata
        kept = [s for s in m.snapshots if s.snapshot_id not in drop]
        # expiring a snapshot drops its statistics pointers too (spec:
        # stats files belong to a snapshot; iceberg-java ExpireSnapshots
        # does the same) — the files themselves become orphans
        b._set(snapshots=kept,
               snapshot_log=[e for e in m.snapshot_log if e["snapshot-id"] not in drop],
               statistics=[s for s in m.statistics
                           if s.get("snapshot-id") not in drop],
               partition_statistics=[s for s in m.partition_statistics
                                     if s.get("snapshot-id") not in drop])


@dataclass
class RemoveSnapshotRef(TableUpdate):
    ref_name: str
    action = "remove-snapshot-ref"

    def apply_to(self, b):
        refs = dict(b.metadata.refs)
        refs.pop(self.ref_name, None)
        out: dict[str, Any] = {"refs": refs}
        if self.ref_name == MAIN_BRANCH:
            out["current_snapshot_id"] = None
        b._set(**out)


@dataclass
class SetLocation(TableUpdate):
    location: str
    action = "set-location"

    def apply_to(self, b):
        b._set(location=self.location)


@dataclass
class SetProperties(TableUpdate):
    updates: dict[str, str]
    action = "set-properties"

    def apply_to(self, b):
        b._set(properties={**b.metadata.properties, **self.updates})


@dataclass
class RemoveProperties(TableUpdate):
    removals: list[str]
    action = "remove-properties"

    def apply_to(self, b):
        props = {k: v for k, v in b.metadata.properties.items() if k not in self.removals}
        b._set(properties=props)


@dataclass
class SetStatistics(TableUpdate):
    statistics: dict
    action = "set-statistics"

    def apply_to(self, b):
        sid = self.statistics["snapshot-id"]
        kept = [s for s in b.metadata.statistics if s.get("snapshot-id") != sid]
        b._set(statistics=kept + [self.statistics])


@dataclass
class RemoveStatistics(TableUpdate):
    snapshot_id: int
    action = "remove-statistics"

    def apply_to(self, b):
        b._set(statistics=[s for s in b.metadata.statistics
                           if s.get("snapshot-id") != self.snapshot_id])


@dataclass
class SetPartitionStatistics(TableUpdate):
    partition_statistics: dict
    action = "set-partition-statistics"

    def apply_to(self, b):
        sid = self.partition_statistics["snapshot-id"]
        kept = [s for s in b.metadata.partition_statistics if s.get("snapshot-id") != sid]
        b._set(partition_statistics=kept + [self.partition_statistics])


@dataclass
class RemovePartitionStatistics(TableUpdate):
    snapshot_id: int
    action = "remove-partition-statistics"

    def apply_to(self, b):
        b._set(partition_statistics=[s for s in b.metadata.partition_statistics
                                     if s.get("snapshot-id") != self.snapshot_id])


class TableMetadataBuilder:
    """table_metadata.h:161-406 — fluent mutators, each recorded as a
    TableUpdate; ``build()`` validates and returns (metadata, updates,
    requirements)."""

    def __init__(self, base: Optional[TableMetadata] = None):
        self.base = base
        self.metadata = dc_replace(base) if base else TableMetadata(table_uuid=new_table_uuid())
        self.updates: list[TableUpdate] = []

    @staticmethod
    def build_from(base: TableMetadata) -> "TableMetadataBuilder":
        return TableMetadataBuilder(base)

    def _set(self, **kwargs) -> None:
        self.metadata = dc_replace(self.metadata, **kwargs)

    def apply(self, update: TableUpdate) -> "TableMetadataBuilder":
        update.apply_to(self)
        self.updates.append(update)
        return self

    # fluent mutators (one per update class)
    def assign_uuid(self, uuid: str):
        return self.apply(AssignUuid(uuid))

    def upgrade_format_version(self, v: int):
        return self.apply(UpgradeFormatVersion(v))

    def add_schema(self, schema: Schema):
        return self.apply(AddSchema(schema))

    def set_current_schema(self, schema_id: int):
        return self.apply(SetCurrentSchema(schema_id))

    def add_partition_spec(self, spec: PartitionSpec):
        return self.apply(AddPartitionSpec(spec))

    def set_default_spec(self, spec_id: int):
        return self.apply(SetDefaultSpec(spec_id))

    def add_sort_order(self, order: SortOrder):
        return self.apply(AddSortOrder(order))

    def set_default_sort_order(self, order_id: int):
        return self.apply(SetDefaultSortOrder(order_id))

    def add_snapshot(self, snapshot: Snapshot):
        return self.apply(AddSnapshot(snapshot))

    def set_branch_snapshot(self, snapshot_id: int, branch: str = MAIN_BRANCH):
        return self.apply(SetSnapshotRef(branch, snapshot_id, type="branch"))

    def set_ref(self, name: str, snapshot_id: int, type: str = "branch",
                min_snapshots_to_keep: Optional[int] = None,
                max_snapshot_age_ms: Optional[int] = None,
                max_ref_age_ms: Optional[int] = None):
        return self.apply(SetSnapshotRef(
            name, snapshot_id, type=type,
            min_snapshots_to_keep=min_snapshots_to_keep,
            max_snapshot_age_ms=max_snapshot_age_ms,
            max_ref_age_ms=max_ref_age_ms))

    def remove_ref(self, name: str):
        return self.apply(RemoveSnapshotRef(name))

    def remove_snapshots(self, snapshot_ids: list[int]):
        return self.apply(RemoveSnapshots(snapshot_ids))

    def set_location(self, location: str):
        return self.apply(SetLocation(location))

    def set_properties(self, props: dict[str, str]):
        return self.apply(SetProperties(props))

    def remove_properties(self, keys: list[str]):
        return self.apply(RemoveProperties(keys))

    def set_statistics(self, stats: dict):
        return self.apply(SetStatistics(stats))

    def remove_statistics(self, snapshot_id: int):
        return self.apply(RemoveStatistics(snapshot_id))

    def set_partition_statistics(self, stats: dict):
        """table_metadata.h:340 SetPartitionStatistics parity."""
        return self.apply(SetPartitionStatistics(stats))

    def remove_partition_statistics(self, snapshot_id: int):
        """table_metadata.h:347 RemovePartitionStatistics parity."""
        return self.apply(RemovePartitionStatistics(snapshot_id))

    def build(self) -> tuple[TableMetadata, list[TableUpdate], list[Requirement]]:
        m = self.metadata
        if not m.schemas:
            raise ValueError("metadata requires at least one schema")
        if m.schema_by_id(m.current_schema_id) is None:
            raise ValueError(f"current schema not found: {m.current_schema_id}")
        if m.spec_by_id(m.default_spec_id) is None and m.partition_specs:
            raise ValueError(f"default spec not found: {m.default_spec_id}")
        if m.current_snapshot_id is not None and m.snapshot_by_id(m.current_snapshot_id) is None:
            raise ValueError(f"current snapshot not found: {m.current_snapshot_id}")
        m = dc_replace(m, last_updated_ms=max(m.last_updated_ms, int(time.time() * 1000)))
        reqs: list[Requirement] = []
        seen: set[str] = set()
        for u in self.updates:
            for r in u.generate_requirements(self.base):
                k = repr(vars(r)) + type(r).__name__
                if k not in seen:
                    seen.add(k)
                    reqs.append(r)
        return m, self.updates, reqs


# ---------------------------------------------------------------------------
# REST wire format (public Iceberg REST catalog OpenAPI): updates and
# requirements as JSON, so a client can POST CommitTableRequest and a
# server can re-apply the updates against its own base metadata.
# ---------------------------------------------------------------------------

def update_to_json(u: TableUpdate) -> dict:
    j: dict[str, Any] = {"action": u.action}
    if isinstance(u, AssignUuid):
        j["uuid"] = u.uuid
    elif isinstance(u, UpgradeFormatVersion):
        j["format-version"] = u.format_version
    elif isinstance(u, AddSchema):
        j["schema"] = u.schema.to_json()
    elif isinstance(u, SetCurrentSchema):
        j["schema-id"] = u.schema_id
    elif isinstance(u, AddPartitionSpec):
        j["spec"] = u.spec.to_json()
    elif isinstance(u, SetDefaultSpec):
        j["spec-id"] = u.spec_id
    elif isinstance(u, AddSortOrder):
        j["sort-order"] = u.sort_order.to_json()
    elif isinstance(u, SetDefaultSortOrder):
        j["sort-order-id"] = u.order_id
    elif isinstance(u, AddSnapshot):
        j["snapshot"] = u.snapshot.to_json()
    elif isinstance(u, SetSnapshotRef):
        j.update({"ref-name": u.ref_name, "snapshot-id": u.snapshot_id,
                  "type": u.type})
        if u.min_snapshots_to_keep is not None:
            j["min-snapshots-to-keep"] = u.min_snapshots_to_keep
        if u.max_snapshot_age_ms is not None:
            j["max-snapshot-age-ms"] = u.max_snapshot_age_ms
        if u.max_ref_age_ms is not None:
            j["max-ref-age-ms"] = u.max_ref_age_ms
    elif isinstance(u, RemoveSnapshots):
        j["snapshot-ids"] = list(u.snapshot_ids)
    elif isinstance(u, RemoveSnapshotRef):
        j["ref-name"] = u.ref_name
    elif isinstance(u, SetLocation):
        j["location"] = u.location
    elif isinstance(u, SetProperties):
        j["updates"] = dict(u.updates)
    elif isinstance(u, RemoveProperties):
        j["removals"] = list(u.removals)
    elif isinstance(u, SetStatistics):
        j["statistics"] = u.statistics
    elif isinstance(u, RemoveStatistics):
        j["snapshot-id"] = u.snapshot_id
    elif isinstance(u, SetPartitionStatistics):
        j["partition-statistics"] = u.partition_statistics
    elif isinstance(u, RemovePartitionStatistics):
        j["snapshot-id"] = u.snapshot_id
    else:
        raise ValueError(f"unserializable update: {type(u).__name__}")
    return j


def update_from_json(j: dict) -> TableUpdate:
    from iceberg_cpp_spark.core.metadata import (
        PartitionSpec, Snapshot, SortOrder)
    from iceberg_cpp_spark.core.types import Schema

    a = j["action"]
    if a == "assign-uuid":
        return AssignUuid(j["uuid"])
    if a == "upgrade-format-version":
        return UpgradeFormatVersion(j["format-version"])
    if a == "add-schema":
        return AddSchema(Schema.from_json(j["schema"]))
    if a == "set-current-schema":
        return SetCurrentSchema(j["schema-id"])
    if a == "add-spec":
        return AddPartitionSpec(PartitionSpec.from_json(j["spec"]))
    if a == "set-default-spec":
        return SetDefaultSpec(j["spec-id"])
    if a == "add-sort-order":
        return AddSortOrder(SortOrder.from_json(j["sort-order"]))
    if a == "set-default-sort-order":
        return SetDefaultSortOrder(j["sort-order-id"])
    if a == "add-snapshot":
        return AddSnapshot(Snapshot.from_json(j["snapshot"]))
    if a == "set-snapshot-ref":
        return SetSnapshotRef(j["ref-name"], j["snapshot-id"],
                              type=j.get("type", "branch"),
                              min_snapshots_to_keep=j.get(
                                  "min-snapshots-to-keep"),
                              max_snapshot_age_ms=j.get("max-snapshot-age-ms"),
                              max_ref_age_ms=j.get("max-ref-age-ms"))
    if a == "remove-snapshots":
        return RemoveSnapshots(j["snapshot-ids"])
    if a == "remove-snapshot-ref":
        return RemoveSnapshotRef(j["ref-name"])
    if a == "set-location":
        return SetLocation(j["location"])
    if a == "set-properties":
        return SetProperties(j["updates"])
    if a == "remove-properties":
        return RemoveProperties(j["removals"])
    if a == "set-statistics":
        return SetStatistics(j["statistics"])
    if a == "remove-statistics":
        return RemoveStatistics(j["snapshot-id"])
    if a == "set-partition-statistics":
        return SetPartitionStatistics(j["partition-statistics"])
    if a == "remove-partition-statistics":
        return RemovePartitionStatistics(j["snapshot-id"])
    raise ValueError(f"unknown update action: {a}")


def requirement_to_json(r: Requirement) -> dict:
    from iceberg_cpp_spark.sources.catalog import (
        AssertCurrentSchemaId, AssertDefaultSpecId,
        AssertLastAssignedFieldId, AssertRefSnapshotId,
        AssertTableDoesNotExist, AssertTableUUID)

    if isinstance(r, AssertTableDoesNotExist):
        return {"type": "assert-create"}
    if isinstance(r, AssertTableUUID):
        return {"type": "assert-table-uuid", "uuid": r.table_uuid}
    if isinstance(r, AssertRefSnapshotId):
        return {"type": "assert-ref-snapshot-id", "ref": r.ref,
                "snapshot-id": r.snapshot_id}
    if isinstance(r, AssertCurrentSchemaId):
        return {"type": "assert-current-schema-id",
                "current-schema-id": r.schema_id}
    if isinstance(r, AssertDefaultSpecId):
        return {"type": "assert-default-spec-id", "default-spec-id": r.spec_id}
    if isinstance(r, AssertLastAssignedFieldId):
        return {"type": "assert-last-assigned-field-id",
                "last-assigned-field-id": r.field_id}
    raise ValueError(f"unserializable requirement: {type(r).__name__}")


def requirement_from_json(j: dict) -> Requirement:
    from iceberg_cpp_spark.sources.catalog import (
        AssertCurrentSchemaId, AssertDefaultSpecId,
        AssertLastAssignedFieldId, AssertRefSnapshotId,
        AssertTableDoesNotExist, AssertTableUUID)

    t = j["type"]
    if t == "assert-create":
        return AssertTableDoesNotExist()
    if t == "assert-table-uuid":
        return AssertTableUUID(j["uuid"])
    if t == "assert-ref-snapshot-id":
        return AssertRefSnapshotId(j["ref"], j.get("snapshot-id"))
    if t == "assert-current-schema-id":
        return AssertCurrentSchemaId(j["current-schema-id"])
    if t == "assert-default-spec-id":
        return AssertDefaultSpecId(j["default-spec-id"])
    if t == "assert-last-assigned-field-id":
        return AssertLastAssignedFieldId(j["last-assigned-field-id"])
    raise ValueError(f"unknown requirement type: {t}")
