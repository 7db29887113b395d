"""Iceberg View spec (v1): versioned SQL views with spec metadata JSON.

The reference has NO view surface at all (its only "view" hits are
std::string_view — no view metadata, no catalog routes); this module
exceeds it with the published Iceberg View spec: a view is a pointer to
versioned metadata, each version carrying a schema id, SQL
representations per dialect, and a summary — so ``ALTER VIEW``/
``CREATE OR REPLACE`` is an append to the version list plus a
current-version swap, and old versions remain queryable (view time
travel) until trimmed by ``version.history.num-entries``.

Storage layout mirrors IceTable's filesystem protocol: the view
directory holds ``metadata/vN.metadata.json`` plus a CAS'd
``view-version-hint.text`` (a DIFFERENT hint filename than tables, so a
warehouse directory is unambiguously a table or a view without opening
JSON). Commits are exclusive-create + hint CAS — same optimistic
concurrency as table commits.

Execution: ``to_df`` runs the version's Spark-dialect (or ANSI)
representation through ``spark.sql`` — referenced names resolve against
the session catalog, so register the underlying IceTable scans first
(``IceTable.create_or_replace_view``), exactly how engine-agnostic view
specs are consumed.
"""

from __future__ import annotations

import json
import os
import time
import uuid as uuid_mod
from dataclasses import dataclass, field as dc_field
from typing import Any, Optional

from iceberg_cpp_spark.core.io import default_io
from iceberg_cpp_spark.core.types import Schema

DEFAULT_HISTORY_ENTRIES = 10  # spec property version.history.num-entries


@dataclass
class SQLRepresentation:
    """{"type": "sql", "sql": ..., "dialect": ...} (view spec)."""

    sql: str
    dialect: str = "spark"

    def to_json(self) -> dict:
        return {"type": "sql", "sql": self.sql, "dialect": self.dialect}

    @staticmethod
    def from_json(j: dict) -> "SQLRepresentation":
        if j.get("type") != "sql":
            raise ValueError(f"unknown representation type: {j.get('type')}")
        return SQLRepresentation(sql=j["sql"], dialect=j.get("dialect", ""))


@dataclass
class ViewVersion:
    """One immutable version of the view (view spec 'versions' entry)."""

    version_id: int
    schema_id: int
    timestamp_ms: int
    summary: dict[str, str]
    representations: list[SQLRepresentation]
    default_namespace: list[str] = dc_field(default_factory=list)
    default_catalog: Optional[str] = None

    def to_json(self) -> dict:
        j: dict[str, Any] = {
            "version-id": self.version_id,
            "schema-id": self.schema_id,
            "timestamp-ms": self.timestamp_ms,
            "summary": self.summary,
            "representations": [r.to_json() for r in self.representations],
            "default-namespace": self.default_namespace,
        }
        if self.default_catalog is not None:
            j["default-catalog"] = self.default_catalog
        return j

    @staticmethod
    def from_json(j: dict) -> "ViewVersion":
        return ViewVersion(
            version_id=j["version-id"],
            schema_id=j["schema-id"],
            timestamp_ms=j["timestamp-ms"],
            summary=dict(j.get("summary") or {}),
            representations=[SQLRepresentation.from_json(r)
                             for r in j.get("representations", [])],
            default_namespace=list(j.get("default-namespace") or []),
            default_catalog=j.get("default-catalog"),
        )


@dataclass
class ViewMetadata:
    """View spec metadata JSON (format-version 1)."""

    view_uuid: str
    location: str
    schemas: list[Schema]
    current_version_id: int
    versions: list[ViewVersion]
    version_log: list[dict]
    properties: dict[str, str] = dc_field(default_factory=dict)
    format_version: int = 1

    def current_version(self) -> ViewVersion:
        return self.version_by_id(self.current_version_id)

    def version_by_id(self, version_id: int) -> ViewVersion:
        for v in self.versions:
            if v.version_id == version_id:
                return v
        raise ValueError(f"view version not found: {version_id}")

    def schema_by_id(self, schema_id: int) -> Schema:
        for s in self.schemas:
            if s.schema_id == schema_id:
                return s
        raise ValueError(f"view schema not found: {schema_id}")

    def schema(self) -> Schema:
        return self.schema_by_id(self.current_version().schema_id)

    def to_json(self) -> dict:
        return {
            "view-uuid": self.view_uuid,
            "format-version": self.format_version,
            "location": self.location,
            "schemas": [dict(s.to_json(), **{"schema-id": s.schema_id})
                        for s in self.schemas],
            "current-version-id": self.current_version_id,
            "versions": [v.to_json() for v in self.versions],
            "version-log": self.version_log,
            "properties": self.properties,
        }

    @staticmethod
    def from_json(j: dict) -> "ViewMetadata":
        if j.get("format-version") != 1:
            raise ValueError(
                f"unsupported view format-version: {j.get('format-version')}")
        schemas = []
        for sj in j.get("schemas", []):
            s = Schema.from_json(sj)
            schemas.append(s)
        return ViewMetadata(
            view_uuid=j["view-uuid"],
            location=j["location"],
            schemas=schemas,
            current_version_id=j["current-version-id"],
            versions=[ViewVersion.from_json(v) for v in j.get("versions", [])],
            version_log=list(j.get("version-log") or []),
            properties=dict(j.get("properties") or {}),
            format_version=1,
        )


def _trim_history(meta: ViewMetadata) -> None:
    """Drop versions beyond ``version.history.num-entries`` (most recent
    kept, current always kept) — the spec's bounded version history."""
    keep_n = int(meta.properties.get("version.history.num-entries",
                                     str(DEFAULT_HISTORY_ENTRIES)))
    if len(meta.versions) <= keep_n:
        return
    ordered = sorted(meta.versions, key=lambda v: v.version_id)
    kept = ordered[-keep_n:]
    if all(v.version_id != meta.current_version_id for v in kept):
        kept.append(meta.version_by_id(meta.current_version_id))
    ids = {v.version_id for v in kept}
    meta.versions = [v for v in ordered if v.version_id in ids]
    meta.version_log = [e for e in meta.version_log
                        if e["version-id"] in ids]
    live_schema_ids = {v.schema_id for v in meta.versions}
    meta.schemas = [s for s in meta.schemas
                    if s.schema_id in live_schema_ids]


class IceView:
    """Handle over spec view metadata (filesystem protocol; catalogs
    layer their own pointer swap on top, same as tables)."""

    HINT = "view-version-hint.text"

    def __init__(self, metadata: ViewMetadata, metadata_location: str):
        self.metadata = metadata
        self.metadata_location = metadata_location

    # -- lifecycle --------------------------------------------------------
    @classmethod
    def create(cls, location: str, sql: str, schema: Schema,
               dialect: str = "spark", properties: Optional[dict] = None,
               default_namespace: Optional[list] = None) -> "IceView":
        schema.schema_id = schema.schema_id or 0
        version = ViewVersion(
            version_id=1, schema_id=schema.schema_id,
            timestamp_ms=int(time.time() * 1000),
            summary={"operation": "create"},
            representations=[SQLRepresentation(sql, dialect)],
            default_namespace=list(default_namespace or []),
        )
        meta = ViewMetadata(
            view_uuid=str(uuid_mod.uuid4()), location=location,
            schemas=[schema], current_version_id=1, versions=[version],
            version_log=[{"timestamp-ms": version.timestamp_ms,
                          "version-id": 1}],
            properties=dict(properties or {}),
        )
        loc = cls._metadata_path(location, 1)
        cls._write(meta, loc, exclusive=True)
        cls._write_hint(location, 1, expected=None)
        return cls(meta, loc)

    @classmethod
    def load(cls, location: str) -> "IceView":
        hint = os.path.join(location, "metadata", cls.HINT)
        if not os.path.exists(hint):
            raise FileNotFoundError(f"not an Iceberg view: {location}")
        with open(hint) as f:
            version = int(f.read().strip())
        loc = cls._metadata_path(location, version)
        with open(loc, "rb") as f:
            meta = ViewMetadata.from_json(json.loads(f.read().decode()))
        return cls(meta, loc)

    def replace(self, sql: str, schema: Optional[Schema] = None,
                dialect: str = "spark",
                properties: Optional[dict] = None) -> "IceView":
        """CREATE OR REPLACE: append a new version, swap current-version
        (CAS'd, optimistic), trim history per the spec property."""
        meta = self.metadata
        new_vid = max(v.version_id for v in meta.versions) + 1
        if schema is None:
            schema_id = meta.current_version().schema_id
            schemas = meta.schemas
        else:
            schema_id = max((s.schema_id for s in meta.schemas),
                            default=-1) + 1
            schema.schema_id = schema_id
            schemas = meta.schemas + [schema]
        version = ViewVersion(
            version_id=new_vid, schema_id=schema_id,
            timestamp_ms=int(time.time() * 1000),
            summary={"operation": "replace"},
            representations=[SQLRepresentation(sql, dialect)],
            default_namespace=meta.current_version().default_namespace,
        )
        new_meta = ViewMetadata(
            view_uuid=meta.view_uuid, location=meta.location,
            schemas=schemas, current_version_id=new_vid,
            versions=meta.versions + [version],
            version_log=meta.version_log + [
                {"timestamp-ms": version.timestamp_ms,
                 "version-id": new_vid}],
            properties={**meta.properties, **(properties or {})},
        )
        _trim_history(new_meta)
        base = int(os.path.basename(self.metadata_location).split(".")[0][1:])
        loc = self._metadata_path(meta.location, base + 1)
        self._write(new_meta, loc, exclusive=True)  # CAS leg 1
        self._write_hint(meta.location, base + 1, expected=base)
        return IceView(new_meta, loc)

    def update_properties(self, updates: dict) -> "IceView":
        """Commit a metadata version that only changes properties (no
        new view version — CREATE OR REPLACE is ``replace``). Used by
        the materialized-view refresh state."""
        new_meta = ViewMetadata.from_json(self.metadata.to_json())
        new_meta.properties.update({str(k): str(v)
                                    for k, v in updates.items()})
        base = int(os.path.basename(self.metadata_location).split(".")[0][1:])
        loc = self._metadata_path(self.metadata.location, base + 1)
        self._write(new_meta, loc, exclusive=True)
        self._write_hint(self.metadata.location, base + 1, expected=base)
        return IceView(new_meta, loc)

    # -- execution --------------------------------------------------------
    def sql_for(self, dialect: str = "spark",
                version_id: Optional[int] = None) -> str:
        v = (self.metadata.version_by_id(version_id)
             if version_id is not None else self.metadata.current_version())
        for r in v.representations:
            if r.dialect == dialect:
                return r.sql
        for r in v.representations:  # ANSI is spark-runnable
            if r.dialect in ("ansi", ""):
                return r.sql
        raise ValueError(
            f"view version {v.version_id} has no {dialect!r} representation "
            f"(has: {[r.dialect for r in v.representations]})")

    def to_df(self, spark, version_id: Optional[int] = None):
        """Run the view (optionally a historical version — view time
        travel) against the session catalog."""
        return spark.sql(self.sql_for("spark", version_id))

    # -- plumbing ---------------------------------------------------------
    @staticmethod
    def _metadata_path(location: str, version: int) -> str:
        return os.path.join(location, "metadata", f"v{version}.metadata.json")

    @staticmethod
    def _write(meta: ViewMetadata, path: str, exclusive: bool) -> None:
        data = json.dumps(meta.to_json(), indent=2).encode()
        default_io().write_bytes(path, data, exclusive=exclusive)

    @classmethod
    def _write_hint(cls, location: str, version: int,
                    expected: Optional[int]) -> None:
        from iceberg_cpp_spark.sources.catalog import CommitFailedError

        hint = os.path.join(location, "metadata", cls.HINT)
        os.makedirs(os.path.dirname(hint), exist_ok=True)
        if os.path.exists(hint):
            with open(hint) as f:
                current = int(f.read().strip())
            if expected is not None and current != expected:
                raise CommitFailedError(
                    f"concurrent view commit: hint moved to v{current}, "
                    f"expected v{expected}")
        tmp = f"{hint}.tmp.{uuid_mod.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, hint)
