"""Catalogs: namespace/table CRUD + optimistic-concurrency commits.

Capability parity with the reference's ``Catalog`` interface
(catalog.h:39-236) and ``InMemoryCatalog``
(catalog/memory/in_memory_catalog.h:38-106): CreateNamespace /
ListNamespaces / DropNamespace / NamespaceExists / Update props,
ListTables / CreateTable / UpdateTable(requirements, updates) /
StageCreateTable / DropTable / LoadTable / RegisterTable / TableExists.

``FileSystemCatalog`` persists each table as a warehouse directory with
``metadata/vN.metadata.json`` + a ``version-hint.text`` pointer; commit
is check-requirements + atomic-rename compare-and-swap — the commit
protocol the reference delegates to TableRequirement validation
(table_requirement.h, table_requirements.h:43-90).
"""

from __future__ import annotations

import json
import os
import time
import uuid as uuid_mod
from typing import Optional

from iceberg_cpp_spark.core.metadata import (
    PartitionSpec,
    SortOrder,
    TableMetadata,
    new_table_uuid,
    read_table_metadata,
    write_table_metadata,
)
from iceberg_cpp_spark.core.types import Schema, max_assigned_field_id


class CommitFailedError(Exception):
    """A table requirement failed at commit time (optimistic concurrency)."""


class NoSuchTableError(Exception):
    pass


class NoSuchViewError(Exception):
    pass


class NoSuchNamespaceError(Exception):
    pass


class AlreadyExistsError(Exception):
    pass


# --------------------------------------------------------------------------
# Requirements (table_requirement.h) — validated against the base metadata
# --------------------------------------------------------------------------

class Requirement:
    def check(self, base: Optional[TableMetadata]) -> None:
        raise NotImplementedError


class AssertTableDoesNotExist(Requirement):
    def check(self, base):
        if base is not None:
            raise CommitFailedError("table already exists")


class AssertTableUUID(Requirement):
    def __init__(self, table_uuid: str):
        self.table_uuid = table_uuid

    def check(self, base):
        if base is None or base.table_uuid != self.table_uuid:
            raise CommitFailedError(f"table uuid mismatch: {self.table_uuid}")


class AssertRefSnapshotId(Requirement):
    def __init__(self, ref: str, snapshot_id: Optional[int]):
        self.ref = ref
        self.snapshot_id = snapshot_id

    def check(self, base):
        if base is None:
            raise CommitFailedError("table does not exist")
        r = base.ref(self.ref)
        current = r.snapshot_id if r else None
        if current != self.snapshot_id:
            raise CommitFailedError(
                f"ref {self.ref} changed: expected {self.snapshot_id}, found {current}"
            )


class AssertCurrentSchemaId(Requirement):
    def __init__(self, schema_id: int):
        self.schema_id = schema_id

    def check(self, base):
        if base is None or base.current_schema_id != self.schema_id:
            raise CommitFailedError("current schema id changed")


class AssertDefaultSpecId(Requirement):
    def __init__(self, spec_id: int):
        self.spec_id = spec_id

    def check(self, base):
        if base is None or base.default_spec_id != self.spec_id:
            raise CommitFailedError("default spec id changed")


class AssertLastAssignedFieldId(Requirement):
    def __init__(self, field_id: int):
        self.field_id = field_id

    def check(self, base):
        if base is None or base.last_column_id != self.field_id:
            raise CommitFailedError("last assigned field id changed")


# --------------------------------------------------------------------------
# Catalog interface
# --------------------------------------------------------------------------

class Catalog:
    name: str = "catalog"

    # namespaces
    def create_namespace(self, ns: str, properties: Optional[dict] = None) -> None:
        raise NotImplementedError

    def list_namespaces(self, parent: str = "") -> list[str]:
        raise NotImplementedError

    def drop_namespace(self, ns: str) -> None:
        raise NotImplementedError

    def namespace_exists(self, ns: str) -> bool:
        raise NotImplementedError

    def get_namespace_properties(self, ns: str) -> dict:
        raise NotImplementedError

    def update_namespace_properties(self, ns: str, updates: dict,
                                    removals: Optional[list[str]] = None) -> None:
        raise NotImplementedError

    # tables
    def list_tables(self, ns: str) -> list[str]:
        raise NotImplementedError

    def table_exists(self, ident: str) -> bool:
        try:
            self.load_metadata(ident)
            return True
        except NoSuchTableError:
            return False

    def load_metadata(self, ident: str) -> tuple[TableMetadata, str]:
        raise NotImplementedError

    def create_table(self, ident: str, schema: Schema,
                     spec: Optional[PartitionSpec] = None,
                     sort_order: Optional[SortOrder] = None,
                     properties: Optional[dict] = None,
                     location: Optional[str] = None) -> TableMetadata:
        raise NotImplementedError

    def commit_table(self, ident: str, requirements: list[Requirement],
                     new_metadata: TableMetadata) -> str:
        """Validate requirements against current base, then CAS-swap.
        Returns new metadata location."""
        raise NotImplementedError

    def register_table(self, ident: str, metadata_location: str) -> None:
        raise NotImplementedError

    def drop_table(self, ident: str, purge: bool = False) -> bool:
        raise NotImplementedError

    def load_table(self, ident: str, spark=None):
        from iceberg_cpp_spark.table import IceTable

        meta, loc = self.load_metadata(ident)
        return IceTable(ident, meta, loc, catalog=self, spark=spark)

    def stage_create_table(self, ident: str, schema: Schema,
                           spec: Optional[PartitionSpec] = None,
                           sort_order: Optional[SortOrder] = None,
                           properties: Optional[dict] = None,
                           location: Optional[str] = None) -> TableMetadata:
        """StageCreateTable (catalog.h:152-165): build + persist metadata
        for a transaction WITHOUT registering the table; a later
        register_table/commit makes it visible."""
        if self.table_exists(ident):
            raise AlreadyExistsError(ident)
        location = location or os.path.join(getattr(self, "warehouse", "/tmp"),
                                            *ident.split("."))
        meta = self._new_metadata(schema, spec, sort_order, properties, location)
        loc = os.path.join(location, "metadata", "v0.staged.metadata.json")
        write_table_metadata(meta, loc)
        return meta

    def _new_metadata(self, schema: Schema, spec: Optional[PartitionSpec],
                      sort_order: Optional[SortOrder], properties: Optional[dict],
                      location: str) -> TableMetadata:
        spec = spec or PartitionSpec.unpartitioned()
        sort_order = sort_order or SortOrder.unsorted()
        last_partition_id = max((f.field_id for f in spec.fields), default=999)
        # create-time `format-version` table property pins the metadata
        # version (Java TableProperties.FORMAT_VERSION parity): v1 for
        # v1-pinned consumers, v3 for row lineage / DVs
        props = dict(properties or {})
        fv = int(props.pop("format-version", 2))
        if fv not in (1, 2, 3):
            raise ValueError(f"unsupported format-version: {fv}")
        from iceberg_cpp_spark.core.types import schema_v3_types
        v3 = schema_v3_types(schema)
        if fv < 3 and v3:
            raise ValueError(
                f"{sorted(v3)} columns require format-version 3 (pass "
                "properties={'format-version': '3'} at create)")
        return TableMetadata(
            format_version=fv,
            table_uuid=new_table_uuid(),
            location=location,
            last_updated_ms=int(time.time() * 1000),
            # max_assigned_field_id, not highest_field_id: list element
            # / map key+value ids never enter the schema's NAME index,
            # and the spec requires last-column-id >= every assigned id
            # (an external reader validates it; review r16)
            last_column_id=max_assigned_field_id(schema.fields),
            schemas=[schema],
            current_schema_id=schema.schema_id,
            partition_specs=[spec],
            default_spec_id=spec.spec_id,
            last_partition_id=last_partition_id,
            properties=props,
            sort_orders=[sort_order],
            default_sort_order_id=sort_order.order_id,
        )


class InMemoryCatalog(Catalog):
    """catalog/memory/in_memory_catalog.cc parity — dict-backed, but
    metadata documents still round-trip through JSON files under a root
    dir so scans/commits behave identically to FileSystemCatalog."""

    def __init__(self, warehouse: str, name: str = "memory"):
        self.name = name
        self.warehouse = warehouse
        self._namespaces: dict[str, dict] = {}
        self._tables: dict[str, str] = {}  # ident -> metadata location

    # namespaces ---------------------------------------------------------
    def create_namespace(self, ns, properties=None):
        if ns in self._namespaces:
            raise AlreadyExistsError(f"namespace exists: {ns}")
        parent = ".".join(ns.split(".")[:-1])
        if parent and parent not in self._namespaces:
            raise NoSuchNamespaceError(f"parent namespace missing: {parent}")
        self._namespaces[ns] = dict(properties or {})

    def list_namespaces(self, parent=""):
        if parent:
            prefix = parent + "."
            return sorted(
                n for n in self._namespaces
                if n.startswith(prefix) and "." not in n[len(prefix):]
            )
        return sorted(n for n in self._namespaces if "." not in n)

    def drop_namespace(self, ns):
        if ns not in self._namespaces:
            raise NoSuchNamespaceError(ns)
        if any(t.startswith(ns + ".") for t in self._tables):
            raise ValueError(f"namespace not empty: {ns}")
        if any(n.startswith(ns + ".") for n in self._namespaces):
            raise ValueError(f"namespace has children: {ns}")
        del self._namespaces[ns]

    def namespace_exists(self, ns):
        return ns in self._namespaces

    def get_namespace_properties(self, ns):
        if ns not in self._namespaces:
            raise NoSuchNamespaceError(ns)
        return dict(self._namespaces[ns])

    def update_namespace_properties(self, ns, updates, removals=None):
        if ns not in self._namespaces:
            raise NoSuchNamespaceError(ns)
        for k in removals or []:
            self._namespaces[ns].pop(k, None)
        self._namespaces[ns].update(updates)

    # tables -------------------------------------------------------------
    def list_tables(self, ns):
        prefix = ns + "."
        return sorted(t for t in self._tables if t.startswith(prefix) and "." not in t[len(prefix):])

    def load_metadata(self, ident):
        loc = self._tables.get(ident)
        if loc is None:
            raise NoSuchTableError(ident)
        return read_table_metadata(loc), loc

    def create_table(self, ident, schema, spec=None, sort_order=None, properties=None, location=None):
        if ident in self._tables:
            raise AlreadyExistsError(ident)
        ns = ".".join(ident.split(".")[:-1])
        if ns and ns not in self._namespaces:
            raise NoSuchNamespaceError(ns)
        location = location or os.path.join(self.warehouse, *ident.split("."))
        meta = self._new_metadata(schema, spec, sort_order, properties, location)
        loc = os.path.join(location, "metadata", "v1.metadata.json")
        write_table_metadata(meta, loc)
        self._tables[ident] = loc
        return meta

    def commit_table(self, ident, requirements, new_metadata):
        base_loc = self._tables.get(ident)
        base = read_table_metadata(base_loc) if base_loc else None
        for r in requirements:
            r.check(base)
        version = 1
        if base_loc:
            fname = os.path.basename(base_loc)
            if fname.startswith("v"):
                version = int(fname.split(".")[0][1:]) + 1
        loc = os.path.join(new_metadata.location, "metadata", f"v{version}.metadata.json")
        write_table_metadata(new_metadata, loc)
        self._tables[ident] = loc
        return loc

    def register_table(self, ident, metadata_location):
        if ident in self._tables:
            raise AlreadyExistsError(ident)
        self._tables[ident] = metadata_location

    def drop_table(self, ident, purge=False):
        if ident not in self._tables:
            return False
        loc = self._tables.pop(ident)
        if purge:
            import shutil

            table_dir = os.path.dirname(os.path.dirname(loc))
            shutil.rmtree(table_dir, ignore_errors=True)
        return True


class FileSystemCatalog(Catalog):
    """Warehouse-directory catalog: each table directory holds
    ``metadata/vN.metadata.json`` and a ``version-hint.text`` pointing at
    the current version. Commit = write vN+1 then atomically replace the
    hint (CAS: fails if another writer got there first)."""

    def __init__(self, warehouse: str, name: str = "fs"):
        self.name = name
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _ns_dir(self, ns: str) -> str:
        return os.path.join(self.warehouse, *ns.split("."))

    def _table_dir(self, ident: str) -> str:
        return os.path.join(self.warehouse, *ident.split("."))

    # namespaces ---------------------------------------------------------
    def create_namespace(self, ns, properties=None):
        d = self._ns_dir(ns)
        if os.path.exists(d):
            raise AlreadyExistsError(ns)
        os.makedirs(d)
        with open(os.path.join(d, ".namespace.json"), "w") as f:
            json.dump(properties or {}, f)

    def namespace_exists(self, ns):
        return os.path.exists(os.path.join(self._ns_dir(ns), ".namespace.json"))

    def list_namespaces(self, parent=""):
        base = self._ns_dir(parent) if parent else self.warehouse
        if not os.path.isdir(base):
            return []
        out = []
        for d in sorted(os.listdir(base)):
            if os.path.exists(os.path.join(base, d, ".namespace.json")):
                out.append(f"{parent}.{d}" if parent else d)
        return out

    def drop_namespace(self, ns):
        d = self._ns_dir(ns)
        if not self.namespace_exists(ns):
            raise NoSuchNamespaceError(ns)
        entries = [e for e in os.listdir(d) if e != ".namespace.json"]
        if entries:
            raise ValueError(f"namespace not empty: {ns}")
        import shutil

        shutil.rmtree(d)

    def get_namespace_properties(self, ns):
        p = os.path.join(self._ns_dir(ns), ".namespace.json")
        if not os.path.exists(p):
            raise NoSuchNamespaceError(ns)
        with open(p) as f:
            return json.load(f)

    def update_namespace_properties(self, ns, updates, removals=None):
        props = self.get_namespace_properties(ns)
        for k in removals or []:
            props.pop(k, None)
        props.update(updates)
        with open(os.path.join(self._ns_dir(ns), ".namespace.json"), "w") as f:
            json.dump(props, f)

    # tables -------------------------------------------------------------
    def list_tables(self, ns):
        d = self._ns_dir(ns)
        if not os.path.isdir(d):
            return []
        out = []
        for t in sorted(os.listdir(d)):
            if os.path.exists(os.path.join(d, t, "metadata", "version-hint.text")):
                out.append(f"{ns}.{t}")
        return out

    def _hint_path(self, ident: str) -> str:
        return os.path.join(self._table_dir(ident), "metadata", "version-hint.text")

    def _read_hint(self, ident):
        """(version, metadata_dir). The hint's first line is the
        version (the Iceberg version-hint.text convention); a second
        line, present only for CUSTOM-LOCATION tables (migrate/clone
        with location=), points at the real metadata directory — the
        default resolves under the warehouse table dir as before."""
        hint = self._hint_path(ident)
        if not os.path.exists(hint):
            raise NoSuchTableError(ident)
        with open(hint) as f:
            lines = f.read().strip().splitlines()
        version = int(lines[0].strip())
        meta_dir = (lines[1].strip() if len(lines) > 1
                    else os.path.join(self._table_dir(ident), "metadata"))
        return version, meta_dir

    def load_metadata(self, ident):
        version, meta_dir = self._read_hint(ident)
        loc = os.path.join(meta_dir, f"v{version}.metadata.json")
        return read_table_metadata(loc), loc

    def create_table(self, ident, schema, spec=None, sort_order=None, properties=None, location=None):
        if self.table_exists(ident):
            raise AlreadyExistsError(ident)
        custom = location is not None and \
            os.path.normpath(location) != \
            os.path.normpath(self._table_dir(ident))
        location = location or self._table_dir(ident)
        meta = self._new_metadata(schema, spec, sort_order, properties, location)
        loc = os.path.join(location, "metadata", "v1.metadata.json")
        write_table_metadata(meta, loc)
        self._write_hint(ident, 1, expected_current=None,
                         metadata_dir=(os.path.join(location, "metadata")
                                       if custom else None))
        return meta

    def _write_hint(self, ident: str, version: int,
                    expected_current: Optional[int],
                    metadata_dir: Optional[str] = None) -> None:
        hint = self._hint_path(ident)
        os.makedirs(os.path.dirname(hint), exist_ok=True)
        # CAS: re-check the current hint immediately before replace
        if os.path.exists(hint):
            with open(hint) as f:
                current = int(f.read().strip().splitlines()[0])
            if expected_current is not None and current != expected_current:
                raise CommitFailedError(
                    f"concurrent commit: hint moved to v{current}, expected v{expected_current}"
                )
        tmp = f"{hint}.tmp.{uuid_mod.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(version) if metadata_dir is None
                    else f"{version}\n{metadata_dir}")
        os.replace(tmp, hint)

    def commit_table(self, ident, requirements, new_metadata):
        try:
            base, base_loc = self.load_metadata(ident)
            base_version = int(os.path.basename(base_loc).split(".")[0][1:])
        except NoSuchTableError:
            base, base_version = None, 0
        for r in requirements:
            r.check(base)
        version = base_version + 1
        meta_dir = os.path.join(new_metadata.location, "metadata")
        loc = os.path.join(meta_dir, f"v{version}.metadata.json")
        try:
            # the exclusive create IS the CAS — no exists() pre-check race
            write_table_metadata(new_metadata, loc, exclusive=True)
        except FileExistsError:
            raise CommitFailedError(f"metadata version exists (concurrent writer): v{version}")
        custom = os.path.normpath(new_metadata.location) != \
            os.path.normpath(self._table_dir(ident))
        self._write_hint(ident, version,
                         expected_current=base_version if base else None,
                         metadata_dir=meta_dir if custom else None)
        return loc

    def register_table(self, ident, metadata_location):
        if self.table_exists(ident):
            raise AlreadyExistsError(ident)
        import re as _re

        meta = read_table_metadata(metadata_location)
        base = os.path.basename(metadata_location)
        vm = _re.fullmatch(r"v(\d+)\.metadata\.json", base)
        if vm is not None:
            # point at the ORIGINAL metadata chain (2-line hint): later
            # commits write v(N+1) NEXT to vN — copying the json into
            # the warehouse dir while commits land at metadata.location
            # would fork the version sequence (r16 migrate fix).
            # EXACT-match only: 'v0.staged.metadata.json' (stage_create)
            # or other v-prefixed names are not chain members — they
            # take the copy path below (review r16)
            version = int(vm.group(1))
            self._write_hint(ident, version, expected_current=None,
                             metadata_dir=os.path.dirname(
                                 metadata_location))
            return
        version = 1
        loc = os.path.join(self._table_dir(ident), "metadata", f"v{version}.metadata.json")
        write_table_metadata(meta, loc)
        self._write_hint(ident, version, expected_current=None)

    def drop_table(self, ident, purge=False):
        if not self.table_exists(ident):
            return False
        import shutil

        d = self._table_dir(ident)
        if purge:
            shutil.rmtree(d, ignore_errors=True)
        else:
            shutil.rmtree(os.path.join(d, "metadata"), ignore_errors=True)
        return True

    def rename_table(self, src: str, dst: str) -> None:
        """Directory catalogs CANNOT rename: the identifier IS the
        path, and manifests/data files hold absolute paths under it, so
        a move breaks every pointer (the exact reason Iceberg's
        HadoopCatalog forbids rename). Loud error, not silent breakage;
        pointer-mapping catalogs (RestCatalog) support it."""
        raise NotImplementedError(
            "FileSystemCatalog cannot rename: the table directory is the "
            "identifier and metadata holds absolute paths under it — use "
            "a pointer-mapping catalog (e.g. RestCatalog), or "
            "register_table under the new name after relocating data")

    def rename_view(self, src: str, dst: str) -> None:
        """Views hold no data paths, only SQL — a directory move IS
        safe for them, except the view metadata 'location' field, which
        is rewritten to the new path in a fresh CAS'd version."""
        from iceberg_cpp_spark.views import IceView

        if not self.view_exists(src):
            raise NoSuchViewError(src)
        if self.table_exists(dst) or self.view_exists(dst):
            raise AlreadyExistsError(dst)
        dst_ns = ".".join(dst.split(".")[:-1])
        if dst_ns and not self.namespace_exists(dst_ns):
            raise NoSuchNamespaceError(dst_ns)
        os.rename(self._table_dir(src), self._table_dir(dst))
        v = IceView.load(self._table_dir(dst))
        v.metadata.location = self._table_dir(dst)
        base = int(os.path.basename(v.metadata_location).split(".")[0][1:])
        loc = IceView._metadata_path(self._table_dir(dst), base + 1)
        IceView._write(v.metadata, loc, exclusive=True)
        IceView._write_hint(self._table_dir(dst), base + 1, expected=base)

    # views (Iceberg View spec; the reference has no view surface) ---------
    def _view_hint(self, ident: str) -> str:
        from iceberg_cpp_spark.views import IceView

        return os.path.join(self._table_dir(ident), "metadata", IceView.HINT)

    def view_exists(self, ident: str) -> bool:
        return os.path.exists(self._view_hint(ident))

    def list_views(self, ns: str) -> list:
        d = self._ns_dir(ns)
        if not os.path.isdir(d):
            return []
        return [f"{ns}.{t}" for t in sorted(os.listdir(d))
                if self.view_exists(f"{ns}.{t}")]

    def create_view(self, ident: str, sql: str, schema, dialect="spark",
                    properties=None):
        from iceberg_cpp_spark.views import IceView

        if self.view_exists(ident) or self.table_exists(ident):
            raise AlreadyExistsError(ident)
        return IceView.create(self._table_dir(ident), sql, schema,
                              dialect=dialect, properties=properties,
                              default_namespace=ident.split(".")[:-1])

    def load_view(self, ident: str):
        from iceberg_cpp_spark.views import IceView

        if not self.view_exists(ident):
            raise NoSuchViewError(ident)
        return IceView.load(self._table_dir(ident))

    def drop_view(self, ident: str) -> bool:
        if not self.view_exists(ident):
            return False
        import shutil

        shutil.rmtree(self._table_dir(ident), ignore_errors=True)
        return True
