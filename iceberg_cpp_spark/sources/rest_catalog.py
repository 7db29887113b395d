"""REST catalog: client + in-process conformance server speaking the
public Apache Iceberg REST catalog protocol (the reference ships the
same pairing — `catalog/rest_catalog` client tested against a local
stub in `test/rest_catalog_test.cc`).

Client (`RestCatalog`): stdlib urllib, no extra deps. Commits follow
the REST model — the client does NOT ship whole metadata; it sends
``CommitTableRequest{requirements, updates}`` and the SERVER re-applies
the updates against its own current base (optimistic concurrency lives
server-side, HTTP 409 → CommitFailedError). Because the engine's
commit paths hand the catalog a full new ``TableMetadata``,
``synthesize_updates`` diffs base→new into the standard update actions
(add-snapshot, set-snapshot-ref, set-properties, ...) so every engine
commit maps onto the wire format.

Server (`serve_rest_catalog`): ThreadingHTTPServer over an in-memory
store; applies requirements then updates through TableMetadataBuilder —
the same code path a real deployment would run.

Endpoints: /v1/config, /v1/namespaces CRUD (+/properties),
/v1/namespaces/{ns}/tables CRUD, table commit (POST), /register.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
import uuid
from typing import Optional

from iceberg_cpp_spark.core import updates as up
from iceberg_cpp_spark.core.metadata import (
    PartitionSpec,
    SortOrder,
    TableMetadata,
)
from iceberg_cpp_spark.core.types import Schema
from iceberg_cpp_spark.sources.catalog import (
    AlreadyExistsError,
    Catalog,
    CommitFailedError,
    NoSuchNamespaceError,
    NoSuchTableError,
    Requirement,
)


# ---------------------------------------------------------------------------
# base → new metadata diff as standard REST update actions
# ---------------------------------------------------------------------------

def synthesize_updates(base: TableMetadata, new: TableMetadata) -> list[up.TableUpdate]:
    ups: list[up.TableUpdate] = []
    if new.table_uuid != base.table_uuid:
        ups.append(up.AssignUuid(new.table_uuid))
    if new.format_version != base.format_version:
        ups.append(up.UpgradeFormatVersion(new.format_version))
    base_schema_ids = {s.schema_id for s in base.schemas}
    for s in new.schemas:
        if s.schema_id not in base_schema_ids:
            ups.append(up.AddSchema(s))
    if new.current_schema_id != base.current_schema_id:
        ups.append(up.SetCurrentSchema(new.current_schema_id))
    base_spec_ids = {s.spec_id for s in base.partition_specs}
    for s in new.partition_specs:
        if s.spec_id not in base_spec_ids:
            ups.append(up.AddPartitionSpec(s))
    if new.default_spec_id != base.default_spec_id:
        ups.append(up.SetDefaultSpec(new.default_spec_id))
    base_so = {s.order_id for s in base.sort_orders}
    for s in new.sort_orders:
        if s.order_id not in base_so:
            ups.append(up.AddSortOrder(s))
    if new.default_sort_order_id != base.default_sort_order_id:
        ups.append(up.SetDefaultSortOrder(new.default_sort_order_id))
    base_snaps = {s.snapshot_id for s in base.snapshots}
    new_snaps = {s.snapshot_id for s in new.snapshots}
    for s in sorted((s for s in new.snapshots if s.snapshot_id not in base_snaps),
                    key=lambda s: s.sequence_number):
        ups.append(up.AddSnapshot(s))
    for name, ref in new.refs.items():
        old = base.refs.get(name)
        if old != ref:  # snapshot move, type change, OR retention edit
            ups.append(up.SetSnapshotRef(
                name, ref.snapshot_id, type=ref.type,
                min_snapshots_to_keep=ref.min_snapshots_to_keep,
                max_snapshot_age_ms=ref.max_snapshot_age_ms,
                max_ref_age_ms=ref.max_ref_age_ms))
    for name in base.refs:
        if name not in new.refs:
            ups.append(up.RemoveSnapshotRef(name))
    removed = sorted(base_snaps - new_snaps)
    if removed:
        ups.append(up.RemoveSnapshots(removed))
    set_props = {k: v for k, v in new.properties.items()
                 if base.properties.get(k) != v}
    if set_props:
        ups.append(up.SetProperties(set_props))
    dropped = [k for k in base.properties if k not in new.properties]
    if dropped:
        ups.append(up.RemoveProperties(dropped))
    if new.location != base.location:
        ups.append(up.SetLocation(new.location))
    base_stats = {s.get("snapshot-id"): s for s in base.statistics}
    for s in new.statistics:
        if base_stats.get(s.get("snapshot-id")) != s:
            ups.append(up.SetStatistics(s))
    new_stat_ids = {s.get("snapshot-id") for s in new.statistics}
    for sid in base_stats:
        if sid not in new_stat_ids:
            ups.append(up.RemoveStatistics(sid))
    base_pstats = {s.get("snapshot-id"): s for s in base.partition_statistics}
    for s in new.partition_statistics:
        if base_pstats.get(s.get("snapshot-id")) != s:
            ups.append(up.SetPartitionStatistics(s))
    new_pstat_ids = {s.get("snapshot-id") for s in new.partition_statistics}
    for sid in base_pstats:
        if sid not in new_pstat_ids:
            ups.append(up.RemovePartitionStatistics(sid))
    return ups


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------

class RestCatalog(Catalog):
    def __init__(self, uri: str, name: str = "rest"):
        self.name = name
        self.uri = uri.rstrip("/")
        self._config = self._request("GET", "/v1/config")

    # -- plumbing --------------------------------------------------------
    def _request(self, method: str, path: str, body: Optional[dict] = None) -> dict:
        req = urllib.request.Request(
            self.uri + path, method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as resp:
                data = resp.read()
                return json.loads(data) if data else {}
        except urllib.error.HTTPError as e:
            msg = e.read().decode(errors="replace")[:300]
            if e.code == 404:
                raise (NoSuchNamespaceError(msg) if "amespace" in msg
                       else NoSuchTableError(msg))
            if e.code == 409:
                if "exists" in msg and "version" not in msg:
                    raise AlreadyExistsError(msg)
                raise CommitFailedError(msg)
            raise

    # -- namespaces ------------------------------------------------------
    def create_namespace(self, ns, properties=None):
        self._request("POST", "/v1/namespaces",
                      {"namespace": ns.split("."), "properties": properties or {}})

    PAGE_SIZE = 1000  # client-side paging bound for list endpoints

    def _paged(self, path: str, key: str) -> list:
        """Drain a paginated list endpoint (REST spec pageToken /
        next-page-token) — a 10^5-table namespace never arrives as one
        response body."""
        out, token = [], None
        while True:
            q = f"?pageSize={self.PAGE_SIZE}"
            if token:
                q += f"&pageToken={token}"
            j = self._request("GET", path + q)
            out.extend(j.get(key, []))
            token = j.get("next-page-token")
            if not token:
                return out

    def list_namespaces(self, parent=""):
        names = [".".join(n)
                 for n in self._paged("/v1/namespaces", "namespaces")]
        if parent:
            names = [n for n in names if n.startswith(parent + ".")]
        return sorted(names)

    def namespace_exists(self, ns):
        try:
            self._request("GET", f"/v1/namespaces/{ns}")
            return True
        except NoSuchNamespaceError:
            return False

    def drop_namespace(self, ns):
        self._request("DELETE", f"/v1/namespaces/{ns}")

    def get_namespace_properties(self, ns):
        return self._request("GET", f"/v1/namespaces/{ns}").get("properties", {})

    def update_namespace_properties(self, ns, updates, removals=None):
        self._request("POST", f"/v1/namespaces/{ns}/properties",
                      {"updates": updates, "removals": removals or []})

    # -- tables ----------------------------------------------------------
    def _split(self, ident: str) -> tuple[str, str]:
        ns, _, name = ident.rpartition(".")
        return ns or "default", name

    def list_tables(self, ns):
        j = {"identifiers": self._paged(
            f"/v1/namespaces/{ns}/tables", "identifiers")}
        return sorted(f"{'.'.join(i['namespace'])}.{i['name']}"
                      for i in j.get("identifiers", []))

    def load_metadata(self, ident):
        ns, name = self._split(ident)
        j = self._request("GET", f"/v1/namespaces/{ns}/tables/{name}")
        return (TableMetadata.from_json(j["metadata"]), j["metadata-location"])

    def create_table(self, ident, schema, spec=None, sort_order=None,
                     properties=None, location=None):
        ns, name = self._split(ident)
        body = {"name": name, "schema": schema.to_json(),
                "properties": properties or {}}
        if spec is not None:
            body["partition-spec"] = spec.to_json()
        if sort_order is not None:
            body["write-order"] = sort_order.to_json()
        if location:
            body["location"] = location
        j = self._request("POST", f"/v1/namespaces/{ns}/tables", body)
        return TableMetadata.from_json(j["metadata"])

    def drop_table(self, ident, purge: bool = False):
        # purgeRequested is the spec's query flag; servers that ignore
        # it still drop the pointer (REST owns file cleanup policy)
        ns, name = self._split(ident)
        suffix = "?purgeRequested=true" if purge else ""
        self._request("DELETE",
                      f"/v1/namespaces/{ns}/tables/{name}{suffix}")

    def register_table(self, ident, metadata_location):
        ns, name = self._split(ident)
        self._request("POST", f"/v1/namespaces/{ns}/register",
                      {"name": name, "metadata-location": metadata_location})

    def commit_table(self, ident, requirements: list[Requirement],
                     new_metadata: TableMetadata) -> str:
        ns, name = self._split(ident)
        base, _loc = self.load_metadata(ident)
        body = {
            "requirements": [up.requirement_to_json(r) for r in requirements],
            "updates": [up.update_to_json(u)
                        for u in synthesize_updates(base, new_metadata)],
        }
        j = self._request("POST", f"/v1/namespaces/{ns}/tables/{name}", body)
        return j["metadata-location"]

    def commit_transaction(self, changes: list) -> None:
        """Atomic MULTI-TABLE commit (the REST CommitTransaction
        route): ``changes`` is a list of (ident, requirements,
        new_metadata); the server validates every table's requirements
        and applies all updates under one lock — all tables move or
        none do. 409 surfaces as CommitFailedError (retry/rebase is
        the caller's job, same as commit_table)."""
        table_changes = []
        for ident, requirements, new_metadata in changes:
            ns, name = self._split(ident)
            base, _loc = self.load_metadata(ident)
            table_changes.append({
                "identifier": {"namespace": ns.split("."),
                               "name": name},
                "requirements": [up.requirement_to_json(r)
                                 for r in requirements],
                "updates": [up.update_to_json(u)
                            for u in synthesize_updates(base,
                                                        new_metadata)],
            })
        self._request("POST", "/v1/transactions/commit",
                      {"table-changes": table_changes})

    def rename_table(self, src: str, dst: str) -> None:
        sns, sname = self._split(src)
        dns, dname = self._split(dst)
        self._request("POST", "/v1/tables/rename", {
            "source": {"namespace": sns.split("."), "name": sname},
            "destination": {"namespace": dns.split("."), "name": dname}})

    def rename_view(self, src: str, dst: str) -> None:
        sns, sname = self._split(src)
        dns, dname = self._split(dst)
        self._request("POST", "/v1/views/rename", {
            "source": {"namespace": sns.split("."), "name": sname},
            "destination": {"namespace": dns.split("."), "name": dname}})

    # -- views (Iceberg View spec + REST catalog view routes; the
    # reference's REST stub has neither) ---------------------------------
    def list_views(self, ns):
        j = {"identifiers": self._paged(
            f"/v1/namespaces/{ns}/views", "identifiers")}
        return [f"{'.'.join(i['namespace'])}.{i['name']}"
                for i in j.get("identifiers", [])]

    def create_view(self, ident, sql, schema, dialect="spark",
                    properties=None, location=None):
        from iceberg_cpp_spark.views import SQLRepresentation, ViewVersion

        ns, name = self._split(ident)
        version = ViewVersion(
            version_id=1, schema_id=schema.schema_id or 0,
            timestamp_ms=int(__import__("time").time() * 1000),
            summary={"operation": "create"},
            representations=[SQLRepresentation(sql, dialect)],
            default_namespace=ns.split("."))
        body = {
            "name": name,
            "location": location,
            "schema": dict(schema.to_json(),
                           **{"schema-id": schema.schema_id or 0}),
            "view-version": version.to_json(),
            "properties": properties or {},
        }
        j = self._request("POST", f"/v1/namespaces/{ns}/views", body)
        return self._view_from(j)

    def load_view(self, ident):
        ns, name = self._split(ident)
        return self._view_from(
            self._request("GET", f"/v1/namespaces/{ns}/views/{name}"))

    def replace_view(self, ident, sql, schema=None, dialect="spark"):
        """CREATE OR REPLACE through the REST commit route: assert the
        view uuid, add a version, swap current — the spec's view update
        actions."""
        from iceberg_cpp_spark.views import SQLRepresentation, ViewVersion

        ns, name = self._split(ident)
        cur = self.load_view(ident)
        meta = cur.metadata
        new_vid = max(v.version_id for v in meta.versions) + 1
        updates = []
        if schema is not None:
            schema_id = max((s.schema_id for s in meta.schemas),
                            default=-1) + 1
            schema.schema_id = schema_id
            updates.append({"action": "add-schema",
                            "schema": dict(schema.to_json(),
                                           **{"schema-id": schema_id})})
        else:
            schema_id = meta.current_version().schema_id
        version = ViewVersion(
            version_id=new_vid, schema_id=schema_id,
            timestamp_ms=int(__import__("time").time() * 1000),
            summary={"operation": "replace"},
            representations=[SQLRepresentation(sql, dialect)],
            default_namespace=meta.current_version().default_namespace)
        updates.append({"action": "add-view-version",
                        "view-version": version.to_json()})
        updates.append({"action": "set-current-view-version",
                        "view-version-id": new_vid})
        body = {
            "requirements": [{"type": "assert-view-uuid",
                              "uuid": meta.view_uuid}],
            "updates": updates,
        }
        j = self._request("POST", f"/v1/namespaces/{ns}/views/{name}", body)
        return self._view_from(j)

    def drop_view(self, ident):
        ns, name = self._split(ident)
        self._request("DELETE", f"/v1/namespaces/{ns}/views/{name}")

    @staticmethod
    def _view_from(j):
        from iceberg_cpp_spark.views import IceView, ViewMetadata

        return IceView(ViewMetadata.from_json(j["metadata"]),
                       j.get("metadata-location") or "")


# ---------------------------------------------------------------------------
# Conformance server (in-memory; for tests and local development)
# ---------------------------------------------------------------------------

def serve_rest_catalog(port: int = 0):
    """Start the stub server on ``port`` (0 = ephemeral). Returns
    (http.server instance, base_uri); call ``server.shutdown()`` when
    done. State is in-memory and thread-safe."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    lock = threading.Lock()
    namespaces: dict[str, dict] = {}
    tables: dict[tuple[str, str], dict] = {}  # -> {"metadata", "version"}
    views: dict[tuple[str, str], dict] = {}   # -> {"metadata", "version"}

    def _vloc(meta, version: int) -> str:
        return f"{meta.location}/metadata/v{version}.metadata.json"

    def _loc(meta: TableMetadata, version: int) -> str:
        return f"{meta.location}/metadata/v{version}.metadata.json"

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def _send(self, code: int, payload: Optional[dict] = None):
            body = json.dumps(payload or {}).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, code: int, msg: str):
            self._send(code, {"error": {"message": msg, "code": code}})

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n)) if n else {}

        def _route(self):
            return [p for p in self.path.split("?")[0].split("/") if p]

        def _page(self, items: list) -> dict:
            """REST spec pagination: pageToken is the offset into the
            sorted listing, pageSize bounds the page; next-page-token
            appears only when more remain."""
            from urllib.parse import parse_qs, urlsplit

            q = parse_qs(urlsplit(self.path).query)
            start = int(q.get("pageToken", ["0"])[0] or 0)
            size = int(q.get("pageSize", ["0"])[0] or 0)
            if size <= 0:
                return {"items": items, "next": None}
            page = items[start:start + size]
            nxt = (str(start + size)
                   if start + size < len(items) else None)
            return {"items": page, "next": nxt}

        def do_GET(self):
            parts = self._route()
            with lock:
                if parts == ["v1", "config"]:
                    return self._send(200, {"defaults": {}, "overrides": {}})
                if parts == ["v1", "namespaces"]:
                    pg = self._page([ns.split(".")
                                     for ns in sorted(namespaces)])
                    body = {"namespaces": pg["items"]}
                    if pg["next"]:
                        body["next-page-token"] = pg["next"]
                    return self._send(200, body)
                if len(parts) == 3 and parts[:2] == ["v1", "namespaces"]:
                    ns = parts[2]
                    if ns not in namespaces:
                        return self._error(404, f"namespace not found: {ns}")
                    return self._send(200, {"namespace": ns.split("."),
                                            "properties": namespaces[ns]})
                if len(parts) == 4 and parts[3] == "tables":
                    ns = parts[2]
                    idents = [{"namespace": k[0].split("."), "name": k[1]}
                              for k in sorted(tables) if k[0] == ns]
                    pg = self._page(idents)
                    body = {"identifiers": pg["items"]}
                    if pg["next"]:
                        body["next-page-token"] = pg["next"]
                    return self._send(200, body)
                if len(parts) == 5 and parts[3] == "tables":
                    t = tables.get((parts[2], parts[4]))
                    if t is None:
                        return self._error(404, f"table not found: {parts[4]}")
                    return self._send(200, {
                        "metadata-location": _loc(t["metadata"], t["version"]),
                        "metadata": t["metadata"].to_json()})
                if len(parts) == 4 and parts[3] == "views":
                    ns = parts[2]
                    idents = [{"namespace": k[0].split("."), "name": k[1]}
                              for k in sorted(views) if k[0] == ns]
                    pg = self._page(idents)
                    body = {"identifiers": pg["items"]}
                    if pg["next"]:
                        body["next-page-token"] = pg["next"]
                    return self._send(200, body)
                if len(parts) == 5 and parts[3] == "views":
                    v = views.get((parts[2], parts[4]))
                    if v is None:
                        return self._error(404, f"view not found: {parts[4]}")
                    return self._send(200, {
                        "metadata-location": _vloc(v["metadata"], v["version"]),
                        "metadata": v["metadata"].to_json()})
            self._error(404, "no route")

        def do_DELETE(self):
            parts = self._route()
            with lock:
                if len(parts) == 3 and parts[:2] == ["v1", "namespaces"]:
                    ns = parts[2]
                    if ns not in namespaces:
                        return self._error(404, f"namespace not found: {ns}")
                    if any(k[0] == ns for k in tables) or any(
                            k[0] == ns for k in views):
                        return self._error(409, f"namespace not empty: {ns}")
                    del namespaces[ns]
                    return self._send(204)
                if len(parts) == 5 and parts[3] == "tables":
                    if tables.pop((parts[2], parts[4]), None) is None:
                        return self._error(404, f"table not found: {parts[4]}")
                    return self._send(204)
                if len(parts) == 5 and parts[3] == "views":
                    if views.pop((parts[2], parts[4]), None) is None:
                        return self._error(404, f"view not found: {parts[4]}")
                    return self._send(204)
            self._error(404, "no route")

        def do_POST(self):
            parts = self._route()
            body = self._body()
            with lock:
                if parts == ["v1", "transactions", "commit"]:
                    # CommitTransactionRequest: N tables move atomically
                    # or none do — validate EVERY change first (no
                    # mutation on any failure), then swap all under the
                    # one store lock
                    staged = []
                    seen = set()
                    for ch in body.get("table-changes", []):
                        ident = ch.get("identifier") or {}
                        key = (".".join(ident.get("namespace", [])),
                               ident.get("name"))
                        if key in seen:
                            return self._error(
                                400, f"duplicate table in transaction: "
                                     f"{key[1]}")
                        seen.add(key)
                        t = tables.get(key)
                        if t is None:
                            return self._error(
                                404, f"table not found: {key[1]}")
                        base = t["metadata"]
                        try:
                            for rj in ch.get("requirements", []):
                                up.requirement_from_json(rj).check(base)
                            b = up.TableMetadataBuilder.build_from(base)
                            for uj in ch.get("updates", []):
                                up.update_from_json(uj).apply_to(b)
                            new_meta, _u, _r = b.build()
                        except CommitFailedError as e:
                            return self._error(409, str(e))
                        except (ValueError, KeyError) as e:
                            return self._error(400, str(e))
                        staged.append((t, new_meta))
                    for t, new_meta in staged:
                        t["metadata"] = new_meta
                        t["version"] += 1
                    return self._send(204)
                if parts in (["v1", "tables", "rename"],
                             ["v1", "views", "rename"]):
                    store = tables if parts[1] == "tables" else views
                    sk = (".".join(body["source"]["namespace"]),
                          body["source"]["name"])
                    dk = (".".join(body["destination"]["namespace"]),
                          body["destination"]["name"])
                    if sk not in store:
                        return self._error(
                            404, f"{parts[1][:-1]} not found: {sk[1]}")
                    if dk in tables or dk in views:
                        return self._error(409, f"exists: {dk[1]}")
                    if dk[0] not in namespaces:
                        return self._error(
                            404, f"namespace not found: {dk[0]}")
                    store[dk] = store.pop(sk)
                    return self._send(204)
                if parts == ["v1", "namespaces"]:
                    ns = ".".join(body["namespace"])
                    if ns in namespaces:
                        return self._error(409, f"namespace exists: {ns}")
                    namespaces[ns] = body.get("properties") or {}
                    return self._send(200, {"namespace": body["namespace"],
                                            "properties": namespaces[ns]})
                if len(parts) == 4 and parts[3] == "properties":
                    ns = parts[2]
                    if ns not in namespaces:
                        return self._error(404, f"namespace not found: {ns}")
                    for k in body.get("removals") or []:
                        namespaces[ns].pop(k, None)
                    namespaces[ns].update(body.get("updates") or {})
                    return self._send(200, {"updated": sorted(body.get("updates") or {}),
                                            "removed": body.get("removals") or []})
                if len(parts) == 4 and parts[3] == "register":
                    from iceberg_cpp_spark.core.metadata import read_table_metadata

                    key = (parts[2], body["name"])
                    if key in tables:
                        return self._error(409, f"table exists: {body['name']}")
                    meta = read_table_metadata(body["metadata-location"])
                    tables[key] = {"metadata": meta, "version": 1}
                    return self._send(200, {
                        "metadata-location": body["metadata-location"],
                        "metadata": meta.to_json()})
                if len(parts) == 4 and parts[3] == "tables":
                    ns = parts[2]
                    if ns not in namespaces:
                        return self._error(404, f"namespace not found: {ns}")
                    key = (ns, body["name"])
                    if key in tables:
                        return self._error(409, f"table exists: {body['name']}")
                    helper = Catalog()
                    meta = helper._new_metadata(
                        Schema.from_json(body["schema"]),
                        PartitionSpec.from_json(body["partition-spec"])
                        if body.get("partition-spec") else None,
                        SortOrder.from_json(body["write-order"])
                        if body.get("write-order") else None,
                        body.get("properties") or {},
                        body.get("location") or f"/tmp/rest-wh/{ns}/{body['name']}")
                    tables[key] = {"metadata": meta, "version": 1}
                    return self._send(200, {
                        "metadata-location": _loc(meta, 1),
                        "metadata": meta.to_json()})
                if len(parts) == 4 and parts[3] == "views":
                    from iceberg_cpp_spark.views import (ViewMetadata,
                                                         ViewVersion)

                    ns = parts[2]
                    if ns not in namespaces:
                        return self._error(404, f"namespace not found: {ns}")
                    key = (ns, body["name"])
                    if key in views or key in tables:
                        return self._error(409, f"view exists: {body['name']}")
                    version = ViewVersion.from_json(body["view-version"])
                    sch = Schema.from_json(body["schema"])
                    meta = ViewMetadata(
                        view_uuid=str(uuid.uuid4()),
                        location=(body.get("location")
                                  or f"/tmp/rest-wh/{ns}/{body['name']}"),
                        schemas=[sch], current_version_id=version.version_id,
                        versions=[version],
                        version_log=[{"timestamp-ms": version.timestamp_ms,
                                      "version-id": version.version_id}],
                        properties=body.get("properties") or {})
                    views[key] = {"metadata": meta, "version": 1}
                    return self._send(200, {
                        "metadata-location": _vloc(meta, 1),
                        "metadata": meta.to_json()})
                if len(parts) == 5 and parts[3] == "views":
                    from iceberg_cpp_spark.views import (ViewMetadata,
                                                         ViewVersion,
                                                         _trim_history)

                    key = (parts[2], parts[4])
                    v = views.get(key)
                    if v is None:
                        return self._error(404, f"view not found: {parts[4]}")
                    meta = v["metadata"]
                    for rj in body.get("requirements", []):
                        if (rj.get("type") == "assert-view-uuid"
                                and rj.get("uuid") != meta.view_uuid):
                            return self._error(
                                409, f"view uuid changed: {meta.view_uuid}")
                    new = ViewMetadata.from_json(meta.to_json())
                    try:
                        for uj in body.get("updates", []):
                            act = uj.get("action")
                            if act == "add-schema":
                                new.schemas.append(
                                    Schema.from_json(uj["schema"]))
                            elif act == "add-view-version":
                                vv = ViewVersion.from_json(uj["view-version"])
                                new.versions.append(vv)
                                new.version_log.append(
                                    {"timestamp-ms": vv.timestamp_ms,
                                     "version-id": vv.version_id})
                            elif act == "set-current-view-version":
                                new.current_version_id = uj["view-version-id"]
                            elif act == "set-properties":
                                new.properties.update(uj.get("updates") or {})
                            else:
                                return self._error(
                                    400, f"unknown view update: {act}")
                        new.current_version()  # validates the swap target
                    except (ValueError, KeyError) as e:
                        return self._error(400, str(e))
                    _trim_history(new)
                    v["metadata"] = new
                    v["version"] += 1
                    return self._send(200, {
                        "metadata-location": _vloc(new, v["version"]),
                        "metadata": new.to_json()})
                if len(parts) == 5 and parts[3] == "tables":
                    key = (parts[2], parts[4])
                    t = tables.get(key)
                    if t is None:
                        return self._error(404, f"table not found: {parts[4]}")
                    base = t["metadata"]
                    try:
                        for rj in body.get("requirements", []):
                            up.requirement_from_json(rj).check(base)
                        b = up.TableMetadataBuilder.build_from(base)
                        for uj in body.get("updates", []):
                            up.update_from_json(uj).apply_to(b)
                        new_meta, _u, _r = b.build()
                    except CommitFailedError as e:
                        return self._error(409, str(e))
                    except (ValueError, KeyError) as e:
                        return self._error(400, str(e))
                    t["metadata"] = new_meta
                    t["version"] += 1
                    return self._send(200, {
                        "metadata-location": _loc(new_meta, t["version"]),
                        "metadata": new_meta.to_json()})
            self._error(404, "no route")

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"
