"""Pure-Python Avro object-container-file reader/writer + Iceberg
manifest adapters.

Interop parity with the reference's Avro subsystem (avro_reader.cc,
avro_data_util.cc, avro_schema_util.cc, manifest_adapter.cc): this
module reads REAL Iceberg manifest / manifest-list files written by
other engines (the reference's test fixtures ``snap-*.avro`` /
``*-m0.avro`` decode with it) and can write spec-compliant Avro
manifests. No external Avro library is used — the container format
(magic ``Obj\\x01``, metadata map, deflate blocks, sync markers) and
the binary encoding (zigzag varints, little-endian floats,
length-prefixed bytes) are implemented here directly from the Avro
1.12 specification.

Field mapping is by Iceberg ``field-id`` (carried as the ``field-id``
attribute on every Avro record field, per the Iceberg spec Appendix A),
NOT by name — v1 manifests name a column ``added_data_files_count``
where v2 says ``added_files_count``; the id (504) is stable.

Scale note: a single manifest is bounded (~8 MiB target, reference
table_properties.h:97). Decoding one file driver-side is metadata-scale
work; for external tables with thousands of manifests the decode is
shipped to executors (see ``table.py`` distributed planning), which
this module supports by operating on bytes, not paths.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from decimal import Decimal
from typing import Any, Iterable, Iterator, Optional
from uuid import UUID

MAGIC = b"Obj\x01"

# Iceberg spec: manifest_file field ids (manifest_list.h:76-201)
_MF_IDS = {
    500: "manifest_path",
    501: "manifest_length",
    502: "partition_spec_id",
    517: "content",
    515: "sequence_number",
    516: "min_sequence_number",
    503: "added_snapshot_id",
    504: "added_files_count",
    505: "existing_files_count",
    506: "deleted_files_count",
    512: "added_rows_count",
    513: "existing_rows_count",
    514: "deleted_rows_count",
    507: "partitions",
}
# field_summary ids
_FS_IDS = {509: "contains_null", 518: "contains_nan",
           510: "lower_bound", 511: "upper_bound"}
# manifest_entry ids (manifest_entry.h:276-313)
_ME_IDS = {0: "status", 1: "snapshot_id", 3: "sequence_number",
           4: "file_sequence_number", 2: "data_file"}
# data_file (r2) ids (manifest_entry.h:61-270)
_DF_IDS = {
    134: "content",
    100: "file_path",
    101: "file_format",
    102: "partition",
    103: "record_count",
    104: "file_size_in_bytes",
    108: "column_sizes",
    109: "value_counts",
    110: "null_value_counts",
    137: "nan_value_counts",
    125: "lower_bounds",
    128: "upper_bounds",
    132: "split_offsets",
    135: "equality_ids",
    140: "sort_order_id",
    142: "first_row_id",
    143: "referenced_data_file",
    144: "content_offset",
    145: "content_size_in_bytes",
}


# ---------------------------------------------------------------------------
# Binary decoder
# ---------------------------------------------------------------------------

class Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.buf[self.pos:self.pos + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return out

    def read_long(self) -> int:
        buf, pos = self.buf, self.pos
        n = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            n |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        self.pos = pos
        return (n >> 1) ^ -(n & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _decode_datum(schema: Any, r: Reader) -> Any:
    """Decode one datum per the writer schema (Avro spec §binary encoding).
    Logical types are resolved to the same representations
    ``literals.from_bytes`` uses: date/timestamp as raw ints, decimal as
    Decimal, uuid as UUID."""
    if isinstance(schema, list):  # union
        return _decode_datum(schema[r.read_long()], r)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) != b"\x00"
        if t in ("int", "long"):
            return r.read_long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read_bytes()
        if t == "string":
            return r.read_bytes().decode("utf-8")
        raise ValueError(f"unknown avro primitive {t!r}")
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode_datum(f["type"], r) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "array":
        out = []
        while True:
            count = r.read_long()
            if count == 0:
                break
            if count < 0:
                r.read_long()  # block byte size, unused
                count = -count
            items = schema["items"]
            for _ in range(count):
                out.append(_decode_datum(items, r))
        if schema.get("logicalType") == "map":
            return {d["key"]: d["value"] for d in out}
        return out
    if t == "map":
        out = {}
        while True:
            count = r.read_long()
            if count == 0:
                break
            if count < 0:
                r.read_long()
                count = -count
            values = schema["values"]
            for _ in range(count):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode_datum(values, r)
        return out
    if t == "fixed":
        raw = r.read(schema["size"])
        lt = schema.get("logicalType")
        if lt == "decimal":
            return Decimal(int.from_bytes(raw, "big", signed=True)).scaleb(
                -schema.get("scale", 0))
        if lt == "uuid" or schema.get("name") == "uuid":
            return UUID(bytes=raw)
        return raw
    if t == "bytes":
        raw = r.read_bytes()
        if schema.get("logicalType") == "decimal":
            return Decimal(int.from_bytes(raw, "big", signed=True)).scaleb(
                -schema.get("scale", 0))
        return raw
    if t in ("int", "long", "string", "float", "double", "boolean", "null"):
        return _decode_datum(t, r)
    raise ValueError(f"unknown avro type {t!r}")


# ---------------------------------------------------------------------------
# Container file read
# ---------------------------------------------------------------------------

class AvroFile:
    """A decoded Avro object container file: header metadata (raw bytes
    per key), the parsed writer schema, and the record list."""

    def __init__(self, metadata: dict[str, bytes], schema: Any,
                 records: list[Any]):
        self.metadata = metadata
        self.schema = schema
        self.records = records


def is_avro(path_or_bytes) -> bool:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return bytes(path_or_bytes[:4]) == MAGIC
    try:
        with open(path_or_bytes, "rb") as f:
            return f.read(4) == MAGIC
    except OSError:
        return False


def read_avro(path_or_bytes) -> AvroFile:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    r = Reader(data)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:
            r.read_long()
            count = -count
        for _ in range(count):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    records: list[Any] = []
    while not r.at_end():
        n = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        br = Reader(block)
        for _ in range(n):
            records.append(_decode_datum(schema, br))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return AvroFile(meta, schema, records)


# ---------------------------------------------------------------------------
# Binary encoder + container file write
# ---------------------------------------------------------------------------

class Writer:
    __slots__ = ("out",)

    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes) -> None:
        self.out.write(b)

    def write_long(self, v: int) -> None:
        n = (v << 1) ^ (v >> 63)  # zigzag (arithmetic shift handles v<0)
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                self.out.write(bytes([b | 0x80]))
            else:
                self.out.write(bytes([b]))
                break

    def write_bytes(self, b: bytes) -> None:
        self.write_long(len(b))
        self.out.write(b)

    def getvalue(self) -> bytes:
        return self.out.getvalue()


def _encode_datum(schema: Any, v: Any, w: Writer) -> None:
    if isinstance(schema, list):  # union: pick first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, v):
                w.write_long(i)
                _encode_datum(branch, v, w)
                return
        raise ValueError(f"value {v!r} matches no union branch {schema!r}")
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            w.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            w.write_long(int(v))
        elif t == "float":
            w.write(struct.pack("<f", float(v)))
        elif t == "double":
            w.write(struct.pack("<d", float(v)))
        elif t == "bytes":
            w.write_bytes(bytes(v))
        elif t == "string":
            w.write_bytes(str(v).encode("utf-8"))
        else:
            raise ValueError(f"unknown avro primitive {t!r}")
        return
    t = schema["type"]
    lt = schema.get("logicalType")
    if lt == "decimal" and isinstance(v, Decimal):
        unscaled = int(v.scaleb(schema.get("scale", 0)).to_integral_value())
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        if t == "fixed":
            nbytes = schema["size"]
        v = unscaled.to_bytes(nbytes, "big", signed=True)
    elif lt == "uuid" and isinstance(v, UUID):
        v = v.bytes
    if t == "record":
        for f in schema["fields"]:
            _encode_datum(f["type"], v.get(f["name"]) if isinstance(v, dict)
                          else getattr(v, f["name"]), w)
    elif t == "array":
        items = list(v or [])
        if schema.get("logicalType") == "map" and isinstance(v, dict):
            items = [{"key": k, "value": val} for k, val in v.items()]
        if items:
            w.write_long(len(items))
            for item in items:
                _encode_datum(schema["items"], item, w)
        w.write_long(0)
    elif t == "map":
        entries = dict(v or {})
        if entries:
            w.write_long(len(entries))
            for k, val in entries.items():
                w.write_bytes(str(k).encode("utf-8"))
                _encode_datum(schema["values"], val, w)
        w.write_long(0)
    elif t == "fixed":
        raw = bytes(v)
        if len(raw) != schema["size"]:
            raise ValueError("fixed size mismatch")
        w.write(raw)
    elif t == "enum":
        w.write_long(schema["symbols"].index(v))
    else:
        _encode_datum(t, v, w)


def _matches(branch: Any, v: Any) -> bool:
    name = branch if isinstance(branch, str) else branch.get("type")
    if v is None:
        return name == "null"
    return name != "null"


def write_avro(path: str, schema: Any, records: Iterable[Any],
               metadata: Optional[dict[str, bytes]] = None,
               codec: str = "deflate",
               sync: bytes = b"\x00" * 16) -> None:
    """Write an Avro object container file (one block; manifests are
    metadata-scale). ``sync`` is deterministic by default so identical
    commits produce identical bytes."""
    meta = dict(metadata or {})
    meta["avro.schema"] = json.dumps(schema, separators=(",", ":")).encode()
    meta["avro.codec"] = codec.encode()
    w = Writer()
    w.write(MAGIC)
    w.write_long(len(meta))
    for k, v in meta.items():
        w.write_bytes(k.encode("utf-8"))
        w.write_bytes(v if isinstance(v, (bytes, bytearray)) else str(v).encode())
    w.write_long(0)
    w.write(sync)
    body = Writer()
    n = 0
    for rec in records:
        _encode_datum(schema, rec, body)
        n += 1
    block = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = co.compress(block) + co.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec {codec!r}")
    w.write_long(n)
    w.write_long(len(block))
    w.write(block)
    w.write(sync)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(w.getvalue())


# ---------------------------------------------------------------------------
# Iceberg adapters: avro records -> manifest dataclasses (by field-id)
# ---------------------------------------------------------------------------

def _id_to_name(record_schema: dict) -> dict[int, str]:
    return {f.get("field-id"): f["name"] for f in record_schema["fields"]
            if f.get("field-id") is not None}


def _field_schema(record_schema: dict, name: str) -> Any:
    for f in record_schema["fields"]:
        if f["name"] == name:
            return f["type"]
    return None


def _nonnull(schema: Any) -> Any:
    if isinstance(schema, list):
        for b in schema:
            if b != "null":
                return b
    return schema


def manifest_list_from_avro(path_or_bytes) -> list:
    """Decode a spec Avro manifest-list into ManifestFile rows.
    Reference parity: manifest_adapter.cc FromManifestList."""
    from iceberg_cpp_spark.core import manifests as mf

    f = read_avro(path_or_bytes)
    names = _id_to_name(f.schema)
    out = []
    for rec in f.records:
        def g(fid: int, default=None):
            name = names.get(fid)
            v = rec.get(name) if name else None
            return default if v is None else v

        summaries = []
        psch = names.get(507) and _field_schema(f.schema, names[507])
        if psch is not None:
            item_schema = _nonnull(_nonnull(psch).get("items", {})) if isinstance(_nonnull(psch), dict) else None
            snames = _id_to_name(item_schema) if item_schema else {}
            for s in (rec.get(names[507]) or []):
                summaries.append(mf.PartitionFieldSummary(
                    contains_null=bool(s.get(snames.get(509, "contains_null"), False)),
                    contains_nan=s.get(snames.get(518, "contains_nan")),
                    lower_bound=s.get(snames.get(510, "lower_bound")),
                    upper_bound=s.get(snames.get(511, "upper_bound")),
                ))
        out.append(mf.ManifestFile(
            manifest_path=g(500),
            manifest_length=g(501, 0),
            partition_spec_id=g(502, 0),
            content=g(517, mf.MANIFEST_CONTENT_DATA),
            sequence_number=g(515, 0),
            min_sequence_number=g(516, 0),
            added_snapshot_id=g(503, 0),
            added_files_count=g(504, 0),
            existing_files_count=g(505, 0),
            deleted_files_count=g(506, 0),
            # row counts are OPTIONAL in the v1 spec: absence must stay
            # visible (None) — a silent 0 would make metadata-only
            # COUNT(*) undercount foreign tables
            added_rows_count=g(512, None),
            existing_rows_count=g(513, None),
            deleted_rows_count=g(514, None),
            partitions=summaries,
            first_row_id=g(520),
            key_metadata=g(519),
        ))
    return out


def manifest_entries_from_avro(path_or_bytes, manifest=None) -> list:
    """Decode a spec Avro manifest into ManifestEntry rows, applying
    InheritableMetadata from ``manifest`` (inheritable_metadata.cc:
    null snapshot/sequence numbers inherit; EXISTING entries keep
    explicit sequence numbers)."""
    from iceberg_cpp_spark.core import manifests as mf

    f = read_avro(path_or_bytes)
    enames = _id_to_name(f.schema)
    df_schema = _nonnull(_field_schema(f.schema, enames[2]))
    dnames = _id_to_name(df_schema)

    fmt_map = {"PARQUET": "parquet", "AVRO": "avro", "ORC": "orc"}
    out = []
    for rec in f.records:
        d = rec[enames[2]]

        def gd(fid: int, default=None):
            name = dnames.get(fid)
            v = d.get(name) if name else None
            return default if v is None else v

        fmt = str(gd(101, "parquet"))
        data_file = mf.DataFile(
            content=gd(134, mf.CONTENT_DATA),
            file_path=gd(100),
            file_format=fmt_map.get(fmt, fmt.lower()),
            partition=dict(gd(102, {}) or {}),
            record_count=gd(103, 0),
            file_size_in_bytes=gd(104, 0),
            column_sizes=dict(gd(108, {}) or {}),
            value_counts=dict(gd(109, {}) or {}),
            null_value_counts=dict(gd(110, {}) or {}),
            nan_value_counts=dict(gd(137, {}) or {}),
            lower_bounds={k: bytes(v) for k, v in (gd(125, {}) or {}).items()},
            upper_bounds={k: bytes(v) for k, v in (gd(128, {}) or {}).items()},
            split_offsets=list(gd(132, []) or []),
            equality_ids=list(gd(135, []) or []),
            sort_order_id=gd(140),
            referenced_data_file=gd(143),
            content_offset=gd(144),
            content_size_in_bytes=gd(145),
            first_row_id=gd(142),
        )
        status = rec.get(enames[0], mf.STATUS_ADDED)
        snap = rec.get(enames.get(1))
        seq = rec.get(enames.get(3))
        fseq = rec.get(enames.get(4))
        if manifest is not None:
            if snap is None:
                snap = manifest.added_snapshot_id
            if seq is None and status != mf.STATUS_EXISTING:
                seq = manifest.sequence_number
            if fseq is None and status != mf.STATUS_EXISTING:
                fseq = manifest.sequence_number
        out.append(mf.ManifestEntry(
            status=status, data_file=data_file, snapshot_id=snap,
            sequence_number=seq, file_sequence_number=fseq,
        ))
    return out


# ---------------------------------------------------------------------------
# Iceberg avro schemas for WRITING spec-compliant manifests
# ---------------------------------------------------------------------------

def _kv_map(name_prefix: str, kid: int, vid: int, vtype: str) -> dict:
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": f"k{kid}_v{vid}",
            "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": vtype, "field-id": vid},
            ],
        },
    }


def _opt(schema: Any) -> list:
    return ["null", schema]


def manifest_list_avro_schema(version: int = 2) -> dict:
    """The manifest_file schema (Iceberg spec §Manifest Lists).
    ``version=2`` (default) is the v2 layout; ``version=1`` emits the
    spec's v1 layout for v1-pinned consumers (reference
    ``v1_metadata.cc`` ManifestFileAdapterV1): no content / sequence
    number fields, the *_data_files_count field NAMES (Avro resolution
    is name-based — v1 Java readers expect the v1 names; field ids 504-
    506 are unchanged), and counts optional. ``version=3`` (reference
    ``manifest_writer.h:70-84,139-147`` MakeV3Writer, ``v3_metadata.cc``)
    adds ``first_row_id`` (field id 520) for row lineage."""
    summary = {
        "type": "record",
        "name": "r508",
        "fields": [
            {"name": "contains_null", "type": "boolean", "field-id": 509},
            {"name": "contains_nan", "type": _opt("boolean"), "default": None,
             "field-id": 518},
            {"name": "lower_bound", "type": _opt("bytes"), "default": None,
             "field-id": 510},
            {"name": "upper_bound", "type": _opt("bytes"), "default": None,
             "field-id": 511},
        ],
    }
    if version == 1:
        return {
            "type": "record",
            "name": "manifest_file",
            "fields": [
                {"name": "manifest_path", "type": "string", "field-id": 500},
                {"name": "manifest_length", "type": "long", "field-id": 501},
                {"name": "partition_spec_id", "type": "int", "field-id": 502},
                {"name": "added_snapshot_id", "type": "long", "field-id": 503},
                {"name": "added_data_files_count", "type": _opt("int"),
                 "default": None, "field-id": 504},
                {"name": "existing_data_files_count", "type": _opt("int"),
                 "default": None, "field-id": 505},
                {"name": "deleted_data_files_count", "type": _opt("int"),
                 "default": None, "field-id": 506},
                {"name": "added_rows_count", "type": _opt("long"),
                 "default": None, "field-id": 512},
                {"name": "existing_rows_count", "type": _opt("long"),
                 "default": None, "field-id": 513},
                {"name": "deleted_rows_count", "type": _opt("long"),
                 "default": None, "field-id": 514},
                {"name": "partitions",
                 "type": _opt({"type": "array", "items": summary}),
                 "default": None, "field-id": 507},
            ],
        }
    out = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int", "field-id": 505},
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long", "field-id": 513},
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
            {"name": "partitions",
             "type": _opt({"type": "array", "items": summary}),
             "default": None, "field-id": 507},
        ],
    }
    if version >= 3:
        # v3 additions (v3_metadata.cc ManifestFileAdapterV3::Init field
        # set): key_metadata (519, encryption — null when unencrypted)
        # and the starting row id the manifest's ADDED files draw from
        # (520; null for delete manifests)
        out["fields"].append({"name": "key_metadata", "type": _opt("bytes"),
                              "default": None, "field-id": 519})
        out["fields"].append({"name": "first_row_id", "type": _opt("long"),
                              "default": None, "field-id": 520})
    return out


def _avro_partition_type(t) -> Any:
    """Iceberg partition result type -> avro schema (spec Appendix A)."""
    from iceberg_cpp_spark.core import types as it

    if isinstance(t, it.BooleanType):
        return "boolean"
    if isinstance(t, it.IntegerType):
        return "int"
    if isinstance(t, it.LongType):
        return "long"
    if isinstance(t, it.FloatType):
        return "float"
    if isinstance(t, it.DoubleType):
        return "double"
    if isinstance(t, it.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(t, it.TimeType):
        return {"type": "long", "logicalType": "time-micros"}
    if isinstance(t, it.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros",
                "adjust-to-utc": False}
    if isinstance(t, it.TimestampTzType):
        return {"type": "long", "logicalType": "timestamp-micros",
                "adjust-to-utc": True}
    if isinstance(t, it.StringType):
        return "string"
    if isinstance(t, it.UuidType):
        return {"type": "fixed", "name": "uuid_fixed", "size": 16,
                "logicalType": "uuid"}
    if isinstance(t, it.BinaryType):
        return "bytes"
    if isinstance(t, it.FixedType):
        return {"type": "fixed", "name": f"fixed_{t.length}", "size": t.length}
    if isinstance(t, it.DecimalType):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": t.precision, "scale": t.scale}
    raise ValueError(f"no avro mapping for partition type {t!r}")


def manifest_entry_avro_schema(spec, schema, version: int = 2) -> dict:
    """The manifest_entry schema with the partition record typed from
    the table's partition spec (field-ids = spec field ids).
    ``version=1`` emits the spec's v1 data_file layout (reference
    ``v1_metadata.cc`` ManifestEntryAdapterV1): snapshot_id REQUIRED, no
    sequence-number fields, no content/v2-delete/v3 fields, and the
    deprecated-but-required ``block_size_in_bytes`` (id 105).

    ``version=2`` carries the v3 optional fields (142-145) as a
    documented engine extension — this engine permits deletion vectors
    on v2 tables, and Avro resolution is name-based so v2 readers skip
    the extras. ``version=3`` (reference ``manifest_writer.h:70-84``
    MakeV3Writer, ``v3_metadata.cc`` ManifestEntryAdapterV3) is the
    spec v3 layout: same fields plus ``key_metadata`` (id 131)."""
    from iceberg_cpp_spark.core.manifests import _partition_types

    types = _partition_types(spec, schema)
    pfields = []
    for pf in spec.fields:
        pfields.append({
            "name": pf.name,
            "type": _opt(_avro_partition_type(types[pf.name])),
            "default": None,
            "field-id": pf.field_id,
        })
    if version == 1:
        data_file_v1 = {
            "type": "record",
            "name": "r2",
            "fields": [
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "partition",
                 "type": {"type": "record", "name": "r102", "fields": pfields},
                 "field-id": 102},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                # deprecated, REQUIRED in v1 (write a default, never read)
                {"name": "block_size_in_bytes", "type": "long", "field-id": 105},
                {"name": "column_sizes",
                 "type": _opt(_kv_map("cs", 117, 118, "long")),
                 "default": None, "field-id": 108},
                {"name": "value_counts",
                 "type": _opt(_kv_map("vc", 119, 120, "long")),
                 "default": None, "field-id": 109},
                {"name": "null_value_counts",
                 "type": _opt(_kv_map("nvc", 121, 122, "long")),
                 "default": None, "field-id": 110},
                {"name": "nan_value_counts",
                 "type": _opt(_kv_map("nanc", 138, 139, "long")),
                 "default": None, "field-id": 137},
                {"name": "lower_bounds",
                 "type": _opt(_kv_map("lb", 126, 127, "bytes")),
                 "default": None, "field-id": 125},
                {"name": "upper_bounds",
                 "type": _opt(_kv_map("ub", 129, 130, "bytes")),
                 "default": None, "field-id": 128},
                {"name": "key_metadata", "type": _opt("bytes"),
                 "default": None, "field-id": 131},
                {"name": "split_offsets",
                 "type": _opt({"type": "array", "items": "long"}),
                 "default": None, "field-id": 132},
                {"name": "sort_order_id", "type": _opt("int"),
                 "default": None, "field-id": 140},
            ],
        }
        return {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int", "field-id": 0},
                {"name": "snapshot_id", "type": "long", "field-id": 1},
                {"name": "data_file", "type": data_file_v1, "field-id": 2},
            ],
        }
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition",
             "type": {"type": "record", "name": "r102", "fields": pfields},
             "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "column_sizes", "type": _opt(_kv_map("cs", 117, 118, "long")),
             "default": None, "field-id": 108},
            {"name": "value_counts", "type": _opt(_kv_map("vc", 119, 120, "long")),
             "default": None, "field-id": 109},
            {"name": "null_value_counts",
             "type": _opt(_kv_map("nvc", 121, 122, "long")),
             "default": None, "field-id": 110},
            {"name": "nan_value_counts",
             "type": _opt(_kv_map("nanc", 138, 139, "long")),
             "default": None, "field-id": 137},
            {"name": "lower_bounds", "type": _opt(_kv_map("lb", 126, 127, "bytes")),
             "default": None, "field-id": 125},
            {"name": "upper_bounds", "type": _opt(_kv_map("ub", 129, 130, "bytes")),
             "default": None, "field-id": 128},
            {"name": "split_offsets",
             "type": _opt({"type": "array", "items": "long"}),
             "default": None, "field-id": 132},
            {"name": "equality_ids",
             "type": _opt({"type": "array", "items": "int"}),
             "default": None, "field-id": 135},
            {"name": "sort_order_id", "type": _opt("int"), "default": None,
             "field-id": 140},
            {"name": "referenced_data_file", "type": _opt("string"),
             "default": None, "field-id": 143},
            {"name": "content_offset", "type": _opt("long"),
             "default": None, "field-id": 144},
            {"name": "content_size_in_bytes", "type": _opt("long"),
             "default": None, "field-id": 145},
            {"name": "first_row_id", "type": _opt("long"),
             "default": None, "field-id": 142},
        ],
    }
    if version >= 3:
        idx = next(i for i, f in enumerate(data_file["fields"])
                   if f["name"] == "upper_bounds") + 1
        data_file["fields"].insert(idx, {
            "name": "key_metadata", "type": _opt("bytes"),
            "default": None, "field-id": 131})
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": _opt("long"), "default": None,
             "field-id": 1},
            {"name": "sequence_number", "type": _opt("long"), "default": None,
             "field-id": 3},
            {"name": "file_sequence_number", "type": _opt("long"),
             "default": None, "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


# ---------------------------------------------------------------------------
# Avro DATA files (reference: avro/avro_reader.cc:77-160 reads arbitrary
# Avro data files dispatched by format from file_reader.h:100-113; the
# writer side mirrors spec Appendix A's Iceberg-type -> Avro mapping)
# ---------------------------------------------------------------------------

_EPOCH_DATE = None  # lazily-built datetime anchors (module import stays light)


def _dt_anchors():
    global _EPOCH_DATE
    if _EPOCH_DATE is None:
        import datetime as _dt
        _EPOCH_DATE = (_dt.date(1970, 1, 1),
                       _dt.datetime(1970, 1, 1),
                       _dt.timezone.utc, _dt.timedelta)
    return _EPOCH_DATE


def avro_record_count(path: str) -> int:
    """Total record count from block headers only — no record decode
    (the cheap path for add_files imports; a block header is two
    varints, so this is O(#blocks) I/O-bound work)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    r = Reader(data)
    r.pos = 4
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:
            r.read_long()
            count = -count
        for _ in range(count):
            r.read_bytes()
            r.read_bytes()
    r.read(16)  # sync
    total = 0
    while not r.at_end():
        n = r.read_long()
        size = r.read_long()
        r.read(size)
        r.read(16)
        total += n
    return total


def avro_file_schema(path: str) -> Any:
    """Writer schema from the container header only (no record decode)."""
    with open(path, "rb") as f:
        data = f.read(1 << 20)  # header is tiny; 1 MiB is generous
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    r = Reader(data)
    r.pos = 4
    meta = {}
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:
            r.read_long()
            count = -count
        for _ in range(count):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    return json.loads(meta["avro.schema"])


def data_avro_schema(schema, name: str = "table_data") -> dict:
    """Iceberg schema -> Avro record schema for DATA files per spec
    Appendix A: every record field carries ``field-id``, lists carry
    ``element-id``, string-keyed maps are Avro maps with
    ``key-id``/``value-id``, other maps are key/value record arrays
    with ``logicalType: map``."""
    from iceberg_cpp_spark.core import types as it

    def conv(t, fid: int) -> Any:
        if isinstance(t, it.StructType):  # includes Schema
            return {"type": "record", "name": f"r{fid}",
                    "fields": [fld(f) for f in t.fields]}
        if isinstance(t, it.ListType):
            out = {"type": "array", "items": conv(t.element_type, t.element_id),
                   "element-id": t.element_id}
            if not t.element_required:
                out["items"] = _opt(out["items"])
            return out
        if isinstance(t, it.MapType):
            vs = conv(t.value_type, t.value_id)
            if not t.value_required:
                vs = _opt(vs)
            if isinstance(t.key_type, it.StringType):
                return {"type": "map", "values": vs,
                        "key-id": t.key_id, "value-id": t.value_id}
            return {"type": "array", "logicalType": "map", "items": {
                "type": "record", "name": f"k{t.key_id}_v{t.value_id}",
                "fields": [
                    {"name": "key", "type": conv(t.key_type, t.key_id),
                     "field-id": t.key_id},
                    {"name": "value", "type": vs, "field-id": t.value_id},
                ]}}
        return _avro_partition_type(t)  # primitive mapping is shared

    def fld(f) -> dict:
        t = conv(f.field_type, f.field_id)
        out = {"name": f.name, "type": t if f.required else _opt(t),
               "field-id": f.field_id}
        if not f.required:
            out["default"] = None
        return out

    return {"type": "record", "name": name,
            "fields": [fld(f) for f in schema.fields]}


def _py_to_avro(v: Any, t) -> Any:
    """Engine-facing Python value -> the raw representation
    ``_encode_datum`` encodes (dates to epoch days, datetimes to µs,
    nested containers recursively)."""
    from iceberg_cpp_spark.core import types as it

    if v is None:
        return None
    ep_d, ep_ts, utc, td = _dt_anchors()
    if isinstance(t, it.DateType):
        if isinstance(v, int):
            return v
        return (v - ep_d).days
    if isinstance(t, (it.TimestampType, it.TimestampTzType)):
        if isinstance(v, int):
            return v
        if v.tzinfo is not None:
            v = v.astimezone(utc).replace(tzinfo=None)
        return round((v - ep_ts).total_seconds() * 1_000_000)
    if isinstance(t, it.StructType):
        return {f.name: _py_to_avro(v.get(f.name) if isinstance(v, dict)
                                    else getattr(v, f.name), f.field_type)
                for f in t.fields}
    if isinstance(t, it.ListType):
        return [_py_to_avro(x, t.element_type) for x in v]
    if isinstance(t, it.MapType):
        return {(_py_to_avro(k, t.key_type) if not isinstance(t.key_type, it.StringType) else k):
                _py_to_avro(val, t.value_type) for k, val in v.items()}
    return v  # int/float/str/bytes/bool/Decimal/UUID pass through


def write_avro_data(path: str, schema, rows: Iterable[Any],
                    codec: str = "deflate") -> int:
    """Write Python row dicts (engine-typed values: date/datetime/
    Decimal/str/bytes/...) as an Iceberg-compliant Avro DATA file.
    Returns the record count. The schema JSON rides in the header as
    ``iceberg.schema`` like other engines write it."""
    avsc = data_avro_schema(schema)
    recs, n = [], 0
    for r in rows:
        recs.append({f.name: _py_to_avro(
            r.get(f.name) if isinstance(r, dict) else getattr(r, f.name),
            f.field_type) for f in schema.fields})
        n += 1
    write_avro(path, avsc, recs, metadata={
        "iceberg.schema": json.dumps(schema.to_json(),
                                     separators=(",", ":")).encode()},
        codec=codec)
    return n


def _avro_to_py(v: Any, t, node: Any) -> Any:
    """Decoded Avro raw value -> the Python value Spark's Arrow bridge
    expects for the Iceberg type ``t`` (dates/datetimes materialized,
    uuid to str, nested containers resolved by FIELD ID against the
    writer-schema ``node``)."""
    from iceberg_cpp_spark.core import types as it

    if v is None:
        return None
    node = _nonnull(node)
    ep_d, ep_ts, utc, td = _dt_anchors()
    if isinstance(t, it.DateType):
        return ep_d + td(days=int(v))
    if isinstance(t, it.TimestampType):
        return ep_ts + td(microseconds=int(v))
    if isinstance(t, it.TimestampTzType):
        return (ep_ts + td(microseconds=int(v))).replace(tzinfo=utc)
    if isinstance(t, it.UuidType):
        return str(v) if isinstance(v, UUID) else (
            str(UUID(bytes=bytes(v))) if isinstance(v, (bytes, bytearray)) else str(v))
    if isinstance(t, it.FixedType):
        return bytes(v)
    if isinstance(t, it.StructType):
        byid = {f.get("field-id"): f for f in node["fields"]
                if f.get("field-id") is not None}
        byname = {f["name"]: f for f in node["fields"]}
        out = {}
        for f in t.fields:
            # Iceberg projection rule: resolve by field id when the
            # writer schema carries ids; fall back to name ONLY for
            # id-less imported files. A file that has ids but lacks
            # this id means the column was absent at write time — a
            # by-name hit there would resurrect a dropped-and-re-added
            # column's stale values.
            af = byid.get(f.field_id) if byid else byname.get(f.name)
            out[f.name] = (None if af is None else
                           _avro_to_py(v.get(af["name"]), f.field_type,
                                       af["type"]))
        return out
    if isinstance(t, it.ListType):
        items = node["items"]
        return [_avro_to_py(x, t.element_type, items) for x in v]
    if isinstance(t, it.MapType):
        if node.get("type") == "map":
            ks, vs = "string", node["values"]
            return {k: _avro_to_py(val, t.value_type, vs)
                    for k, val in v.items()}
        # kv-record array (logicalType map): _decode_datum already
        # folded it into {key: value}; resolve member schemas
        items = _nonnull(node["items"])
        ks = _field_schema(items, "key")
        vs = _field_schema(items, "value")
        return {_avro_to_py(k, t.key_type, ks):
                _avro_to_py(val, t.value_type, vs) for k, val in v.items()}
    if isinstance(t, it.FloatType) or isinstance(t, it.DoubleType):
        return float(v)
    return v


def data_records(af: AvroFile, schema) -> list[dict]:
    """Project a decoded Avro DATA file onto an Iceberg read schema BY
    FIELD ID (name fallback for id-less imported files) — the Avro
    analogue of parquet field-id projection. Fields absent from the
    file come back None (v3 initial-defaults are applied downstream by
    the seq-gated scan join, same as parquet)."""
    return [_avro_to_py(rec, schema, af.schema) for rec in af.records]
