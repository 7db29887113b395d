"""Puffin file format: the Iceberg sidecar container for statistics and
deletion-vector blobs (spec: puffin-spec.md; the reference carries
Puffin *pointers* in `statistics_file.h:33-60` without reading blobs —
this goes one step further and implements the container).

Layout::

    Magic "PFA1"
    blob bytes, back to back
    Magic "PFA1"
    footer payload (JSON, uncompressed here)
    u32 LE payload length | u32 LE flags | Magic "PFA1"

Footer JSON: ``{"blobs": [{type, fields, snapshot-id, sequence-number,
offset, length, properties}, ...], "properties": {...}}``.

``deletion-vector-v1`` blob (Iceberg v3): ``u32 BE length`` of
(magic+vector), 4-byte magic D1 D3 39 64, the portable-serialized
64-bit roaring bitmap (core/roaring.py), ``u32 BE crc32`` of
(magic+vector). The DV for a data file marks deleted row positions;
one blob per referenced data file.
"""

from __future__ import annotations

import json
import struct
import zlib
from functools import lru_cache as _lru_cache
from dataclasses import dataclass, field as dc_field
from typing import Optional

from iceberg_cpp_spark.core.roaring import Roaring64

MAGIC = b"PFA1"
DV_MAGIC = bytes((0xD1, 0xD3, 0x39, 0x64))
DELETION_VECTOR_V1 = "deletion-vector-v1"


@dataclass
class BlobMetadata:
    type: str
    offset: int
    length: int
    fields: list[int] = dc_field(default_factory=list)
    snapshot_id: Optional[int] = None
    sequence_number: Optional[int] = None
    properties: dict[str, str] = dc_field(default_factory=dict)

    def to_json(self) -> dict:
        j = {"type": self.type, "fields": self.fields,
             "snapshot-id": self.snapshot_id,
             "sequence-number": self.sequence_number,
             "offset": self.offset, "length": self.length}
        if self.properties:
            j["properties"] = self.properties
        return j

    @classmethod
    def from_json(cls, j: dict) -> "BlobMetadata":
        return cls(type=j["type"], offset=j["offset"], length=j["length"],
                   fields=j.get("fields") or [],
                   snapshot_id=j.get("snapshot-id"),
                   sequence_number=j.get("sequence-number"),
                   properties=j.get("properties") or {})


def write_puffin(path: str, blobs: list[tuple[BlobMetadata, bytes]],
                 properties: Optional[dict[str, str]] = None) -> list[BlobMetadata]:
    """Write blobs; each entry's metadata gets its real offset/length
    filled in. Returns the final metadata list (footer order)."""
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    out_meta: list[BlobMetadata] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        for meta, data in blobs:
            meta.offset = f.tell()
            meta.length = len(data)
            f.write(data)
            out_meta.append(meta)
        payload = json.dumps({
            "blobs": [m.to_json() for m in out_meta],
            "properties": properties or {},
        }).encode("utf-8")
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<II", len(payload), 0))
        f.write(MAGIC)
    return out_meta


def read_puffin_metadata(path: str) -> tuple[list[BlobMetadata], dict]:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"not a puffin file: {path}")
    (payload_len, flags) = struct.unpack("<II", data[-12:-4])
    if flags & 0b1:
        raise ValueError("compressed puffin footer not supported")
    payload = json.loads(data[-12 - payload_len:-12].decode("utf-8"))
    blobs = [BlobMetadata.from_json(b) for b in payload.get("blobs", [])]
    return blobs, payload.get("properties", {})


def read_blob(path: str, meta: BlobMetadata) -> bytes:
    with open(path, "rb") as f:
        f.seek(meta.offset)
        return f.read(meta.length)


# -- deletion-vector-v1 blobs ------------------------------------------------

def dv_blob_bytes(rb: Roaring64) -> bytes:
    body = DV_MAGIC + rb.serialize()
    return struct.pack(">I", len(body)) + body + struct.pack(">I", zlib.crc32(body))


def parse_dv_blob(blob: bytes) -> Roaring64:
    (n,) = struct.unpack_from(">I", blob, 0)
    body = blob[4:4 + n]
    if body[:4] != DV_MAGIC:
        raise ValueError("bad deletion-vector magic")
    (crc,) = struct.unpack_from(">I", blob, 4 + n)
    if crc != zlib.crc32(body):
        raise ValueError("deletion-vector crc mismatch")
    return Roaring64.deserialize(body[4:])


@_lru_cache(maxsize=1024)
def _decode_dv_pointer_cached(path: str, offset: int, length: int):
    """Executor-side helper: (puffin_path, offset, length) pointer →
    sorted uint64 position array.  The executor reads ONLY its own
    files' blobs, memoized per worker — the scale-safe alternative to
    the driver reading every blob and broadcasting raw bytes (at 10⁵-10⁶
    DV'd files that is a serial driver I/O pass plus a broadcast that
    grows with table size)."""
    return parse_dv_blob(read_blob(
        path, BlobMetadata(type=DELETION_VECTOR_V1,
                           offset=offset, length=length))).to_array()


def write_deletion_vectors(path: str, dvs: dict[str, Roaring64],
                           snapshot_id: Optional[int] = None,
                           sequence_number: Optional[int] = None,
                           ) -> dict[str, BlobMetadata]:
    """One puffin file holding one DV blob per referenced data file.
    Returns {data_file_path: blob metadata (with offset/length)}."""
    blobs = []
    order = sorted(dvs)
    for p in order:
        rb = dvs[p]
        blobs.append((BlobMetadata(
            type=DELETION_VECTOR_V1, offset=0, length=0,
            snapshot_id=snapshot_id, sequence_number=sequence_number,
            properties={"referenced-data-file": p,
                        "cardinality": str(rb.cardinality)},
        ), dv_blob_bytes(rb)))
    written = write_puffin(path, blobs)
    return dict(zip(order, written))
