"""64-bit roaring bitmap with the CRoaring *portable* serialization.

The reference ships a roaring-bitmap util (`util/roaring.h`,
`test/roaring_test.cc`) as groundwork for Iceberg v3 deletion vectors;
this module is the Spark engine's equivalent, backing
`core/puffin.py`'s `deletion-vector-v1` blobs.

Layout follows the portable spec the ecosystem shares (CRoaring /
RoaringBitmap java `serialize()`):

- 64-bit: ``u64 n_buckets`` then per bucket ``u32 high32`` + a portable
  32-bit roaring bitmap of the low 32 bits.
- 32-bit, no run containers (what we WRITE — always valid):
  ``u32 cookie=12346, u32 n, n×(u16 key, u16 cardinality-1),
  n×u32 byte-offsets, containers``; a container is a sorted ``u16``
  array (cardinality ≤ 4096) or an 8 KiB bitset.
- 32-bit with run containers (READ support): low16(cookie)=12347,
  n = (cookie>>16)+1, run-flag bitset, headers, offsets only when
  n ≥ 4, run container = ``u16 n_runs`` + n_runs×(u16 start, u16 len)
  encoding [start, start+len].

All little-endian. In memory every container is a sorted unique
``uint16`` numpy array (encode-time choice of array vs bitset), and the
bulk ops (build / union / membership) are vectorized numpy — no per-bit
Python. Round-trip pinned by tests/test_roaring_puffin.py; no external
roaring library exists in this environment to cross-check, so external
interop is best-effort (documented in README).
"""

from __future__ import annotations

import struct
from typing import Iterable

import numpy as np

ARRAY_MAX = 4096  # container cardinality above which we write a bitset
SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE_RUN = 12347
NO_OFFSET_THRESHOLD = 4
BITSET_BYTES = 8192


class Roaring64:
    """buckets: {high32: {key16: sorted unique uint16 ndarray}}"""

    def __init__(self) -> None:
        self.buckets: dict[int, dict[int, np.ndarray]] = {}

    # -- construction ----------------------------------------------------

    @classmethod
    def from_array(cls, values) -> "Roaring64":
        rb = cls()
        vals = np.asarray(values, dtype=np.uint64)
        if vals.size == 0:
            return rb
        vals = np.unique(vals)
        high32 = (vals >> np.uint64(32)).astype(np.uint32)
        low32 = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        for h in np.unique(high32):
            lo = low32[high32 == h]
            key16 = (lo >> np.uint32(16)).astype(np.uint16)
            low16 = (lo & np.uint32(0xFFFF)).astype(np.uint16)
            bucket = {}
            for k in np.unique(key16):
                bucket[int(k)] = low16[key16 == k]
            rb.buckets[int(h)] = bucket
        return rb

    def to_array(self) -> np.ndarray:
        parts = []
        for h in sorted(self.buckets):
            for k in sorted(self.buckets[h]):
                lo = self.buckets[h][k].astype(np.uint64)
                parts.append((np.uint64(h) << np.uint64(32))
                             | (np.uint64(k) << np.uint64(16)) | lo)
        if not parts:
            return np.empty(0, dtype=np.uint64)
        return np.concatenate(parts)

    # -- ops -------------------------------------------------------------

    @property
    def cardinality(self) -> int:
        return sum(len(c) for b in self.buckets.values() for c in b.values())

    def contains_many(self, values) -> np.ndarray:
        vals = np.asarray(values, dtype=np.uint64)
        return np.isin(vals, self.to_array())

    def union(self, other: "Roaring64") -> "Roaring64":
        return Roaring64.from_array(
            np.concatenate([self.to_array(), other.to_array()]))

    def __eq__(self, other) -> bool:
        if not isinstance(other, Roaring64):
            return NotImplemented
        a, b = self.to_array(), other.to_array()
        return a.shape == b.shape and bool(np.all(a == b))

    # -- serde -----------------------------------------------------------

    def serialize(self) -> bytes:
        out = bytearray(struct.pack("<Q", len(self.buckets)))
        for h in sorted(self.buckets):
            out += struct.pack("<I", h)
            out += _serialize32(self.buckets[h])
        return bytes(out)

    @classmethod
    def deserialize(cls, buf: bytes) -> "Roaring64":
        rb = cls()
        (n_buckets,) = struct.unpack_from("<Q", buf, 0)
        off = 8
        for _ in range(n_buckets):
            (h,) = struct.unpack_from("<I", buf, off)
            off += 4
            containers, off = _parse32(buf, off)
            rb.buckets[int(h)] = containers
        return rb


def _serialize32(containers: dict[int, np.ndarray]) -> bytes:
    keys = sorted(containers)
    n = len(keys)
    out = bytearray(struct.pack("<II", SERIAL_COOKIE_NO_RUN, n))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    pos = 8 + 4 * n + 4 * n
    for k in keys:
        out += struct.pack("<I", pos)
        c = containers[k]
        pos += 2 * len(c) if len(c) <= ARRAY_MAX else BITSET_BYTES
    for k in keys:
        c = containers[k]
        if len(c) <= ARRAY_MAX:
            out += np.ascontiguousarray(c, dtype="<u2").tobytes()
        else:
            bits = np.zeros(65536, dtype=np.uint8)
            bits[c.astype(np.int64)] = 1
            out += np.packbits(bits, bitorder="little").tobytes()
    return bytes(out)


def _parse32(buf: bytes, off: int) -> tuple[dict[int, np.ndarray], int]:
    (cookie,) = struct.unpack_from("<I", buf, off)
    containers: dict[int, np.ndarray] = {}
    if cookie & 0xFFFF == SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        off += 4
        nrf = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, np.uint8, nrf, off), bitorder="little")
        off += nrf
        headers = [struct.unpack_from("<HH", buf, off + 4 * i) for i in range(n)]
        off += 4 * n
        if n >= NO_OFFSET_THRESHOLD:
            off += 4 * n  # offsets: containers follow sequentially anyway
        for i, (key, card_m1) in enumerate(headers):
            if run_flags[i]:
                (n_runs,) = struct.unpack_from("<H", buf, off)
                off += 2
                runs = np.frombuffer(buf, "<u2", 2 * n_runs, off).reshape(-1, 2)
                off += 4 * n_runs
                # Python-int arithmetic: numpy-2 (NEP 50) keeps uint16 for
                # s+ln+1, so a run ending at 65535 would wrap to 0 and drop
                # every deleted position in the run
                vals = [np.arange(int(s), int(s) + int(ln) + 1,
                                  dtype=np.uint32).astype(np.uint16)
                        for s, ln in runs]
                containers[key] = (np.unique(np.concatenate(vals)) if vals
                                   else np.empty(0, np.uint16))
            else:
                containers[key], off = _read_plain(buf, off, card_m1 + 1)
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, off + 4)
        off += 8
        headers = [struct.unpack_from("<HH", buf, off + 4 * i) for i in range(n)]
        off += 4 * n + 4 * n  # headers + offsets
        for key, card_m1 in headers:
            containers[key], off = _read_plain(buf, off, card_m1 + 1)
    else:
        raise ValueError(f"unknown roaring cookie {cookie}")
    return containers, off


def _read_plain(buf: bytes, off: int, card: int) -> tuple[np.ndarray, int]:
    if card <= ARRAY_MAX:
        arr = np.frombuffer(buf, "<u2", card, off).copy()
        return arr, off + 2 * card
    bits = np.unpackbits(
        np.frombuffer(buf, np.uint8, BITSET_BYTES, off), bitorder="little")
    return np.nonzero(bits)[0].astype(np.uint16), off + BITSET_BYTES
