"""Well-Known Binary (WKB) envelope math for the Iceberg v3 geospatial
types.

The v3 spec stores ``geometry`` / ``geography`` values as WKB and their
per-file lower/upper bounds as WKB *points* (lower = (xmin, ymin),
upper = (xmax, ymax); geography bounds may wrap the antimeridian, i.e.
lower.x > upper.x). The reference engine predates v3 and has no
geospatial slot at all (type_fwd.h:34 pins its enum at v2), so this
module is spec-derived: ISO 19125 / OGC 06-103r4 WKB layout, plus the
PostGIS EWKB dimension flags for robustness when importing foreign
files.

Only envelope (bounding-box) math lives here — enough for metrics
bounds, file-level pruning and the conservative ``st_intersects`` row
filter. No geometry algebra, no CRS transforms: values pass through
byte-for-byte and all box math is planar in the stored coordinates.

Scale shape: ``envelopes_np`` vectorizes the overwhelmingly common
uniform-2D-point corpus with one ``numpy.frombuffer`` reinterpret (no
per-row Python), falling back to a per-value parse only for mixed or
non-point geometry batches.
"""

from __future__ import annotations

import struct
from typing import Iterable, Optional, Sequence

import numpy as np

# ISO geometry kinds (base code modulo the 1000/2000/3000 Z/M blocks)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

# PostGIS EWKB dimension/SRID flag bits
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000

Envelope = tuple[float, float, float, float]  # xmin, ymin, xmax, ymax


def point_wkb(x: float, y: float) -> bytes:
    """Little-endian ISO 2D WKB point — the spec's bound encoding."""
    return struct.pack("<BIdd", 1, POINT, x, y)


def parse_point(b: bytes) -> tuple[float, float]:
    """Decode a WKB point's (x, y); Z/M coordinates are ignored (bound
    points may legally carry them — spec: x/y always present)."""
    if len(b) < 21:
        raise ValueError(f"WKB point too short: {len(b)} bytes")
    endian = "<" if b[0] == 1 else ">"
    (code,) = struct.unpack_from(f"{endian}I", b, 1)
    kind, _, off = _dims(code, 5)
    if kind != POINT:
        raise ValueError(f"expected WKB point, got geometry kind {kind}")
    x, y = struct.unpack_from(f"{endian}dd", b, off)
    return x, y


def _dims(code: int, off: int) -> tuple[int, int, int]:
    """(base kind, coords per vertex, offset past any EWKB SRID)."""
    ndim = 2
    if code & (_EWKB_Z | _EWKB_M | _EWKB_SRID):  # EWKB flag form
        if code & _EWKB_Z:
            ndim += 1
        if code & _EWKB_M:
            ndim += 1
        if code & _EWKB_SRID:
            off += 4
        kind = code & 0xFF
    else:  # ISO 1000/2000/3000 block form
        kind = code % 1000
        block = code // 1000
        if block in (1, 2):
            ndim = 3
        elif block == 3:
            ndim = 4
        elif block != 0:
            raise ValueError(f"unknown WKB type code: {code}")
    return kind, ndim, off


class _Box:
    __slots__ = ("xmin", "ymin", "xmax", "ymax", "empty")

    def __init__(self) -> None:
        self.xmin = self.ymin = float("inf")
        self.xmax = self.ymax = float("-inf")
        self.empty = True

    def add(self, x: float, y: float) -> None:
        if x != x or y != y:  # NaN coords = empty point (spec allows)
            return
        self.empty = False
        if x < self.xmin:
            self.xmin = x
        if x > self.xmax:
            self.xmax = x
        if y < self.ymin:
            self.ymin = y
        if y > self.ymax:
            self.ymax = y


def envelope(b: bytes) -> Optional[Envelope]:
    """Planar envelope of one WKB value; None for empty geometries."""
    box = _Box()
    _walk(memoryview(b), 0, box)
    return None if box.empty else (box.xmin, box.ymin, box.xmax, box.ymax)


def _walk(mv: memoryview, off: int, box: _Box) -> int:
    endian = "<" if mv[off] == 1 else ">"
    (code,) = struct.unpack_from(f"{endian}I", mv, off + 1)
    kind, ndim, off = _dims(code, off + 5)
    step = 8 * ndim
    if kind == POINT:
        x, y = struct.unpack_from(f"{endian}dd", mv, off)
        box.add(x, y)
        return off + step
    if kind in (LINESTRING, MULTIPOINT):
        # MULTIPOINT items are full WKB points (header per item)
        (n,) = struct.unpack_from(f"{endian}I", mv, off)
        off += 4
        if kind == LINESTRING:
            for x, y in _coords(mv, off, n, ndim, endian):
                box.add(x, y)
            return off + n * step
        for _ in range(n):
            off = _walk(mv, off, box)
        return off
    if kind == POLYGON:
        (rings,) = struct.unpack_from(f"{endian}I", mv, off)
        off += 4
        for _ in range(rings):
            (n,) = struct.unpack_from(f"{endian}I", mv, off)
            off += 4
            for x, y in _coords(mv, off, n, ndim, endian):
                box.add(x, y)
            off += n * step
        return off
    if kind in (MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        (n,) = struct.unpack_from(f"{endian}I", mv, off)
        off += 4
        for _ in range(n):
            off = _walk(mv, off, box)
        return off
    raise ValueError(f"unsupported WKB geometry kind: {kind}")


def _coords(mv: memoryview, off: int, n: int, ndim: int,
            endian: str) -> Iterable[tuple[float, float]]:
    if n == 0:
        return
    dt = np.dtype("<f8" if endian == "<" else ">f8")
    arr = np.frombuffer(mv, dtype=dt, count=n * ndim, offset=off)
    arr = arr.reshape(n, ndim)
    for i in range(n):
        yield float(arr[i, 0]), float(arr[i, 1])


# 2D little-endian point: 1 + 4 + 16 bytes
_POINT2D_LEN = 21
_POINT2D_HEADER = struct.pack("<BI", 1, POINT)


def envelopes_np(values: Sequence[Optional[bytes]]) -> np.ndarray:
    """(n, 4) float64 envelopes (xmin, ymin, xmax, ymax); NaN rows for
    null/empty values. Vectorized fast path when every non-null value is
    a little-endian 2D point (the training-corpus common case): one
    buffer concat + frombuffer, zero per-row Python."""
    n = len(values)
    out = np.full((n, 4), np.nan, dtype=np.float64)
    live = [(i, v) for i, v in enumerate(values) if v is not None]
    if not live:
        return out
    if all(len(v) == _POINT2D_LEN and v[:5] == _POINT2D_HEADER
           for _, v in live):
        buf = b"".join(v for _, v in live)
        pts = np.frombuffer(buf, dtype=np.uint8).reshape(len(live),
                                                         _POINT2D_LEN)
        xy = pts[:, 5:].copy().view("<f8").reshape(len(live), 2)
        idx = np.fromiter((i for i, _ in live), dtype=np.int64,
                          count=len(live))
        out[idx, 0] = xy[:, 0]
        out[idx, 1] = xy[:, 1]
        out[idx, 2] = xy[:, 0]
        out[idx, 3] = xy[:, 1]
        # NaN-coordinate (empty) points already yield NaN rows
        return out
    for i, v in live:
        env = envelope(bytes(v))
        if env is not None:
            out[i] = env
    return out


def intersects_mask(envs: np.ndarray, bbox: Envelope) -> np.ndarray:
    """Boolean mask: envelope rows that intersect ``bbox`` (closed box
    semantics; NaN/empty rows are False)."""
    xmin, ymin, xmax, ymax = bbox
    return ((envs[:, 0] <= xmax) & (envs[:, 2] >= xmin)
            & (envs[:, 1] <= ymax) & (envs[:, 3] >= ymin))


def file_bounds_intersect(lower: bytes, upper: bytes,
                          bbox: Envelope) -> bool:
    """File-level test against spec bound points. Geography bounds may
    wrap the antimeridian (lower.x > upper.x): the x-range is then the
    union [lower.x, 180] ∪ [-180, upper.x], checked piecewise."""
    lx, ly = parse_point(lower)
    ux, uy = parse_point(upper)
    xmin, ymin, xmax, ymax = bbox
    if ly > ymax or uy < ymin:
        return False
    if lx <= ux:
        return lx <= xmax and ux >= xmin
    return (lx <= xmax) or (xmin <= ux)
