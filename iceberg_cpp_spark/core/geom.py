"""Exact planar geometry predicates over WKB values.

Completes the v3 geospatial surface (the reference's type enum stops at
v2 — type_fwd.h:34-35; core/wkb.py carries the envelope machinery):
``st_intersects`` with a WKB polygon literal evaluates EXACT
intersection semantics (PostGIS ``ST_Intersects``: boundary-inclusive)
instead of the envelope approximation, behind the same file-pruning
front end (the query polygon's envelope prunes files; only surviving
rows reach the exact kernel).

Scale shape: the kernel is Arrow-batch vectorized. Point columns — the
overwhelmingly common case — run a numpy crossing-number test over the
whole batch per polygon edge (no per-row Python). Non-point rows fall
back to a per-row edge/vertex test that still short-circuits through a
numpy envelope prefilter, so only envelope-hitting rows pay for exact
math. Query polygons are parsed ONCE per batch.

Geometry support: query literal = POLYGON / MULTIPOLYGON (with holes,
even-odd rule). Column values = any WKB kind core/wkb.py walks (point,
linestring, polygon, multi*, collections).
"""

from __future__ import annotations

import struct
from typing import Optional, Sequence

import numpy as np

from iceberg_cpp_spark.core import wkb

# part kinds for parsed column geometries
_PT, _LINE, _POLY = 0, 1, 2


# ------------------------------------------------------------- WKB parsing

def _read_ring(mv: memoryview, off: int, n: int, ndim: int,
               endian: str) -> tuple[np.ndarray, int]:
    dt = np.dtype("<f8" if endian == "<" else ">f8")
    arr = np.frombuffer(mv, dtype=dt, count=n * ndim, offset=off)
    return np.ascontiguousarray(arr.reshape(n, ndim)[:, :2],
                                dtype=np.float64), off + 8 * ndim * n


def parse_parts(b: bytes) -> list[tuple[int, object]]:
    """WKB → flat list of (kind, payload): payload is an (x, y) tuple
    for points, an (n, 2) array for linestrings, a list of ring arrays
    for polygons (ring 0 = exterior, rest = holes). Collections and
    multi-geometries flatten."""
    out: list[tuple[int, object]] = []
    _parse_into(memoryview(b), 0, out)
    return out


def _parse_into(mv: memoryview, off: int, out: list) -> int:
    endian = "<" if mv[off] == 1 else ">"
    (code,) = struct.unpack_from(f"{endian}I", mv, off + 1)
    kind, ndim, off = wkb._dims(code, off + 5)
    if kind == wkb.POINT:
        x, y = struct.unpack_from(f"{endian}dd", mv, off)
        if not (np.isnan(x) or np.isnan(y)):
            out.append((_PT, (x, y)))
        return off + 8 * ndim
    if kind == wkb.LINESTRING:
        (n,) = struct.unpack_from(f"{endian}I", mv, off)
        ring, off = _read_ring(mv, off + 4, n, ndim, endian)
        if n:
            out.append((_LINE, ring))
        return off
    if kind == wkb.POLYGON:
        (nrings,) = struct.unpack_from(f"{endian}I", mv, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(f"{endian}I", mv, off)
            ring, off = _read_ring(mv, off + 4, n, ndim, endian)
            rings.append(ring)
        if rings and len(rings[0]):
            out.append((_POLY, rings))
        return off
    if kind in (wkb.MULTIPOINT, wkb.MULTILINESTRING, wkb.MULTIPOLYGON,
                wkb.GEOMETRYCOLLECTION):
        (n,) = struct.unpack_from(f"{endian}I", mv, off)
        off += 4
        for _ in range(n):
            off = _parse_into(mv, off, out)
        return off
    raise ValueError(f"unsupported WKB geometry kind: {kind}")


def parse_query_polygons(b: bytes) -> list[list[np.ndarray]]:
    """Query literal → list of polygons (each a list of rings). Raises
    on non-areal query geometries — exact st_intersects takes a POLYGON
    or MULTIPOLYGON literal."""
    polys = [p for k, p in parse_parts(bytes(b)) if k == _POLY]
    if not polys:
        raise ValueError(
            "st_intersects exact literal must be a WKB POLYGON or "
            "MULTIPOLYGON")
    return polys


# ----------------------------------------------------------- point kernels

def _on_segments(px: np.ndarray, py: np.ndarray, x1, y1, x2, y2) -> np.ndarray:
    """Vectorized: is each point exactly on segment (x1,y1)-(x2,y2)?"""
    cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    within = ((px >= min(x1, x2)) & (px <= max(x1, x2))
              & (py >= min(y1, y2)) & (py <= max(y1, y2)))
    return (cross == 0.0) & within


def points_in_rings(px: np.ndarray, py: np.ndarray,
                    rings: Sequence[np.ndarray]) -> np.ndarray:
    """Boundary-inclusive even-odd test of many points against one
    polygon's rings (exterior + holes): crossing-number parity XORed
    across rings (a hole flips parity back out), boundary points always
    inside (PostGIS ST_Intersects semantics). Vectorized over points,
    looped over edges."""
    inside = np.zeros(len(px), dtype=bool)
    boundary = np.zeros(len(px), dtype=bool)
    for ring in rings:
        xs, ys = ring[:, 0], ring[:, 1]
        n = len(ring)
        for i in range(n - 1):
            x1, y1, x2, y2 = xs[i], ys[i], xs[i + 1], ys[i + 1]
            boundary |= _on_segments(px, py, x1, y1, x2, y2)
            if y1 == y2:
                continue
            crosses = ((y1 > py) != (y2 > py)) & (
                px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)
            inside ^= crosses
        # unclosed rings (tolerated by some writers): close implicitly
        if n > 1 and (xs[0] != xs[-1] or ys[0] != ys[-1]):
            x1, y1, x2, y2 = xs[-1], ys[-1], xs[0], ys[0]
            boundary |= _on_segments(px, py, x1, y1, x2, y2)
            if y1 != y2:
                inside ^= ((y1 > py) != (y2 > py)) & (
                    px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)
    return inside | boundary


def points_in_polygons(px: np.ndarray, py: np.ndarray,
                       polys: Sequence[Sequence[np.ndarray]]) -> np.ndarray:
    hit = np.zeros(len(px), dtype=bool)
    for rings in polys:
        miss = ~hit
        if not miss.any():
            break
        hit[miss] |= points_in_rings(px[miss], py[miss], rings)
    return hit


# --------------------------------------------------------- segment kernels

def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _segs_cross(a0, a1, b0, b1) -> bool:
    """Exact segment intersection incl. collinear overlap and endpoint
    touches (boundary-inclusive)."""
    d1 = _orient(b0[0], b0[1], b1[0], b1[1], a0[0], a0[1])
    d2 = _orient(b0[0], b0[1], b1[0], b1[1], a1[0], a1[1])
    d3 = _orient(a0[0], a0[1], a1[0], a1[1], b0[0], b0[1])
    d4 = _orient(a0[0], a0[1], a1[0], a1[1], b1[0], b1[1])
    if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
            and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0):
        return True

    def on(p, q, r):  # r collinear with pq: does r lie on pq?
        return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))

    if d1 == 0 and on(b0, b1, a0):
        return True
    if d2 == 0 and on(b0, b1, a1):
        return True
    if d3 == 0 and on(a0, a1, b0):
        return True
    if d4 == 0 and on(a0, a1, b1):
        return True
    return False


def _edges(coords: np.ndarray):
    for i in range(len(coords) - 1):
        yield coords[i], coords[i + 1]
    if len(coords) > 1 and (coords[0][0] != coords[-1][0]
                            or coords[0][1] != coords[-1][1]):
        yield coords[-1], coords[0]


def _line_edges(coords: np.ndarray):
    for i in range(len(coords) - 1):
        yield coords[i], coords[i + 1]


def _any_edge_crosses(coords_a, close_a: bool, polys) -> bool:
    gen_a = _edges(coords_a) if close_a else _line_edges(coords_a)
    edges_a = list(gen_a)
    for rings in polys:
        for ring in rings:
            for e0, e1 in _edges(ring):
                for a0, a1 in edges_a:
                    if _segs_cross(a0, a1, e0, e1):
                        return True
    return False


# ------------------------------------------------------------ row kernels

def part_intersects_polygons(kind: int, payload, polys) -> bool:
    """One parsed column-geometry part vs the query polygons — exact,
    boundary-inclusive."""
    if kind == _PT:
        x, y = payload
        return bool(points_in_polygons(np.array([x]), np.array([y]),
                                       polys)[0])
    if kind == _LINE:
        coords = payload
        if points_in_polygons(coords[:, 0], coords[:, 1], polys).any():
            return True
        return _any_edge_crosses(coords, False, polys)
    # polygon: any of its vertices in the query, any query vertex in
    # it (containment without edge contact), or any edge crossing
    rings = payload
    ext = rings[0]
    if points_in_polygons(ext[:, 0], ext[:, 1], polys).any():
        return True
    for qrings in polys:
        q = qrings[0]
        if points_in_rings(q[:, 0], q[:, 1], rings).any():
            return True
    return _any_edge_crosses(ext, True, polys) or any(
        _any_edge_crosses(hole, True, polys) for hole in rings[1:])


def wkb_intersects_polygons(b: bytes, polys) -> bool:
    return any(part_intersects_polygons(k, p, polys)
               for k, p in parse_parts(b))


# ------------------------------------------------------------ batch entry

def _query_envelope(polys) -> tuple[float, float, float, float]:
    xs = np.concatenate([r[:, 0] for rings in polys for r in rings])
    ys = np.concatenate([r[:, 1] for rings in polys for r in rings])
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def intersects_exact_mask(values: Sequence[Optional[bytes]],
                          query_wkb: bytes) -> np.ndarray:
    """Batch exact st_intersects: (n,) bool array (False for
    null/empty rows — the caller layers SQL null semantics on top).

    Point batches run fully vectorized; mixed batches envelope-prefilter
    with ``wkb.envelopes_np`` and only envelope-hitting rows pay the
    per-row exact kernel."""
    polys = parse_query_polygons(query_wkb)
    n = len(values)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    envs = wkb.envelopes_np(values)
    qxmin, qymin, qxmax, qymax = _query_envelope(polys)
    cand = (~np.isnan(envs[:, 0])
            & (envs[:, 0] <= qxmax) & (envs[:, 2] >= qxmin)
            & (envs[:, 1] <= qymax) & (envs[:, 3] >= qymin))
    if not cand.any():
        return out
    # vectorized path: candidate rows that are plain 2D points (their
    # envelope is degenerate AND the buffer is a point record)
    idx = np.flatnonzero(cand)
    pts_mask = np.zeros(len(idx), dtype=bool)
    for j, i in enumerate(idx):
        v = values[i]
        if (len(v) == wkb._POINT2D_LEN
                and bytes(v[:5]) == wkb._POINT2D_HEADER):
            pts_mask[j] = True
    pt_idx = idx[pts_mask]
    if len(pt_idx):
        px = envs[pt_idx, 0]
        py = envs[pt_idx, 1]
        out[pt_idx] = points_in_polygons(px, py, polys)
    for i in idx[~pts_mask]:
        out[i] = wkb_intersects_polygons(bytes(values[i]), polys)
    return out


def polygon_wkb(exterior: Sequence[tuple[float, float]],
                holes: Sequence[Sequence[tuple[float, float]]] = ()) -> bytes:
    """Little-endian WKB POLYGON from coordinate sequences (rings are
    closed automatically) — the ergonomic way to build exact
    st_intersects literals."""
    def ring(coords):
        pts = list(coords)
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        return struct.pack("<I", len(pts)) + b"".join(
            struct.pack("<dd", float(x), float(y)) for x, y in pts)

    rings = [ring(exterior)] + [ring(h) for h in holes]
    return (struct.pack("<BI", 1, wkb.POLYGON)
            + struct.pack("<I", len(rings)) + b"".join(rings))
