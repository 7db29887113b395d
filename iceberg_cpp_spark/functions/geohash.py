"""Geohash encoding as pure JVM Column arithmetic.

Geospatial columns cannot be partition sources (v3 spec), so the way a
100 TB geo table gets PARTITION pruning is a derived cell column:
``geohash_column`` encodes (lon, lat) into the standard base32 geohash
entirely with Column math (quantize → bit-interleave → base32 chars —
the z-order bit trick, no UDF), a table partitions by
``truncate(p, geohash)``, and ``geohash_covers`` turns a query bbox
into the prefix cover set that prunes partitions before
``st_intersects`` touches a row.

Standard geohash layout (public spec): bits alternate lon, lat,
starting with LONGITUDE; each base32 char encodes 5 bits with alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_PRECISION = 12  # 60 bits — fits a long


def _bit_counts(precision: int) -> tuple[int, int, int]:
    bits = 5 * precision
    lon_bits = (bits + 1) // 2  # longitude first → gets the extra bit
    lat_bits = bits // 2
    return bits, lon_bits, lat_bits


def geohash_column(lon: Column, lat: Column, precision: int = 7) -> Column:
    """Base32 geohash of (lon, lat) at ``precision`` chars — pure JVM
    Column arithmetic (whole-stage-codegen friendly; null in → null
    out). Out-of-range coordinates are clamped to the valid domain."""
    if not (1 <= precision <= MAX_PRECISION):
        raise ValueError(f"precision must be in [1, {MAX_PRECISION}]")
    bits, lon_bits, lat_bits = _bit_counts(precision)
    lon_c = F.least(F.greatest(lon.cast("double"), F.lit(-180.0)),
                    F.lit(179.9999999))
    lat_c = F.least(F.greatest(lat.cast("double"), F.lit(-90.0)),
                    F.lit(89.9999999))
    lon_q = F.floor((lon_c + 180.0) / 360.0 * (1 << lon_bits)).cast("long")
    lat_q = F.floor((lat_c + 90.0) / 180.0 * (1 << lat_bits)).cast("long")
    # interleave: geohash bit i (MSB-first) comes from lon when i is
    # even, lat when odd; source bit index descends from its width
    z = F.lit(0).cast("long")
    for i in range(bits):
        if i % 2 == 0:
            src, src_bit = lon_q, lon_bits - 1 - (i // 2)
        else:
            src, src_bit = lat_q, lat_bits - 1 - (i // 2)
        z = z + (F.shiftright(src, src_bit).bitwiseAND(F.lit(1))
                 * F.lit(1 << (bits - 1 - i)))
    chars = [
        F.substring(F.lit(ALPHABET),
                    (F.shiftright(z, 5 * (precision - 1 - k))
                     .bitwiseAND(F.lit(31)) + 1).cast("int"), 1)
        for k in range(precision)
    ]
    out = F.concat(*chars)
    return F.when(lon.isNull() | lat.isNull(), F.lit(None)).otherwise(out)


def geohash_py(lon: float, lat: float, precision: int = 7) -> str:
    """Plain-Python reference encoder (tests + driver-side planning)."""
    bits, lon_bits, lat_bits = _bit_counts(precision)
    lon = min(max(lon, -180.0), 179.9999999)
    lat = min(max(lat, -90.0), 89.9999999)
    lon_q = int((lon + 180.0) / 360.0 * (1 << lon_bits))
    lat_q = int((lat + 90.0) / 180.0 * (1 << lat_bits))
    z = 0
    for i in range(bits):
        if i % 2 == 0:
            bit = (lon_q >> (lon_bits - 1 - i // 2)) & 1
        else:
            bit = (lat_q >> (lat_bits - 1 - i // 2)) & 1
        z = (z << 1) | bit
    return "".join(ALPHABET[(z >> (5 * (precision - 1 - k))) & 31]
                   for k in range(precision))


def geohash_bbox(gh: str) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) cell bounds of a geohash."""
    precision = len(gh)
    bits, lon_bits, lat_bits = _bit_counts(precision)
    z = 0
    for ch in gh:
        z = (z << 5) | ALPHABET.index(ch)
    lon_q = lat_q = 0
    for i in range(bits):
        bit = (z >> (bits - 1 - i)) & 1
        if i % 2 == 0:
            lon_q = (lon_q << 1) | bit
        else:
            lat_q = (lat_q << 1) | bit
    lon_w = 360.0 / (1 << lon_bits)
    lat_h = 180.0 / (1 << lat_bits)
    return (lon_q * lon_w - 180.0, lat_q * lat_h - 90.0,
            (lon_q + 1) * lon_w - 180.0, (lat_q + 1) * lat_h - 90.0)


def geohash_covers(bbox: tuple, precision: int,
                   max_cells: int = 1024) -> list[str]:
    """Geohash prefixes of length ``precision`` covering ``bbox``
    (lon_min, lat_min, lon_max, lat_max) — driver-side planning for
    partition pruning: ``F.substring(gh, 1, p).isin(covers)``. Raises
    when the cover exceeds ``max_cells`` (pick a coarser precision)."""
    xmin, ymin, xmax, ymax = (float(v) for v in bbox)
    _bits, lon_bits, lat_bits = _bit_counts(precision)
    lon_w = 360.0 / (1 << lon_bits)
    lat_h = 180.0 / (1 << lat_bits)
    import math

    x0 = max(0, int(math.floor((xmin + 180.0) / lon_w)))
    x1 = min((1 << lon_bits) - 1, int(math.floor((xmax + 180.0) / lon_w)))
    y0 = max(0, int(math.floor((ymin + 90.0) / lat_h)))
    y1 = min((1 << lat_bits) - 1, int(math.floor((ymax + 90.0) / lat_h)))
    n = (x1 - x0 + 1) * (y1 - y0 + 1)
    if n > max_cells:
        raise ValueError(
            f"bbox covers {n} geohash cells at precision {precision} "
            f"(> {max_cells}); use a coarser precision")
    out = []
    for xq in range(x0, x1 + 1):
        lon = xq * lon_w - 180.0 + lon_w / 2
        for yq in range(y0, y1 + 1):
            lat = yq * lat_h - 90.0 + lat_h / 2
            out.append(geohash_py(lon, lat, precision))
    return sorted(set(out))
