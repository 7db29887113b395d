"""Literal values, the Iceberg single-value binary serde, and casts.

Capability parity with the reference's ``Literal`` (expression/literal.h:
39-167), spec single-value serialization (literal.cc:311-323,
util/conversions.cc:100-140 — little-endian numerics, UTF-8 strings,
big-endian unscaled decimals) and the cast matrix with AboveMax/BelowMin
range sentinels (literal.cc:509-557). The binary serde decodes manifest
``lower_bounds``/``upper_bounds``; Spark has no equivalent, so it is
hand-written with ``struct``.
"""

from __future__ import annotations

import datetime as dt
import struct
import uuid as uuid_mod
from decimal import Decimal
from typing import Any, Optional

from iceberg_cpp_spark.core import types as it

EPOCH_DATE = dt.date(1970, 1, 1)
EPOCH_DT = dt.datetime(1970, 1, 1)


class _Sentinel:
    """Range sentinels for cast overflow (literal.h BelowMin/AboveMax)."""

    def __init__(self, name: str):
        self.name = name

    def __repr__(self) -> str:
        return self.name


BELOW_MIN = _Sentinel("BelowMin")
ABOVE_MAX = _Sentinel("AboveMax")

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1
INT64_MIN, INT64_MAX = -(2**63), 2**63 - 1


# --------------------------------------------------------------------------
# Single-value binary serde (Iceberg spec Appendix D; conversions.cc)
# --------------------------------------------------------------------------

def to_bytes(value: Any, t: it.IcebergType) -> bytes:
    """Serialize a python value per the Iceberg single-value spec."""
    if isinstance(t, it.BooleanType):
        return b"\x01" if value else b"\x00"
    if isinstance(t, it.IntegerType):
        return struct.pack("<i", int(value))
    if isinstance(t, (it.LongType, it.TimeType, it.TimestampNsType,
                      it.TimestampTzNsType)):
        return struct.pack("<q", int(value))
    if isinstance(t, it.FloatType):
        return struct.pack("<f", float(value))
    if isinstance(t, it.DoubleType):
        return struct.pack("<d", float(value))
    if isinstance(t, it.DateType):
        days = value if isinstance(value, int) else (value - EPOCH_DATE).days
        return struct.pack("<i", days)
    if isinstance(t, (it.TimestampType, it.TimestampTzType)):
        return struct.pack("<q", _to_micros(value))
    if isinstance(t, it.StringType):
        return str(value).encode("utf-8")
    if isinstance(t, it.UuidType):
        u = value if isinstance(value, uuid_mod.UUID) else uuid_mod.UUID(str(value))
        return u.bytes
    if isinstance(t, (it.BinaryType, it.FixedType, it.GeometryType,
                      it.GeographyType)):
        return bytes(value)  # geo: WKB (bounds are WKB points)
    if isinstance(t, it.DecimalType):
        unscaled = int(Decimal(value).scaleb(t.scale).to_integral_value())
        return _minimal_big_endian(unscaled)
    raise ValueError(f"cannot serialize {t!r}")


def from_bytes(data: bytes, t: it.IcebergType) -> Any:
    """Decode a single-value buffer (e.g. manifest lower/upper bounds)."""
    if data is None:
        return None
    data = bytes(data)
    if isinstance(t, it.BooleanType):
        return data != b"\x00"
    if isinstance(t, it.IntegerType):
        return struct.unpack("<i", data)[0]
    if isinstance(t, (it.LongType, it.TimeType, it.TimestampNsType,
                      it.TimestampTzNsType)):
        # 4-byte buffer: a bound written before an int→long promotion
        # (manifests keep the write-time encoding; decode by length)
        if len(data) == 4:
            return struct.unpack("<i", data)[0]
        return struct.unpack("<q", data)[0]
    if isinstance(t, it.FloatType):
        return struct.unpack("<f", data)[0]
    if isinstance(t, it.DoubleType):
        if len(data) == 4:  # float→double promotion (see above)
            return struct.unpack("<f", data)[0]
        return struct.unpack("<d", data)[0]
    if isinstance(t, it.DateType):
        return struct.unpack("<i", data)[0]
    if isinstance(t, (it.TimestampType, it.TimestampTzType)):
        return struct.unpack("<q", data)[0]
    if isinstance(t, it.StringType):
        return data.decode("utf-8")
    if isinstance(t, it.UuidType):
        return uuid_mod.UUID(bytes=data)
    if isinstance(t, (it.BinaryType, it.FixedType, it.GeometryType,
                      it.GeographyType)):
        return data
    if isinstance(t, it.DecimalType):
        unscaled = int.from_bytes(data, "big", signed=True)
        return Decimal(unscaled).scaleb(-t.scale)
    raise ValueError(f"cannot deserialize {t!r}")


def _minimal_big_endian(v: int) -> bytes:
    """Minimal two's-complement big-endian bytes (decimal encoding)."""
    length = max(1, (v.bit_length() + 8) // 8)
    return v.to_bytes(length, "big", signed=True)


def _to_micros(value: Any) -> int:
    if isinstance(value, int):
        return value
    if isinstance(value, dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(dt.timezone.utc).replace(tzinfo=None)
        delta = value - EPOCH_DT
        return delta.days * 86_400_000_000 + delta.seconds * 1_000_000 + delta.microseconds
    raise ValueError(f"cannot convert to micros: {value!r}")


def to_comparable(value: Any, t: it.IcebergType) -> Any:
    """Normalize a python value for three-way comparison against decoded
    bounds (dates→days, timestamps→µs)."""
    if value is None:
        return None
    if isinstance(t, it.DateType) and isinstance(value, dt.date) and not isinstance(value, dt.datetime):
        return (value - EPOCH_DATE).days
    if isinstance(t, (it.TimestampType, it.TimestampTzType)):
        return _to_micros(value)
    if isinstance(t, it.DecimalType):
        return Decimal(value)
    return value


# --------------------------------------------------------------------------
# Cast matrix (literal.cc:509-557) — widening + overflow sentinels
# --------------------------------------------------------------------------

def cast(value: Any, src: it.IcebergType, dst: it.IcebergType) -> Any:
    """Cast a literal to ``dst``; returns BELOW_MIN/ABOVE_MAX on overflow,
    None when the cast is unsupported, the value when src == dst."""
    if value is None or src == dst:
        return value
    if isinstance(src, it.IntegerType):
        if isinstance(dst, it.LongType):
            return int(value)
        if isinstance(dst, (it.FloatType, it.DoubleType)):
            return float(value)
        if isinstance(dst, it.DateType):
            return int(value)
        if isinstance(dst, it.DecimalType):
            return Decimal(int(value)).quantize(Decimal(1).scaleb(-dst.scale))
    if isinstance(src, it.LongType):
        if isinstance(dst, it.IntegerType):
            v = int(value)
            if v < INT32_MIN:
                return BELOW_MIN
            if v > INT32_MAX:
                return ABOVE_MAX
            return v
        if isinstance(dst, (it.FloatType, it.DoubleType)):
            return float(value)
        if isinstance(dst, (it.TimeType, it.TimestampType, it.TimestampTzType,
                            it.TimestampNsType, it.TimestampTzNsType)):
            return int(value)
        if isinstance(dst, it.DecimalType):
            return Decimal(int(value)).quantize(Decimal(1).scaleb(-dst.scale))
    if isinstance(src, it.FloatType) and isinstance(dst, it.DoubleType):
        return float(value)
    if isinstance(src, it.DoubleType) and isinstance(dst, it.FloatType):
        f32_max = struct.unpack("<f", b"\xff\xff\x7f\x7f")[0]
        v = float(value)
        if v < -f32_max:
            return BELOW_MIN
        if v > f32_max:
            return ABOVE_MAX
        return struct.unpack("<f", struct.pack("<f", v))[0]
    if isinstance(src, it.StringType):
        s = str(value)
        if isinstance(dst, it.DateType):
            return (dt.date.fromisoformat(s) - EPOCH_DATE).days
        if isinstance(dst, (it.TimestampType, it.TimestampTzType)):
            return _to_micros(dt.datetime.fromisoformat(s))
        if isinstance(dst, it.UuidType):
            return uuid_mod.UUID(s)
        if isinstance(dst, it.DecimalType):
            return Decimal(s)
    if isinstance(src, it.DateType) and isinstance(dst, (it.TimestampType, it.TimestampTzType)):
        days = value if isinstance(value, int) else (value - EPOCH_DATE).days
        return days * 86_400_000_000
    if isinstance(src, it.DecimalType) and isinstance(dst, it.DecimalType):
        if src.scale == dst.scale:
            return value
        return None
    return None
