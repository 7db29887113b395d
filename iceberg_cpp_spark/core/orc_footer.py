"""Pure-Python ORC footer statistics reader.

The reference declares ORC as a first-class data format (file_format.h
enumerates it) and its write-side ``Metrics`` contract
(metrics.h:33-42) is format-agnostic — but pyarrow.orc exposes no
column statistics, so ``collect_orc_metrics`` previously harvested
counts + sizes only, leaving min/max file pruning inert on ORC-written
tables. This module reads the ORC PostScript + Footer protobufs
directly (a tail read of a few KB — no data stripes touched, the same
cost model as the parquet footer harvest) and surfaces per-column
``ColumnStatistics`` so DataFile entries carry real lower/upper bounds.

Layout (ORC spec v1): ``... stripes ... | metadata | footer |
postscript | 1-byte postscript length``. The postscript is always
uncompressed protobuf; the footer is chunk-framed with the file's
codec (NONE / ZLIB raw-deflate via stdlib; SNAPPY / ZSTD / LZ4 via
pyarrow codecs when decodable). When the footer cannot be decoded the
caller falls back to counts-only metrics — pruning stays conservative,
never wrong.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Any, Iterator, Optional

_MAGIC = b"ORC"

# PostScript.compression enum
_COMP_NONE, _COMP_ZLIB, _COMP_SNAPPY, _COMP_LZO, _COMP_LZ4, _COMP_ZSTD = range(6)

# Type.kind enum (orc_proto.proto)
K_BOOLEAN, K_BYTE, K_SHORT, K_INT, K_LONG, K_FLOAT, K_DOUBLE, K_STRING, \
    K_BINARY, K_TIMESTAMP, K_LIST, K_MAP, K_STRUCT, K_UNION, K_DECIMAL, \
    K_DATE, K_VARCHAR, K_CHAR, K_TIMESTAMP_INSTANT = range(19)


# ---------------------------------------------------------------- protobuf

def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _fields(buf: bytes) -> Iterator[tuple[int, int, Any]]:
    """Yield (field_number, wire_type, value) for one protobuf message.
    Length-delimited values come back as raw bytes; varints as ints;
    fixed32/64 as raw 4/8-byte slices."""
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _varint(buf, pos)
        elif wt == 1:
            v, pos = buf[pos:pos + 8], pos + 8
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            v, pos = buf[pos:pos + ln], pos + ln
        elif wt == 5:
            v, pos = buf[pos:pos + 4], pos + 4
        else:  # groups (3/4) never appear in ORC protos
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _packed_varints(buf: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(buf):
        v, pos = _varint(buf, pos)
        out.append(v)
    return out


# ---------------------------------------------------------------- framing

def _decompress(data: bytes, kind: int, block: int) -> bytes:
    """Un-frame an ORC compressed stream: repeated [3-byte LE header =
    chunkLen*2 + isOriginal][chunk]. ZLIB chunks are raw deflate."""
    if kind == _COMP_NONE:
        return data
    out, pos, n = [], 0, len(data)
    codec = None
    if kind != _COMP_ZLIB:
        import pyarrow as pa

        name = {_COMP_SNAPPY: "snappy", _COMP_LZ4: "lz4_raw",
                _COMP_ZSTD: "zstd"}.get(kind)
        if name is None:
            raise ValueError(f"unsupported ORC compression kind {kind}")
        codec = pa.Codec(name)
    while pos + 3 <= n:
        header = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        ln, original = header >> 1, header & 1
        chunk = data[pos:pos + ln]
        pos += ln
        if original:
            out.append(chunk)
        elif kind == _COMP_ZLIB:
            out.append(zlib.decompressobj(-15).decompress(chunk))
        elif kind == _COMP_ZSTD:
            # zstd frames embed the content size, but pyarrow's
            # one-shot decompress demands an EXACT size — stream instead
            import pyarrow as pa

            out.append(pa.input_stream(pa.py_buffer(chunk),
                                       compression="zstd").read())
        else:
            out.append(codec.decompress(chunk, block))
    return b"".join(out)


# ---------------------------------------------------------------- messages

class OrcType:
    __slots__ = ("kind", "subtypes", "field_names", "precision", "scale")

    def __init__(self) -> None:
        self.kind = K_STRUCT
        self.subtypes: list[int] = []
        self.field_names: list[str] = []
        self.precision = self.scale = 0


def _parse_type(buf: bytes) -> OrcType:
    t = OrcType()
    for fno, wt, v in _fields(buf):
        if fno == 1:
            t.kind = v
        elif fno == 2:
            t.subtypes.extend(_packed_varints(v) if wt == 2 else [v])
        elif fno == 3:
            t.field_names.append(v.decode("utf-8"))
        elif fno == 5:
            t.precision = v
        elif fno == 6:
            t.scale = v
    return t


class OrcColumnStats:
    __slots__ = ("number_of_values", "has_null", "bytes_on_disk",
                 "int_min", "int_max", "dbl_min", "dbl_max",
                 "str_min", "str_max", "dec_min", "dec_max",
                 "date_min", "date_max", "ts_min_utc", "ts_max_utc",
                 "ts_min_nanos", "ts_max_nanos", "true_count")

    def __init__(self) -> None:
        for s in self.__slots__:
            setattr(self, s, None)


def _parse_stats(buf: bytes) -> OrcColumnStats:
    st = OrcColumnStats()
    for fno, wt, v in _fields(buf):
        if fno == 1:
            st.number_of_values = v
        elif fno == 2:  # IntegerStatistics {sint64 min=1, max=2}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    st.int_min = _zigzag(v2)
                elif f2 == 2:
                    st.int_max = _zigzag(v2)
        elif fno == 3:  # DoubleStatistics {double min=1, max=2}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    st.dbl_min = struct.unpack("<d", v2)[0]
                elif f2 == 2:
                    st.dbl_max = struct.unpack("<d", v2)[0]
        elif fno == 4:  # StringStatistics {string min=1, max=2}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    st.str_min = v2.decode("utf-8", errors="replace")
                elif f2 == 2:
                    st.str_max = v2.decode("utf-8", errors="replace")
        elif fno == 5:  # BucketStatistics {repeated uint64 count=1}
            for f2, w2, v2 in _fields(v):
                if f2 == 1:
                    counts = _packed_varints(v2) if w2 == 2 else [v2]
                    if counts:
                        st.true_count = counts[0]
        elif fno == 6:  # DecimalStatistics {string min=1, max=2}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    st.dec_min = v2.decode()
                elif f2 == 2:
                    st.dec_max = v2.decode()
        elif fno == 7:  # DateStatistics {sint32 min=1, max=2} (epoch days)
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    st.date_min = _zigzag(v2)
                elif f2 == 2:
                    st.date_max = _zigzag(v2)
        elif fno == 9:  # TimestampStatistics (UTC millis + ns remainder)
            for f2, _w2, v2 in _fields(v):
                if f2 == 3:
                    st.ts_min_utc = _zigzag(v2)
                elif f2 == 4:
                    st.ts_max_utc = _zigzag(v2)
                elif f2 == 5:
                    st.ts_min_nanos = v2
                elif f2 == 6:
                    st.ts_max_nanos = v2
        elif fno == 10:
            st.has_null = bool(v)
        elif fno == 11:
            st.bytes_on_disk = v
    return st


class OrcFooter:
    __slots__ = ("number_of_rows", "types", "statistics")

    def __init__(self) -> None:
        self.number_of_rows = 0
        self.types: list[OrcType] = []
        self.statistics: list[OrcColumnStats] = []


def read_footer(path: str) -> OrcFooter:
    """Tail-read one ORC file's PostScript + Footer. Raises on files
    this parser can't decode (unknown codec, truncated tail) — callers
    catch and fall back to counts-only metrics."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        tail_len = min(size, 256 * 1024)
        f.seek(size - tail_len)
        tail = f.read(tail_len)
        ps_len = tail[-1]
        ps = tail[-1 - ps_len:-1]
        footer_len = compression = block = 0
        for fno, _wt, v in _fields(ps):
            if fno == 1:
                footer_len = v
            elif fno == 2:
                compression = v
            elif fno == 3:
                block = v
            elif fno == 8000 and bytes(v) != _MAGIC:
                raise ValueError(f"not an ORC file: {path}")
        need = footer_len + ps_len + 1
        if need > tail_len:
            f.seek(size - need)
            tail = f.read(need)
        raw = tail[-(1 + ps_len + footer_len):-(1 + ps_len)]
    buf = _decompress(raw, compression, block or 262144)
    out = OrcFooter()
    for fno, _wt, v in _fields(buf):
        if fno == 4:
            out.types.append(_parse_type(v))
        elif fno == 6:
            out.number_of_rows = v
        elif fno == 7:
            out.statistics.append(_parse_stats(v))
    if not out.types:
        raise ValueError(f"ORC footer carries no type tree: {path}")
    return out


def column_ids(types: list[OrcType]) -> dict[str, int]:
    """Dotted column path → ORC type id (pre-order flattened tree; root
    struct is id 0). Only struct-reachable leaves are mapped — list/map
    subtrees get no bounds, matching the parquet harvest's field map."""
    out: dict[str, int] = {}

    def walk(tid: int, prefix: str) -> None:
        t = types[tid]
        if t.kind != K_STRUCT:
            return
        for name, sub in zip(t.field_names, t.subtypes):
            child = types[sub]
            full = prefix + name
            if child.kind == K_STRUCT:
                walk(sub, full + ".")
            else:
                out[full] = sub

    walk(0, "")
    return out


def stat_bounds(st: OrcColumnStats, t: Any) -> tuple[Optional[Any], Optional[Any]]:
    """One column's (lower, upper) as python values in the shape
    ``literals.to_bytes`` expects for Iceberg type ``t``, or (None,
    None) when ORC tracks no usable bound for the type.

    Timestamps: ORC statistics store UTC epoch millis with an optional
    nanosecond remainder (ORC-611). The remainder fields aren't written
    by every writer, so bounds are widened to the enclosing
    millisecond: lower = floor-to-ms, upper = floor-to-ms + 1ms. Both
    stay valid inclusive bounds — pruning keeps at most one extra
    boundary file and never drops a matching one."""
    from iceberg_cpp_spark.core import types as it

    if isinstance(t, (it.IntegerType, it.LongType)):
        return st.int_min, st.int_max
    if isinstance(t, (it.FloatType, it.DoubleType)):
        return st.dbl_min, st.dbl_max
    if isinstance(t, it.StringType):
        return st.str_min, st.str_max
    if isinstance(t, it.DecimalType):
        if st.dec_min is None or st.dec_max is None:
            return None, None
        from decimal import Decimal

        return Decimal(st.dec_min), Decimal(st.dec_max)
    if isinstance(t, it.DateType):
        return st.date_min, st.date_max
    if isinstance(t, it.BooleanType):
        if st.true_count is None or not st.number_of_values:
            return None, None
        return st.true_count >= st.number_of_values, st.true_count > 0
    if isinstance(t, (it.TimestampType, it.TimestampTzType)):
        if st.ts_min_utc is None or st.ts_max_utc is None:
            return None, None
        lo = st.ts_min_utc * 1000
        hi = (st.ts_max_utc + 1) * 1000
        if st.ts_min_nanos is not None and st.ts_max_nanos is not None:
            # exact micros when the writer recorded the ns remainder
            # (spec stores remainder + 1)
            lo = st.ts_min_utc * 1000 + (st.ts_min_nanos - 1) // 1000
            hi = st.ts_max_utc * 1000 + -(-(st.ts_max_nanos - 1) // 1000)
        return lo, hi
    if isinstance(t, (it.TimestampNsType, it.TimestampTzNsType)):
        if st.ts_min_utc is None or st.ts_max_utc is None:
            return None, None
        lo = st.ts_min_utc * 1_000_000
        hi = (st.ts_max_utc + 1) * 1_000_000
        if st.ts_min_nanos is not None and st.ts_max_nanos is not None:
            lo = st.ts_min_utc * 1_000_000 + st.ts_min_nanos - 1
            hi = st.ts_max_utc * 1_000_000 + st.ts_max_nanos - 1
        return lo, hi
    return None, None  # binary/uuid/fixed/geo: ORC keeps no min/max
