"""The 8 Iceberg partition transforms as Spark Column builders + python
value kernels.

Capability parity with the reference's transform family
(transform.h:150, transform_function.cc:37-259, util/bucket_util.cc,
util/truncate_util.cc, util/temporal_util.cc; result-type rules tested
in test/transform_test.cc:118-204). Each transform provides:

* ``spark_column(col, source_type)`` — a JVM-side Column expression
  wherever a builtin matches spec semantics exactly; pandas UDF (Arrow
  batched, numpy-vectorized) only for bucket and decimal-truncate where
  no builtin parity exists;
* ``pyvalue(v, source_type)`` — a driver-side scalar kernel used by the
  expression projector (inclusive projection of predicates onto
  partition values) and by tests;
* ``result_type(source_type)`` — bucket/year/month/day/hour → int,
  identity/truncate/void → source type;
* string parse/round-trip (``from_string`` — e.g. ``bucket[16]``).

All transforms map null → null. Sessions must run with
``spark.sql.session.timeZone=UTC`` (see session.py) so temporal
builtins agree with the spec's UTC-based math.
"""

from __future__ import annotations

import datetime as dt
import re
from decimal import Decimal
from typing import Any, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as ST
from pyspark.sql.functions import pandas_udf

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.core.literals import EPOCH_DATE, _minimal_big_endian, _to_micros
from iceberg_cpp_spark.functions import murmur3

MICROS_PER_HOUR = 3_600_000_000
MICROS_PER_DAY = 86_400_000_000

_TEMPORAL = (it.DateType, it.TimestampType, it.TimestampTzType,
             it.TimestampNsType, it.TimestampTzNsType)
_NS = (it.TimestampNsType, it.TimestampTzNsType)


def _unique_memo(series: "pd.Series", fn):
    """value → fn(value) computed once per DISTINCT non-null value in the
    batch. Turns per-row python hashing into per-distinct hashing — for
    key-like bucket columns the batch cardinality is far below its size."""
    memo = {v: fn(v) for v in series.dropna().unique()}

    def lookup(v):
        return None if v is None else memo[v]

    return lookup


def _is_ts(source_type: it.IcebergType) -> bool:
    return isinstance(source_type, (it.TimestampType, it.TimestampTzType))


class Transform:
    name: str = ""

    def result_type(self, source_type: it.IcebergType) -> it.IcebergType:
        raise NotImplementedError

    def can_transform(self, source_type: it.IcebergType) -> bool:
        raise NotImplementedError

    def spark_column(self, col: Column, source_type: it.IcebergType) -> Column:
        raise NotImplementedError

    def pyvalue(self, v: Any, source_type: it.IcebergType) -> Any:
        raise NotImplementedError

    @property
    def preserves_order(self) -> bool:
        """Order-preserving transforms admit range-predicate projection."""
        return False

    def __str__(self) -> str:
        return self.name

    def __repr__(self) -> str:
        return f"Transform({self.name})"

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Transform) and str(self) == str(other)

    def __hash__(self) -> int:
        return hash(str(self))


class IdentityTransform(Transform):
    name = "identity"

    def result_type(self, source_type):
        return source_type

    def can_transform(self, source_type):
        return True

    def spark_column(self, col, source_type):
        return col

    def pyvalue(self, v, source_type):
        return v

    @property
    def preserves_order(self):
        return True


class VoidTransform(Transform):
    """Always-null transform used to drop spec fields (transform_function.cc:245)."""

    name = "void"

    def result_type(self, source_type):
        return source_type

    def can_transform(self, source_type):
        return True

    def spark_column(self, col, source_type):
        from iceberg_cpp_spark.core.types import to_spark_type

        return F.lit(None).cast(to_spark_type(source_type))

    def pyvalue(self, v, source_type):
        return None


class BucketTransform(Transform):
    """``(murmur3_x86_32(encode(v)) & INT32_MAX) % N`` with spec encodings
    (bucket_util.cc:30-147): integral/temporal types as 8-byte LE longs,
    decimals as minimal big-endian unscaled bytes, strings as UTF-8,
    uuid/fixed/binary raw bytes."""

    def __init__(self, num_buckets: int):
        if num_buckets <= 0:
            raise ValueError(f"bucket count must be > 0: {num_buckets}")
        self.num_buckets = num_buckets
        self.name = f"bucket[{num_buckets}]"

    def result_type(self, source_type):
        return it.IntegerType()

    def can_transform(self, source_type):
        return isinstance(
            source_type,
            (it.IntegerType, it.LongType, it.DecimalType, it.DateType, it.TimeType,
             it.TimestampType, it.TimestampTzType, it.TimestampNsType,
             it.TimestampTzNsType, it.StringType, it.UuidType,
             it.FixedType, it.BinaryType),
        )

    def pyvalue(self, v, source_type):
        if v is None:
            return None
        h = self._hash(v, source_type)
        return (h & 0x7FFFFFFF) % self.num_buckets

    @staticmethod
    def _hash(v: Any, source_type: it.IcebergType) -> int:
        if isinstance(source_type, (it.IntegerType, it.LongType, it.TimeType)):
            return murmur3.hash_long(int(v))
        if isinstance(source_type, it.DateType):
            days = v if isinstance(v, int) else (v - EPOCH_DATE).days
            return murmur3.hash_long(days)
        if isinstance(source_type, (it.TimestampType, it.TimestampTzType)):
            return murmur3.hash_long(_to_micros(v))
        if isinstance(source_type, _NS):
            # spec Appendix B: timestamp_ns buckets by the MICROSECOND
            # value (floor division) so a ns and a µs column of the same
            # instant land in the same bucket
            return murmur3.hash_long(int(v) // 1000)
        if isinstance(source_type, it.StringType):
            return murmur3.hash_bytes(str(v).encode("utf-8"))
        if isinstance(source_type, it.UuidType):
            import uuid as uuid_mod

            u = v if isinstance(v, uuid_mod.UUID) else uuid_mod.UUID(str(v))
            return murmur3.hash_bytes(u.bytes)
        if isinstance(source_type, (it.BinaryType, it.FixedType)):
            return murmur3.hash_bytes(bytes(v))
        if isinstance(source_type, it.DecimalType):
            unscaled = int(Decimal(v).scaleb(source_type.scale).to_integral_value())
            return murmur3.hash_bytes(_minimal_big_endian(unscaled))
        raise ValueError(f"cannot bucket {source_type!r}")

    def spark_column(self, col, source_type):
        n = self.num_buckets
        if isinstance(source_type, (it.IntegerType, it.LongType, it.TimeType)
                      ) or isinstance(source_type, _NS):
            @pandas_udf(ST.IntegerType())
            def _bucket_long(s: pd.Series) -> pd.Series:
                mask = s.notna()
                out = pd.Series([None] * len(s), index=s.index, dtype=object)
                if mask.any():
                    h = murmur3.hash_longs_vectorized(s[mask].to_numpy(dtype=np.int64))
                    out[mask] = ((h.astype(np.int64) & 0x7FFFFFFF) % n).astype("int32")
                return out

            if isinstance(source_type, _NS):
                # spec Appendix B: ns timestamps bucket by the FLOOR-µs
                # value. Exact long floor-div via decimal (a double
                # division would corrupt int64 nanos past 2^53)
                return _bucket_long(
                    F.floor(col.cast("decimal(38,0)") / F.lit(1000))
                    .cast("long"))
            return _bucket_long(col.cast("long"))
        if isinstance(source_type, it.DateType):
            @pandas_udf(ST.IntegerType())
            def _bucket_date(s: pd.Series) -> pd.Series:
                mask = s.notna()
                out = pd.Series([None] * len(s), index=s.index, dtype=object)
                if mask.any():
                    days = (pd.to_datetime(s[mask]) - pd.Timestamp("1970-01-01")).dt.days
                    h = murmur3.hash_longs_vectorized(days.to_numpy(dtype=np.int64))
                    out[mask] = ((h.astype(np.int64) & 0x7FFFFFFF) % n).astype("int32")
                return out

            return _bucket_date(col)
        if _is_ts(source_type):
            # µs since epoch as long, then long path
            @pandas_udf(ST.IntegerType())
            def _bucket_micros(s: pd.Series) -> pd.Series:
                mask = s.notna()
                out = pd.Series([None] * len(s), index=s.index, dtype=object)
                if mask.any():
                    h = murmur3.hash_longs_vectorized(s[mask].to_numpy(dtype=np.int64))
                    out[mask] = ((h.astype(np.int64) & 0x7FFFFFFF) % n).astype("int32")
                return out

            # unix_micros works for TimestampType; NTZ is cast first (UTC session tz)
            micros = F.unix_micros(col.cast("timestamp"))
            return _bucket_micros(micros)
        if isinstance(source_type, it.StringType):
            @pandas_udf(ST.IntegerType())
            def _bucket_str(s: pd.Series) -> pd.Series:
                # hash each DISTINCT value once per batch, then map — the
                # variable-length murmur3 can't be numpy-vectorized, but
                # real bucket columns are keys with heavy repetition
                return s.map(_unique_memo(
                    s, lambda v: (murmur3.hash_bytes(v.encode("utf-8")) & 0x7FFFFFFF) % n))

            return _bucket_str(col)
        if isinstance(source_type, (it.BinaryType, it.FixedType, it.UuidType)):
            @pandas_udf(ST.IntegerType())
            def _bucket_bytes(s: pd.Series) -> pd.Series:
                return s.map(_unique_memo(
                    s, lambda v: (murmur3.hash_bytes(bytes(v)) & 0x7FFFFFFF) % n))

            if isinstance(source_type, it.UuidType):
                import uuid as uuid_mod

                @pandas_udf(ST.IntegerType())
                def _bucket_uuid(s: pd.Series) -> pd.Series:
                    return s.map(_unique_memo(
                        s, lambda v: (murmur3.hash_bytes(uuid_mod.UUID(v).bytes)
                                      & 0x7FFFFFFF) % n))

                return _bucket_uuid(col)
            return _bucket_bytes(col)
        if isinstance(source_type, it.DecimalType):
            scale = source_type.scale

            @pandas_udf(ST.IntegerType())
            def _bucket_dec(s: pd.Series) -> pd.Series:
                def one(v):
                    unscaled = int(Decimal(v).scaleb(scale).to_integral_value())
                    return (murmur3.hash_bytes(_minimal_big_endian(unscaled)) & 0x7FFFFFFF) % n

                return s.map(_unique_memo(s, one))

            return _bucket_dec(col)
        raise ValueError(f"cannot bucket {source_type!r}")


class TruncateTransform(Transform):
    """int/long: floor-to-width (v - ((v % W + W) % W)); decimal: same on
    unscaled; string: first W code points; binary: first W bytes
    (truncate_util.cc:33-107)."""

    def __init__(self, width: int):
        if width <= 0:
            raise ValueError(f"truncate width must be > 0: {width}")
        self.width = width
        self.name = f"truncate[{width}]"

    def result_type(self, source_type):
        return source_type

    def can_transform(self, source_type):
        return isinstance(
            source_type, (it.IntegerType, it.LongType, it.DecimalType, it.StringType, it.BinaryType)
        )

    @property
    def preserves_order(self):
        return True

    def pyvalue(self, v, source_type):
        if v is None:
            return None
        w = self.width
        if isinstance(source_type, (it.IntegerType, it.LongType)):
            return int(v) - (((int(v) % w) + w) % w)
        if isinstance(source_type, it.DecimalType):
            unscaled = int(Decimal(v).scaleb(source_type.scale).to_integral_value())
            truncated = unscaled - (((unscaled % w) + w) % w)
            return Decimal(truncated).scaleb(-source_type.scale)
        if isinstance(source_type, it.StringType):
            return str(v)[:w]  # python slicing is code-point based, like the spec
        if isinstance(source_type, it.BinaryType):
            return bytes(v)[:w]
        raise ValueError(f"cannot truncate {source_type!r}")

    def spark_column(self, col, source_type):
        w = self.width
        if isinstance(source_type, (it.IntegerType, it.LongType)):
            return col - F.pmod(col, F.lit(w))
        if isinstance(source_type, it.StringType):
            return F.substring(col, 1, w)  # code-point based, matches spec
        if isinstance(source_type, it.BinaryType):
            return F.substring(col, 1, w)  # spark substring slices binary by bytes
        if isinstance(source_type, it.DecimalType):
            scale = source_type.scale

            @pandas_udf(ST.DecimalType(source_type.precision, source_type.scale))
            def _trunc_dec(s: pd.Series) -> pd.Series:
                def one(v):
                    if v is None:
                        return None
                    unscaled = int(Decimal(v).scaleb(scale).to_integral_value())
                    t = unscaled - (((unscaled % w) + w) % w)
                    return Decimal(t).scaleb(-scale)

                return s.map(one)

            return _trunc_dec(col)
        raise ValueError(f"cannot truncate {source_type!r}")


class _TemporalTransform(Transform):
    def can_transform(self, source_type):
        if self.name == "hour":
            return _is_ts(source_type)
        return isinstance(source_type, _TEMPORAL)

    def result_type(self, source_type):
        return it.IntegerType()

    @property
    def preserves_order(self):
        return True

    @staticmethod
    def _as_date(v: Any) -> dt.date:
        if isinstance(v, dt.datetime):
            return v.date()
        if isinstance(v, dt.date):
            return v
        raise ValueError(f"not a date: {v!r}")

    def _pyvalue_parts(self, v: Any, source_type: it.IcebergType) -> tuple[int, int, int, int]:
        """→ (year, month, days_since_epoch, hours_since_epoch)."""
        if isinstance(source_type, it.DateType):
            days = v if isinstance(v, int) else (self._as_date(v) - EPOCH_DATE).days
            d = EPOCH_DATE + dt.timedelta(days=days)
            return d.year, d.month, days, 0
        if isinstance(source_type, _NS):
            micros = int(v) // 1000
        else:
            micros = _to_micros(v) if not isinstance(v, int) else v
        days = micros // MICROS_PER_DAY
        hours = micros // MICROS_PER_HOUR
        d = EPOCH_DATE + dt.timedelta(days=days)
        return d.year, d.month, days, hours


def _ns_to_ts(col: Column, source_type: it.IcebergType) -> Column:
    """v3 ns timestamps ride as long nanos; temporal transforms convert
    to a µs TimestampType column first (exact decimal floor-div — double
    division would corrupt int64 nanos past 2^53)."""
    if isinstance(source_type, _NS):
        return F.timestamp_micros(
            F.floor(col.cast("decimal(38,0)") / F.lit(1000)).cast("long"))
    return col


class YearTransform(_TemporalTransform):
    name = "year"

    def pyvalue(self, v, source_type):
        if v is None:
            return None
        y, _, _, _ = self._pyvalue_parts(v, source_type)
        return y - 1970

    def spark_column(self, col, source_type):
        col = _ns_to_ts(col, source_type)
        return (F.year(col) - F.lit(1970)).cast("int")


class MonthTransform(_TemporalTransform):
    name = "month"

    def pyvalue(self, v, source_type):
        if v is None:
            return None
        y, m, _, _ = self._pyvalue_parts(v, source_type)
        return (y - 1970) * 12 + (m - 1)

    def spark_column(self, col, source_type):
        col = _ns_to_ts(col, source_type)
        return ((F.year(col) - F.lit(1970)) * 12 + F.month(col) - F.lit(1)).cast("int")


class DayTransform(_TemporalTransform):
    name = "day"

    def pyvalue(self, v, source_type):
        if v is None:
            return None
        _, _, days, _ = self._pyvalue_parts(v, source_type)
        return days

    def spark_column(self, col, source_type):
        col = _ns_to_ts(col, source_type)
        return F.datediff(F.to_date(col), F.lit("1970-01-01")).cast("int")


class HourTransform(_TemporalTransform):
    name = "hour"

    def pyvalue(self, v, source_type):
        if v is None:
            return None
        _, _, _, hours = self._pyvalue_parts(v, source_type)
        return hours

    def spark_column(self, col, source_type):
        col = _ns_to_ts(col, source_type)
        return F.floor(F.unix_micros(col.cast("timestamp")) / F.lit(MICROS_PER_HOUR)).cast("int")


IDENTITY = IdentityTransform()
VOID = VoidTransform()
YEAR = YearTransform()
MONTH = MonthTransform()
DAY = DayTransform()
HOUR = HourTransform()

_PAT = re.compile(r"^(bucket|truncate)\[(\d+)\]$")


class UnknownTransform(Transform):
    """transform.h:41 kUnknown: a transform this engine doesn't know,
    parsed and carried losslessly (metadata written by another/newer
    engine must load), failing only if something tries to EVALUATE it.
    Result type is string, matching the Iceberg spec's rule for unknown
    transforms."""

    def __init__(self, name: str):
        self.name = name

    def result_type(self, source_type: it.IcebergType) -> it.IcebergType:
        return it.StringType()

    def can_transform(self, source_type: it.IcebergType) -> bool:
        return True  # carried, not evaluated

    def spark_column(self, col: Column, source_type: it.IcebergType) -> Column:
        raise NotImplementedError(
            f"cannot evaluate unknown transform: {self.name}")

    def pyvalue(self, v: Any, source_type: it.IcebergType) -> Any:
        raise NotImplementedError(
            f"cannot evaluate unknown transform: {self.name}")


# §2.5 registry extension point (file_reader.h:100-113 pattern applied
# to transforms): engines register custom transforms by name and
# from_string dispatches to them before falling back to UnknownTransform.
_CUSTOM: dict[str, "Transform"] = {}


def register(name: str, transform: Transform) -> None:
    _CUSTOM[name] = transform


def from_string(s: str) -> Transform:
    """Parse ``identity | void | year | month | day | hour | bucket[N] |
    truncate[W]`` (transform.h:188 TransformFromString); registered
    custom transforms next; anything else parses as UnknownTransform
    (carried, evaluation fails) rather than erroring at load time."""
    simple = {
        "identity": IDENTITY,
        "void": VOID,
        "year": YEAR,
        "month": MONTH,
        "day": DAY,
        "hour": HOUR,
    }
    if s in simple:
        return simple[s]
    m = _PAT.match(s)
    if m:
        n = int(m.group(2))
        return BucketTransform(n) if m.group(1) == "bucket" else TruncateTransform(n)
    if s in _CUSTOM:
        return _CUSTOM[s]
    return UnknownTransform(s)


def bucket(n: int) -> BucketTransform:
    return BucketTransform(n)


def truncate(w: int) -> TruncateTransform:
    return TruncateTransform(w)
