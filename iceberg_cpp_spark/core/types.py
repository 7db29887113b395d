"""Iceberg type system + schema with field IDs, mapped to Spark SQL types.

Capability parity with the reference's type system (type.h:108-463,
schema.h, schema_field.h:38-88 in /root/reference/src/iceberg/): every
field carries a unique int32 field ID, an optional/required flag and an
optional doc; schemas support lookup by id, by name (case-sensitive or
not) and by dotted nested short names; JSON serde mirrors the Iceberg
table-spec type JSON (json_internal.cc:393-449).

Spark mapping (SURVEY.md §1.2): field IDs ride in
``StructField.metadata['iceberg.field-id']`` (plus ``parquet.field.id``
so Spark's parquet writer can persist them); time → LongType µs,
uuid → StringType, fixed(L) → BinaryType with an engine-level tag.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterator, Optional

from pyspark.sql import types as T

FIELD_ID_KEY = "iceberg.field-id"
PARQUET_FIELD_ID_KEY = "parquet.field.id"
DOC_KEY = "iceberg.doc"
ENGINE_TYPE_KEY = "iceberg.type"  # tags types Spark can't represent (time/uuid/fixed)


class IcebergType:
    """Base class; subclasses are value-compared."""

    @property
    def is_primitive(self) -> bool:
        # property, not method: call sites test `t.is_primitive` as an
        # attribute — a bound method there is always truthy (r10 fix;
        # the metrics field map silently skipped struct-leaf bounds)
        return not isinstance(self, (StructType, ListType, MapType))

    def __eq__(self, other: object) -> bool:
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self) -> int:
        return hash((type(self).__name__, tuple(sorted(self.__dict__.items(), key=lambda kv: kv[0]))))

    # --- JSON serde (Iceberg table spec `type` JSON) -------------------
    def to_json(self) -> Any:
        raise NotImplementedError

    def __repr__(self) -> str:
        j = self.to_json()
        return j if isinstance(j, str) else type(self).__name__


class _Singleton(IcebergType):
    _NAME: str = ""

    def to_json(self) -> str:
        return self._NAME


class BooleanType(_Singleton):
    _NAME = "boolean"


class IntegerType(_Singleton):
    _NAME = "int"


class LongType(_Singleton):
    _NAME = "long"


class FloatType(_Singleton):
    _NAME = "float"


class DoubleType(_Singleton):
    _NAME = "double"


class DateType(_Singleton):
    _NAME = "date"


class TimeType(_Singleton):
    # µs of day; Spark has no time type → LongType + engine tag
    _NAME = "time"


class TimestampType(_Singleton):
    # µs, no tz → Spark TimestampNTZType
    _NAME = "timestamp"


class TimestampTzType(_Singleton):
    # µs, UTC-adjusted → Spark TimestampType
    _NAME = "timestamptz"


class StringType(_Singleton):
    _NAME = "string"


class BinaryType(_Singleton):
    _NAME = "binary"


class UuidType(_Singleton):
    _NAME = "uuid"


class TimestampNsType(_Singleton):
    """Iceberg v3 ``timestamp_ns`` — nanoseconds since epoch, no zone.
    The reference pins its TimeUnit enum at microseconds
    (type_fwd.h:56-58 "In Iceberg V3 nanoseconds are also supported");
    this engine exceeds that slot. Spark has no nanosecond timestamp, so
    the column rides as LongType (nanos since epoch, engine-tagged via
    ``iceberg.type`` metadata — the TimeType pattern): exact storage,
    correct ordering for predicates/bounds, int64 spec encoding."""

    _NAME = "timestamp_ns"


class TimestampTzNsType(_Singleton):
    """Iceberg v3 ``timestamptz_ns`` — UTC-adjusted nanoseconds since
    epoch. Same LongType engine-tagged representation as
    ``timestamp_ns`` (see that docstring)."""

    _NAME = "timestamptz_ns"


class UnknownType(_Singleton):
    """Iceberg v3 ``unknown`` — a column whose type could not be
    determined; every value is null by definition (spec: always
    optional, readable as null, convertible to any type later). Rides
    as an engine-tagged all-null StringType column; the writer enforces
    the all-null invariant with a per-row JVM guard (zero cost on null)
    and predicate binding folds is_null -> TRUE, everything else ->
    FALSE before any file is touched."""

    _NAME = "unknown"


class VariantType(_Singleton):
    """Iceberg v3 ``variant`` — semi-structured value (spec: Variant
    encoding, metadata+value binary pair). The reference pins its enum
    at v2 ("Iceberg V3 types are not currently supported",
    type_fwd.h:34); this engine maps it onto Spark 4's native
    VariantType, so reads/writes/shredding stay JVM-side. Variant
    columns carry no bounds, cannot be partition/sort/filter sources,
    and require format-version 3."""

    _NAME = "variant"


DEFAULT_CRS = "OGC:CRS84"
DEFAULT_EDGE_ALGORITHM = "spherical"


class GeometryType(IcebergType):
    """Iceberg v3 ``geometry(C)`` — planar-edge geospatial value, WKB
    encoded, CRS ``C`` (default OGC:CRS84). The reference pins its enum
    at v2 (type_fwd.h:34); this engine exceeds that slot: values ride
    as engine-tagged BinaryType WKB (byte-for-byte pass-through),
    bounds are spec WKB points (lower=(xmin,ymin), upper=(xmax,ymax))
    harvested by core/metrics.py via core/wkb.py, and
    ``st_intersects`` predicates prune files through those bounds.
    Geospatial columns cannot be partition/sort/equality-delete/
    identifier sources and require format-version 3."""

    def __init__(self, crs: str = DEFAULT_CRS):
        self.crs = crs

    def to_json(self) -> str:
        return ("geometry" if self.crs == DEFAULT_CRS
                else f"geometry({self.crs})")


class GeographyType(IcebergType):
    """Iceberg v3 ``geography(C, A)`` — non-planar edges interpolated
    by algorithm ``A`` (default spherical) in CRS ``C`` (default
    OGC:CRS84). Same engine-tagged WKB representation as
    ``GeometryType``; bound x-ranges may wrap the antimeridian
    (lower.x > upper.x), which the file-level evaluator honors
    piecewise (core/wkb.py file_bounds_intersect). This engine's
    row-level ``st_intersects`` uses the planar envelope of the stored
    coordinates — exact for points, conservative-in-x for edge
    geometries that cross the antimeridian."""

    def __init__(self, crs: str = DEFAULT_CRS,
                 algorithm: str = DEFAULT_EDGE_ALGORITHM):
        self.crs = crs
        self.algorithm = algorithm

    def to_json(self) -> str:
        if self.crs == DEFAULT_CRS and self.algorithm == DEFAULT_EDGE_ALGORITHM:
            return "geography"
        if self.algorithm == DEFAULT_EDGE_ALGORITHM:
            return f"geography({self.crs})"
        return f"geography({self.crs}, {self.algorithm})"


class DecimalType(IcebergType):
    def __init__(self, precision: int, scale: int):
        if not (0 < precision <= 38):
            raise ValueError(f"decimal precision out of range [1, 38]: {precision}")
        self.precision = precision
        self.scale = scale

    def to_json(self) -> str:
        return f"decimal({self.precision}, {self.scale})"


class FixedType(IcebergType):
    def __init__(self, length: int):
        if length < 0:
            raise ValueError(f"fixed length must be >= 0: {length}")
        self.length = length

    def to_json(self) -> str:
        return f"fixed[{self.length}]"


@dataclass(frozen=True)
class NestedField:
    """A named, ID'd field (reference: schema_field.h:38-88)."""

    field_id: int
    name: str
    field_type: IcebergType
    required: bool = False
    doc: Optional[str] = None
    # v3 default values (spec: JSON single-value encoding).
    # initial-default: value rows in PRE-EXISTING files read as
    # (schema_util.h Project::Default); write-default: value stamped
    # when a writer omits the column.
    initial_default: Any = None
    write_default: Any = None

    def to_json(self) -> dict:
        j: dict[str, Any] = {
            "id": self.field_id,
            "name": self.name,
            "required": self.required,
            "type": self.field_type.to_json(),
        }
        if self.doc is not None:
            j["doc"] = self.doc
        if self.initial_default is not None:
            j["initial-default"] = self.initial_default
        if self.write_default is not None:
            j["write-default"] = self.write_default
        return j


class StructType(IcebergType):
    def __init__(self, fields: list[NestedField]):
        self.fields = list(fields)
        self._by_id = {f.field_id: f for f in self.fields}
        self._by_name = {f.name: f for f in self.fields}
        self._by_lower = {}
        for f in self.fields:
            self._by_lower.setdefault(f.name.lower(), f)

    def field_by_id(self, field_id: int) -> Optional[NestedField]:
        return self._by_id.get(field_id)

    def field_by_name(self, name: str, case_sensitive: bool = True) -> Optional[NestedField]:
        if case_sensitive:
            return self._by_name.get(name)
        return self._by_lower.get(name.lower())

    def to_json(self) -> dict:
        return {"type": "struct", "fields": [f.to_json() for f in self.fields]}

    def __eq__(self, other: object) -> bool:
        return isinstance(other, StructType) and type(self) is type(other) and self.fields == other.fields

    def __hash__(self) -> int:
        return hash(tuple(self.fields))


class ListType(IcebergType):
    def __init__(self, element_id: int, element_type: IcebergType, element_required: bool = False):
        self.element_id = element_id
        self.element_type = element_type
        self.element_required = element_required

    def to_json(self) -> dict:
        return {
            "type": "list",
            "element-id": self.element_id,
            "element": self.element_type.to_json(),
            "element-required": self.element_required,
        }


class MapType(IcebergType):
    def __init__(self, key_id: int, key_type: IcebergType, value_id: int,
                 value_type: IcebergType, value_required: bool = False):
        self.key_id = key_id
        self.key_type = key_type
        self.value_id = value_id
        self.value_type = value_type
        self.value_required = value_required

    def to_json(self) -> dict:
        return {
            "type": "map",
            "key-id": self.key_id,
            "key": self.key_type.to_json(),
            "value-id": self.value_id,
            "value": self.value_type.to_json(),
            "value-required": self.value_required,
        }


_PRIMITIVES: dict[str, IcebergType] = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "date": DateType(),
    "time": TimeType(),
    "timestamp": TimestampType(),
    "timestamptz": TimestampTzType(),
    "string": StringType(),
    "binary": BinaryType(),
    "uuid": UuidType(),
    "variant": VariantType(),
    "timestamp_ns": TimestampNsType(),
    "timestamptz_ns": TimestampTzNsType(),
    "unknown": UnknownType(),
    "geometry": GeometryType(),
    "geography": GeographyType(),
}

# v3-only primitives: tables carrying them must be format-version >= 3
V3_ONLY_TYPES = (VariantType, TimestampNsType, TimestampTzNsType,
                 UnknownType, GeometryType, GeographyType)

# types with no total order: never partition/sort/equality-delete/
# identifier sources, and ordered comparison predicates are invalid
GEO_TYPES = (GeometryType, GeographyType)


def type_from_json(j: Any) -> IcebergType:
    """Parse the Iceberg spec's type JSON (json_internal.cc:393-449)."""
    if isinstance(j, str):
        if j in _PRIMITIVES:
            return _PRIMITIVES[j]
        if j.startswith("decimal"):
            inner = j[j.index("(") + 1 : j.index(")")]
            p, s = (int(x.strip()) for x in inner.split(","))
            return DecimalType(p, s)
        if j.startswith("fixed"):
            inner = j[j.index("[") + 1 : j.index("]")]
            return FixedType(int(inner))
        if j.startswith("geometry("):
            return GeometryType(j[j.index("(") + 1 : j.rindex(")")].strip())
        if j.startswith("geography("):
            inner = j[j.index("(") + 1 : j.rindex(")")]
            parts = [p.strip() for p in inner.split(",")]
            if len(parts) == 1:
                return GeographyType(parts[0])
            if len(parts) == 2:
                return GeographyType(parts[0], parts[1])
            raise ValueError(f"malformed geography type: {j}")
        raise ValueError(f"unknown primitive type: {j}")
    t = j.get("type")
    if t == "struct":
        return StructType([field_from_json(f) for f in j["fields"]])
    if t == "list":
        return ListType(j["element-id"], type_from_json(j["element"]), j.get("element-required", False))
    if t == "map":
        return MapType(
            j["key-id"], type_from_json(j["key"]),
            j["value-id"], type_from_json(j["value"]), j.get("value-required", False),
        )
    raise ValueError(f"unknown complex type: {t}")


def field_from_json(j: dict) -> NestedField:
    return NestedField(
        field_id=j["id"],
        name=j["name"],
        field_type=type_from_json(j["type"]),
        required=j.get("required", False),
        doc=j.get("doc"),
        initial_default=j.get("initial-default"),
        write_default=j.get("write-default"),
    )


class Schema(StructType):
    """Schema = StructType + schema_id (reference: schema.h:46)."""

    def __init__(self, fields: list[NestedField], schema_id: int = 0,
                 identifier_field_ids: Optional[list[int]] = None):
        super().__init__(fields)
        self.schema_id = schema_id
        self.identifier_field_ids = identifier_field_ids or []
        self._index: dict[str, tuple[int, NestedField]] = {}
        self._index_lower: dict[str, tuple[int, NestedField]] = {}
        self._id_to_name: dict[int, str] = {}
        self._build_index("", self.fields)

    # --- nested name index (schema.cc:90-137: dotted short names) ------
    def _build_index(self, prefix: str, fields: list[NestedField]) -> None:
        for f in fields:
            full = f"{prefix}{f.name}"
            self._index[full] = (f.field_id, f)
            self._index_lower.setdefault(full.lower(), (f.field_id, f))
            self._id_to_name[f.field_id] = full
            ft = f.field_type
            if isinstance(ft, StructType):
                self._build_index(full + ".", ft.fields)
            elif isinstance(ft, ListType) and isinstance(ft.element_type, StructType):
                self._build_index(full + ".element.", ft.element_type.fields)
            elif isinstance(ft, MapType) and isinstance(ft.value_type, StructType):
                self._build_index(full + ".value.", ft.value_type.fields)

    def find_field(self, name: str, case_sensitive: bool = True) -> Optional[NestedField]:
        hit = (self._index if case_sensitive else self._index_lower).get(
            name if case_sensitive else name.lower()
        )
        return hit[1] if hit else None

    def find_field_by_id(self, field_id: int) -> Optional[NestedField]:
        name = self._id_to_name.get(field_id)
        return self._index[name][1] if name else None

    def name_of(self, field_id: int) -> Optional[str]:
        return self._id_to_name.get(field_id)

    def column_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def highest_field_id(self) -> int:
        return max(self._id_to_name.keys(), default=0)

    # --- projection (schema.cc:357-430) ---------------------------------
    def select(self, names: list[str], case_sensitive: bool = True) -> "Schema":
        """Select top-level subtrees by (possibly dotted) name."""
        out: list[NestedField] = []
        seen: set[int] = set()
        for n in names:
            f = self.find_field(n, case_sensitive)
            if f is None:
                raise ValueError(f"column not found: {n}")
            top = self.field_by_name(n.split(".")[0], case_sensitive)
            pick = top if top is not None else f
            if pick.field_id not in seen:
                seen.add(pick.field_id)
                out.append(pick)
        return Schema(out, schema_id=self.schema_id)

    def project(self, field_ids: list[int]) -> "Schema":
        out = [f for f in self.fields if f.field_id in set(field_ids)]
        return Schema(out, schema_id=self.schema_id)

    def to_json(self) -> dict:
        j = super().to_json()
        j["schema-id"] = self.schema_id
        if self.identifier_field_ids:
            j["identifier-field-ids"] = self.identifier_field_ids
        return j

    @staticmethod
    def from_json(j: dict) -> "Schema":
        return Schema(
            [field_from_json(f) for f in j["fields"]],
            schema_id=j.get("schema-id", 0),
            identifier_field_ids=j.get("identifier-field-ids"),
        )

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Schema)
            and self.schema_id == other.schema_id
            and self.fields == other.fields
        )

    def __hash__(self) -> int:
        return hash((self.schema_id, tuple(self.fields)))


# --------------------------------------------------------------------------
# Iceberg ↔ Spark type mapping (SURVEY.md §1.2 table)
# --------------------------------------------------------------------------

def schema_v3_types(schema: "Schema") -> set:
    """Names of v3-only primitive types used anywhere in the schema
    (top-level or nested) — tables carrying any must be
    format-version >= 3."""
    found: set = set()

    def walk(t: IcebergType) -> None:
        if isinstance(t, V3_ONLY_TYPES):
            found.add(t.to_json())
        elif isinstance(t, (StructType, Schema)):
            for f in t.fields:
                walk(f.field_type)
        elif isinstance(t, ListType):
            walk(t.element_type)
        elif isinstance(t, MapType):
            walk(t.key_type)
            walk(t.value_type)

    for f in schema.fields:
        walk(f.field_type)
    return found


def types_equal_ignoring_ids(a: IcebergType, b: IcebergType) -> bool:
    """Structural type equality that IGNORES field/element/key/value
    IDs: two spellings of the same nested type compare equal even when
    their subtree IDs differ (a re-parsed DDL type carries fresh IDs).
    Primitives fall back to value equality (decimal precision/scale,
    fixed length, ... all participate)."""
    if isinstance(a, StructType) and isinstance(b, StructType):
        if len(a.fields) != len(b.fields):
            return False
        return all(
            fa.name == fb.name and fa.required == fb.required
            and types_equal_ignoring_ids(fa.field_type, fb.field_type)
            for fa, fb in zip(a.fields, b.fields))
    if isinstance(a, ListType) and isinstance(b, ListType):
        return (a.element_required == b.element_required
                and types_equal_ignoring_ids(a.element_type,
                                             b.element_type))
    if isinstance(a, MapType) and isinstance(b, MapType):
        return (a.value_required == b.value_required
                and types_equal_ignoring_ids(a.key_type, b.key_type)
                and types_equal_ignoring_ids(a.value_type,
                                             b.value_type))
    if isinstance(a, (StructType, ListType, MapType)) \
            or isinstance(b, (StructType, ListType, MapType)):
        return False
    return a == b


def max_assigned_field_id(fields) -> int:
    """Highest field id assigned ANYWHERE in the given fields, including
    list element ids and map key/value ids (which Schema's name index —
    and therefore highest_field_id() — never sees). The authoritative
    walker for last-column-id accounting."""
    best = 0

    def walk_type(t: IcebergType) -> None:
        nonlocal best
        if isinstance(t, StructType):
            for f in t.fields:
                best = max(best, f.field_id)
                walk_type(f.field_type)
        elif isinstance(t, ListType):
            best = max(best, t.element_id)
            walk_type(t.element_type)
        elif isinstance(t, MapType):
            best = max(best, t.key_id, t.value_id)
            walk_type(t.key_type)
            walk_type(t.value_type)

    for f in fields:
        best = max(best, f.field_id)
        walk_type(f.field_type)
    return best


def to_spark_type(t: IcebergType) -> T.DataType:
    if isinstance(t, BooleanType):
        return T.BooleanType()
    if isinstance(t, IntegerType):
        return T.IntegerType()
    if isinstance(t, LongType):
        return T.LongType()
    if isinstance(t, FloatType):
        return T.FloatType()
    if isinstance(t, DoubleType):
        return T.DoubleType()
    if isinstance(t, DecimalType):
        return T.DecimalType(t.precision, t.scale)
    if isinstance(t, DateType):
        return T.DateType()
    if isinstance(t, TimeType):
        return T.LongType()  # µs of day, engine-tagged
    if isinstance(t, (TimestampNsType, TimestampTzNsType)):
        return T.LongType()  # ns since epoch, engine-tagged (v3)
    if isinstance(t, UnknownType):
        return T.StringType()  # all-null by invariant, engine-tagged (v3)
    if isinstance(t, GEO_TYPES):
        return T.BinaryType()  # WKB pass-through, engine-tagged (v3)
    if isinstance(t, TimestampType):
        return T.TimestampNTZType()
    if isinstance(t, TimestampTzType):
        return T.TimestampType()
    if isinstance(t, (StringType, UuidType)):
        return T.StringType()
    if isinstance(t, (BinaryType, FixedType)):
        return T.BinaryType()
    if isinstance(t, VariantType):
        return T.VariantType()
    if isinstance(t, Schema) or isinstance(t, StructType):
        return T.StructType([_to_spark_field(f) for f in t.fields])
    if isinstance(t, ListType):
        return T.ArrayType(to_spark_type(t.element_type), containsNull=not t.element_required)
    if isinstance(t, MapType):
        return T.MapType(to_spark_type(t.key_type), to_spark_type(t.value_type),
                         valueContainsNull=not t.value_required)
    raise ValueError(f"no spark mapping for {t!r}")


def _to_spark_field(f: NestedField) -> T.StructField:
    md: dict[str, Any] = {FIELD_ID_KEY: f.field_id, PARQUET_FIELD_ID_KEY: f.field_id}
    if isinstance(f.field_type, VariantType):
        # variant columns resolve BY NAME: Spark's parquet writer drops
        # the field id from a variant group when the column was itself
        # read from parquet (observed on 4.1 — fresh writes keep it, a
        # compaction/CoW rewrite loses it), so an id-resolved read would
        # silently null every variant after the first rewrite. Keeping
        # parquet.field.id OFF the read schema makes Spark match the
        # column by name on every file, stamped or not. rename_column /
        # historical-name reuse are fenced in table.py (same hazard
        # class as the id-less ORC leg).
        md.pop(PARQUET_FIELD_ID_KEY)
    if f.doc:
        md[DOC_KEY] = f.doc
    if isinstance(f.field_type, (TimeType, UuidType, FixedType,
                                 TimestampNsType, TimestampTzNsType,
                                 UnknownType, GeometryType, GeographyType)):
        md[ENGINE_TYPE_KEY] = f.field_type.to_json()
    return T.StructField(f.name, to_spark_type(f.field_type), nullable=not f.required, metadata=md)


def to_spark_schema(schema: Schema) -> T.StructType:
    return T.StructType([_to_spark_field(f) for f in schema.fields])


def strip_field_metadata(dt: T.DataType) -> T.DataType:
    """Recursively drop StructField metadata (field ids, engine types).
    Needed wherever a schema leaves the engine's control: Spark demands
    parquet field IDs from files when a read schema carries
    parquet.field.id metadata, and the python-streaming source runner
    asserts declared schema == arrow-round-tripped schema (arrow drops
    Spark metadata)."""
    if isinstance(dt, T.StructType):
        return T.StructType([
            T.StructField(f.name, strip_field_metadata(f.dataType), f.nullable)
            for f in dt.fields])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(strip_field_metadata(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(strip_field_metadata(dt.keyType),
                         strip_field_metadata(dt.valueType),
                         dt.valueContainsNull)
    return dt


def from_spark_type(dt: T.DataType, next_id: Iterator[int]) -> IcebergType:
    """Best-effort inverse mapping; fresh IDs drawn from ``next_id`` for
    nested element/key/value fields (used when importing a plain Spark
    DataFrame into an Iceberg table)."""
    if isinstance(dt, T.BooleanType):
        return BooleanType()
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return IntegerType()
    if isinstance(dt, T.LongType):
        return LongType()
    if isinstance(dt, T.FloatType):
        return FloatType()
    if isinstance(dt, T.DoubleType):
        return DoubleType()
    if isinstance(dt, T.DecimalType):
        return DecimalType(dt.precision, dt.scale)
    if isinstance(dt, T.DateType):
        return DateType()
    if isinstance(dt, T.TimestampNTZType):
        return TimestampType()
    if isinstance(dt, T.TimestampType):
        return TimestampTzType()
    if isinstance(dt, T.StringType):
        return StringType()
    if isinstance(dt, T.BinaryType):
        return BinaryType()
    if isinstance(dt, T.VariantType):
        return VariantType()
    if isinstance(dt, T.StructType):
        return StructType([
            NestedField(next(next_id), f.name, from_spark_type(f.dataType, next_id), not f.nullable)
            for f in dt.fields
        ])
    if isinstance(dt, T.ArrayType):
        return ListType(next(next_id), from_spark_type(dt.elementType, next_id), not dt.containsNull)
    if isinstance(dt, T.MapType):
        kid = next(next_id)
        vid = next(next_id)
        return MapType(kid, from_spark_type(dt.keyType, iter(next_id)), vid,
                       from_spark_type(dt.valueType, next_id), not dt.valueContainsNull)
    raise ValueError(f"no iceberg mapping for spark type {dt}")


def schema_from_spark(st: T.StructType, schema_id: int = 0) -> Schema:
    """Import a Spark schema, assigning fresh sequential field IDs
    (honoring any existing ``iceberg.field-id`` metadata)."""
    counter = iter(range(10_000, 1_000_000))
    fields = []
    next_top = 1
    for f in st.fields:
        fid = (f.metadata or {}).get(FIELD_ID_KEY, next_top)
        next_top = max(next_top, int(fid)) + 1
        fields.append(NestedField(int(fid), f.name, from_spark_type(f.dataType, counter), not f.nullable))
    return Schema(fields, schema_id=schema_id)
