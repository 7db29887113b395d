"""Variant shredding: typed subcolumns for v3 variant values.

The Iceberg/Parquet variant-shredding direction: a writer extracts
user-declared paths of a variant column into TYPED side columns whose
per-file statistics make ``variant_get`` predicates prunable — without
them every variant filter must open every file. (The reference pins
its enum at v2, type_fwd.h:34-35; this exceeds the slot.)

Engine encoding: shred paths are declared as table properties

    write.variant.shred.<column> = "$.k:long, $.st:string"

and the parquet writer materializes one shadow column per path
(``_shred_<fid>`` = ``try_variant_get(column, path, type)``) next to
the variant binary. Shadow columns are NOT part of the table schema —
schema-projected scans never see them — but their min/max/null
statistics are harvested into the DataFile entry under a DETERMINISTIC
synthetic field id (murmur3 of source-fid:path:type into a reserved
band), so any engine session can bind a ``variant_get`` predicate to
the same id with zero coordination state.

Scan side: ``ex.variant_get("payload", "$.k", "long") < 100`` binds to
a BoundVariantGetTerm carrying the synthetic id + declared type; the
metrics evaluator prunes files on the recorded bounds exactly like a
real column, and surviving rows filter through Spark's native
``try_variant_get`` (JVM, codegen). Files written before the shred
declaration simply carry no bounds for the id — kept, never wrong.
"""

from __future__ import annotations

from dataclasses import dataclass

from iceberg_cpp_spark.core import types as it
from iceberg_cpp_spark.functions.murmur3 import hash_bytes

PROPERTY_PREFIX = "write.variant.shred."

# synthetic ids live far above any real schema id and below Iceberg's
# reserved metadata-column ids (which start at 2147483546)
_ID_BASE = 1_600_000_000
_ID_SPAN = 500_000_000

# shreddable leaf types: orderable primitives try_variant_get can cast
_TYPES = {
    "boolean": it.BooleanType(), "int": it.IntegerType(),
    "long": it.LongType(), "float": it.FloatType(),
    "double": it.DoubleType(), "string": it.StringType(),
    "date": it.DateType(), "timestamp": it.TimestampType(),
    "timestamptz": it.TimestampTzType(),
}


def shred_field_id(source_fid: int, path: str, type_name: str) -> int:
    """Deterministic synthetic field id for one shred path — stable
    across sessions/engines with no stored mapping."""
    h = hash_bytes(f"variant-shred:{source_fid}:{path}:{type_name}"
                   .encode("utf-8"))
    return _ID_BASE + (h & 0x7FFFFFFF) % _ID_SPAN


@dataclass(frozen=True)
class ShredField:
    column: str            # variant column name
    source_fid: int
    path: str              # $.k (Spark variant-get path)
    type_name: str

    @property
    def field_type(self) -> it.IcebergType:
        return _TYPES[self.type_name]

    @property
    def field_id(self) -> int:
        return shred_field_id(self.source_fid, self.path, self.type_name)

    @property
    def shadow_name(self) -> str:
        return f"_shred_{self.field_id}"


def parse_shred_spec(column: str, source_fid: int, spec: str) -> list[ShredField]:
    out: list[ShredField] = []
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        if ":" not in item:
            raise ValueError(
                f"shred spec item {item!r} must be '<path>:<type>'")
        path, _, tname = item.rpartition(":")
        path, tname = path.strip(), tname.strip().lower()
        if not path.startswith("$"):
            raise ValueError(f"shred path must start with '$': {path!r}")
        if tname not in _TYPES:
            raise ValueError(
                f"unsupported shred type {tname!r} "
                f"(one of {sorted(_TYPES)})")
        out.append(ShredField(column, source_fid, path, tname))
    ids = [f.field_id for f in out]
    if len(set(ids)) != len(ids):
        raise ValueError(f"shred field-id collision in spec {spec!r}")
    return out


def shred_fields(schema: it.Schema, properties: dict) -> list[ShredField]:
    """Every declared shred path of this table, validated against the
    schema. A property naming a column that is no longer in the schema
    (drop_column / rename_column leave stale keys behind) warns and is
    skipped — raising here would brick every subsequent write to the
    table (the same contract as stale write.metadata.metrics.*
    properties); a property naming an existing NON-variant column is a
    declaration error and still raises."""
    import warnings

    out: list[ShredField] = []
    for k, v in sorted(properties.items()):
        if not k.startswith(PROPERTY_PREFIX):
            continue
        col = k[len(PROPERTY_PREFIX):]
        f = schema.find_field(col)
        if f is None:
            warnings.warn(
                f"ignoring shred property for unknown column: {col}",
                stacklevel=2)
            continue
        if not isinstance(f.field_type, it.VariantType):
            raise ValueError(
                f"shred property names non-variant column: {col} "
                f"({f.field_type!r})")
        out.extend(parse_shred_spec(col, f.field_id, v))
    ids = [f.field_id for f in out]
    if len(set(ids)) != len(ids):
        raise ValueError("shred field-id collision across columns")
    return out


def shadow_columns(df, shreds: list[ShredField]):
    """Attach the typed shadow columns to a write-side DataFrame."""
    from pyspark.sql import functions as F

    for s in shreds:
        df = df.withColumn(
            s.shadow_name,
            F.try_variant_get(F.col(s.column), s.path, s.type_name))
    return df
