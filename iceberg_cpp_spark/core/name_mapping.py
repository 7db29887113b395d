"""Name mapping (reference name_mapping.h:22-113): assigns field IDs to
files that were written without them (foreign parquet imported via
``IceTable.add_files``).

Spec format (table property ``schema.name-mapping.default``):
    [{"field-id": 1, "names": ["id", "record_id"]},
     {"field-id": 2, "names": ["data"], "fields": [...nested...]}]
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Optional

from iceberg_cpp_spark.core import types as it

PROPERTY_KEY = "schema.name-mapping.default"


@dataclass
class MappedField:
    field_id: Optional[int]
    names: list[str]
    fields: list["MappedField"] = dc_field(default_factory=list)

    def to_json(self) -> dict:
        j: dict = {"names": self.names}
        if self.field_id is not None:
            j["field-id"] = self.field_id
        if self.fields:
            j["fields"] = [f.to_json() for f in self.fields]
        return j

    @staticmethod
    def from_json(j: dict) -> "MappedField":
        return MappedField(
            field_id=j.get("field-id"),
            names=list(j.get("names", [])),
            fields=[MappedField.from_json(f) for f in j.get("fields", [])],
        )


@dataclass
class NameMapping:
    fields: list[MappedField]

    def id_for(self, name: str) -> Optional[int]:
        """Resolve a (possibly dotted) path through nested mapped fields
        (reference name_mapping.h:76-113 Find-by-path). A top-level field
        whose name literally contains a dot wins over a dotted-path
        interpretation (exact match first), so such names stay
        resolvable."""
        exact = next((f for f in self.fields if name in f.names), None)
        if exact is not None:
            return exact.field_id
        fields = self.fields
        fid: Optional[int] = None
        for part in name.split("."):
            hit = next((f for f in fields if part in f.names), None)
            if hit is None:
                return None
            fid = hit.field_id
            fields = hit.fields
        return fid

    def names_for(self, field_id: int) -> list[str]:
        def walk(fields: list[MappedField]) -> list[str]:
            for f in fields:
                if f.field_id == field_id:
                    return f.names
                got = walk(f.fields)
                if got:
                    return got
            return []

        return walk(self.fields)

    def to_json_string(self) -> str:
        return json.dumps([f.to_json() for f in self.fields])

    @staticmethod
    def from_json_string(s: str) -> "NameMapping":
        return NameMapping([MappedField.from_json(j) for j in json.loads(s)])

    @staticmethod
    def from_schema(schema: it.Schema, aliases: Optional[dict[str, list[str]]] = None
                    ) -> "NameMapping":
        """Default mapping: every field (including nested struct/list/map
        children, per name_mapping.h:76-113) maps its current name — plus
        any provided aliases, keyed by dotted path for nested fields."""

        def mapped(name: str, fid: Optional[int], ftype: it.IcebergType,
                   prefix: str) -> MappedField:
            full = f"{prefix}{name}"
            names = [name] + list((aliases or {}).get(full, []))
            kids: list[MappedField] = []
            if isinstance(ftype, it.StructType):
                kids = [mapped(c.name, c.field_id, c.field_type, full + ".")
                        for c in ftype.fields]
            elif isinstance(ftype, it.ListType):
                kids = [mapped("element", ftype.element_id,
                               ftype.element_type, full + ".")]
            elif isinstance(ftype, it.MapType):
                kids = [mapped("key", ftype.key_id, ftype.key_type, full + "."),
                        mapped("value", ftype.value_id, ftype.value_type,
                               full + ".")]
            return MappedField(fid, names, kids)

        return NameMapping([mapped(f.name, f.field_id, f.field_type, "")
                            for f in schema.fields])


def arrow_leaf_paths(arrow_schema) -> list[str]:
    """Dotted paths of an arrow schema's fields, recursing into structs
    (the nesting shape parquet's ``path_in_schema`` uses for struct
    leaves). List/map columns stay as their top-level name."""
    import pyarrow as pa

    out: list[str] = []

    def walk(prefix: str, typ) -> None:
        if pa.types.is_struct(typ):
            for f in typ:
                walk(f"{prefix}.{f.name}", f.type)
        else:
            out.append(prefix)

    for f in arrow_schema:
        walk(f.name, f.type)
    return out


def apply_to_file_columns(mapping: NameMapping, file_columns: list[str],
                          schema: it.Schema) -> dict[str, tuple[int, it.IcebergType]]:
    """file column path → (field_id, type) for footer-metrics harvesting
    and read projection of ID-less files. Paths may be dotted (struct
    leaves). Unmapped columns are ignored (projected out), matching
    avro_reader.cc:105-108 behavior."""
    out: dict[str, tuple[int, it.IcebergType]] = {}
    for name in file_columns:
        fid = mapping.id_for(name)
        if fid is None:
            continue
        field = schema.find_field_by_id(fid)
        if field is not None and field.field_type.is_primitive:
            out[name] = (fid, field.field_type)
    return out
