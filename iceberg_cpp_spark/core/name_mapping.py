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
        for f in self.fields:
            if name in f.names:
                return f.field_id
        return None

    def names_for(self, field_id: int) -> list[str]:
        for f in self.fields:
            if f.field_id == field_id:
                return f.names
        return []

    def to_json_string(self) -> str:
        return json.dumps([f.to_json() for f in self.fields])

    @staticmethod
    def from_json_string(s: str) -> "NameMapping":
        return NameMapping([MappedField.from_json(j) for j in json.loads(s)])

    @staticmethod
    def from_schema(schema: it.Schema, aliases: Optional[dict[str, list[str]]] = None
                    ) -> "NameMapping":
        """Default mapping: every field maps its current name (plus any
        provided aliases, e.g. the column names foreign files use)."""
        out = []
        for f in schema.fields:
            names = [f.name] + list((aliases or {}).get(f.name, []))
            out.append(MappedField(f.field_id, names))
        return NameMapping(out)


def apply_to_file_columns(mapping: NameMapping, file_columns: list[str],
                          schema: it.Schema) -> dict[str, tuple[int, it.IcebergType]]:
    """file column name → (field_id, type) for footer-metrics harvesting
    and read projection of ID-less files. Unmapped columns are ignored
    (projected out), matching avro_reader.cc:105-108 behavior."""
    out: dict[str, tuple[int, it.IcebergType]] = {}
    for name in file_columns:
        fid = mapping.id_for(name)
        if fid is None:
            continue
        field = schema.find_field_by_id(fid)
        if field is not None and field.field_type.is_primitive:
            out[name] = (fid, field.field_type)
    return out
