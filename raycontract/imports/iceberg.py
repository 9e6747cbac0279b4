"""Iceberg schema JSON → contract importer.

≅ the reference's ``imports/iceberg_importer.py`` (pyiceberg-based; parsed
directly per the public Iceberg spec here): struct schema fields with
required flags, list/map/struct nesting, decimal(p,s)/timestamptz types.
Inverse of :mod:`raycontract.export.iceberg` — round-trip tested.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from raycontract.contract import DataContractSpecification, Field, Info, Model

_SIMPLE = {
    "string": "string", "uuid": "string", "binary": "bytes", "fixed": "bytes",
    "int": "int", "long": "long", "float": "float", "double": "double",
    "boolean": "boolean", "date": "date", "time": "time",
    "timestamptz": "timestamp", "timestamp": "timestamp_ntz",
}


def _field_from_type(t: Any) -> Field:
    f = Field()
    if isinstance(t, str):
        m = re.match(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", t)
        if m:
            f.type = "decimal"
            f.precision, f.scale = int(m.group(1)), int(m.group(2))
            return f
        m = re.match(r"^fixed\s*\[\s*\d+\s*\]$", t)
        if m:
            f.type = "bytes"
            return f
        f.type = _SIMPLE.get(t, "string")
        return f
    kind = t.get("type")
    if kind == "struct":
        f.type = "object"
        for sub in t.get("fields", []):
            f.fields[sub["name"]] = _field_from_struct_field(sub)
        return f
    if kind == "list":
        f.type = "array"
        f.items = _field_from_type(t.get("element", "string"))
        return f
    if kind == "map":
        f.type = "map"
        f.keys = _field_from_type(t.get("key", "string"))
        f.values = _field_from_type(t.get("value", "string"))
        return f
    f.type = "string"
    return f


def _field_from_struct_field(sf: dict) -> Field:
    f = _field_from_type(sf.get("type", "string"))
    if sf.get("required"):
        f.required = True
    if sf.get("doc"):
        f.description = sf["doc"]
    return f


def import_iceberg(source: str, model_name: str = "model") -> DataContractSpecification:
    text = source
    if os.path.exists(source):
        with open(source) as fh:
            text = fh.read()
    doc = json.loads(text)

    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    spec.id = "imported-iceberg"
    spec.info = Info(title="Imported Iceberg Schema", version="0.0.1")

    if isinstance(doc, dict) and doc.get("type") == "struct":
        schemas = {model_name: doc}
    else:
        schemas = {n: s for n, s in doc.items()
                   if isinstance(s, dict) and s.get("type") == "struct"}
    for name, s in schemas.items():
        model = Model()
        for sf in s.get("fields", []):
            model.fields[sf["name"]] = _field_from_struct_field(sf)
        spec.models[name] = model
    if not spec.models:
        raise ValueError("no iceberg struct schema found")
    return spec
