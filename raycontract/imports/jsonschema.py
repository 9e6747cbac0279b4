"""JSON Schema → contract importer.

≅ the reference's ``imports/jsonschema_importer.py``: object schema → model,
properties → fields, ``[T, "null"]`` unions → optional, required list →
required flags, format/pattern/enum/length/bounds passthrough, nested
objects/arrays. Inverse of :mod:`raycontract.export.jsonschema` —
round-trip tested.
"""

from __future__ import annotations

import json
import os
from typing import Any

from raycontract.contract import DataContractSpecification, Field, Info, Model

_JSON_TO_CONTRACT = {
    "string": "string",
    "integer": "long",
    "number": "double",
    "boolean": "boolean",
    "object": "object",
    "array": "array",
    "null": "null",
}

_FORMAT_TYPES = {"date-time": "timestamp", "date": "date", "time": "time"}


def _field_from_schema(prop: dict, required: bool) -> Field:
    f = Field()
    t = prop.get("type")
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        t = non_null[0] if non_null else "null"
    fmt = prop.get("format")
    if t == "string" and fmt in _FORMAT_TYPES:
        f.type = _FORMAT_TYPES[fmt]
    else:
        f.type = _JSON_TO_CONTRACT.get(t, "string" if t else None)
        if fmt:
            f.format = fmt
    if required:
        f.required = True
    for src, dst in (("pattern", "pattern"), ("enum", "enum"),
                     ("minLength", "minLength"), ("maxLength", "maxLength"),
                     ("minimum", "minimum"), ("maximum", "maximum"),
                     ("exclusiveMinimum", "exclusiveMinimum"),
                     ("exclusiveMaximum", "exclusiveMaximum"),
                     ("title", "title"), ("description", "description")):
        if src in prop:
            setattr(f, dst, prop[src])
    if prop.get("unique"):
        f.unique = True
    if f.type == "object":
        req = set(prop.get("required") or [])
        for n, sub in (prop.get("properties") or {}).items():
            f.fields[n] = _field_from_schema(sub, n in req)
    if f.type == "array" and isinstance(prop.get("items"), dict):
        f.items = _field_from_schema(prop["items"], False)
    return f


def import_jsonschema(source: str, model_name: str = "model") -> DataContractSpecification:
    """``source``: path to a .json schema file or the JSON text itself.
    A top-level object schema becomes one model; a dict of named schemas
    (the multi-model form export_jsonschema emits) becomes one model each."""
    text = source
    if os.path.exists(source):
        with open(source) as fh:
            text = fh.read()
    schema: Any = json.loads(text)

    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    spec.id = "imported-jsonschema"
    spec.info = Info(title="Imported JSON Schema", version="0.0.1")

    def add_model(name: str, s: dict) -> None:
        model = Model()
        if s.get("title"):
            model.title = s["title"]
        if s.get("description"):
            model.description = s["description"]
        req = set(s.get("required") or [])
        for n, prop in (s.get("properties") or {}).items():
            model.fields[n] = _field_from_schema(prop, n in req)
        spec.models[name] = model

    if isinstance(schema, dict) and "properties" in schema:
        add_model(schema.get("title") or model_name, schema)
    elif isinstance(schema, dict):
        for name, s in schema.items():
            if isinstance(s, dict) and "properties" in s:
                add_model(name, s)
    if not spec.models:
        raise ValueError("no object schema with properties found")
    return spec
