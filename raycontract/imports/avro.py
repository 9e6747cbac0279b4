"""Avro schema (.avsc) → contract importer.

≅ the reference's ``imports/avro_importer.py`` (avro-lib based) re-expressed
over plain JSON parsing (the ``avro`` wheel is unavailable offline; an .avsc
file IS JSON): record per model, ``["null", T]`` unions → optional field,
logicalTypes (decimal/date/time/timestamp variants) → contract types, nested
records / arrays / maps / enums, doc → description. Inverse of
:mod:`raycontract.export.avro` — round-trip tested.
"""

from __future__ import annotations

import json
import os
from typing import Any

from raycontract.contract import DataContractSpecification, Field, Info, Model

_PRIMITIVES = {
    "string": "string", "bytes": "bytes", "int": "int", "long": "long",
    "float": "float", "double": "double", "boolean": "boolean", "null": "null",
}

_LOGICAL = {
    "decimal": "decimal",
    "date": "date",
    "time-millis": "time", "time-micros": "time",
    "timestamp-millis": "timestamp", "timestamp-micros": "timestamp",
    "local-timestamp-millis": "timestamp_ntz", "local-timestamp-micros": "timestamp_ntz",
    "uuid": "string",
}


def _field_from_type(at: Any) -> Field:
    """Avro type node → contract Field (type + nested structure)."""
    f = Field()
    if isinstance(at, str):
        f.type = _PRIMITIVES.get(at, "string")
        return f
    if isinstance(at, list):  # union
        non_null = [t for t in at if t != "null"]
        inner = _field_from_type(non_null[0]) if non_null else Field(type="null")
        inner.required = None  # nullable union → optional
        return inner
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt in _LOGICAL:
            f.type = _LOGICAL[lt]
            if lt == "decimal":
                f.precision = at.get("precision")
                f.scale = at.get("scale")
            if lt == "uuid":
                f.format = "uuid"
            return f
        t = at.get("type")
        if t == "record":
            f.type = "object"
            for sub in at.get("fields", []):
                f.fields[sub["name"]] = _field_from_avro_field(sub)
            return f
        if t == "array":
            f.type = "array"
            f.items = _field_from_type(at.get("items", "string"))
            return f
        if t == "map":
            f.type = "map"
            f.keys = Field(type="string")
            f.values = _field_from_type(at.get("values", "string"))
            return f
        if t == "enum":
            f.type = "string"
            f.enum = list(at.get("symbols", []))
            return f
        if t == "fixed":
            f.type = "bytes"
            return f
        return _field_from_type(t)
    f.type = "string"
    return f


def _field_from_avro_field(af: dict) -> Field:
    at = af.get("type")
    nullable = isinstance(at, list) and "null" in at
    f = _field_from_type(at)
    f.required = True if not nullable else None
    if af.get("doc"):
        f.description = af["doc"]
    return f


def import_avro(source: str) -> DataContractSpecification:
    """``source``: path to an .avsc file or the JSON text itself."""
    text = source
    if os.path.exists(source):
        with open(source) as fh:
            text = fh.read()
    schema = json.loads(text)

    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    spec.id = "imported-avro"
    spec.info = Info(title="Imported Avro Schema", version="0.0.1")

    records = schema if isinstance(schema, list) else [schema]
    for rec in records:
        if rec.get("type") != "record":
            raise ValueError(f"top-level avro schema must be a record, got {rec.get('type')!r}")
        model = Model()
        if rec.get("doc"):
            model.description = rec["doc"]
        if rec.get("namespace"):
            model.config["avroNamespace"] = rec["namespace"]
        for af in rec.get("fields", []):
            model.fields[af["name"]] = _field_from_avro_field(af)
        spec.models[rec["name"]] = model
    return spec
