"""Contract → Avro schema (.avsc) exporter.

Mirrors the reference's avro exporter semantics (``export/avro_converter.py``:
record per model, nullable unions for non-required fields, logicalTypes for
date/time/timestamp/decimal, nested records/arrays/maps).
"""

from __future__ import annotations

import json
from typing import Any, Optional

from raycontract.contract import DataContractSpecification, Field, Model


def _avro_type(field: Field, name_hint: str) -> Any:
    t = (field.type or "").lower()
    if t in ("string", "text", "varchar"):
        return "string"
    if t in ("int", "integer"):
        return "int"
    if t in ("long", "bigint"):
        return "long"
    if t == "float":
        return "float"
    if t in ("double", "number"):
        return "double"
    if t == "boolean":
        return "boolean"
    if t == "bytes":
        return "bytes"
    if t in ("decimal", "numeric"):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": field.precision or 38, "scale": field.scale or 0}
    if t in ("timestamp", "timestamp_tz"):
        return {"type": "long", "logicalType": "timestamp-millis"}
    if t == "timestamp_ntz":
        return {"type": "long", "logicalType": "local-timestamp-millis"}
    if t == "date":
        return {"type": "int", "logicalType": "date"}
    if t == "time":
        return {"type": "long", "logicalType": "time-micros"}
    if t == "array":
        items = _avro_type(field.items, f"{name_hint}_item") if field.items else "string"
        return {"type": "array", "items": items}
    if t == "map":
        values = _avro_type(field.values, f"{name_hint}_value") if field.values else "string"
        return {"type": "map", "values": values}
    if t in ("object", "record", "struct"):
        return {
            "type": "record",
            "name": f"{name_hint}_record",
            "fields": [_avro_field(n, f, f"{name_hint}_{n}") for n, f in field.fields.items()],
        }
    return "string"


def _avro_field(name: str, field: Field, name_hint: str) -> dict:
    at = _avro_type(field, name_hint)
    out: dict = {"name": name, "type": at if field.required else ["null", at]}
    if field.description:
        out["doc"] = field.description
    return out


def to_avro_schema(model_name: str, model: Model,
                   namespace: Optional[str] = None) -> dict:
    out = {
        "type": "record",
        "name": model_name,
        "fields": [_avro_field(n, f, f"{model_name}_{n}") for n, f in model.fields.items()],
    }
    if namespace:
        out["namespace"] = namespace
    if model.description:
        out["doc"] = model.description
    return out


def export_avro(spec: DataContractSpecification) -> str:
    schemas = [to_avro_schema(n, m, namespace=spec.id) for n, m in spec.models.items()]
    return json.dumps(schemas[0] if len(schemas) == 1 else schemas, indent=2)
