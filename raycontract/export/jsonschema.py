"""Contract → JSON Schema exporter.

Same semantics as the reference's ``export/jsonschema_converter.py:34-157``:
type map (string/varchar/text→string; timestamp→string+date-time;
timestamp_ntz→string; date/time→string+format; number family→number; int
family→integer; boolean; object/record/struct→object; array),
non-required fields become ``[type, "null"]`` unions, nested
properties/required, array items, and the constraint passthroughs (pattern,
enum, min/maxLength, bounds, exclusive bounds).
"""

from __future__ import annotations

from typing import Optional

from raycontract.contract import Field, Model


def convert_type_format(t: Optional[str], fmt: Optional[str]) -> tuple:
    if t is None:
        return None, None
    t = t.lower()
    if t in ("string", "varchar", "text"):
        return "string", fmt
    if t in ("timestamp", "timestamp_tz", "date-time", "datetime"):
        return "string", "date-time"
    if t in ("timestamp_ntz",):
        return "string", None
    if t == "date":
        return "string", "date"
    if t == "time":
        return "string", "time"
    if t in ("number", "decimal", "numeric", "float", "double"):
        return "number", None
    if t in ("integer", "int", "long", "bigint"):
        return "integer", None
    if t == "boolean":
        return "boolean", None
    if t in ("object", "record", "struct"):
        return "object", None
    if t == "array":
        return "array", None
    return None, None


def to_property(field: Field) -> dict:
    prop: dict = {}
    json_type, json_format = convert_type_format(field.type, field.format)
    if json_type is not None:
        prop["type"] = json_type if field.required else [json_type, "null"]
    if json_format is not None:
        prop["format"] = json_format
    if field.unique:
        prop["unique"] = True
    if getattr(field, "primaryKey", None):
        # passthrough so row validators can annotate violations with the pk
        # (reference jsonschema_converter.py:53-54 / check_jsonschema.py:21-38)
        prop["primaryKey"] = True
    if json_type == "object":
        prop["properties"] = {n: to_property(f) for n, f in field.fields.items()}
        prop["required"] = [n for n, f in field.fields.items() if f.required is True]
    if json_type == "array" and field.items is not None:
        prop["items"] = to_property(field.items)
    if field.pattern:
        prop["pattern"] = field.pattern
    if field.enum:
        prop["enum"] = field.enum
    if field.minLength is not None:
        prop["minLength"] = field.minLength
    if field.maxLength is not None:
        prop["maxLength"] = field.maxLength
    if field.title:
        prop["title"] = field.title
    if field.description:
        prop["description"] = field.description
    if field.exclusiveMinimum is not None:
        prop["exclusiveMinimum"] = field.exclusiveMinimum
    if field.exclusiveMaximum is not None:
        prop["exclusiveMaximum"] = field.exclusiveMaximum
    if field.minimum is not None:
        prop["minimum"] = field.minimum
    if field.maximum is not None:
        prop["maximum"] = field.maximum
    return prop


def to_jsonschema(model_key: str, model: Model) -> dict:
    out = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "type": "object",
        "properties": {n: to_property(f) for n, f in model.fields.items()},
        "required": [n for n, f in model.fields.items() if f.required is True],
    }
    if model.title:
        out["title"] = model.title
    if model.description:
        out["description"] = model.description
    return out


def export_jsonschema(spec) -> dict:
    """All models; single-model contracts return that model's schema."""
    schemas = {k: to_jsonschema(k, m) for k, m in spec.models.items()}
    if len(schemas) == 1:
        return next(iter(schemas.values()))
    return schemas
