"""Structural validation of the data-contract document itself.

≅ the reference's JSON-Schema gate at resolve time
(``lint/resolve.py:283-305`` validating against
``schemas/datacontract-1.1.0.schema.json`` with fastjsonschema): a malformed
contract is rejected BEFORE hydration with the same error shape
(``type=lint, result=failed, name='Check that data contract YAML is valid',
reason=<message>``) and fastjsonschema-style messages
(``data must contain ['id'] properties``, ``data.info.title must be string``).

The schema below is hand-authored from the public Data Contract Specification
v1.1.0 semantics (NOT a copy of the reference's vendored schema file): it
encodes the structural core — required roots, info title/version, model/field
shapes, constraint value types, server/servicelevel shapes — which is the
part the execution engine depends on. The validator itself is a small
JSON-Schema-subset interpreter (type / required / properties /
additionalProperties / enum / items / recursion)."""

from __future__ import annotations

from typing import Any

from raycontract.contract import DATACONTRACT_TYPES


class ContractValidationError(Exception):
    """≅ the reference's DataContractException raised on schema failure."""

    def __init__(self, reason: str):
        self.type = "lint"
        self.result = "failed"
        self.name = "Check that data contract YAML is valid"
        self.reason = reason
        self.engine = "raycontract"
        super().__init__(reason)


_STR = {"type": "string"}
_BOOL = {"type": "boolean"}
_NUM = {"type": "number"}
_INT = {"type": "integer"}

_QUALITY = {
    "type": "object",
    "properties": {
        "type": _STR, "description": _STR, "query": _STR, "dialect": _STR,
        "mustBe": {}, "mustNotBe": {},
        "mustBeGreaterThan": _NUM, "mustBeGreaterThanOrEqualTo": _NUM,
        "mustBeLessThan": _NUM, "mustBeLessThanOrEqualTo": _NUM,
        "mustBeBetween": {"type": "array", "items": _NUM},
        "mustNotBeBetween": {"type": "array", "items": _NUM},
        "engine": _STR, "implementation": {}, "specification": {}, "schedule": _STR,
    },
}

_FIELD: dict = {
    "type": "object",
    "properties": {
        "type": {"type": "string", "enum": DATACONTRACT_TYPES},
        "title": _STR, "description": _STR,
        "required": _BOOL, "unique": _BOOL, "primaryKey": _BOOL, "primary": _BOOL,
        "references": _STR, "format": _STR, "pattern": _STR,
        "minLength": _INT, "maxLength": _INT,
        "minimum": _NUM, "maximum": _NUM,
        "exclusiveMinimum": _NUM, "exclusiveMaximum": _NUM,
        "enum": {"type": "array"},
        "precision": _INT, "scale": _INT,
        "example": {}, "examples": {"type": "array"},
        "pii": _BOOL, "classification": _STR, "tags": {"type": "array"},
        "links": {"type": "object"}, "$ref": _STR,
        "fields": {"type": "object", "additionalProperties": {"$recurse": "field"}},
        "items": {"$recurse": "field"},
        "keys": {"$recurse": "field"},
        "values": {"$recurse": "field"},
        "quality": {"type": "array", "items": _QUALITY},
        "config": {"type": "object"},
        "lineage": {}, "definition": _STR,
    },
}

_MODEL = {
    "type": "object",
    "properties": {
        "type": {"type": "string", "enum": ["table", "view", "object"]},
        "title": _STR, "description": _STR,
        "fields": {"type": "object", "additionalProperties": {"$recurse": "field"}},
        "primaryKey": {"type": "array", "items": _STR},
        "quality": {"type": "array", "items": _QUALITY},
        "config": {"type": "object"},
        "examples": {"type": "array"}, "tags": {"type": "array"},
    },
}

_SERVER = {
    "type": "object",
    "properties": {
        "type": _STR, "format": _STR, "path": _STR, "location": _STR,
        "delimiter": _STR, "description": _STR, "environment": _STR,
        "dataProductId": _STR, "outputPortId": _STR,
    },
}

DCS_SCHEMA = {
    "type": "object",
    "required": ["dataContractSpecification", "id", "info"],
    "properties": {
        "dataContractSpecification": {
            "type": "string",
            "enum": ["1.2.0", "1.1.0", "1.0.0", "0.9.3", "0.9.2", "0.9.1", "0.9.0"],
        },
        "id": _STR,
        "info": {
            "type": "object",
            "required": ["title", "version"],
            "properties": {
                "title": _STR, "version": _STR, "status": _STR,
                "description": _STR, "owner": _STR, "contact": {"type": "object"},
            },
        },
        "servers": {"type": "object", "additionalProperties": _SERVER},
        "terms": {"type": "object"},
        "models": {"type": "object", "additionalProperties": _MODEL},
        "definitions": {"type": "object", "additionalProperties": {"$recurse": "field"}},
        "examples": {"type": "array"},
        "servicelevels": {
            "type": "object",
            "properties": {
                "availability": {"type": "object"}, "retention": {
                    "type": "object",
                    "properties": {"period": _STR, "unlimited": _BOOL,
                                   "timestampField": _STR, "description": _STR},
                },
                "latency": {"type": "object"},
                "freshness": {
                    "type": "object",
                    "properties": {"threshold": _STR, "timestampField": _STR,
                                   "description": _STR},
                },
                "frequency": {"type": "object"}, "support": {"type": "object"},
                "backup": {"type": "object"},
            },
        },
        "quality": {},  # deprecated root quality: passthrough
        "links": {"type": "object"},
        "tags": {"type": "array"},
    },
}

_RECURSE = {"field": _FIELD}

_TYPE_CHECKS = {
    "object": lambda v: isinstance(v, dict),
    "array": lambda v: isinstance(v, list),
    "string": lambda v: isinstance(v, str),
    "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "integer": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "boolean": lambda v: isinstance(v, bool),
    "null": lambda v: v is None,
}


def _validate_node(value: Any, schema: dict, path: str) -> None:
    if "$recurse" in schema:
        schema = _RECURSE[schema["$recurse"]]
    t = schema.get("type")
    if t is not None:
        check = _TYPE_CHECKS[t]
        if not check(value):
            raise ContractValidationError(f"{path} must be {t}")
    if "enum" in schema and value is not None:
        if value not in schema["enum"]:
            raise ContractValidationError(
                f"{path} must be one of {schema['enum']!r}")
    if isinstance(value, dict):
        req = schema.get("required")
        if req:
            missing = [k for k in req if k not in value]
            if missing:
                raise ContractValidationError(
                    f"{path} must contain {req!r} properties")
        props = schema.get("properties") or {}
        for k, v in value.items():
            if k in props:
                _validate_node(v, props[k], f"{path}.{k}")
            elif "additionalProperties" in schema:
                ap = schema["additionalProperties"]
                if ap is False:
                    raise ContractValidationError(
                        f"{path} must not contain {k!r} properties")
                if isinstance(ap, dict) and (v is not None):
                    _validate_node(v, ap, f"{path}.{k}")
            # unknown keys under a schema without additionalProperties are
            # ignored (forward compatibility, matching the reference schema's
            # permissive areas)
    if isinstance(value, list) and "items" in schema:
        for i, v in enumerate(value):
            _validate_node(v, schema["items"], f"{path}[{i}]")


def validate_contract_dict(d: Any) -> None:
    """Raise :class:`ContractValidationError` if ``d`` is not a structurally
    valid Data Contract Specification document."""
    if not isinstance(d, dict):
        raise ContractValidationError("data must be object")
    _validate_node(d, DCS_SCHEMA, "data")
