"""Contract → Iceberg schema JSON exporter.

≅ the reference's ``export/iceberg_converter.py`` (pyiceberg-based; the
wheel is unavailable offline so the schema JSON is emitted directly per the
public Iceberg spec): struct schema with sequential field-ids,
required/optional, list/map/struct nesting, decimal(p,s)/timestamptz types.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from raycontract.contract import DataContractSpecification, Field

_SIMPLE = {
    "string": "string", "text": "string", "varchar": "string",
    "int": "int", "integer": "int", "long": "long", "bigint": "long",
    "float": "float", "double": "double",
    "boolean": "boolean", "bytes": "binary",
    "date": "date", "time": "time",
    "timestamp": "timestamptz", "timestamp_tz": "timestamptz",
    "timestamp_ntz": "timestamp",
}


class _Ids:
    def __init__(self):
        self.n = 0

    def next(self) -> int:
        self.n += 1
        return self.n


def _iceberg_type(f: Optional[Field], ids: _Ids) -> Any:
    if f is None or f.type is None:
        return "string"
    t = f.type.lower()
    if t in _SIMPLE:
        return _SIMPLE[t]
    if t in ("number", "decimal", "numeric"):
        p = f.precision if f.precision is not None else 38
        s = f.scale if f.scale is not None else 0
        return f"decimal({p}, {s})"
    if t == "array":
        return {"type": "list", "element-id": ids.next(),
                "element": _iceberg_type(f.items, ids),
                "element-required": bool(f.items and f.items.required)}
    if t == "map":
        return {"type": "map", "key-id": ids.next(),
                "key": _iceberg_type(f.keys, ids) if f.keys else "string",
                "value-id": ids.next(),
                "value": _iceberg_type(f.values, ids),
                "value-required": bool(f.values and f.values.required)}
    if t in ("object", "record", "struct"):
        return {"type": "struct",
                "fields": [_struct_field(n, sf, ids) for n, sf in f.fields.items()]}
    return "string"


def _struct_field(name: str, f: Field, ids: _Ids) -> dict:
    out = {"id": ids.next(), "name": name, "required": f.required is True,
           "type": _iceberg_type(f, ids)}
    if f.description:
        out["doc"] = f.description
    return out


def export_iceberg(spec: DataContractSpecification, model_name: Optional[str] = None) -> str:
    names = [model_name] if model_name else list(spec.models)
    schemas = {}
    for n in names:
        ids = _Ids()
        schemas[n] = {
            "type": "struct",
            "schema-id": 0,
            "fields": [_struct_field(fn, f, ids)
                       for fn, f in spec.models[n].fields.items()],
        }
    if len(schemas) == 1:
        return json.dumps(next(iter(schemas.values())), indent=2)
    return json.dumps(schemas, indent=2)
