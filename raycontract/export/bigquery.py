"""Contract → BigQuery table-schema JSON exporter.

≅ the reference's ``export/bigquery_converter.py``: one table definition per
model with ``fields[]`` of ``{name, type, mode, description}``; REQUIRED /
NULLABLE / REPEATED modes, RECORD for nested objects, NUMERIC with
precision/scale, maxLength for STRING.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from raycontract.contract import DataContractSpecification, Field

_SIMPLE = {
    "string": "STRING", "text": "STRING", "varchar": "STRING",
    "int": "INT64", "integer": "INT64", "long": "INT64", "bigint": "INT64",
    "float": "FLOAT64", "double": "FLOAT64",
    "boolean": "BOOL", "bytes": "BYTES",
    "date": "DATE", "time": "TIME",
    "timestamp": "TIMESTAMP", "timestamp_tz": "TIMESTAMP",
    "timestamp_ntz": "DATETIME",
}


def _bq_field(name: str, f: Field) -> dict:
    t = (f.type or "string").lower()
    out: dict[str, Any] = {"name": name}
    mode = "REQUIRED" if f.required else "NULLABLE"
    if t == "array":
        mode = "REPEATED"
        inner = f.items or Field(type="string")
        sub = _bq_field(name, inner)
        out["type"] = sub["type"]
        if "fields" in sub:
            out["fields"] = sub["fields"]
    elif t in ("object", "record", "struct"):
        out["type"] = "RECORD"
        out["fields"] = [_bq_field(n, sf) for n, sf in f.fields.items()]
    elif t in ("number", "decimal", "numeric"):
        out["type"] = "NUMERIC"
        if f.precision is not None:
            out["precision"] = f.precision
        if f.scale is not None:
            out["scale"] = f.scale
    else:
        out["type"] = _SIMPLE.get(t, "STRING")
        if out["type"] == "STRING" and f.maxLength is not None:
            out["maxLength"] = f.maxLength
    out["mode"] = mode
    if f.description:
        out["description"] = f.description
    return out


def export_bigquery_dict(spec: DataContractSpecification) -> dict:
    tables = []
    for name, model in spec.models.items():
        tables.append({
            "tableReference": {"tableId": name},
            "description": model.description or "",
            "schema": {"fields": [_bq_field(n, f) for n, f in model.fields.items()]},
        })
    return {"tables": tables}


def export_bigquery(spec: DataContractSpecification) -> str:
    return json.dumps(export_bigquery_dict(spec), indent=2)
