"""BigQuery table-schema JSON → contract importer.

≅ the reference's ``imports/bigquery_importer.py``: ``schema.fields[]`` of
``{name, type, mode, description}`` → contract fields (REQUIRED → required,
REPEATED → array, RECORD → object, NUMERIC(p,s) → decimal). Accepts either
a table definition (``{tableReference, schema}``), a bare ``{fields: []}``
schema, or the multi-table form :mod:`raycontract.export.bigquery` emits —
round-trip tested.
"""

from __future__ import annotations

import json
import os

from raycontract.contract import DataContractSpecification, Field, Info, Model

_TYPE_MAP = {
    "STRING": "string", "BYTES": "bytes",
    "INTEGER": "long", "INT64": "long",
    "FLOAT": "double", "FLOAT64": "double",
    "NUMERIC": "decimal", "BIGNUMERIC": "decimal", "DECIMAL": "decimal",
    "BOOLEAN": "boolean", "BOOL": "boolean",
    "TIMESTAMP": "timestamp", "DATETIME": "timestamp_ntz",
    "DATE": "date", "TIME": "time",
    "RECORD": "object", "STRUCT": "object",
    "JSON": "object", "GEOGRAPHY": "string",
}


def _field(bf: dict) -> Field:
    f = Field()
    t = (bf.get("type") or "STRING").upper()
    mode = (bf.get("mode") or "NULLABLE").upper()
    if mode == "REPEATED":
        f.type = "array"
        inner = dict(bf)
        inner["mode"] = "NULLABLE"
        f.items = _field(inner)
        return f
    f.type = _TYPE_MAP.get(t, "string")
    if mode == "REQUIRED":
        f.required = True
    if bf.get("description"):
        f.description = bf["description"]
    if f.type == "decimal":
        if bf.get("precision") is not None:
            f.precision = int(bf["precision"])
        if bf.get("scale") is not None:
            f.scale = int(bf["scale"])
    if f.type == "string" and bf.get("maxLength") is not None:
        f.maxLength = int(bf["maxLength"])
    if f.type == "object":
        for sub in bf.get("fields", []):
            f.fields[sub["name"]] = _field(sub)
    return f


def import_bigquery(source: str) -> DataContractSpecification:
    """``source``: path to a JSON file or the JSON text itself."""
    text = source
    if os.path.exists(source):
        with open(source) as fh:
            text = fh.read()
    doc = json.loads(text)

    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    spec.id = "imported-bigquery"
    spec.info = Info(title="Imported BigQuery Schema", version="0.0.1")

    if isinstance(doc, dict) and "tables" in doc:
        tables = doc["tables"]
    elif isinstance(doc, dict):
        tables = [doc]
    else:
        tables = doc

    for i, tbl in enumerate(tables):
        name = (tbl.get("tableReference") or {}).get("tableId") or tbl.get("name") \
            or f"table_{i}"
        model = Model(description=tbl.get("description") or None)
        fields = (tbl.get("schema") or {}).get("fields") or tbl.get("fields") or []
        for bf in fields:
            model.fields[bf["name"]] = _field(bf)
        spec.models[name] = model
    return spec
