"""Databricks Unity Catalog table JSON → contract importer.

≅ the reference's ``imports/unity_importer.py`` (file path, not the live
API): TableInfo JSON with ``columns[]`` of {name, type_name / type_json,
nullable, comment} → contract fields.
"""

from __future__ import annotations

import json
import os

from raycontract.contract import DataContractSpecification, Field, Info, Model

_TYPE_MAP = {
    "STRING": "string", "BINARY": "bytes",
    "BYTE": "int", "SHORT": "int", "INT": "int", "LONG": "long",
    "FLOAT": "float", "DOUBLE": "double", "DECIMAL": "decimal",
    "BOOLEAN": "boolean",
    "DATE": "date", "TIMESTAMP": "timestamp", "TIMESTAMP_NTZ": "timestamp_ntz",
    "ARRAY": "array", "MAP": "map", "STRUCT": "object",
}


def _field(col: dict) -> Field:
    f = Field()
    tname = str(col.get("type_name") or col.get("type_text") or "STRING").upper()
    base = tname.split("(")[0]
    f.type = _TYPE_MAP.get(base, "string")
    if f.type == "decimal":
        tj = col.get("type_json")
        if tj:
            try:
                tinfo = json.loads(tj) if isinstance(tj, str) else tj
                t = tinfo.get("type")
                if isinstance(t, str) and t.startswith("decimal("):
                    p, s = t[len("decimal("):-1].split(",")
                    f.precision, f.scale = int(p), int(s)
            except Exception:
                pass
    if col.get("nullable") is False:
        f.required = True
    if col.get("comment"):
        f.description = col["comment"]
    return f


def import_unity(source: str) -> DataContractSpecification:
    text = source
    if os.path.exists(source):
        with open(source) as fh:
            text = fh.read()
    doc = json.loads(text)

    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    spec.id = "imported-unity"
    spec.info = Info(title="Imported Unity Catalog Table", version="0.0.1")

    tables = doc.get("tables") if isinstance(doc, dict) and "tables" in doc else [doc]
    for tbl in tables:
        name = tbl.get("name") or tbl.get("table_id") or "table"
        model = Model(description=tbl.get("comment") or None)
        for col in tbl.get("columns") or []:
            model.fields[col["name"]] = _field(col)
        spec.models[name] = model
    return spec
