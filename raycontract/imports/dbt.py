"""dbt manifest.json → contract importer.

≅ the reference's ``imports/dbt_importer.py``: every node with
``resource_type == "model"`` becomes a contract model; columns carry
data_type (mapped back to contract logical types via the SQL map),
descriptions and tests (not_null → required, unique → unique).
"""

from __future__ import annotations

import json
import os

from raycontract.contract import DataContractSpecification, Field, Info, Model
from raycontract.imports.sql import map_sql_type


def import_dbt_manifest(source: str) -> DataContractSpecification:
    text = source
    if os.path.exists(source):
        with open(source, encoding="utf-8") as fh:
            text = fh.read()
    manifest = json.loads(text)

    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    project = (manifest.get("metadata") or {}).get("project_name") or "dbt"
    spec.id = f"imported-dbt-{project}"
    spec.info = Info(title=f"Imported dbt project {project}", version="0.0.1")

    for key, node in (manifest.get("nodes") or {}).items():
        if node.get("resource_type") != "model":
            continue
        model = Model(description=node.get("description") or None)
        for cname, col in (node.get("columns") or {}).items():
            f = Field()
            dt = col.get("data_type")
            if dt:
                logical, extra = map_sql_type(str(dt))
                f.type = logical or "string"
                for k, v in extra.items():
                    setattr(f, k, v)
            if col.get("description"):
                f.description = col["description"]
            tests = col.get("data_tests") or col.get("tests") or []
            for t in tests:
                name = t if isinstance(t, str) else next(iter(t), "")
                if name == "not_null":
                    f.required = True
                elif name == "unique":
                    f.unique = True
            model.fields[cname] = f
        spec.models[node.get("name") or key.split(".")[-1]] = model
    return spec
