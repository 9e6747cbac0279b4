"""Contract → data-caterer generation-task YAML exporter.

≅ the reference's ``export/data_caterer_converter.py``: a generation task
with one step per model — step type/options from the server (parquet/csv/
json path), fields with name/type and generation options derived from the
constraints (regex, oneOf, min/max).
"""

from __future__ import annotations

from typing import Any, Optional

import yaml

from raycontract.contract import DataContractSpecification, Field, Server

_TYPES = {
    "string": "string", "text": "string", "varchar": "string",
    "int": "integer", "integer": "integer", "long": "long", "bigint": "long",
    "float": "float", "double": "double", "number": "double",
    "decimal": "decimal", "numeric": "decimal",
    "boolean": "boolean", "bytes": "binary",
    "date": "date", "time": "string",
    "timestamp": "timestamp", "timestamp_tz": "timestamp", "timestamp_ntz": "timestamp",
    "array": "array", "object": "struct", "record": "struct", "struct": "struct",
    "map": "map",
}


def _field_entry(name: str, f: Field) -> dict:
    out: dict[str, Any] = {"name": name, "type": _TYPES.get((f.type or "string").lower(),
                                                            "string")}
    opts: dict[str, Any] = {}
    if f.pattern:
        opts["regex"] = f.pattern
    if f.enum:
        opts["oneOf"] = list(f.enum)
    if f.minimum is not None:
        opts["min"] = f.minimum
    if f.maximum is not None:
        opts["max"] = f.maximum
    if f.minLength is not None:
        opts["minLen"] = f.minLength
    if f.maxLength is not None:
        opts["maxLen"] = f.maxLength
    if f.unique:
        opts["isUnique"] = True
    if f.required:
        opts["enableNull"] = False
    if opts:
        out["options"] = opts
    if (f.type or "").lower() in ("object", "record", "struct"):
        out["fields"] = [_field_entry(n, sf) for n, sf in f.fields.items()]
    return out


def _step_type(server: Optional[Server]) -> str:
    if server is None:
        return "parquet"
    fmt = (server.format or "parquet").lower()
    return {"parquet": "parquet", "csv": "csv", "json": "json",
            "delta": "delta", "lance": "parquet"}.get(fmt, "parquet")


def export_data_caterer(spec: DataContractSpecification,
                        server_name: Optional[str] = None) -> str:
    server = None
    if spec.servers:
        server = (spec.servers.get(server_name) if server_name
                  else next(iter(spec.servers.values())))
    steps = []
    for mname, model in spec.models.items():
        step: dict[str, Any] = {"name": mname, "type": _step_type(server)}
        options: dict[str, Any] = {}
        if server is not None and (server.path or server.location):
            options["path"] = (server.path or server.location).replace("{model}", mname)
        if options:
            step["options"] = options
        step["fields"] = [_field_entry(n, f) for n, f in model.fields.items()]
        steps.append(step)
    task = {"name": f"{spec.id}_generation", "steps": steps}
    return yaml.safe_dump(task, sort_keys=False, allow_unicode=True)
