"""Contract → Go struct source exporter.

≅ the reference's ``export/go_converter.py``: one struct per model, exported
CamelCase field names with json/avro tags, pointer types for optional
fields, nested structs for objects.
"""

from __future__ import annotations

from typing import Optional

from raycontract.contract import DataContractSpecification, Field

_GO_TYPES = {
    "string": "string", "text": "string", "varchar": "string",
    "int": "int32", "integer": "int32", "long": "int64", "bigint": "int64",
    "float": "float32", "double": "float64",
    "number": "float64", "decimal": "float64", "numeric": "float64",
    "boolean": "bool", "bytes": "[]byte",
    "date": "time.Time", "time": "time.Time",
    "timestamp": "time.Time", "timestamp_tz": "time.Time", "timestamp_ntz": "time.Time",
}


def _camel(name: str) -> str:
    return "".join(p.capitalize() for p in name.replace("-", "_").split("_"))


def _go_type(f: Optional[Field], hint: str, nested: list) -> str:
    if f is None or f.type is None:
        return "interface{}"
    t = f.type.lower()
    if t in _GO_TYPES:
        return _GO_TYPES[t]
    if t == "array":
        return "[]" + _go_type(f.items, hint + "Item", nested)
    if t == "map":
        return f"map[string]{_go_type(f.values, hint + 'Value', nested)}"
    if t in ("object", "record", "struct"):
        name = _camel(hint)
        nested.append(_render_struct(name, f.fields, nested))
        return name
    return "interface{}"


def _render_struct(name: str, fields: dict, nested: list) -> str:
    lines = [f"type {name} struct {{"]
    for n, f in fields.items():
        gt = _go_type(f, f"{name}{_camel(n)}", nested)
        if not f.required and not gt.startswith(("[]", "map[")):
            gt = "*" + gt
        tag = f'`json:"{n}" avro:"{n}"`'
        lines.append(f"    {_camel(n)} {gt} {tag}")
    lines.append("}")
    return "\n".join(lines)


def export_go(spec: DataContractSpecification, package: str = "main") -> str:
    nested: list[str] = []
    structs = [_render_struct(_camel(n), m.fields, nested)
               for n, m in spec.models.items()]
    body = "\n\n".join(nested + structs)
    header = f"package {package}\n"
    if "time.Time" in body:
        header += '\nimport "time"\n'
    return header + "\n" + body + "\n"
