"""Contract → protobuf (proto3) exporter.

≅ the reference's ``export/protobuf_converter.py``: one message per model,
nested messages for object fields, ``repeated`` for arrays, ``map<,>`` for
maps, ``optional`` for non-required scalars, sequential field numbers,
descriptions as comments.
"""

from __future__ import annotations

from typing import Optional

from raycontract.contract import DataContractSpecification, Field

_SIMPLE = {
    "string": "string", "text": "string", "varchar": "string",
    "int": "int32", "integer": "int32", "long": "int64", "bigint": "int64",
    "float": "float", "double": "double",
    "number": "double", "decimal": "double", "numeric": "double",
    "boolean": "bool", "bytes": "bytes",
    "date": "string", "time": "string",
    "timestamp": "string", "timestamp_tz": "string", "timestamp_ntz": "string",
}


def _msg_name(name: str) -> str:
    return "".join(p.capitalize() for p in name.replace("-", "_").split("_")) or "Msg"


def _proto_type(f: Optional[Field], hint: str, nested: list, indent: str) -> str:
    if f is None or f.type is None:
        return "string"
    t = f.type.lower()
    if t in _SIMPLE:
        return _SIMPLE[t]
    if t in ("object", "record", "struct"):
        name = _msg_name(hint)
        nested.append(_render_message(name, f.fields, indent))
        return name
    if t == "map":
        k = _proto_type(f.keys, hint + "Key", nested, indent)
        v = _proto_type(f.values, hint + "Value", nested, indent)
        return f"map<{k}, {v}>"
    return "string"


def _render_message(name: str, fields: dict, indent: str = "") -> str:
    inner = indent + "  "
    nested: list[str] = []
    lines = []
    num = 0
    for n, f in fields.items():
        num += 1
        t = (f.type or "").lower()
        if f.description:
            lines.append(f"{inner}// {f.description}")
        if t == "array":
            item = _proto_type(f.items, f"{name}_{n}", nested, inner)
            lines.append(f"{inner}repeated {item} {n} = {num};")
            continue
        pt = _proto_type(f, f"{name}_{n}", nested, inner)
        qualifier = ""
        if not f.required and not pt.startswith("map<") and pt in _SIMPLE.values():
            qualifier = "optional "
        lines.append(f"{inner}{qualifier}{pt} {n} = {num};")
    body = "\n".join([f"{inner}{m}" if False else m for m in nested] + lines)
    return f"{indent}message {name} {{\n{body}\n{indent}}}"


def export_protobuf(spec: DataContractSpecification) -> str:
    out = ['syntax = "proto3";', ""]
    for name, model in spec.models.items():
        if model.description:
            out.append(f"// {model.description}")
        out.append(_render_message(_msg_name(name), model.fields))
        out.append("")
    return "\n".join(out)
