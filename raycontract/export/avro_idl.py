"""Contract → Avro IDL (.avdl) exporter.

≅ the reference's ``export/avro_idl_converter.py``: one protocol per
contract, a record per model, nullable unions for optional fields,
decimal/date/timestamp logical annotations, nested records.
"""

from __future__ import annotations

from typing import Optional

from raycontract.contract import DataContractSpecification, Field

_SIMPLE = {
    "string": "string", "text": "string", "varchar": "string",
    "int": "int", "integer": "int", "long": "long", "bigint": "long",
    "float": "float", "double": "double", "number": "double",
    "boolean": "boolean", "bytes": "bytes", "null": "null",
}


def _ident(name: str) -> str:
    return "".join(c if (c.isalnum() or c == "_") else "_" for c in name)


def _idl_type(f: Optional[Field], hint: str, nested: list) -> str:
    if f is None or f.type is None:
        return "string"
    t = f.type.lower()
    if t in _SIMPLE:
        return _SIMPLE[t]
    if t in ("decimal", "numeric"):
        return f"decimal({f.precision or 38}, {f.scale or 0})"
    if t == "date":
        return "date"
    if t == "time":
        return "time_ms"
    if t in ("timestamp", "timestamp_tz"):
        return "timestamp_ms"
    if t == "timestamp_ntz":
        return "local_timestamp_ms"
    if t == "array":
        return f"array<{_idl_type(f.items, hint + '_item', nested)}>"
    if t == "map":
        return f"map<{_idl_type(f.values, hint + '_value', nested)}>"
    if t in ("object", "record", "struct"):
        rname = _ident(hint)
        nested.append(_record(rname, f.fields, nested))
        return rname
    return "string"


def _record(name: str, fields: dict, nested: list) -> str:
    lines = [f"    record {name} {{"]
    for n, f in fields.items():
        t = _idl_type(f, f"{name}_{n}", nested)
        if not f.required:
            t = f"union {{ null, {t} }}"
        if f.description:
            lines.append(f"        /** {f.description} */")
        lines.append(f"        {t} {_ident(n)};")
    lines.append("    }")
    return "\n".join(lines)


def export_avro_idl(spec: DataContractSpecification) -> str:
    nested: list[str] = []
    records = [_record(_ident(n), m.fields, nested) for n, m in spec.models.items()]
    proto = _ident(spec.id or "DataContract")
    body = "\n\n".join(nested + records)
    doc = f"/** {spec.info.title} ({spec.info.version}) */\n" if spec.info.title else ""
    return f"{doc}protocol {proto} {{\n{body}\n}}\n"
