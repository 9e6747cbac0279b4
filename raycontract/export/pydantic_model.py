"""Contract → Python pydantic model source exporter.

≅ the reference's ``export/pydantic_converter.py``: one BaseModel class per
model, Optional[...] for non-required fields, nested classes for
struct/object children, typing for arrays/maps, constraint kwargs via
``Field(...)``.
"""

from __future__ import annotations

from typing import Optional

from raycontract.contract import DataContractSpecification, Field, Model

_SIMPLE = {
    "string": "str", "text": "str", "varchar": "str",
    "int": "int", "integer": "int", "long": "int", "bigint": "int",
    "float": "float", "double": "float",
    "number": "Decimal", "decimal": "Decimal", "numeric": "Decimal",
    "boolean": "bool", "bytes": "bytes",
    "date": "date", "time": "time",
    "timestamp": "datetime", "timestamp_tz": "datetime", "timestamp_ntz": "datetime",
    "null": "None",
}


def _class_name(name: str) -> str:
    return "".join(p.capitalize() for p in name.replace("-", "_").split("_")) or "Model"


def _py_type(f: Optional[Field], name_hint: str, nested: list) -> str:
    if f is None or f.type is None:
        return "Any"
    t = f.type.lower()
    if t in _SIMPLE:
        return _SIMPLE[t]
    if t == "array":
        return f"List[{_py_type(f.items, name_hint + 'Item', nested)}]"
    if t == "map":
        k = _py_type(f.keys, name_hint + "Key", nested)
        v = _py_type(f.values, name_hint + "Value", nested)
        return f"Dict[{k}, {v}]"
    if t in ("object", "record", "struct"):
        cname = _class_name(name_hint)
        nested.append(_render_class(cname, f.fields, nested))
        return cname
    return "Any"


def _field_kwargs(f: Field) -> str:
    kw = []
    if f.description is not None:
        kw.append(f"description={f.description!r}")
    if f.pattern is not None:
        kw.append(f"pattern={f.pattern!r}")
    if f.minLength is not None:
        kw.append(f"min_length={f.minLength}")
    if f.maxLength is not None:
        kw.append(f"max_length={f.maxLength}")
    if f.minimum is not None:
        kw.append(f"ge={f.minimum}")
    if f.maximum is not None:
        kw.append(f"le={f.maximum}")
    if f.exclusiveMinimum is not None:
        kw.append(f"gt={f.exclusiveMinimum}")
    if f.exclusiveMaximum is not None:
        kw.append(f"lt={f.exclusiveMaximum}")
    return ", ".join(kw)


def _render_class(cname: str, fields: dict, nested: list) -> str:
    lines = [f"class {cname}(BaseModel):"]
    if not fields:
        lines.append("    pass")
    for n, f in fields.items():
        py = _py_type(f, f"{cname}_{n}", nested)
        kwargs = _field_kwargs(f)
        if f.required:
            default = f" = Field({kwargs})" if kwargs else ""
            lines.append(f"    {n}: {py}{default}")
        else:
            default = f" = Field(None, {kwargs})" if kwargs else " = None"
            lines.append(f"    {n}: Optional[{py}]{default}")
    return "\n".join(lines)


def export_pydantic(spec: DataContractSpecification) -> str:
    nested: list[str] = []
    classes = []
    for name, model in spec.models.items():
        classes.append(_render_class(_class_name(name), model.fields, nested))
    header = (
        "# generated from data contract: " + str(spec.id) + "\n"
        "from __future__ import annotations\n\n"
        "from datetime import date, datetime, time\n"
        "from decimal import Decimal\n"
        "from typing import Any, Dict, List, Optional\n\n"
        "from pydantic import BaseModel, Field\n"
    )
    return header + "\n\n" + "\n\n\n".join(nested + classes) + "\n"
