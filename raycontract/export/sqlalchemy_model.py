"""Contract → SQLAlchemy declarative model source exporter.

≅ the reference's ``export/sqlalchemy_converter.py``: one declarative class
per model with typed Columns, nullable/primary_key/unique kwargs and a
docstring from the description.
"""

from __future__ import annotations

from typing import Optional

from raycontract.contract import DataContractSpecification, Field

_SA_TYPES = {
    "string": "String", "text": "Text", "varchar": "String",
    "int": "Integer", "integer": "Integer", "long": "BigInteger",
    "bigint": "BigInteger", "float": "Float", "double": "Double",
    "boolean": "Boolean", "bytes": "LargeBinary",
    "date": "Date", "time": "Time",
    "timestamp": "DateTime(timezone=True)", "timestamp_tz": "DateTime(timezone=True)",
    "timestamp_ntz": "DateTime",
}


def _sa_type(f: Optional[Field]) -> str:
    if f is None or f.type is None:
        return "String"
    t = f.type.lower()
    if t in ("number", "decimal", "numeric"):
        p = f.precision if f.precision is not None else 38
        s = f.scale if f.scale is not None else 0
        return f"Numeric({p}, {s})"
    if t in ("string", "varchar", "text") and f.maxLength:
        return f"String({f.maxLength})"
    if t in ("array", "object", "record", "struct", "map"):
        return "JSON"
    return _SA_TYPES.get(t, "String")


def _class_name(name: str) -> str:
    return "".join(p.capitalize() for p in name.replace("-", "_").split("_")) or "Model"


def export_sqlalchemy(spec: DataContractSpecification) -> str:
    out = [
        "# generated from data contract: " + str(spec.id),
        "from sqlalchemy import (BigInteger, Boolean, Column, Date, DateTime, Double,",
        "                        Float, Integer, JSON, LargeBinary, Numeric, String,",
        "                        Text, Time)",
        "from sqlalchemy.orm import declarative_base",
        "",
        "Base = declarative_base()",
        "",
    ]
    for name, model in spec.models.items():
        out.append(f"class {_class_name(name)}(Base):")
        if model.description:
            out.append(f'    """{model.description}"""')
        out.append(f'    __tablename__ = "{name}"')
        has_pk = any(f.primaryKey for f in model.fields.values())
        for i, (n, f) in enumerate(model.fields.items()):
            kwargs = []
            if f.primaryKey or (not has_pk and i == 0):
                kwargs.append("primary_key=True")  # SA requires a pk; first col fallback
            if f.required:
                kwargs.append("nullable=False")
            if f.unique:
                kwargs.append("unique=True")
            if f.description:
                kwargs.append(f"doc={f.description!r}")
            kw = (", " + ", ".join(kwargs)) if kwargs else ""
            out.append(f"    {n} = Column({_sa_type(f)}{kw})")
        out.append("")
        out.append("")
    return "\n".join(out)
