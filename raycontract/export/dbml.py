"""Contract → DBML (database markup language) exporter.

≅ the reference's ``export/dbml_converter.py``: Project header, one Table per
model with typed columns, not null / unique / pk settings and notes, Ref
entries from field references.
"""

from __future__ import annotations

from raycontract.contract import DataContractSpecification, Field, Model
from raycontract.export.sql import sql_type


def _column(name: str, f: Field, dialect: str) -> str:
    t = sql_type(f, dialect) or "varchar"
    settings = []
    if f.primaryKey:
        settings.append("pk")
    if f.required:
        settings.append("not null")
    if f.unique:
        settings.append("unique")
    if f.description:
        settings.append(f'note: "{f.description}"')
    s = f' [{", ".join(settings)}]' if settings else ""
    return f'  "{name}" "{t}"{s}'


def _table(name: str, m: Model, dialect: str) -> str:
    lines = [f'Table "{name}" {{']
    for n, f in m.fields.items():
        lines.append(_column(n, f, dialect))
    if m.description:
        lines.append(f"  Note: \"{m.description}\"")
    lines.append("}")
    return "\n".join(lines)


def export_dbml(spec: DataContractSpecification, dialect: str = "duckdb") -> str:
    out = [
        f'Project "{spec.info.title or spec.id}" {{',
        f'  Note: "{spec.info.description or ""}"',
        "}",
        "",
    ]
    refs = []
    for name, m in spec.models.items():
        out.append(_table(name, m, dialect))
        out.append("")
        for fname, f in m.fields.items():
            if f.references and "." in f.references:
                pm, pf = f.references.split(".", 1)
                refs.append(f'Ref: "{name}"."{fname}" > "{pm}"."{pf}"')
    out.extend(refs)
    return "\n".join(out).strip() + "\n"
