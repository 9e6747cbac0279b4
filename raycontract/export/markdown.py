"""Contract → Markdown documentation exporter.

≅ the reference's ``export/markdown_converter.py``: info header, per-model
field tables (type, required/unique/pk flags, constraints, description),
servers, service levels, quality checks.
"""

from __future__ import annotations

from raycontract.contract import DataContractSpecification, Field


def _constraints(f: Field) -> str:
    parts = []
    if f.pattern:
        parts.append(f"pattern `{f.pattern}`")
    if f.enum:
        parts.append("enum " + ", ".join(map(str, f.enum)))
    if f.minLength is not None:
        parts.append(f"minLength {f.minLength}")
    if f.maxLength is not None:
        parts.append(f"maxLength {f.maxLength}")
    if f.minimum is not None:
        parts.append(f"min {f.minimum}")
    if f.maximum is not None:
        parts.append(f"max {f.maximum}")
    if f.exclusiveMinimum is not None:
        parts.append(f"exclusiveMin {f.exclusiveMinimum}")
    if f.exclusiveMaximum is not None:
        parts.append(f"exclusiveMax {f.exclusiveMaximum}")
    if f.format:
        parts.append(f"format {f.format}")
    if f.references:
        parts.append(f"references {f.references}")
    return ", ".join(parts)


def _flags(f: Field) -> str:
    out = []
    if f.primaryKey:
        out.append("PK")
    if f.required:
        out.append("required")
    if f.unique:
        out.append("unique")
    return " ".join(out)


def _field_rows(prefix: str, f: Field, rows: list) -> None:
    for n, sub in (f.fields or {}).items():
        name = f"{prefix}.{n}"
        rows.append((name, sub.type or "", _flags(sub), _constraints(sub),
                     sub.description or ""))
        _field_rows(name, sub, rows)
    if f.items is not None:
        name = f"{prefix}[]"
        rows.append((name, f.items.type or "", _flags(f.items),
                     _constraints(f.items), f.items.description or ""))
        _field_rows(name, f.items, rows)


def export_markdown(spec: DataContractSpecification) -> str:
    out: list[str] = []
    title = spec.info.title or spec.id or "Data Contract"
    out.append(f"# {title}")
    out.append("")
    meta = []
    if spec.id:
        meta.append(f"- **id**: `{spec.id}`")
    if spec.info.version:
        meta.append(f"- **version**: {spec.info.version}")
    if spec.dataContractSpecification:
        meta.append(f"- **specification**: {spec.dataContractSpecification}")
    out.extend(meta)
    if spec.info.description:
        out += ["", spec.info.description]

    if spec.servers:
        out += ["", "## Servers", ""]
        out.append("| name | type | format | path |")
        out.append("|---|---|---|---|")
        for n, s in spec.servers.items():
            out.append(f"| {n} | {s.type or ''} | {s.format or ''} | "
                       f"{s.path or s.location or ''} |")

    for mname, model in spec.models.items():
        out += ["", f"## Model `{mname}`", ""]
        if model.description:
            out += [model.description, ""]
        out.append("| field | type | flags | constraints | description |")
        out.append("|---|---|---|---|---|")
        rows: list = []
        for n, f in model.fields.items():
            rows.append((n, f.type or "", _flags(f), _constraints(f),
                         f.description or ""))
            _field_rows(n, f, rows)
        for r in rows:
            out.append("| " + " | ".join(str(x) for x in r) + " |")
        qualities = list(model.quality) + [q for f in model.fields.values()
                                           for q in f.quality]
        if qualities:
            out += ["", f"### Quality checks ({mname})", ""]
            for q in qualities:
                desc = q.description or q.type or "check"
                out.append(f"- {desc}" + (f": `{q.query}`" if q.query else ""))

    if spec.servicelevels is not None:
        out += ["", "## Service levels", ""]
        fr = spec.servicelevels.freshness
        if fr is not None and fr.threshold:
            out.append(f"- **freshness**: {fr.threshold} on `{fr.timestampField}`")
        rt = spec.servicelevels.retention
        if rt is not None and rt.period:
            out.append(f"- **retention**: {rt.period} on `{rt.timestampField}`")
    return "\n".join(out) + "\n"
