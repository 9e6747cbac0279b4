"""Contract → ODCS v3 (Open Data Contract Standard) exporter.

≅ the reference's ``export/odcs_v3_exporter.py`` essentials, and the inverse
of :mod:`raycontract.imports.odcs`: models → ``schema[]`` with
``properties[]`` (logicalType, logicalTypeOptions for constraints,
required/unique/primaryKey with position), servers, SLA properties from
servicelevels. Round-trip tested against the importer.
"""

from __future__ import annotations

from typing import Any, Optional

import yaml

from raycontract.contract import DataContractSpecification, Field, Model


def _logical_type(t: Optional[str]) -> Optional[str]:
    if t is None:
        return None
    t = t.lower()
    # ODCS logical types are a coarser set; DCS types map onto them
    aliases = {"text": "string", "varchar": "string",
               "int": "integer", "long": "integer", "bigint": "integer",
               "float": "number", "double": "number", "decimal": "number",
               "numeric": "number", "number": "number",
               "timestamp": "date", "timestamp_tz": "date", "timestamp_ntz": "date",
               "date": "date", "time": "date",
               "bytes": "array", "object": "object", "record": "object",
               "struct": "object", "array": "array", "boolean": "boolean",
               "string": "string", "map": "object", "null": "string"}
    return aliases.get(t, "string")


def _property(name: str, f: Field, pk_position: Optional[int]) -> dict:
    out: dict[str, Any] = {"name": name}
    if f.type is not None:
        out["logicalType"] = _logical_type(f.type)
        out["physicalType"] = f.type
    if f.description is not None:
        out["description"] = f.description
    if f.title is not None:
        out["businessName"] = f.title
    if f.required is not None:
        out["required"] = f.required
    if f.unique is not None:
        out["unique"] = f.unique
    if pk_position is not None:
        out["primaryKey"] = True
        out["primaryKeyPosition"] = pk_position
    lo: dict[str, Any] = {}
    for src in ("minLength", "maxLength", "minimum", "maximum", "pattern", "format"):
        v = getattr(f, src)
        if v is not None:
            lo[src] = v
    if lo:
        out["logicalTypeOptions"] = lo
    if f.quality:
        out["quality"] = [
            {k: v for k, v in vars(q).items() if v is not None} for q in f.quality
        ]
    return out


def _schema_entry(name: str, m: Model) -> dict:
    pk_names = list(m.primaryKey) if m.primaryKey else [
        n for n, f in m.fields.items() if f.primaryKey]
    out: dict[str, Any] = {
        "name": m.title or name,
        "physicalName": name,
        "logicalType": "object",
        "physicalType": m.type or "table",
    }
    if m.description is not None:
        out["description"] = m.description
    props = []
    for n, f in m.fields.items():
        pos = pk_names.index(n) + 1 if n in pk_names else None
        props.append(_property(n, f, pos))
    out["properties"] = props
    if m.quality:
        out["quality"] = [
            {k: v for k, v in vars(q).items() if v is not None} for q in m.quality
        ]
    return out


def export_odcs_dict(spec: DataContractSpecification) -> dict:
    doc: dict[str, Any] = {
        "apiVersion": "v3.0.1",
        "kind": "DataContract",
        "id": spec.id,
        "name": spec.info.title or spec.id,
        "version": spec.info.version or "0.0.1",
        "status": "active",
    }
    if spec.info.description:
        doc["description"] = {"purpose": spec.info.description}
    doc["schema"] = [_schema_entry(n, m) for n, m in spec.models.items()]
    if spec.servers:
        doc["servers"] = [
            {k: v for k, v in (("server", name), ("type", s.type), ("format", s.format),
                               ("path", s.path or s.location)) if v is not None}
            for name, s in spec.servers.items()
        ]
    sla = []
    if spec.servicelevels is not None:
        fr = spec.servicelevels.freshness
        if fr is not None and fr.threshold:
            sla.append({"property": "freshness", "value": fr.threshold,
                        "element": fr.timestampField})
        rt = spec.servicelevels.retention
        if rt is not None and rt.period:
            sla.append({"property": "retention", "value": rt.period,
                        "element": rt.timestampField})
    if sla:
        doc["slaProperties"] = sla
    return doc


def export_odcs(spec: DataContractSpecification) -> str:
    return yaml.safe_dump(export_odcs_dict(spec), sort_keys=False, allow_unicode=True)
