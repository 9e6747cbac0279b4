"""ODCS v3 (Open Data Contract Standard) → contract importer.

≅ the reference's ``imports/odcs_v3_importer.py`` essentials: detect an ODCS
document (``apiVersion: v3*`` + ``kind: DataContract``, cf.
``lint/resolve.py:248-252`` auto-detect), map ``schema[].properties[]`` →
models/fields (logicalType → contract types, required/unique/primaryKey,
per-property quality passthrough) and top-level servers/SLA basics.
"""

from __future__ import annotations

from typing import Any, Optional

import yaml

from raycontract.contract import (
    DATACONTRACT_TYPES,
    DataContractSpecification,
    Field,
    Info,
    Model,
    Quality,
    Server,
)


def is_odcs(doc: dict) -> bool:
    api = str(doc.get("apiVersion", ""))
    return doc.get("kind") == "DataContract" and api.startswith("v3")


def _map_type(t: Optional[str]) -> Optional[str]:
    if t is None:
        return None
    t = t.lower()
    if t in DATACONTRACT_TYPES:
        return t
    aliases = {"datetime": "timestamp", "date-time": "timestamp", "number": "double"}
    return aliases.get(t)


def _import_field(prop: dict, composite_pk: bool) -> Optional[Field]:
    mapped = _map_type(prop.get("logicalType"))
    if mapped is None:
        return None
    f = Field(
        type=mapped,
        description=prop.get("description"),
        title=prop.get("businessName"),
        required=prop.get("required"),
        unique=prop.get("unique"),
        primaryKey=bool(prop.get("primaryKey")) if not composite_pk else False,
    )
    lo = prop.get("logicalTypeOptions") or {}
    for src, dst in (("minLength", "minLength"), ("maxLength", "maxLength"),
                     ("minimum", "minimum"), ("maximum", "maximum"),
                     ("pattern", "pattern"), ("format", "format")):
        if lo.get(src) is not None:
            setattr(f, dst, lo[src])
    if prop.get("quality"):
        f.quality = [Quality.from_dict(q) for q in prop["quality"] if isinstance(q, dict)]
    return f


def import_odcs_from_dict(doc: dict) -> DataContractSpecification:
    spec = DataContractSpecification(dataContractSpecification="1.1.0")
    spec.id = doc.get("id") or doc.get("name")
    spec.info = Info(title=doc.get("name"), version=doc.get("version"),
                     description=(doc.get("description") or {}).get("purpose")
                     if isinstance(doc.get("description"), dict) else doc.get("description"))

    for schema in doc.get("schema") or []:
        model_name = schema.get("physicalName") or schema.get("name")
        props = schema.get("properties") or []
        pks = [p for p in props if p.get("primaryKey")]
        composite = len(pks) > 1
        model = Model(type="table", title=schema.get("name"),
                      description=schema.get("description"))
        for p in props:
            f = _import_field(p, composite)
            if f is not None:
                model.fields[p["name"]] = f
        if composite:
            model.primaryKey = [p["name"] for p in pks]
        if schema.get("quality"):
            model.quality = [Quality.from_dict(q) for q in schema["quality"]
                             if isinstance(q, dict)]
        spec.models[model_name] = model

    for srv in doc.get("servers") or []:
        name = srv.get("server") or srv.get("environment") or "default"
        spec.servers[name] = Server(type=srv.get("type"), format=srv.get("format"),
                                    path=srv.get("path") or srv.get("location"))

    # slaProperties → servicelevels (inverse of export/odcs.py)
    sla = {p.get("property"): p for p in (doc.get("slaProperties") or [])
           if isinstance(p, dict)}
    if "freshness" in sla or "retention" in sla:
        from raycontract.contract import Freshness, Retention, ServiceLevel

        sl = ServiceLevel()
        if "freshness" in sla:
            p = sla["freshness"]
            sl.freshness = Freshness(threshold=p.get("value"),
                                     timestampField=p.get("element"))
        if "retention" in sla:
            p = sla["retention"]
            sl.retention = Retention(period=p.get("value"),
                                     timestampField=p.get("element"))
        spec.servicelevels = sl
    return spec


def import_odcs(source: str) -> DataContractSpecification:
    with open(source) as fh:
        doc = yaml.safe_load(fh)
    if not is_odcs(doc):
        raise ValueError("not an ODCS v3 document (need kind=DataContract, apiVersion=v3*)")
    return import_odcs_from_dict(doc)
