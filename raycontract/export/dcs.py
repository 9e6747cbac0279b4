"""Contract spec → DCS YAML serializer (round-trips from_dict/from_string).

The reference gets this for free from pydantic's ``model_dump``; our plain
dataclasses serialize explicitly. Used by the import CLI (imported contracts
are emitted as YAML) and by ``init``.
"""

from __future__ import annotations

from typing import Any

import yaml

from raycontract.contract import DataContractSpecification, Field, Model, Quality, Server


def _quality_dict(q: Quality) -> dict:
    out: dict[str, Any] = {}
    for k in ("type", "description", "query", "mustBe", "mustNotBe",
              "mustBeGreaterThan", "mustBeGreaterThanOrEqualTo",
              "mustBeLessThan", "mustBeLessThanOrEqualTo",
              "mustBeBetween", "mustNotBeBetween"):
        v = getattr(q, k)
        if v is not None:
            out[k] = v
    return out


def field_dict(f: Field) -> dict:
    out: dict[str, Any] = {}
    for k in ("type", "title", "description", "required", "unique", "references",
              "format", "pattern", "minLength", "maxLength", "minimum", "maximum",
              "exclusiveMinimum", "exclusiveMaximum", "enum", "precision", "scale",
              "primaryKey"):
        v = getattr(f, k)
        if v is not None and v != []:
            out[k] = v
    if f.fields:
        out["fields"] = {n: field_dict(sf) for n, sf in f.fields.items()}
    if f.items is not None:
        out["items"] = field_dict(f.items)
    if f.keys is not None:
        out["keys"] = field_dict(f.keys)
    if f.values is not None:
        out["values"] = field_dict(f.values)
    if f.quality:
        out["quality"] = [_quality_dict(q) for q in f.quality]
    if f.config:
        out["config"] = f.config
    return out


def _model_dict(m: Model) -> dict:
    out: dict[str, Any] = {}
    if m.type and m.type != "table":
        out["type"] = m.type
    for k in ("title", "description"):
        v = getattr(m, k)
        if v is not None:
            out[k] = v
    out["fields"] = {n: field_dict(f) for n, f in m.fields.items()}
    if m.primaryKey:
        out["primaryKey"] = m.primaryKey
    if m.quality:
        out["quality"] = [_quality_dict(q) for q in m.quality]
    if m.config:
        out["config"] = m.config
    return out


def _server_dict(s: Server) -> dict:
    out: dict[str, Any] = {}
    for k in ("type", "format", "path", "location", "delimiter", "dataProductId"):
        v = getattr(s, k)
        if v is not None:
            out[k] = v
    out.update(s.config or {})
    return out


def spec_to_dict(spec: DataContractSpecification) -> dict:
    out: dict[str, Any] = {
        "dataContractSpecification": spec.dataContractSpecification or "1.1.0",
        "id": spec.id,
        "info": {k: v for k, v in (("title", spec.info.title),
                                   ("version", spec.info.version),
                                   ("description", spec.info.description))
                 if v is not None},
    }
    if spec.terms:
        out["terms"] = spec.terms
    if spec.servers:
        out["servers"] = {n: _server_dict(s) for n, s in spec.servers.items()}
    if spec.models:
        out["models"] = {n: _model_dict(m) for n, m in spec.models.items()}
    if spec.definitions:
        out["definitions"] = {n: field_dict(f) for n, f in spec.definitions.items()}
    if spec.servicelevels is not None:
        sl: dict[str, Any] = {}
        if spec.servicelevels.freshness is not None:
            fr = spec.servicelevels.freshness
            sl["freshness"] = {k: v for k, v in (("threshold", fr.threshold),
                                                 ("timestampField", fr.timestampField))
                               if v is not None}
        if spec.servicelevels.retention is not None:
            rt = spec.servicelevels.retention
            sl["retention"] = {k: v for k, v in (("period", rt.period),
                                                 ("timestampField", rt.timestampField),
                                                 ("unlimited", rt.unlimited))
                               if v is not None}
        if sl:
            out["servicelevels"] = sl
    if spec.quality is not None:
        out["quality"] = spec.quality
    return out


def export_dcs_yaml(spec: DataContractSpecification) -> str:
    return yaml.safe_dump(spec_to_dict(spec), sort_keys=False, allow_unicode=True)
