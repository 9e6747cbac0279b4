"""DBML → contract importer.

≅ the reference's ``imports/dbml_importer.py`` (pydbml-based; the wheel is
unavailable offline so a small parser handles the Table/Ref grammar that
:mod:`raycontract.export.dbml` emits and common hand-written DBML): Table
blocks with typed columns + settings (pk / not null / unique / note), Ref
lines → field references.
"""

from __future__ import annotations

import os
import re

from raycontract.contract import DataContractSpecification, Field, Info, Model
from raycontract.imports.sql import map_sql_type

_TABLE_RE = re.compile(r'Table\s+"?([\w.]+)"?\s*\{([^}]*)\}', re.DOTALL)
_COL_RE = re.compile(r'^\s*"?([\w]+)"?\s+"?([\w() ,\[\]<>]+?)"?\s*(?:\[(.*)\])?\s*$')
_REF_RE = re.compile(
    r'Ref:\s*"?([\w]+)"?\s*\.\s*"?([\w]+)"?\s*[<>-]\s*"?([\w]+)"?\s*\.\s*"?([\w]+)"?')
_NOTE_RE = re.compile(r'note:\s*([\'"])(.*?)\1', re.IGNORECASE)


def import_dbml(source: str) -> DataContractSpecification:
    text = source
    if os.path.exists(source):
        with open(source) as fh:
            text = fh.read()

    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    spec.id = "imported-dbml"
    spec.info = Info(title="Imported DBML", version="0.0.1")

    for tname, body in _TABLE_RE.findall(text):
        model = Model()
        for line in body.splitlines():
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            if line.lower().startswith("note:"):
                m = _NOTE_RE.match(line)
                if m:
                    model.description = m.group(2)
                continue
            m = _COL_RE.match(line)
            if not m:
                continue
            cname, ctype, settings = m.group(1), m.group(2).strip(), m.group(3) or ""
            f = Field()
            logical, extra = map_sql_type(ctype)
            f.type = logical or "string"
            for k, v in extra.items():
                setattr(f, k, v)
            low = settings.lower()
            if "pk" in [s.strip() for s in low.split(",")] or "primary key" in low:
                f.primaryKey = True
                f.required = True
            if "not null" in low:
                f.required = True
            if "unique" in [s.strip() for s in low.split(",")]:
                f.unique = True
            nm = _NOTE_RE.search(settings)
            if nm:
                f.description = nm.group(2)
            model.fields[cname] = f
        spec.models[tname] = model

    for child_t, child_f, parent_t, parent_f in _REF_RE.findall(text):
        if child_t in spec.models and child_f in spec.models[child_t].fields:
            spec.models[child_t].fields[child_f].references = f"{parent_t}.{parent_f}"
    return spec
