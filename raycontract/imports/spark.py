"""Spark schema → contract importer.

≅ the reference's ``imports/spark_importer.py`` (live DataFrame based; no
JVM offline, so this parses the two textual schema forms Spark itself
emits): the DDL form (``name TYPE [NOT NULL][, ...]``, from
``df.schema.toDDL()``) and the simpleString form
(``struct<name:type,...>``).
"""

from __future__ import annotations

import os
import re

from raycontract.contract import DataContractSpecification, Field, Info, Model

_SIMPLE = {
    "string": "string", "binary": "bytes",
    "tinyint": "int", "smallint": "int", "int": "int", "integer": "int",
    "bigint": "long", "long": "long",
    "float": "float", "double": "double", "boolean": "boolean",
    "date": "date", "timestamp": "timestamp", "timestamp_ntz": "timestamp_ntz",
}


def _parse_type(s: str) -> Field:
    s = s.strip()
    f = Field()
    low = s.lower()
    m = re.match(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", low)
    if m:
        f.type = "decimal"
        f.precision, f.scale = int(m.group(1)), int(m.group(2))
        return f
    if low.startswith("array<") and low.endswith(">"):
        f.type = "array"
        f.items = _parse_type(s[6:-1])
        return f
    if low.startswith("map<") and low.endswith(">"):
        inner = s[4:-1]
        k, v = _split_top(inner)
        f.type = "map"
        f.keys = _parse_type(k)
        f.values = _parse_type(v)
        return f
    if low.startswith("struct<") and low.endswith(">"):
        f.type = "object"
        for part in _split_fields(s[7:-1]):
            name, _, t = part.partition(":")
            f.fields[name.strip()] = _parse_type(t)
        return f
    f.type = _SIMPLE.get(low, "string")
    return f


def _split_top(s: str) -> tuple[str, str]:
    depth = 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            return s[:i], s[i + 1:]
    return s, "string"


def _split_fields(s: str):
    depth = 0
    cur = ""
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            yield cur
            cur = ""
        else:
            cur += ch
    if cur.strip():
        yield cur


def import_spark(source: str, model_name: str = "model") -> DataContractSpecification:
    """``source``: path to a file or the schema text itself (DDL or
    simpleString form)."""
    text = source
    if os.path.exists(source):
        with open(source) as fh:
            text = fh.read()
    text = text.strip()

    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    spec.id = "imported-spark"
    spec.info = Info(title="Imported Spark Schema", version="0.0.1")
    model = Model()

    if text.lower().startswith("struct<"):
        parsed = _parse_type(text)
        model.fields = parsed.fields
    else:
        # DDL form: `a INT NOT NULL, b STRING, c ARRAY<INT>`
        for part in _split_fields(text):
            part = part.strip().rstrip(",")
            if not part:
                continue
            m = re.match(r"^`?(\w+)`?\s+(.+?)(\s+not\s+null)?$", part,
                         re.IGNORECASE | re.DOTALL)
            if not m:
                continue
            f = _parse_type(m.group(2))
            if m.group(3):
                f.required = True
            model.fields[m.group(1)] = f
    spec.models[model_name] = model
    return spec
