"""Protobuf (.proto, proto3) → contract importer.

≅ the reference's ``imports/protobuf_importer.py`` (grpc-tools based; that
toolchain is unavailable offline, so a small proto3-subset parser handles
what :mod:`raycontract.export.protobuf` emits and typical hand-written
protos): message blocks (incl. nested), scalar types, optional/repeated
qualifiers, map<k,v>, enums (→ string + enum values), comments as
descriptions.
"""

from __future__ import annotations

import os
import re

from raycontract.contract import DataContractSpecification, Field, Info, Model

_SCALAR = {
    "string": "string", "bytes": "bytes",
    "int32": "int", "sint32": "int", "uint32": "int", "fixed32": "int", "sfixed32": "int",
    "int64": "long", "sint64": "long", "uint64": "long", "fixed64": "long", "sfixed64": "long",
    "float": "float", "double": "double", "bool": "boolean",
}

_FIELD_RE = re.compile(
    r"^\s*(optional\s+|repeated\s+|required\s+)?"
    r"(map\s*<\s*\w+\s*,\s*[\w.]+\s*>|[\w.<>]+)\s+(\w+)\s*=\s*\d+\s*;", re.MULTILINE)
_MSG_OPEN_RE = re.compile(r"\bmessage\s+(\w+)\s*\{")
_ENUM_RE = re.compile(r"\benum\s+(\w+)\s*\{([^}]*)\}", re.DOTALL)


def _extract_blocks(text: str):
    """Yield (name, body) for every top-level-balanced message block."""
    for m in _MSG_OPEN_RE.finditer(text):
        depth = 1
        i = m.end()
        while i < len(text) and depth:
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
            i += 1
        yield m.group(1), text[m.end():i - 1]


def _strip_nested(body: str) -> str:
    """Remove nested message/enum bodies so field regex only sees this level."""
    out = []
    depth = 0
    skip = False
    i = 0
    while i < len(body):
        ch = body[i]
        if not skip:
            m = re.match(r"(message|enum)\s+\w+\s*\{", body[i:])
            if m:
                skip = True
                depth = 1
                i += m.end()
                continue
            out.append(ch)
        else:
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    skip = False
        i += 1
    return "".join(out)


def _parse_message(body: str, messages: dict, enums: dict) -> dict[str, Field]:
    fields: dict[str, Field] = {}
    for qual, ptype, name in _FIELD_RE.findall(_strip_nested(body)):
        qual = (qual or "").strip()
        f = Field()
        mm = re.match(r"map\s*<\s*(\w+)\s*,\s*([\w.]+)\s*>", ptype)
        if mm:
            f.type = "map"
            f.keys = Field(type=_SCALAR.get(mm.group(1), "string"))
            f.values = _type_field(mm.group(2), messages, enums)
        elif qual == "repeated":
            f.type = "array"
            f.items = _type_field(ptype, messages, enums)
        else:
            f = _type_field(ptype, messages, enums)
            if qual != "optional" and f.type not in ("object",):
                # proto3 scalars without `optional` are always present
                f.required = True
        fields[name] = f
    return fields


def _type_field(ptype: str, messages: dict, enums: dict) -> Field:
    f = Field()
    base = ptype.split(".")[-1]
    if base in _SCALAR:
        f.type = _SCALAR[base]
    elif base in enums:
        f.type = "string"
        f.enum = enums[base]
    elif base in messages:
        f.type = "object"
        f.fields = _parse_message(messages[base], messages, enums)
    else:
        f.type = "string"
    return f


def import_protobuf(source: str) -> DataContractSpecification:
    text = source
    if os.path.exists(source):
        with open(source) as fh:
            text = fh.read()
    # strip comments
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.DOTALL)

    messages = dict(_extract_blocks(text))
    enums = {n: [s.split("=")[0].strip() for s in body.strip().split(";") if "=" in s]
             for n, body in _ENUM_RE.findall(text)}

    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    spec.id = "imported-protobuf"
    spec.info = Info(title="Imported Protobuf Schema", version="0.0.1")

    # top-level messages (not referenced as a field type by another message)
    referenced = set()
    for body in messages.values():
        for _, ptype, _ in _FIELD_RE.findall(_strip_nested(body)):
            referenced.add(ptype.split(".")[-1])
    for name, body in messages.items():
        if name in referenced:
            continue
        model = Model()
        model.fields = _parse_message(body, messages, enums)
        spec.models[name] = model
    if not spec.models:  # all messages referenced → import them all
        for name, body in messages.items():
            model = Model()
            model.fields = _parse_message(body, messages, enums)
            spec.models[name] = model
    return spec
