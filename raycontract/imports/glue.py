"""AWS Glue catalog → contract importer.

≅ the reference's ``imports/glue_importer.py:44-288`` — same semantics for
the testable surface: Hive type strings (incl. nested
``struct<...>``/``array<...>``/``map<k,v>``, ``decimal(p,s)``,
``varchar(n)``) map to contract fields, Hive partition keys become REQUIRED
fields (not primary keys), column Comments become descriptions, and the
database's CatalogId / LocationUri land on a ``production`` glue server.

The reference reads the live catalog via boto3 (network); offline, the
source is a JSON fixture with the SAME shapes the Glue API returns::

    {"Database": {"Name": "db", "CatalogId": "123", "LocationUri": "s3://.."},
     "Tables": [{"Name": "t",
                 "StorageDescriptor": {"Columns": [{"Name":..,"Type":..,"Comment":..}]},
                 "PartitionKeys": [{"Name":..,"Type":..}]}]}

i.e. ``get_database()["Database"]`` plus a list of ``get_table()["Table"]``
payloads — a boto3 response dump imports unchanged.
"""

from __future__ import annotations

import json
import os
import re
from typing import Generator, List, Optional

from raycontract.contract import DataContractSpecification, Field, Info, Model, Server

# flat Hive/Glue type → contract logical type (reference map_type_from_sql,
# glue_importer.py:262-288 — prefix-matched, unknown → "unknown")
_TYPE_PREFIXES = [
    ("string", "string"),
    ("bigint", "bigint"),
    ("int", "int"),
    ("tinyint", "int"),
    ("smallint", "int"),
    ("float", "float"),
    ("double", "double"),
    ("boolean", "boolean"),
    ("timestamp", "timestamp"),
    ("date", "date"),
    ("binary", "bytes"),
]


def split_fields(s: str) -> Generator[str, None, None]:
    """Split comma-separated type args, honoring ``<...>``/``(...)`` nesting
    (reference glue_importer.py:228-247)."""
    counter = 0
    last = 0
    for i, x in enumerate(s):
        if x in ("<", "("):
            counter += 1
        elif x in (">", ")"):
            counter -= 1
        elif x == "," and counter == 0:
            yield s[last:i]
            last = i + 1
    yield s[last:]


def create_typed_field(dtype: str) -> Field:
    """Hive type string → Field, recursing into array/struct/map
    (reference glue_importer.py:179-225)."""
    field = Field()
    dtype = dtype.strip().lower().replace(" ", "")
    if dtype.startswith("array<"):
        field.type = "array"
        field.items = create_typed_field(dtype[6:-1])
    elif dtype.startswith("struct<"):
        field.type = "struct"
        for f in split_fields(dtype[7:-1]):
            if ":" not in f:
                continue
            name, sub = f.split(":", 1)
            field.fields[name] = create_typed_field(sub)
    elif dtype.startswith("map<"):
        field.type = "map"
        m = re.match(r"map<(.+?),\s*(.+)>", dtype)
        if m:
            field.keys = create_typed_field(m.group(1))
            field.values = create_typed_field(m.group(2))
    elif dtype.startswith("decimal"):
        field.type = "decimal"
        m = re.match(r"decimal\((\d+),\s*(\d+)\)", dtype)
        if m:
            field.precision = int(m.group(1))
            field.scale = int(m.group(2))
    elif dtype.startswith("varchar"):
        field.type = "varchar"
        if len(dtype) > 7:
            field.maxLength = int(dtype[8:-1])
    else:
        field.type = _map_flat_type(dtype)
    return field


def _map_flat_type(t: str) -> str:
    for prefix, mapped in _TYPE_PREFIXES:
        if t.startswith(prefix):
            return mapped
    return "unknown"


def import_glue(source: str, table_names: Optional[List[str]] = None) -> DataContractSpecification:
    """``source`` is a path to the catalog-dump JSON (or the JSON text)."""
    text = source
    if os.path.exists(source):
        with open(source) as fh:
            text = fh.read()
    doc = json.loads(text)

    db = doc.get("Database") or {}
    spec = DataContractSpecification()
    spec.dataContractSpecification = "1.1.0"
    spec.id = f"glue-{db.get('Name', 'database')}"
    spec.info = Info(title=f"Imported Glue database {db.get('Name', '')}".strip(),
                     version="0.0.1")
    server_kwargs = {"type": "glue"}
    if db.get("CatalogId"):
        server_kwargs["account"] = db["CatalogId"]
    if db.get("Name"):
        server_kwargs["database"] = db["Name"]
    if db.get("LocationUri"):
        server_kwargs["location"] = db["LocationUri"]
    spec.servers = {"production": Server(**server_kwargs)}

    for table in doc.get("Tables", []):
        name = table.get("Name")
        if not name or (table_names and name not in table_names):
            continue
        columns = list((table.get("StorageDescriptor") or {}).get("Columns") or [])
        # hive partition keys: appended to the schema, required but NOT pk
        # (reference glue_importer.py:106-117,163-166)
        for pk in table.get("PartitionKeys") or []:
            columns.append({**pk, "Hive": True})
        fields = {}
        for col in columns:
            f = create_typed_field(col.get("Type", "string"))
            if col.get("Hive"):
                f.required = True
            if col.get("Comment"):
                f.description = col["Comment"]
            fields[col["Name"]] = f
        spec.models[name] = Model(type="table", fields=fields)
    return spec
