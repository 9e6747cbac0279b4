"""Parquet → contract importer.

≅ the reference's ``imports/parquet_importer.py:18-81``: read a parquet
file's Arrow schema and build a contract model with the inverse type mapping
(bool→boolean, int32-→int, int64→long, float32→float, float64→double,
decimal(p,s)→decimal, timestamp→timestamp[_ntz], date, binary→bytes,
string, map, struct→object with nested fields, list→array with items).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from raycontract.contract import DataContractSpecification, Field, Info, Model
from raycontract.types import arrow_to_contract_type


def field_from_arrow(af: pa.Field) -> Field:
    f = Field()
    f.type = arrow_to_contract_type(af.type)
    if not af.nullable:
        f.required = True
    if pa.types.is_decimal(af.type):
        f.precision = af.type.precision
        f.scale = af.type.scale
    if pa.types.is_struct(af.type):
        f.fields = {af.type.field(i).name: field_from_arrow(af.type.field(i))
                    for i in range(af.type.num_fields)}
    if pa.types.is_list(af.type) or pa.types.is_large_list(af.type):
        f.items = field_from_arrow(pa.field("element", af.type.value_type))
    if pa.types.is_map(af.type):
        f.keys = field_from_arrow(pa.field("key", af.type.key_type))
        f.values = field_from_arrow(pa.field("value", af.type.item_type))
    return f


def import_parquet(path: str, model_name: str | None = None) -> DataContractSpecification:
    if os.path.isdir(path):
        frags = [f for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
        schema = pq.read_schema(os.path.join(path, frags[0]))
    else:
        schema = pq.read_schema(path)
    name = model_name or os.path.splitext(os.path.basename(path))[0]
    model = Model(type="table", fields={
        af.name: field_from_arrow(af) for af in schema
    })
    spec = DataContractSpecification(
        dataContractSpecification="1.1.0",
        id=f"imported-{name}",
        info=Info(title=name, version="0.0.1"),
        models={name: model},
    )
    return spec
