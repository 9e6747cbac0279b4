"""Contract logical types ↔ Arrow physical types.

Inverts the reference's Arrow→contract mapping
(``imports/parquet_importer.py:44-81``) and stands in for the per-dialect SQL
type map (``export/sql_type_converter.py:243-310`` DuckDB branch): since our
execution engine IS Arrow, the ``field_type`` check compares the dataset's
``pyarrow.Schema`` against the contract→Arrow mapping — metadata only, no
scan.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from raycontract.contract import Field


def contract_field_to_arrow(field: Field) -> pa.DataType:
    # per-field physical override (≅ the reference's per-dialect config
    # overrides, e.g. config.postgresType — ours is the engine's dialect):
    # config.arrowType names any pyarrow alias ("uint32", "float16", ...)
    if field.config:
        override = field.config.get("arrowType")
        if override:
            try:
                return pa.type_for_alias(str(override))
            except ValueError:
                pass
    t = (field.type or "").lower()
    if t in ("string", "text", "varchar"):
        return pa.string()
    if t in ("int", "integer"):
        return pa.int32()
    if t in ("long", "bigint"):
        return pa.int64()
    if t == "float":
        return pa.float32()
    if t == "double":
        return pa.float64()
    if t in ("number", "decimal", "numeric"):
        if field.precision is not None:
            return pa.decimal128(field.precision, field.scale or 0)
        return pa.decimal128(38, 0)
    if t == "boolean":
        return pa.bool_()
    if t in ("timestamp", "timestamp_tz"):
        return pa.timestamp("us", tz="UTC")
    if t == "timestamp_ntz":
        return pa.timestamp("us")
    if t == "date":
        return pa.date32()
    if t == "time":
        return pa.time64("us")
    if t == "bytes":
        return pa.binary()
    if t == "array":
        inner = contract_field_to_arrow(field.items) if field.items else pa.null()
        return pa.list_(inner)
    if t == "map":
        k = contract_field_to_arrow(field.keys) if field.keys else pa.string()
        v = contract_field_to_arrow(field.values) if field.values else pa.null()
        return pa.map_(k, v)
    if t in ("object", "record", "struct"):
        children = [pa.field(n, contract_field_to_arrow(f)) for n, f in field.fields.items()]
        return pa.struct(children)
    if t == "null":
        return pa.null()
    raise ValueError(f"unknown contract type: {field.type!r}")


def arrow_type_matches(actual: pa.DataType, expected: pa.DataType) -> bool:
    """Lenient physical-type equality.

    Equivalences allowed (they are representation variants of the same
    logical type, the way DuckDB collapses them in the reference's
    ``field_type`` check):
      - string ≡ large_string, binary ≡ large_binary
      - timestamps match across unit; tz-naive vs tz-aware is a MISMATCH
        (timestamp vs timestamp_ntz is contract-significant)
      - list ≡ large_list with matching element
      - decimal matches on (precision, scale)
    """
    if actual.equals(expected):
        return True
    if pa.types.is_string(actual) or pa.types.is_large_string(actual):
        return pa.types.is_string(expected) or pa.types.is_large_string(expected)
    if pa.types.is_binary(actual) or pa.types.is_large_binary(actual):
        return pa.types.is_binary(expected) or pa.types.is_large_binary(expected)
    if pa.types.is_timestamp(actual) and pa.types.is_timestamp(expected):
        return bool(actual.tz) == bool(expected.tz)
    if pa.types.is_time(actual) and pa.types.is_time(expected):
        return True
    if (pa.types.is_list(actual) or pa.types.is_large_list(actual)) and (
        pa.types.is_list(expected) or pa.types.is_large_list(expected)
    ):
        return arrow_type_matches(actual.value_type, expected.value_type)
    if pa.types.is_struct(actual) and pa.types.is_struct(expected):
        if actual.num_fields != expected.num_fields:
            return False
        return all(
            actual.field(i).name == expected.field(i).name
            and arrow_type_matches(actual.field(i).type, expected.field(i).type)
            for i in range(actual.num_fields)
        )
    if pa.types.is_map(actual) and pa.types.is_map(expected):
        return arrow_type_matches(actual.key_type, expected.key_type) and arrow_type_matches(
            actual.item_type, expected.item_type
        )
    if pa.types.is_decimal(actual) and pa.types.is_decimal(expected):
        return actual.precision == expected.precision and actual.scale == expected.scale
    return False


def arrow_to_contract_type(t: pa.DataType) -> Optional[str]:
    """Arrow → contract logical type (mirrors parquet_importer.py:44-81)."""
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_int8(t) or pa.types.is_int16(t) or pa.types.is_int32(t):
        return "int"
    if pa.types.is_int64(t):
        return "long"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t):
        return "timestamp" if t.tz else "timestamp_ntz"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_time(t):
        return "time"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_map(t):
        return "map"
    if pa.types.is_struct(t):
        return "object"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "array"
    if pa.types.is_null(t):
        return "null"
    return None
