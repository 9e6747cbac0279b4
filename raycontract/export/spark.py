"""Contract → PySpark StructType code exporter.

≅ the reference's ``export/spark_converter.py``: emits Python source that
builds one ``StructType`` per model (nullable = not required; nested
StructType / ArrayType / MapType / DecimalType(p,s); timestamp vs
timestamp_ntz mapped to TimestampType vs TimestampNTZType).
"""

from __future__ import annotations

from typing import Optional

from raycontract.contract import DataContractSpecification, Field

_SIMPLE = {
    "string": "StringType()", "text": "StringType()", "varchar": "StringType()",
    "int": "IntegerType()", "integer": "IntegerType()",
    "long": "LongType()", "bigint": "LongType()",
    "float": "FloatType()", "double": "DoubleType()",
    "boolean": "BooleanType()", "bytes": "BinaryType()",
    "date": "DateType()", "time": "StringType()",
    "timestamp": "TimestampType()", "timestamp_tz": "TimestampType()",
    "timestamp_ntz": "TimestampNTZType()", "null": "NullType()",
}


def spark_type(f: Optional[Field]) -> str:
    if f is None or f.type is None:
        return "StringType()"
    t = f.type.lower()
    if t in _SIMPLE:
        return _SIMPLE[t]
    if t in ("number", "decimal", "numeric"):
        p = f.precision if f.precision is not None else 38
        s = f.scale if f.scale is not None else 0
        return f"DecimalType({p}, {s})"
    if t == "array":
        return f"ArrayType({spark_type(f.items)})"
    if t == "map":
        return f"MapType({spark_type(f.keys)}, {spark_type(f.values)})"
    if t in ("object", "record", "struct"):
        return _struct(f.fields)
    return "StringType()"


def _struct(fields: dict) -> str:
    parts = []
    for n, f in fields.items():
        nullable = "False" if f.required else "True"
        parts.append(f'StructField("{n}", {spark_type(f)}, {nullable})')
    return "StructType([" + ", ".join(parts) + "])"


def export_spark(spec: DataContractSpecification) -> str:
    out = ["from pyspark.sql.types import *", ""]
    for name, model in spec.models.items():
        out.append(f"{name} = {_struct(model.fields)}")
        out.append("")
    return "\n".join(out)
