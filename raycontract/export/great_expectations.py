"""Contract → Great Expectations suite exporter.

≅ the reference's ``export/great_expectations_converter.py``: one expectation
suite per model — ordered-column-list expectation, per-column type /
not-null / unique / length / range / regex / set-membership expectations.
"""

from __future__ import annotations

import json
from typing import Any

from raycontract.contract import DataContractSpecification, Field

_GE_TYPES = {
    "string": "string", "text": "string", "varchar": "string",
    "int": "int", "integer": "int", "long": "long", "bigint": "long",
    "float": "float", "double": "double",
    "number": "decimal", "decimal": "decimal", "numeric": "decimal",
    "boolean": "boolean", "bytes": "bytes",
    "date": "date", "time": "time",
    "timestamp": "timestamp", "timestamp_tz": "timestamp",
    "timestamp_ntz": "timestamp",
}


def _field_expectations(name: str, f: Field) -> list[dict[str, Any]]:
    out: list[dict[str, Any]] = []
    t = (f.type or "").lower()
    if t in _GE_TYPES:
        out.append({"expectation_type": "expect_column_values_to_be_of_type",
                    "kwargs": {"column": name, "type_": _GE_TYPES[t]}})
    if f.required:
        out.append({"expectation_type": "expect_column_values_to_not_be_null",
                    "kwargs": {"column": name}})
    if f.unique:
        out.append({"expectation_type": "expect_column_values_to_be_unique",
                    "kwargs": {"column": name}})
    if f.minLength is not None or f.maxLength is not None:
        out.append({"expectation_type": "expect_column_value_lengths_to_be_between",
                    "kwargs": {"column": name, "min_value": f.minLength,
                               "max_value": f.maxLength}})
    if f.minimum is not None or f.maximum is not None:
        out.append({"expectation_type": "expect_column_values_to_be_between",
                    "kwargs": {"column": name, "min_value": f.minimum,
                               "max_value": f.maximum}})
    if f.pattern is not None:
        out.append({"expectation_type": "expect_column_values_to_match_regex",
                    "kwargs": {"column": name, "regex": f.pattern}})
    if f.enum:
        out.append({"expectation_type": "expect_column_values_to_be_in_set",
                    "kwargs": {"column": name, "value_set": list(f.enum)}})
    return out


def to_great_expectations(spec: DataContractSpecification, model_name: str) -> str:
    model = spec.models[model_name]
    expectations: list[dict[str, Any]] = [{
        "expectation_type": "expect_table_columns_to_match_ordered_list",
        "kwargs": {"column_list": list(model.fields.keys())},
    }]
    for n, f in model.fields.items():
        expectations.extend(_field_expectations(n, f))
    suite = {
        "data_asset_type": "null",
        "expectation_suite_name": f"{spec.id}.{model_name}.{spec.info.version}",
        "expectations": expectations,
        "meta": {},
    }
    return json.dumps(suite, indent=2)


def export_great_expectations(spec: DataContractSpecification) -> str:
    suites = {n: json.loads(to_great_expectations(spec, n)) for n in spec.models}
    if len(suites) == 1:
        return json.dumps(next(iter(suites.values())), indent=2)
    return json.dumps(suites, indent=2)
