"""Contract → dbt exporters (models schema YAML, sources YAML, staging SQL).

≅ the reference's ``export/dbt_converter.py`` trio: ``to_dbt_models_yaml``
(version-2 models with enforced contracts, column data_types, not_null /
unique constraints, dbt_expectations-style data_tests for length / range /
regex / accepted values), ``to_dbt_sources_yaml`` (source tables with column
tests), ``to_dbt_staging_sql`` (select column list from the source).
"""

from __future__ import annotations

from typing import Any, Optional

import yaml

from raycontract.contract import DataContractSpecification, Field, Model
from raycontract.export.sql import sql_type


def _column_tests(f: Field) -> list:
    tests: list[Any] = []
    if f.minLength is not None or f.maxLength is not None:
        tests.append({"dbt_expectations.expect_column_value_lengths_to_be_between": {
            k: v for k, v in (("min_value", f.minLength), ("max_value", f.maxLength))
            if v is not None}})
    if f.pattern is not None:
        tests.append({"dbt_expectations.expect_column_values_to_match_regex": {
            "regex": f.pattern}})
    if f.minimum is not None or f.maximum is not None:
        tests.append({"dbt_expectations.expect_column_values_to_be_between": {
            k: v for k, v in (("min_value", f.minimum), ("max_value", f.maximum))
            if v is not None}})
    if f.enum:
        tests.append({"accepted_values": {"values": list(f.enum)}})
    return tests


def _column(name: str, f: Field, dialect: str, with_constraints: bool) -> dict:
    col: dict[str, Any] = {"name": name}
    dt = sql_type(f, dialect)
    if dt is not None:
        col["data_type"] = dt
    if f.description:
        col["description"] = f.description
    constraints = []
    if f.required:
        constraints.append({"type": "not_null"})
    if f.unique:
        constraints.append({"type": "unique"})
    if f.primaryKey:
        constraints.append({"type": "primary_key"})
    if constraints and with_constraints:
        col["constraints"] = constraints
    tests = _column_tests(f)
    if not with_constraints:
        # sources can't enforce constraints → express them as tests instead
        if f.required:
            tests.insert(0, "not_null")
        if f.unique:
            tests.insert(0, "unique")
    if tests:
        col["data_tests"] = tests
    return col


def _dbt_model(name: str, m: Model, spec, dialect: str) -> dict:
    out: dict[str, Any] = {
        "name": name,
        "config": {
            "meta": {"data_contract": spec.id},
            "materialized": "table" if (m.type or "table") == "table" else "view",
            "contract": {"enforced": True},
        },
    }
    if m.description:
        out["description"] = m.description
    out["columns"] = [_column(n, f, dialect, with_constraints=True)
                      for n, f in m.fields.items()]
    return out


def to_dbt_models_yaml(spec: DataContractSpecification, dialect: str = "duckdb") -> str:
    doc = {"version": 2,
           "models": [_dbt_model(n, m, spec, dialect) for n, m in spec.models.items()]}
    return yaml.safe_dump(doc, sort_keys=False, allow_unicode=True)


def to_dbt_sources_yaml(spec: DataContractSpecification, source_name: Optional[str] = None,
                        dialect: str = "duckdb") -> str:
    src: dict[str, Any] = {
        "name": source_name or spec.id or "source",
        "description": spec.info.description or "",
        "tables": [],
    }
    for n, m in spec.models.items():
        tbl: dict[str, Any] = {"name": n}
        if m.description:
            tbl["description"] = m.description
        tbl["columns"] = [_column(cn, f, dialect, with_constraints=False)
                          for cn, f in m.fields.items()]
        src["tables"].append(tbl)
    return yaml.safe_dump({"version": 2, "sources": [src]}, sort_keys=False,
                          allow_unicode=True)


def to_dbt_staging_sql(spec: DataContractSpecification, model_name: str,
                       source_name: Optional[str] = None) -> str:
    model = spec.models[model_name]
    src = source_name or spec.id or "source"
    cols = ",\n    ".join(model.fields.keys())
    return (f"with source as (\n    select * from {{{{ source('{src}', '{model_name}') }}}}\n)\n"
            f"select\n    {cols}\nfrom source\n")
