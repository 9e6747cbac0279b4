"""Contract linters (static, driver-side).

≅ the reference's linter set (``lint/linters/*``, base class ``lint/lint.py:
104-142`` turns findings into warning Checks):
- valid constraints per type (type-vs-constraint matrix, min≤max —
  ``valid_constraints_linter.py:18-100``)
- field pattern compiles (``field_pattern_linter.py:23-34``)
- field references resolve (``field_reference_linter.py:20-48``)
- descriptions present (``description_linter.py:17-35``)
- quality checks reference known models (``quality_schema_linter.py:17-50``)
"""

from __future__ import annotations

import re

from raycontract.contract import DATACONTRACT_TYPES, DataContractSpecification
from raycontract.result import Check, ResultEnum, Run, new_check_id

_STRING_TYPES = {"string", "text", "varchar"}
_NUMERIC_TYPES = {"number", "decimal", "numeric", "int", "integer", "long", "bigint",
                  "float", "double"}
_LENGTH_CONSTRAINTS = ("minLength", "maxLength", "pattern", "format")
_NUMERIC_CONSTRAINTS = ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum")


def _warn(findings: list[str], msg: str) -> None:
    findings.append(msg)


def lint_spec(spec: DataContractSpecification, raw_dict: dict | None = None) -> Run:
    run = Run.create_run()
    run.dataContractId = spec.id

    # structural DCS-schema check (≅ reference resolve-time validation; the
    # reference hard-fails lint on schema violations — here lint downgrades
    # them to a warning so the remaining linters still report, while test()
    # enforces the schema strictly)
    if raw_dict is not None:
        from raycontract.schema_validate import ContractValidationError, validate_contract_dict

        c = Check(id=new_check_id(), key="lint__schema", category="lint", type="lint",
                  name="Check that data contract YAML is valid")
        try:
            validate_contract_dict(raw_dict)
            c.result = ResultEnum.passed
        except ContractValidationError as e:
            c.result = ResultEnum.warning
            c.reason = e.reason
        run.checks.append(c)

    linters = {
        "valid-constraints": _lint_valid_constraints,
        "field-pattern": _lint_field_pattern,
        "field-reference": _lint_field_reference,
        "description": _lint_description,
        "quality-model": _lint_quality_model,
        "known-types": _lint_known_types,
        "notice-period": _lint_notice_period,
    }
    # syntactic resolution itself is the first passed check (ref data_contract.py:74-138)
    run.checks.append(Check(id=new_check_id(), key="lint__syntax", category="lint",
                            type="lint", name="Contract is syntactically valid",
                            result=ResultEnum.passed))
    for lid, fn in linters.items():
        findings: list[str] = []
        fn(spec, findings)
        c = Check(id=new_check_id(), key=f"lint__{lid}", category="lint", type="lint",
                  name=f"Linter '{lid}'")
        if findings:
            c.result = ResultEnum.warning
            c.reason = "; ".join(findings[:10])
            c.diagnostics = {"findings": findings}
        else:
            c.result = ResultEnum.passed
        run.checks.append(c)
    run.finish()
    return run


def _iter_fields(spec):
    for mname, model in spec.models.items():
        for fname, f in model.fields.items():
            yield mname, fname, f


def _lint_valid_constraints(spec, findings):
    for mname, fname, f in _iter_fields(spec):
        t = (f.type or "").lower()
        if t and t not in _STRING_TYPES:
            for c in _LENGTH_CONSTRAINTS:
                if getattr(f, c) is not None and t != "bytes":
                    _warn(findings, f"{mname}.{fname}: {c} on non-string type {t}")
        if t and t not in _NUMERIC_TYPES:
            for c in _NUMERIC_CONSTRAINTS:
                if getattr(f, c) is not None and t not in ("date", "time", "timestamp",
                                                           "timestamp_tz", "timestamp_ntz"):
                    _warn(findings, f"{mname}.{fname}: {c} on non-numeric type {t}")
        if f.minLength is not None and f.maxLength is not None and f.minLength > f.maxLength:
            _warn(findings, f"{mname}.{fname}: minLength > maxLength")
        if f.minimum is not None and f.maximum is not None and f.minimum > f.maximum:
            _warn(findings, f"{mname}.{fname}: minimum > maximum")
        if f.minimum is not None and f.exclusiveMinimum is not None:
            _warn(findings, f"{mname}.{fname}: both minimum and exclusiveMinimum set")
        if f.maximum is not None and f.exclusiveMaximum is not None:
            _warn(findings, f"{mname}.{fname}: both maximum and exclusiveMaximum set")


def _lint_field_pattern(spec, findings):
    for mname, fname, f in _iter_fields(spec):
        if f.pattern is not None:
            try:
                re.compile(f.pattern)
            except re.error as e:
                _warn(findings, f"{mname}.{fname}: pattern does not compile: {e}")


def _lint_field_reference(spec, findings):
    for mname, fname, f in _iter_fields(spec):
        if f.references:
            if "." not in f.references:
                _warn(findings, f"{mname}.{fname}: reference {f.references!r} not model.field")
                continue
            pm, pf = f.references.split(".", 1)
            if pm not in spec.models:
                _warn(findings, f"{mname}.{fname}: referenced model {pm!r} does not exist")
            elif pf not in spec.models[pm].fields:
                _warn(findings, f"{mname}.{fname}: referenced field {pm}.{pf} does not exist")


def _lint_description(spec, findings):
    for mname, model in spec.models.items():
        if not model.description:
            _warn(findings, f"model {mname} has no description")
        for fname, f in model.fields.items():
            if not f.description:
                _warn(findings, f"{mname}.{fname} has no description")


def _lint_quality_model(spec, findings):
    for mname, model in spec.models.items():
        for q in model.quality + [q for f in model.fields.values() for q in f.quality]:
            if q.type == "sql" and q.query:
                for token in re.findall(r"\bfrom\s+(\w+)", q.query, re.IGNORECASE):
                    if token not in spec.models and token not in ("{model}", "{table}"):
                        if "{" not in q.query or token != mname:
                            if token.lower() != mname.lower():
                                _warn(findings,
                                      f"{mname}: quality SQL references unknown table {token!r}")


def _lint_notice_period(spec, findings):
    """terms.noticePeriod must be an ISO-8601 duration
    (≅ notice_period_linter.py:17-55)."""
    np_ = (spec.terms or {}).get("noticePeriod")
    if np_ is None:
        return
    from raycontract.functions.durations import _ISO

    if not (isinstance(np_, str) and np_.startswith("P") and _ISO.match(np_)
            and np_ not in ("P", "PT")):
        _warn(findings, f"terms.noticePeriod {np_!r} is not an ISO-8601 duration")


def _lint_known_types(spec, findings):
    for mname, fname, f in _iter_fields(spec):
        if f.type and f.type.lower() not in DATACONTRACT_TYPES:
            _warn(findings, f"{mname}.{fname}: unknown type {f.type!r}")
