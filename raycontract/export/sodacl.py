"""Contract → SodaCL YAML exporter.

Reproduces the reference's compile output (``export/sodacl_converter.py:15-30``
merging the per-check snippets from ``engines/data_contract_checks.py:104-738``)
so our check compiler can be diffed 1:1 against the reference's golden YAML
(``tests/test_export_sodacl.py:52-118``). We don't execute SodaCL — this is a
conformance oracle + interchange artifact.

Known intentional divergence: the reference hardcodes the retention metric
name as ``orders_servicelevel_retention`` regardless of model
(``data_contract_checks.py:652-658``); we emit ``{model}_servicelevel_retention``
(pass ``bug_compat=True`` for byte-identical output on the golden fixture).
"""

from __future__ import annotations

import yaml

from raycontract.contract import DataContractSpecification, Server
from raycontract.compile import is_check_types
from raycontract.functions.durations import period_to_seconds


def export_sodacl(spec: DataContractSpecification, server: Server | None = None,
                  bug_compat: bool = True) -> str:
    out: dict = {}

    def block(model_name: str) -> list:
        return out.setdefault(f"checks for {model_name}", [])

    check_types = is_check_types(server)

    for model_name, model in spec.models.items():
        checks = block(model_name)
        for fname, f in model.fields.items():
            key = lambda t: f"{model_name}__{fname}__{t}"  # noqa: E731
            checks.append({"schema": {
                "name": key("field_is_present"),
                "fail": {"when required column missing": [fname]},
            }})
            if check_types and f.type is not None:
                checks.append({"schema": {
                    "name": key("field_type"),
                    "fail": {"when wrong column type": {fname: f.type}},
                }})
            if f.required:
                checks.append({f"missing_count({fname}) = 0": {"name": key("field_required")}})
            if f.unique:
                checks.append({f"duplicate_count({fname}) = 0": {"name": key("field_unique")}})
            if f.minLength is not None:
                checks.append({f"invalid_count({fname}) = 0": {
                    "name": key("field_min_length"), "valid min length": f.minLength}})
            if f.maxLength is not None:
                checks.append({f"invalid_count({fname}) = 0": {
                    "name": key("field_max_length"), "valid max length": f.maxLength}})
            if f.minimum is not None:
                checks.append({f"invalid_count({fname}) = 0": {
                    "name": key("field_minimum"), "valid min": f.minimum}})
            if f.maximum is not None:
                checks.append({f"invalid_count({fname}) = 0": {
                    "name": key("field_maximum"), "valid max": f.maximum}})
            if f.exclusiveMinimum is not None:
                checks.append({f"invalid_count({fname}) = 0": {
                    "name": key("field_minimum"), "valid min": f.exclusiveMinimum}})
                checks.append({f"invalid_count({fname}) = 0": {
                    "name": key("field_not_equal"), "invalid values": [f.exclusiveMinimum]}})
            if f.exclusiveMaximum is not None:
                checks.append({f"invalid_count({fname}) = 0": {
                    "name": key("field_maximum"), "valid max": f.exclusiveMaximum}})
                checks.append({f"invalid_count({fname}) = 0": {
                    "name": key("field_not_equal"), "invalid values": [f.exclusiveMaximum]}})
            if f.pattern is not None:
                checks.append({f"invalid_count({fname}) = 0": {
                    "name": key("field_regex"), "valid regex": f.pattern}})
            if f.enum:
                checks.append({f"invalid_count({fname}) = 0": {
                    "name": key("field_enum"), "valid values": f.enum}})
            for count, q in enumerate(f.quality):
                if q.type != "sql" or not q.query:
                    continue
                qkey = f"{model_name}__{fname}__quality_sql_{count}"
                threshold = _threshold_str(q)
                if threshold is None:
                    continue
                query = (q.query.replace("{model}", model_name)
                         .replace("{table}", model_name)
                         .replace("{field}", fname).replace("{column}", fname))
                checks.append({f"{qkey} {threshold}": {
                    "name": qkey, f"{qkey} query": query}})
        for count, q in enumerate(model.quality):
            if q.type != "sql" or not q.query:
                continue
            qkey = f"{model_name}__quality_sql_{count}"
            threshold = _threshold_str(q)
            if threshold is None:
                continue
            query = (q.query.replace("{model}", model_name).replace("{table}", model_name))
            checks.append({f"{qkey} {threshold}": {"name": qkey, f"{qkey} query": query}})

    sl = spec.servicelevels
    if sl is not None:
        if sl.freshness and sl.freshness.timestampField and sl.freshness.threshold \
                and sl.freshness.timestampField.count(".") == 1:
            model_name, fname = sl.freshness.timestampField.split(".")
            if model_name in spec.models and any(u in sl.freshness.threshold
                                                 for u in "dDhHmM"):
                thr = sl.freshness.threshold.replace("P", "").replace("T", "").lower()
                block(model_name).append({f"freshness({fname}) < {thr}": {
                    "name": "servicelevel_freshness"}})
        r = sl.retention
        if r and not r.unlimited and r.timestampField and r.period \
                and r.timestampField.count(".") == 1:
            model_name, fname = r.timestampField.split(".")
            if model_name in spec.models:
                secs = int(period_to_seconds(r.period))
                metric = "orders_servicelevel_retention" if bug_compat \
                    else f"{model_name}_servicelevel_retention"
                block(model_name).append({f"{metric} < {secs}": {
                    f"{metric} expression":
                        f"TIMESTAMPDIFF(SECOND, MIN({fname}), CURRENT_TIMESTAMP)",
                    "name": "servicelevel_retention",
                }})

    # deprecated root quality: raw SodaCL passthrough (ref :716-738)
    if isinstance(spec.quality, dict):
        for k, v in spec.quality.items():
            if k.startswith("checks for "):
                out.setdefault(k, []).extend(v or [])

    return yaml.dump(out, sort_keys=False)


def _threshold_str(q) -> str | None:
    if q.mustBe is not None:
        return f"= {q.mustBe}"
    if q.mustNotBe is not None:
        return f"!= {q.mustNotBe}"
    if q.mustBeGreaterThan is not None:
        return f"> {q.mustBeGreaterThan}"
    if q.mustBeGreaterThanOrEqualTo is not None:
        return f">= {q.mustBeGreaterThanOrEqualTo}"
    if q.mustBeLessThan is not None:
        return f"< {q.mustBeLessThan}"
    if q.mustBeLessThanOrEqualTo is not None:
        return f"<= {q.mustBeLessThanOrEqualTo}"
    if q.mustBeBetween is not None and len(q.mustBeBetween) == 2:
        return f"between {q.mustBeBetween[0]} and {q.mustBeBetween[1]}"
    if q.mustNotBeBetween is not None and len(q.mustNotBeBetween) == 2:
        return f"not between {q.mustNotBeBetween[0]} and {q.mustNotBeBetween[1]}"
    return None
