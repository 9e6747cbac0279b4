"""DCS structural-schema gate (≅ reference lint/resolve.py:283-305 +
tests/fixtures/lint fixtures — ours are authored inline, same shapes)."""

import pytest

from raycontract import DataContract, ResultEnum
from raycontract.schema_validate import ContractValidationError, validate_contract_dict

MISSING_ID = """
dataContractSpecification: 1.1.0
info:
  title: My Data Contract
  version: 0.0.1
"""

BAD_FIELD_TYPE = """
dataContractSpecification: 1.1.0
id: t
info: {title: t, version: 1.0.0}
models:
  m:
    fields:
      a: {type: varchar2}
"""

BAD_MODELS_SHAPE = """
dataContractSpecification: 1.1.0
id: t
info: {title: t, version: 1.0.0}
models: []
"""

MISSING_INFO_VERSION = """
dataContractSpecification: 1.1.0
id: t
info: {title: t}
"""

VALID = """
dataContractSpecification: 1.1.0
id: t
info: {title: t, version: 1.0.0}
models:
  m:
    fields:
      a: {type: string, required: true}
      nested:
        type: object
        fields:
          child: {type: int, minimum: 0}
"""


def test_missing_id_rejected():
    import yaml

    with pytest.raises(ContractValidationError) as ei:
        validate_contract_dict(yaml.safe_load(MISSING_ID))
    assert "must contain" in ei.value.reason and "id" in ei.value.reason


def test_bad_field_type_rejected():
    import yaml

    with pytest.raises(ContractValidationError) as ei:
        validate_contract_dict(yaml.safe_load(BAD_FIELD_TYPE))
    assert "data.models.m.fields.a.type must be one of" in ei.value.reason


def test_bad_models_shape_rejected():
    import yaml

    with pytest.raises(ContractValidationError) as ei:
        validate_contract_dict(yaml.safe_load(BAD_MODELS_SHAPE))
    assert ei.value.reason == "data.models must be object"


def test_missing_info_version_rejected():
    import yaml

    with pytest.raises(ContractValidationError) as ei:
        validate_contract_dict(yaml.safe_load(MISSING_INFO_VERSION))
    assert "data.info must contain" in ei.value.reason


def test_valid_contract_accepted():
    import yaml

    validate_contract_dict(yaml.safe_load(VALID))  # no raise


def test_engine_returns_failed_run_for_malformed_contract(ray_session):
    run = DataContract(data_contract_str=MISSING_ID).test()
    assert run.result == ResultEnum.failed
    assert len(run.checks) == 1
    c = run.checks[0]
    assert c.name == "Check that data contract YAML is valid"
    assert "must contain" in c.reason


def test_lint_downgrades_schema_violation_to_warning():
    run = DataContract(data_contract_str=BAD_FIELD_TYPE).lint()
    by = {c.key: c for c in run.checks}
    assert by["lint__schema"].result == ResultEnum.warning
    assert "must be one of" in by["lint__schema"].reason
    # the dedicated known-types linter still reports too
    assert by["lint__known-types"].result == ResultEnum.warning


def test_lint_schema_passes_for_valid():
    run = DataContract(data_contract_str=VALID).lint()
    by = {c.key: c for c in run.checks}
    assert by["lint__schema"].result == ResultEnum.passed
