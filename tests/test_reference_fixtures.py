"""Run OUR engine against the REFERENCE's own test fixtures (read-only).

Mirrors /root/reference/tests/test_test_parquet.py:21-151: the all-types
contract over combined.parquet must yield 26 checks all passed; each
per-type fixture contract must pass against its own parquet; the invalid
variant must fail its field_type checks. This is direct check-result parity
with the reference CLI on the reference's own inputs.
"""

import os

import pyarrow.parquet as pq
import pytest
import yaml

from raycontract import DataContract, ResultEnum

FIX = "/root/reference/tests/fixtures/parquet"


def run_fixture(contract_name: str):
    path = os.path.join(FIX, contract_name)
    with open(path) as fh:
        doc = yaml.safe_load(fh.read())
    server = next(iter(doc["servers"].values()))
    data_rel = server["path"].lstrip("./")
    data_path = os.path.join("/root/reference/tests", data_rel)
    model_name = next(iter(doc["models"]))
    table = pq.read_table(data_path)
    dc = DataContract(data_contract_file=path)
    return dc.test(datasets={model_name: table})


def test_combined_all_types_26_checks_pass(ray_session):
    run = run_fixture("datacontract.yaml")
    # exact parity with reference tests/test_test_parquet.py:21-29
    assert len(run.checks) == 26
    failed = [(c.key, c.reason) for c in run.checks if c.result != ResultEnum.passed]
    assert not failed, failed
    assert run.result == ResultEnum.passed


@pytest.mark.parametrize("name", [
    "datacontract_string.yaml", "datacontract_binary.yaml", "datacontract_boolean.yaml",
    "datacontract_decimal.yaml", "datacontract_float.yaml", "datacontract_double.yaml",
    "datacontract_integer.yaml", "datacontract_bigint.yaml", "datacontract_struct.yaml",
    "datacontract_array.yaml", "datacontract_map.yaml", "datacontract_date.yaml",
    "datacontract_timestamp.yaml", "datacontract_timestamp_ntz.yaml",
])
def test_per_type_fixture_passes(ray_session, name):
    run = run_fixture(name)
    failed = [(c.key, c.reason) for c in run.checks if c.result != ResultEnum.passed]
    assert not failed, failed


def test_invalid_contract_fails_type_checks(ray_session):
    """datacontract_invalid.yaml declares order_id as date ('this is not
    true') and a nonexistent field; its referenced orders.parquet isn't in
    the fixture corpus, so the matching physical table (order_id string) is
    synthesized here."""
    import pyarrow as pa

    path = os.path.join(FIX, "datacontract_invalid.yaml")
    table = pa.table({"order_id": pa.array(["o1", "o2", "o3"])})
    run = DataContract(data_contract_file=path).test(datasets={"orders": table})
    by = {c.key: c for c in run.checks}
    assert by["orders__order_id__field_type"].result == ResultEnum.failed
    assert by["orders__some_extra_field__field_is_present"].result == ResultEnum.failed
    assert run.result in (ResultEnum.failed, ResultEnum.error)
