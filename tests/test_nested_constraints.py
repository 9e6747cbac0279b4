"""Nested-field constraint execution: struct children + array items compiled
into flattened Arrow kernels (VERDICT r1 'What's missing' #4; reference
semantics export/jsonschema_converter.py:34-94 +
engines/fastjsonschema/check_jsonschema.py:87-111)."""

import pyarrow as pa

from raycontract import DataContract, ResultEnum

CONTRACT = """
dataContractSpecification: 1.1.0
id: nested
info: {title: nested, version: 1.0.0}
models:
  m:
    primaryKey: [id]
    fields:
      id: {type: long, required: true}
      addr:
        type: object
        fields:
          zip: {type: string, pattern: "^[0-9]{5}$", required: true}
          city: {type: string, minLength: 2}
      scores:
        type: array
        items: {type: long, minimum: 0, maximum: 100}
      orders:
        type: array
        items:
          type: object
          fields:
            qty: {type: long, minimum: 1}
"""


def _table():
    ids = pa.array([1, 2, 3, 4], type=pa.int64())
    addr = pa.array([
        {"zip": "12345", "city": "aa"},
        {"zip": "bad", "city": "b"},       # zip regex fail + city minLength fail
        None,                               # parent null: child required NOT enforced
        {"zip": None, "city": "ok"},       # zip required fail (parent exists)
    ], type=pa.struct([pa.field("zip", pa.string()), pa.field("city", pa.string())]))
    scores = pa.array([[10, 20], [150, -5], None, [100]],
                      type=pa.list_(pa.int64()))
    orders = pa.array([
        [{"qty": 2}, {"qty": 0}],          # one qty below minimum
        [],
        None,
        [{"qty": 5}],
    ], type=pa.list_(pa.struct([pa.field("qty", pa.int64())])))
    return pa.table({"id": ids, "addr": addr, "scores": scores, "orders": orders})


def test_nested_struct_and_list_constraints(ray_session):
    run = DataContract(data_contract_str=CONTRACT).test(datasets={"m": _table()})
    by = {c.key: c for c in run.checks}

    zip_re = by["m__addr.zip__field_regex"]
    assert zip_re.result == ResultEnum.failed
    assert zip_re.diagnostics["invalid_count"] == 1
    assert zip_re.diagnostics["samples"][0][0] == 2  # pk of the bad row

    zip_req = by["m__addr.zip__field_required"]
    assert zip_req.result == ResultEnum.failed
    # row 3 has addr=None → required NOT enforced there; only row 4 counts
    assert zip_req.diagnostics["invalid_count"] == 1
    assert zip_req.diagnostics["samples"][0][0] == 4

    city_len = by["m__addr.city__field_min_length"]
    assert city_len.result == ResultEnum.failed
    assert city_len.diagnostics["invalid_count"] == 1

    smax = by["m__scores[]__field_maximum"]
    smin = by["m__scores[]__field_minimum"]
    assert smax.diagnostics["invalid_count"] == 1  # 150
    assert smin.diagnostics["invalid_count"] == 1  # -5
    assert smax.diagnostics["samples"][0][0] == 2  # both in row 2

    qty = by["m__orders[].qty__field_minimum"]
    assert qty.result == ResultEnum.failed
    assert qty.diagnostics["invalid_count"] == 1
    assert qty.diagnostics["samples"][0][0] == 1  # pk of row with qty=0


def test_nested_path_missing_in_physical_schema(ray_session):
    t = pa.table({
        "id": pa.array([1], type=pa.int64()),
        "addr": pa.array([{"zip": "12345"}],
                         type=pa.struct([pa.field("zip", pa.string())])),
        "scores": pa.array([[1]], type=pa.list_(pa.int64())),
        "orders": pa.array([[{"qty": 1}]],
                           type=pa.list_(pa.struct([pa.field("qty", pa.int64())]))),
    })
    run = DataContract(data_contract_str=CONTRACT).test(datasets={"m": t})
    by = {c.key: c for c in run.checks}
    # addr.city missing physically → that check errors, others still run
    assert by["m__addr.city__field_min_length"].result == ResultEnum.error
    assert "not present" in by["m__addr.city__field_min_length"].reason
    assert by["m__addr.zip__field_regex"].result == ResultEnum.passed
    assert by["m__orders[].qty__field_minimum"].result == ResultEnum.passed


def test_nested_all_clean_passes(ray_session):
    t = pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "addr": pa.array([{"zip": "11111", "city": "xy"}, {"zip": "22222", "city": "zz"}],
                         type=pa.struct([pa.field("zip", pa.string()),
                                         pa.field("city", pa.string())])),
        "scores": pa.array([[0, 100], []], type=pa.list_(pa.int64())),
        "orders": pa.array([[{"qty": 1}], []],
                           type=pa.list_(pa.struct([pa.field("qty", pa.int64())]))),
    })
    run = DataContract(data_contract_str=CONTRACT).test(datasets={"m": t})
    assert run.result == ResultEnum.passed
