"""Custom-check plugin API (raycontract.plugins): register a vectorized
constraint kind, use it from a contract via field config, full engine path."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from raycontract import DataContract, ResultEnum
from raycontract.plugins import register_check, registered_kinds, unregister_check


def make_even_mask():
    """Plugin callables ship to Ray workers: define them in an importable
    module, or as a closure/lambda (cloudpickle serializes those BY VALUE —
    a top-level def in a non-importable file fails to deserialize)."""

    def even_mask(col, args):
        return pc.and_(pc.not_equal(pc.bit_wise_and(col, 1), 0), col.is_valid())

    return even_mask


CONTRACT = """
id: p
dataContractSpecification: 1.1.0
info: {title: test, version: 1.0.0}
models:
  m:
    primaryKey: [id]
    fields:
      id: {type: string}
      v:
        type: long
        config:
          checks:
            - kind: must_be_even
              args: []
"""

TABLE = pa.table({"id": pa.array(["a", "b", "c", "d"]),
                  "v": pa.array([2, 3, 4, 7], type=pa.int64())})


def test_registered_plugin_runs_through_engine(ray_session):
    register_check("must_be_even", make_even_mask())
    try:
        run = DataContract(data_contract_str=CONTRACT).test(datasets={"m": TABLE})
        c = [c for c in run.checks if c.type == "custom_must_be_even"][0]
        assert c.result == ResultEnum.failed
        assert c.diagnostics["invalid_count"] == 2
        assert sorted(s[0] for s in c.diagnostics["samples"]) == ["b", "d"]
    finally:
        unregister_check("must_be_even")


def test_unregistered_kind_errors_only_that_check(ray_session):
    run = DataContract(data_contract_str=CONTRACT).test(datasets={"m": TABLE})
    c = [c for c in run.checks if c.type == "custom_must_be_even"][0]
    assert c.result == ResultEnum.error
    assert "no plugin registered" in c.reason
    # other checks unaffected
    assert [c for c in run.checks if c.type == "field_is_present"][0].result == ResultEnum.passed


def test_registry_api():
    fn = make_even_mask()
    register_check("k1", fn)
    assert "k1" in registered_kinds()
    unregister_check("k1")
    assert "k1" not in registered_kinds()
    with pytest.raises(ValueError):
        register_check("", fn)
