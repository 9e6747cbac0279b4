import pyarrow as pa
import pytest

from raycontract.compile import compile_contract, evaluate_threshold
from raycontract.contract import DataContractSpecification
from raycontract.types import arrow_type_matches, contract_field_to_arrow
from raycontract.contract import Field

CONTRACT = """
dataContractSpecification: 1.1.0
id: t
info: {title: T, version: 0.1.0}
definitions:
  order_id_def: {type: string, minLength: 8, maxLength: 10}
models:
  orders:
    fields:
      order_id:
        $ref: "#/definitions/order_id_def"
        required: true
        unique: true
      amount: {type: double, minimum: 10, exclusiveMaximum: 100}
      status: {type: string, enum: [a, b]}
      mail: {type: string, format: email}
      ref_field: {type: long, references: other.id}
    quality:
      - type: sql
        query: "SELECT avg(amount) FROM {model}"
        mustBeLessThan: 50
  other:
    fields:
      id: {type: long}
servicelevels:
  freshness: {threshold: 24h, timestampField: orders.ts}
  retention: {period: P1Y, timestampField: orders.ts}
"""


def test_compile_check_inventory():
    spec = DataContractSpecification.from_string(CONTRACT)
    # $ref inlined (reference resolve.py:75-191)
    f = spec.models["orders"].fields["order_id"]
    assert f.minLength == 8 and f.maxLength == 10 and f.required and f.unique

    plan = compile_contract(spec, None)
    keys = [c.key for c in plan.checks]
    for expected in [
        "orders__order_id__field_is_present",
        "orders__order_id__field_type",
        "orders__order_id__field_required",
        "orders__order_id__field_unique",
        "orders__order_id__field_min_length",
        "orders__order_id__field_max_length",
        "orders__amount__field_minimum",
        "orders__amount__field_maximum",   # from exclusiveMaximum
        "orders__amount__field_not_equal",  # paired not_equal
        "orders__status__field_enum",
        "orders__mail__field_format",
        "orders__ref_field__field_references",
        "orders__quality_sql_0",
    ]:
        assert expected in keys, expected
    # freshness skipped: ts not a declared field? (reference only checks model
    # membership, not the field) — present with model match
    assert "servicelevel_freshness" in keys
    assert "servicelevel_retention" in keys
    mp = plan.models["orders"]
    assert len(mp.uniques) == 1 and len(mp.referentials) == 1 and len(mp.qualities) == 1
    assert len(mp.agg_thresholds) == 2


def test_check_types_skipped_for_csv_json():
    from raycontract.contract import Server

    spec = DataContractSpecification.from_string(CONTRACT)
    for fmt in ("json", "csv", "avro"):
        plan = compile_contract(spec, Server(type="local", format=fmt))
        assert not any(c.type == "field_type" for c in plan.checks)
    plan = compile_contract(spec, Server(type="local", format="parquet"))
    assert any(c.type == "field_type" for c in plan.checks)


def test_type_mapping():
    assert contract_field_to_arrow(Field(type="string")) == pa.string()
    assert contract_field_to_arrow(Field(type="int")) == pa.int32()
    assert contract_field_to_arrow(Field(type="long")) == pa.int64()
    assert contract_field_to_arrow(Field(type="decimal", precision=10, scale=2)) == pa.decimal128(10, 2)
    assert contract_field_to_arrow(Field(type="timestamp")) == pa.timestamp("us", tz="UTC")
    assert contract_field_to_arrow(Field(type="timestamp_ntz")) == pa.timestamp("us")
    arr = Field(type="array", items=Field(type="int"))
    assert contract_field_to_arrow(arr) == pa.list_(pa.int32())
    with pytest.raises(ValueError):
        contract_field_to_arrow(Field(type="wat"))


def test_arrow_type_matches_leniency():
    assert arrow_type_matches(pa.large_string(), pa.string())
    assert arrow_type_matches(pa.timestamp("ms", tz="UTC"), pa.timestamp("us", tz="UTC"))
    assert not arrow_type_matches(pa.timestamp("us"), pa.timestamp("us", tz="UTC"))
    assert not arrow_type_matches(pa.int32(), pa.int64())
    assert arrow_type_matches(pa.list_(pa.large_string()), pa.list_(pa.string()))


def test_threshold_eval():
    assert evaluate_threshold(5, ("=", 5))
    assert evaluate_threshold(5, ("between", (1, 10)))
    assert not evaluate_threshold(5, ("not between", (1, 10)))
    assert evaluate_threshold(5, ("<", 6)) and evaluate_threshold(5, (">=", 5))
    with pytest.raises(ValueError):
        evaluate_threshold(1, ("~", 2))
