"""Generic row-wise JSON-Schema engine (stages/jsonrows.py) — keyword
coverage + the reference's violation semantics (pk reason format, error cap,
first-error-per-row; reference check_jsonschema.py:87-111)."""

import pyarrow as pa
import pytest

import ray.data as rd
from raycontract.stages.jsonrows import (JsonRowValidator, compile_jsonschema,
                                         primary_key_field, validate_json_rows)


def errs(schema, value, **kw):
    return compile_jsonschema(schema)(value, **kw)


# keyword → (schema, valid values, invalid values)
KEYWORD_CASES = [
    ("type", {"type": "string"}, ["x"], [1, None, True]),
    ("type-union", {"type": ["integer", "null"]}, [3, None, 4.0], ["x", True]),
    ("integer-not-bool", {"type": "integer"}, [1, 2.0], [True, 1.5]),
    ("enum", {"enum": ["a", "b", 1]}, ["a", 1], ["c", True]),
    ("const", {"const": 5}, [5, 5.0], [6, "5", True]),
    ("pattern", {"type": "string", "pattern": "^[A-Z]+$"}, ["AB"], ["ab", "A b"]),
    ("format-email", {"format": "email"}, ["a@b.co", 7], ["nope"]),
    ("format-uuid", {"format": "uuid"},
     ["123e4567-e89b-12d3-a456-426614174000"], ["123"]),
    ("format-date-time", {"format": "date-time"},
     ["2024-01-02T03:04:05Z", "2024-01-02 03:04:05+01:00"], ["2024-13-02", "x"]),
    ("minLength", {"minLength": 2}, ["ab", 5], ["a"]),
    ("maxLength", {"maxLength": 2}, ["ab"], ["abc"]),
    ("minimum", {"minimum": 2}, [2, 3.5], [1.9]),
    ("maximum", {"maximum": 2}, [2], [2.1]),
    ("excl-min-draft7", {"exclusiveMinimum": 2}, [2.1], [2]),
    ("excl-max-draft7", {"exclusiveMaximum": 2}, [1.9], [2]),
    ("excl-min-draft4", {"minimum": 2, "exclusiveMinimum": True}, [2.1], [2]),
    ("multipleOf", {"multipleOf": 0.5}, [1.5, 2], [1.3]),
    ("required", {"type": "object", "required": ["a"]}, [{"a": 1}], [{"b": 1}]),
    ("properties", {"properties": {"a": {"type": "integer"}}},
     [{"a": 1}, {}], [{"a": "x"}]),
    ("additionalProperties-false",
     {"properties": {"a": {}}, "additionalProperties": False},
     [{"a": 1}], [{"a": 1, "b": 2}]),
    ("additionalProperties-schema",
     {"properties": {"a": {}}, "additionalProperties": {"type": "integer"}},
     [{"a": "x", "b": 2}], [{"b": "x"}]),
    ("patternProperties", {"patternProperties": {"^n_": {"type": "integer"}}},
     [{"n_x": 1, "other": "s"}], [{"n_x": "s"}]),
    ("minProperties", {"minProperties": 1}, [{"a": 1}], [{}]),
    ("items", {"items": {"type": "integer"}}, [[1, 2], []], [[1, "x"]]),
    ("items-tuple", {"items": [{"type": "integer"}, {"type": "string"}],
                     "additionalItems": False},
     [[1, "a"], [1]], [[1, 2], [1, "a", 3]]),
    ("contains", {"contains": {"type": "string"}}, [[1, "a"]], [[1, 2]]),
    ("minItems", {"minItems": 2}, [[1, 2]], [[1]]),
    ("uniqueItems", {"uniqueItems": True}, [[1, 2], ["a", 1]], [[1, 1]]),
    ("allOf", {"allOf": [{"minimum": 2}, {"maximum": 4}]}, [3], [1, 5]),
    ("anyOf", {"anyOf": [{"type": "string"}, {"minimum": 10}]}, ["x", 11], [5]),
    ("oneOf", {"oneOf": [{"multipleOf": 3}, {"multipleOf": 5}]}, [9, 10], [15, 7]),
    ("not", {"not": {"type": "string"}}, [1, None], ["x"]),
    ("if-then-else", {"if": {"type": "string"}, "then": {"minLength": 2},
                      "else": {"minimum": 0}},
     ["ab", 1], ["a", -1]),
    ("ref", {"definitions": {"pos": {"type": "integer", "minimum": 0}},
             "properties": {"a": {"$ref": "#/definitions/pos"}}},
     [{"a": 3}], [{"a": -1}, {"a": "x"}]),
]


@pytest.mark.parametrize("name,schema,valid,invalid",
                         KEYWORD_CASES, ids=[c[0] for c in KEYWORD_CASES])
def test_keyword(name, schema, valid, invalid):
    for v in valid:
        assert errs(schema, v) == [], (name, v)
    for v in invalid:
        assert errs(schema, v), (name, v)


def test_nested_paths_and_messages():
    schema = {"type": "object",
              "properties": {"user": {"type": "object", "properties": {
                  "tags": {"items": {"type": "string"}}}}}}
    out = errs(schema, {"user": {"tags": ["ok", 7]}})
    assert out == [("data.user.tags[1]", "data.user.tags[1] must be string")]


def test_collect_all_vs_first():
    schema = {"type": "object", "properties": {
        "a": {"type": "integer"}, "b": {"type": "integer"}}}
    bad = {"a": "x", "b": "y"}
    assert len(errs(schema, bad)) == 2
    assert len(errs(schema, bad, first=True)) == 1


def test_primary_key_detection():
    schema = {"properties": {"a": {"type": "string"},
                             "id": {"type": "integer", "primaryKey": True}}}
    assert primary_key_field(schema) == "id"
    assert primary_key_field({"properties": {"a": {}}}) is None


def test_contract_export_feeds_row_engine():
    """contract → to_jsonschema → generic row validation round trip, with the
    reference's '#{pk}: {message}' reason format."""
    from raycontract.contract import DataContractSpecification
    from raycontract.export.jsonschema import to_jsonschema

    spec = DataContractSpecification.from_string("""
dataContractSpecification: 1.1.0
id: t
info: {title: t, version: 1.0.0}
models:
  users:
    fields:
      uid: {type: long, required: true, primaryKey: true}
      email: {type: string, pattern: "^[^@]+@[^@]+$"}
""")
    schema = to_jsonschema("users", spec.models["users"])
    assert schema["properties"]["uid"].get("primaryKey") is True
    v = JsonRowValidator(schema, model_name="users")
    out = v(pa.table({"uid": [1, 2], "email": ["a@b", "nope"]}))
    assert out.num_rows == 1
    assert out["pk"][0].as_py() == "2"
    assert out["reason"][0].as_py().startswith("#2: ")


def test_validate_json_rows_dataset(ray_session):
    rows = [{"id": i, "v": (i if i % 3 else "bad")} for i in range(30)]
    schema = {"type": "object", "required": ["id", "v"],
              "properties": {"id": {"type": "integer", "primaryKey": True},
                             "v": {"type": "integer"}}}
    ds = rd.from_items(rows)
    out = validate_json_rows(ds, schema).take_all()
    assert len(out) == 10  # ids 0,3,...,27
    assert {r["pk"] for r in out} == {str(i) for i in range(0, 30, 3)}
    capped = validate_json_rows(ds, schema, max_errors=4).take_all()
    assert len(capped) == 4
