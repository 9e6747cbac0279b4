import yaml

from raycontract.breaking import Severity, breaking, changelog
from raycontract.contract import DataContractSpecification
from raycontract.export.jsonschema import export_jsonschema
from raycontract.export.sodacl import export_sodacl

# the reference's golden SodaCL fixture (tests/test_export_sodacl.py:8-118) —
# same contract, our exporter must produce the same YAML structure
GOLDEN_CONTRACT = """
dataContractSpecification: 1.1.0
id: test-contract
info: {title: test, version: 1.0.0}
models:
  orders:
    description: test
    fields:
      order_id:
        type: string
        required: true
      order_timestamp:
        type: timestamp
        required: true
      processed_timestamp:
        type: timestamp
        required: true
      order_total:
        type: integer
        quality:
          - type: sql
            query: |
              SELECT quantile_cont({field}, 0.95) AS percentile_95
              FROM {model}
            mustBeBetween: [ 1000, 49900 ]
servicelevels:
  retention:
    period: P1Y
    timestampField: orders.processed_timestamp
  freshness:
    threshold: 24h
    timestampField: orders.order_timestamp
quality:
    type: SodaCL
    specification:
      checks for orders:
         - row_count > 10
      checks for line_items:
         - row_count > 10:
             name: Have at lease 10 line items
"""

GOLDEN_EXPECTED = """
checks for orders:
  - schema:
      name: orders__order_id__field_is_present
      fail:
        when required column missing:
          - order_id
  - schema:
      name: orders__order_id__field_type
      fail:
        when wrong column type:
          order_id: string
  - missing_count(order_id) = 0:
      name: orders__order_id__field_required
  - schema:
      name: orders__order_timestamp__field_is_present
      fail:
        when required column missing:
          - order_timestamp
  - schema:
      name: orders__order_timestamp__field_type
      fail:
        when wrong column type:
          order_timestamp: timestamp
  - missing_count(order_timestamp) = 0:
      name: orders__order_timestamp__field_required
  - schema:
      name: orders__processed_timestamp__field_is_present
      fail:
        when required column missing:
          - processed_timestamp
  - schema:
      name: orders__processed_timestamp__field_type
      fail:
        when wrong column type:
          processed_timestamp: timestamp
  - missing_count(processed_timestamp) = 0:
      name: orders__processed_timestamp__field_required
  - schema:
      name: orders__order_total__field_is_present
      fail:
        when required column missing:
          - order_total
  - schema:
      name: orders__order_total__field_type
      fail:
        when wrong column type:
          order_total: integer
  - orders__order_total__quality_sql_0 between 1000 and 49900:
      name: orders__order_total__quality_sql_0
      orders__order_total__quality_sql_0 query: |
        SELECT quantile_cont(order_total, 0.95) AS percentile_95
        FROM orders
  - freshness(order_timestamp) < 24h:
      name: servicelevel_freshness
  - orders_servicelevel_retention < 31536000:
      name: servicelevel_retention
      orders_servicelevel_retention expression: TIMESTAMPDIFF(SECOND, MIN(processed_timestamp), CURRENT_TIMESTAMP)
  - row_count > 10
checks for line_items:
  - row_count > 10:
      name: Have at lease 10 line items
"""


def test_sodacl_golden_parity():
    spec = DataContractSpecification.from_string(GOLDEN_CONTRACT)
    got = yaml.safe_load(export_sodacl(spec))
    expected = yaml.safe_load(GOLDEN_EXPECTED)
    assert got == expected


def test_jsonschema_export():
    spec = DataContractSpecification.from_string("""
id: t
dataContractSpecification: 1.1.0
info: {title: test, version: 1.0.0}
models:
  m:
    fields:
      a: {type: string, required: true, pattern: "^x$", maxLength: 5}
      b: {type: long, minimum: 1}
      t: {type: timestamp}
      arr:
        type: array
        items: {type: int}
      obj:
        type: object
        fields:
          x: {type: string, required: true}
""")
    js = export_jsonschema(spec)
    assert js["required"] == ["a"]
    assert js["properties"]["a"]["type"] == "string"
    assert js["properties"]["a"]["pattern"] == "^x$"
    assert js["properties"]["b"]["type"] == ["integer", "null"]
    assert js["properties"]["b"]["minimum"] == 1
    assert js["properties"]["t"] == {"type": ["string", "null"], "format": "date-time"}
    assert js["properties"]["arr"]["items"]["type"] == ["integer", "null"]
    assert js["properties"]["obj"]["properties"]["x"]["type"] == "string"
    assert js["properties"]["obj"]["required"] == ["x"]


def test_parquet_import_roundtrip(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raycontract.imports.parquet import import_parquet

    t = pa.table({
        "s": pa.array(["a"]),
        "i": pa.array([1], type=pa.int32()),
        "l": pa.array([1], type=pa.int64()),
        "d": pa.array([1.0], type=pa.float64()),
        "dec": pa.array([1], type=pa.decimal128(10, 2)),
        "ts": pa.array([0], type=pa.timestamp("us")),
        "b": pa.array([b"x"], type=pa.binary()),
        "arr": pa.array([[1]], type=pa.list_(pa.int32())),
        "st": pa.array([{"x": 1}], type=pa.struct([("x", pa.int64())])),
    })
    p = tmp_path / "m.parquet"
    pq.write_table(t, p)
    spec = import_parquet(str(p))
    f = spec.models["m"].fields
    assert f["s"].type == "string" and f["i"].type == "int" and f["l"].type == "long"
    assert f["d"].type == "double"
    assert f["dec"].type == "decimal" and f["dec"].precision == 10 and f["dec"].scale == 2
    assert f["ts"].type == "timestamp_ntz" and f["b"].type == "bytes"
    assert f["arr"].type == "array" and f["arr"].items.type == "int"
    assert f["st"].type == "object" and f["st"].fields["x"].type == "long"


OLD = """
id: t
dataContractSpecification: 1.1.0
info: {title: test, version: 1.0.0}
models:
  m:
    fields:
      a: {type: string, required: true, pattern: "^x$"}
      b: {type: long, maximum: 10}
      gone: {type: string}
"""
NEW = """
id: t
dataContractSpecification: 1.1.0
info: {title: test, version: 1.0.0}
models:
  m:
    fields:
      a: {type: long, required: false}
      b: {type: long, maximum: 20, minLength: 3}
      fresh: {type: string}
"""


def test_breaking_and_changelog():
    old = DataContractSpecification.from_string(OLD)
    new = DataContractSpecification.from_string(NEW)
    all_changes = {c.rule for c in changelog(old, new)}
    assert {"field_type_updated", "field_required_updated", "field_pattern_removed",
            "field_maximum_updated", "field_min_length_added", "field_removed",
            "field_added"} <= all_changes
    brk = breaking(old, new)
    assert all(c.severity in (Severity.ERROR, Severity.WARNING) for c in brk)
    assert "field_added" not in {c.rule for c in brk}  # INFO filtered
    by_rule = {c.rule: c for c in brk}
    assert by_rule["field_type_updated"].severity == Severity.ERROR
    assert by_rule["field_min_length_added"].severity == Severity.WARNING


def test_model_removed_is_error():
    old = DataContractSpecification.from_string(OLD)
    new = DataContractSpecification.from_string("id: t\nmodels: {}\n")
    brk = breaking(old, new)
    assert brk[0].rule == "model_removed" and brk[0].severity == Severity.ERROR


def test_csv_import(tmp_path):
    from raycontract.imports.csv import import_csv

    p = tmp_path / "t.csv"
    p.write_text("a,b,c\nx,1,1.5\ny,2,2.5\n")
    spec = import_csv(str(p))
    f = spec.models["t"].fields
    assert f["a"].type == "string" and f["b"].type == "long" and f["c"].type == "double"


def test_cli_export_import_breaking(tmp_path):
    from raycontract.cli import main

    c1 = tmp_path / "c1.yaml"
    c1.write_text(OLD)
    c2 = tmp_path / "c2.yaml"
    c2.write_text(NEW)
    assert main(["export", str(c1), "--format", "sodacl"]) == 0
    assert main(["export", str(c1), "--format", "jsonschema"]) == 0
    assert main(["breaking", str(c1), str(c2)]) == 1  # ERROR-severity changes
    assert main(["changelog", str(c1), str(c1)]) == 0  # no changes
    # diff (reference cli.py:433-455): same entries as changelog, exit 0
    # even when breaking changes exist
    assert main(["diff", str(c1), str(c2)]) == 0
    assert main(["diff", str(c1), str(c1)]) == 0


ODCS_DOC = """
apiVersion: v3.0.0
kind: DataContract
id: odcs-orders
name: Orders
version: 1.2.0
schema:
  - name: orders
    physicalName: orders_tbl
    properties:
      - name: order_id
        logicalType: string
        required: true
        unique: true
        primaryKey: true
      - name: amount
        logicalType: number
        logicalTypeOptions: {minimum: 0}
      - name: created
        logicalType: date-time
servers:
  - server: prod
    type: local
    format: parquet
    path: /data/orders
"""


def test_odcs_import_and_autodetect():
    spec = DataContractSpecification.from_string(ODCS_DOC)
    assert spec.id == "odcs-orders"
    m = spec.models["orders_tbl"]
    assert m.fields["order_id"].required and m.fields["order_id"].unique
    assert m.fields["order_id"].primaryKey
    # "number" passes through (∈ DATACONTRACT_TYPES), matching the reference's map_type
    assert m.fields["amount"].type == "number" and m.fields["amount"].minimum == 0
    assert m.fields["created"].type == "timestamp"
    assert spec.servers["prod"].format == "parquet"
    # compiles into the same check plan machinery
    from raycontract.compile import compile_contract

    plan = compile_contract(spec, None)
    keys = {c.key for c in plan.checks}
    assert "orders_tbl__order_id__field_unique" in keys
    assert "orders_tbl__amount__field_minimum" in keys


def test_avro_export():
    from raycontract.export.avro import export_avro
    import json as _json

    spec = DataContractSpecification.from_string("""
id: av
dataContractSpecification: 1.1.0
info: {title: test, version: 1.0.0}
models:
  orders:
    fields:
      order_id: {type: string, required: true}
      amount: {type: decimal, precision: 10, scale: 2}
      created: {type: timestamp}
      tags:
        type: array
        items: {type: string}
      meta:
        type: object
        fields:
          k: {type: long, required: true}
""")
    schema = _json.loads(export_avro(spec))
    assert schema["type"] == "record" and schema["name"] == "orders"
    by = {f["name"]: f for f in schema["fields"]}
    assert by["order_id"]["type"] == "string"  # required → no null union
    assert by["amount"]["type"][0] == "null"
    assert by["amount"]["type"][1]["logicalType"] == "decimal"
    assert by["created"]["type"][1]["logicalType"] == "timestamp-millis"
    assert by["tags"]["type"][1]["type"] == "array"
    assert by["meta"]["type"][1]["type"] == "record"
    assert by["meta"]["type"][1]["fields"][0]["name"] == "k"


def test_breaking_rules_parity_round2():
    """Severity table parity with the reference (breaking_rules.py:40-114):
    pii/classification/primaryKey/quality-type rules added in round 2."""
    old = DataContractSpecification.from_string("""
dataContractSpecification: 1.1.0
id: b2
info: {title: t, version: 1.0.0}
models:
  m:
    description: old desc
    fields:
      a: {type: string, pii: true, classification: sensitive, primaryKey: true}
      b: {type: string}
    quality:
      - {type: sql, query: "SELECT count(*) FROM m", mustBe: 1}
""")
    new = DataContractSpecification.from_string("""
dataContractSpecification: 1.1.0
id: b2
info: {title: t, version: 2.0.0}
models:
  m:
    description: new desc
    fields:
      a: {type: string, classification: public}
      b: {type: string, pii: true}
    quality:
      - {type: custom, query: "SELECT count(*) FROM m", mustBe: 1}
""")
    changes = changelog(old, new)
    by_rule = {c.rule: c for c in changes}
    assert by_rule["field_pii_removed"].severity == Severity.ERROR
    assert by_rule["field_pii_added"].severity == Severity.WARNING
    assert by_rule["field_classification_updated"].severity == Severity.ERROR
    assert by_rule["field_primary_key_removed"].severity == Severity.WARNING
    assert by_rule["quality_type_updated"].severity == Severity.WARNING
    assert by_rule["model_description_updated"].severity == Severity.INFO
    assert by_rule["info_version_updated"].severity == Severity.INFO
    # breaking() keeps only ERROR/WARNING
    brk_rules = {c.rule for c in breaking(old, new)}
    assert "model_description_updated" not in brk_rules
    assert "field_pii_removed" in brk_rules
