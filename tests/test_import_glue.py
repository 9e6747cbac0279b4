"""Glue importer: mirrors the reference's tests/test_import_glue.py fixture
(the moto-mocked catalog) as a JSON catalog dump — same columns, same
partition keys, same expected contract shape."""

import json

# the reference test's table definition, verbatim column set
GLUE_DUMP = {
    "Database": {
        "Name": "test_database",
        "CatalogId": "123456789012",
        "LocationUri": "s3://test_bucket/testdb",
    },
    "Tables": [
        {
            "Name": "test_table",
            "StorageDescriptor": {
                "Columns": [
                    {"Name": "field_one", "Type": "string", "Comment": "Comment 1"},
                    {"Name": "field_two", "Type": "int"},
                    {"Name": "field_three", "Type": "timestamp"},
                    {"Name": "field_four", "Type": "decimal(6,2)"},
                    {"Name": "field_five",
                     "Type": "struct<sub_field_one:string, sub_field_two: boolean>"},
                    {"Name": "field_six", "Type": "array<string>"},
                    {"Name": "field_seven",
                     "Type": "array<struct<sub_field_three:string, sub_field_four:int>>"},
                    {"Name": "field_eight", "Type": "map<string,int>"},
                    {"Name": "field_nine", "Type": "decimal"},
                    {"Name": "field_ten", "Type": "bigint"},
                    {"Name": "field_eleven", "Type": "float"},
                    {"Name": "field_twelve", "Type": "double"},
                    {"Name": "field_thirteen", "Type": "timestamp"},
                    {"Name": "field_fourteen", "Type": "date"},
                    {"Name": "field_fifteen", "Type": "varchar"},
                    {"Name": "field_sixteen", "Type": "varchar(255)"},
                ]
            },
            "PartitionKeys": [
                {"Name": "part_one", "Type": "string", "Comment": "Comment 2"},
                {"Name": "part_two", "Type": "date"},
            ],
        }
    ],
}


def test_import_glue_full_schema(tmp_path):
    from raycontract.imports.glue import import_glue

    p = tmp_path / "glue.json"
    p.write_text(json.dumps(GLUE_DUMP))
    spec = import_glue(str(p))

    assert spec.servers["production"].type == "glue"
    assert spec.servers["production"].account == "123456789012"
    assert spec.servers["production"].database == "test_database"
    assert spec.servers["production"].location == "s3://test_bucket/testdb"

    m = spec.models["test_table"]
    f = m.fields
    assert f["field_one"].type == "string"
    assert f["field_one"].description == "Comment 1"
    assert f["field_two"].type == "int"
    assert f["field_four"].type == "decimal"
    assert (f["field_four"].precision, f["field_four"].scale) == (6, 2)
    # nested struct
    assert f["field_five"].type == "struct"
    assert f["field_five"].fields["sub_field_one"].type == "string"
    assert f["field_five"].fields["sub_field_two"].type == "boolean"
    # array of scalar + array of struct
    assert f["field_six"].type == "array"
    assert f["field_six"].items.type == "string"
    assert f["field_seven"].type == "array"
    assert f["field_seven"].items.type == "struct"
    assert f["field_seven"].items.fields["sub_field_four"].type == "int"
    # map
    assert f["field_eight"].type == "map"
    assert f["field_eight"].keys.type == "string"
    assert f["field_eight"].values.type == "int"
    # plain decimal (no precision), bigint, varchar with/without length
    assert f["field_nine"].type == "decimal"
    assert f["field_nine"].precision is None
    assert f["field_ten"].type == "bigint"
    assert f["field_fifteen"].type == "varchar"
    assert f["field_fifteen"].maxLength is None
    assert f["field_sixteen"].type == "varchar"
    assert f["field_sixteen"].maxLength == 255
    # hive partition keys: required, NOT primary keys, comments preserved
    assert f["part_one"].required is True
    assert f["part_one"].description == "Comment 2"
    assert f["part_two"].required is True
    assert f["part_two"].type == "date"
    assert not m.primaryKey


def test_import_glue_table_filter_and_text_source():
    from raycontract.imports.glue import import_glue

    dump = dict(GLUE_DUMP)
    dump["Tables"] = GLUE_DUMP["Tables"] + [
        {"Name": "other_table",
         "StorageDescriptor": {"Columns": [{"Name": "x", "Type": "string"}]}}
    ]
    spec = import_glue(json.dumps(dump), table_names=["other_table"])
    assert set(spec.models) == {"other_table"}


def test_import_glue_cli_roundtrip(tmp_path, capsys):
    """`raycontract import --format glue` emits contract YAML that re-parses."""
    import yaml

    from raycontract.cli import main

    p = tmp_path / "glue.json"
    p.write_text(json.dumps(GLUE_DUMP))
    rc = main(["import", "--format", "glue", "--source", str(p)])
    assert rc == 0
    doc = yaml.safe_load(capsys.readouterr().out)
    assert "test_table" in doc["models"]
    assert doc["servers"]["production"]["type"] == "glue"
