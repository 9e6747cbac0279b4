"""Server-format readers: json (newline + array), csv with declared types,
parquet directory — mirrors the reference's per-format connection tests
(duckdb_connection.py:40-66 semantics)."""

import json
import os

import pyarrow as pa
import pytest

from raycontract import DataContract, ResultEnum

CONTRACT_TMPL = """
id: srv
dataContractSpecification: 1.1.0
info: {{title: test, version: 1.0.0}}
models:
  m:
    fields:
      id: {{type: string, required: true, unique: true}}
      v: {{type: long, maximum: 100}}
servers:
  local: {{type: local, format: {fmt}, path: "{path}"{delim}}}
"""

ROWS = [{"id": "a", "v": 1}, {"id": "b", "v": 50}, {"id": "c", "v": 200}]


def _expect(run):
    by = {c.key: c for c in run.checks}
    assert by["m__v__field_maximum"].result == ResultEnum.failed
    assert by["m__v__field_maximum"].diagnostics["invalid_count"] == 1
    assert by["m__id__field_required"].result == ResultEnum.passed
    assert by["m__id__field_unique"].result == ResultEnum.passed


def test_json_newline_server(ray_session, tmp_path):
    p = tmp_path / "m.json"
    p.write_text("\n".join(json.dumps(r) for r in ROWS))
    c = CONTRACT_TMPL.format(fmt="json", path=p, delim="")
    run = DataContract(data_contract_str=c).test()
    _expect(run)
    # type checks skipped for schemaless json (ref data_contract_checks.py:79-82)
    assert not any(ch.type == "field_type" for ch in run.checks)


def test_json_array_server(ray_session, tmp_path):
    p = tmp_path / "m.json"
    p.write_text(json.dumps(ROWS))
    c = CONTRACT_TMPL.format(fmt="json", path=p, delim=", delimiter: array")
    run = DataContract(data_contract_str=c).test()
    _expect(run)


def test_csv_server_with_declared_types(ray_session, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("id,v\na,1\nb,50\nc,200\n")
    c = CONTRACT_TMPL.format(fmt="csv", path=p, delim="")
    run = DataContract(data_contract_str=c).test()
    _expect(run)


def test_parquet_directory_server(ray_session, tmp_path):
    import pyarrow.parquet as pq

    d = tmp_path / "m"
    d.mkdir()
    t = pa.table({"id": pa.array([r["id"] for r in ROWS]),
                  "v": pa.array([r["v"] for r in ROWS], type=pa.int64())})
    pq.write_table(t.slice(0, 2), d / "part0.parquet")
    pq.write_table(t.slice(2), d / "part1.parquet")
    c = CONTRACT_TMPL.format(fmt="parquet", path=d, delim="")
    run = DataContract(data_contract_str=c).test()
    _expect(run)
    assert any(ch.type == "field_type" and ch.result == ResultEnum.passed
               for ch in run.checks)


def test_unknown_format_errors(ray_session, tmp_path):
    c = CONTRACT_TMPL.format(fmt="avro", path=tmp_path / "x.avro", delim="")
    run = DataContract(data_contract_str=c).test()
    assert run.result == ResultEnum.error


def test_kafka_dump_snapshot_server(ray_session, tmp_path):
    """format: kafka reads an NDJSON topic dump as a batch snapshot (the
    reference's kafka semantics: earliest→now materialized, validated as a
    batch — engines/soda/connections/kafka.py:50-57)."""
    p = tmp_path / "topic.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in ROWS))
    c = CONTRACT_TMPL.format(fmt="kafka", path=p, delim="")
    run = DataContract(data_contract_str=c).test()
    _expect(run)
    # (a `type: kafka, format: json` server flows through the json branch
    # with type-checks skipped, exactly like the reference; `format: kafka`
    # is the explicit dump spelling tested here)


# --- kafka avro wire format (reference kafka.py:90-95) ----------------------

def test_avro_binary_known_byte_vectors():
    """Decoder checked against hand-computed Avro-spec byte sequences (not
    against our own encoder): zigzag longs, string framing, nullable union."""
    from raycontract.functions.avro_binary import compile_decoder

    # long: zigzag(1)=2, zigzag(-2)=3, zigzag(64)=128 -> varint 0x80 0x01
    dec = compile_decoder("long")
    assert dec(b"\x02", 0) == (1, 1)
    assert dec(b"\x03", 0) == (-2, 1)
    assert dec(b"\x80\x01", 0) == (64, 2)
    # string: length zigzag(3)=6 then utf-8 bytes
    dec = compile_decoder("string")
    assert dec(b"\x06foo", 0) == ("foo", 4)
    # union ["null","long"]: index 1 (zigzag=2) then zigzag(7)=14
    dec = compile_decoder(["null", "long"])
    assert dec(b"\x02\x0e", 0) == (7, 2)
    assert dec(b"\x00", 0) == (None, 1)
    # record {a: long, b: string}
    dec = compile_decoder({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]})
    assert dec(b"\x04\x02x", 0) == ({"a": 2, "b": "x"}, 3)
    # array of long: block count 2, items 1,2, end block 0
    dec = compile_decoder({"type": "array", "items": "long"})
    assert dec(b"\x04\x02\x04\x00", 0) == ([1, 2], 4)


def test_kafka_avro_wire_server(ray_session, tmp_path):
    """type: kafka + format: avro reads a length-prefixed Confluent
    wire-format topic dump, decoding with the CONTRACT-derived schema (the
    reference's from_avro(substring(value,6)) semantics)."""
    import struct

    from raycontract.export.avro import to_avro_schema
    from raycontract.functions.avro_binary import encode_wire_message
    from raycontract.contract import DataContractSpecification

    c = CONTRACT_TMPL.format(fmt="avro", path=tmp_path / "m.dump", delim="")
    spec = DataContractSpecification.from_string(c)
    schema = to_avro_schema("m", spec.models["m"])
    blob = bytearray()
    for r in ROWS:
        msg = encode_wire_message(r, schema)
        blob += struct.pack(">I", len(msg)) + msg
    (tmp_path / "m.dump").write_bytes(bytes(blob))

    c = c.replace("type: local", "type: kafka")
    run = DataContract(data_contract_str=c).test()
    _expect(run)


def test_kafka_avro_rejects_bad_magic(ray_session, tmp_path):
    import struct

    (tmp_path / "m.dump").write_bytes(struct.pack(">I", 3) + b"\x01ab")
    c = CONTRACT_TMPL.format(fmt="avro", path=tmp_path / "m.dump", delim="")
    run = DataContract(data_contract_str=c).test()
    assert run.result == ResultEnum.error
