"""Minimal Avro *binary* decoder for Kafka Confluent wire-format dumps.

The reference validates avro Kafka topics by stripping the 5-byte
schema-registry header (magic 0x00 + 4-byte schema id) from every message
and decoding the remainder with the avro schema derived FROM THE CONTRACT
MODEL (``engines/soda/connections/kafka.py:90-95`` — ``from_avro`` over
``substring(value, 6)`` with ``to_avro_schema_json``). This module is the
offline analog: a self-contained decoder for the Avro 1.11 binary encoding
(spec: https://avro.apache.org/docs/1.11.1/specification/) covering the
types our avro exporter emits — primitives, zigzag-varint ints/longs,
length-prefixed bytes/strings, nullable unions, records, arrays, maps,
enums, fixed, and the date / timestamp-millis / time-micros logical types.

Decoding is inherently per-message Python (Avro binary is a ragged,
schema-driven stream with no record framing we could vectorize over); the
reader runs it inside ``map_batches`` workers so the per-message cost is
distributed and the schema → decoder compilation happens once per actor.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta, timezone
from typing import Any, Callable, Tuple

_EPOCH_DATE = date(1970, 1, 1)

Decoder = Callable[[bytes, int], Tuple[Any, int]]


def _read_long(buf: bytes, pos: int) -> Tuple[int, int]:
    """Zigzag varint (avro int and long share the encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _decode_null(buf: bytes, pos: int):
    return None, pos


def _decode_boolean(buf: bytes, pos: int):
    return buf[pos] != 0, pos + 1


def _decode_float(buf: bytes, pos: int):
    return struct.unpack_from("<f", buf, pos)[0], pos + 4


def _decode_double(buf: bytes, pos: int):
    return struct.unpack_from("<d", buf, pos)[0], pos + 8


def _decode_bytes(buf: bytes, pos: int):
    n, pos = _read_long(buf, pos)
    return bytes(buf[pos:pos + n]), pos + n


def _decode_string(buf: bytes, pos: int):
    n, pos = _read_long(buf, pos)
    return buf[pos:pos + n].decode("utf-8"), pos + n


def _wrap_logical(base: Decoder, logical: str) -> Decoder:
    if logical == "date":
        def dec(buf, pos):
            v, pos = base(buf, pos)
            return _EPOCH_DATE + timedelta(days=v), pos
        return dec
    # exact integer arithmetic: epoch + timedelta, never float division —
    # float64 loses sub-µs precision for current-epoch timestamp-micros
    if logical in ("timestamp-millis", "local-timestamp-millis"):
        tz = timezone.utc if logical == "timestamp-millis" else None
        epoch = datetime(1970, 1, 1, tzinfo=tz)
        def dec(buf, pos, _e=epoch):
            v, pos = base(buf, pos)
            return _e + timedelta(milliseconds=v), pos
        return dec
    if logical in ("timestamp-micros", "local-timestamp-micros"):
        tz = timezone.utc if logical == "timestamp-micros" else None
        epoch = datetime(1970, 1, 1, tzinfo=tz)
        def dec(buf, pos, _e=epoch):
            v, pos = base(buf, pos)
            return _e + timedelta(microseconds=v), pos
        return dec
    if logical in ("time-micros", "time-millis"):
        scale = 1 if logical == "time-micros" else 1000
        def dec(buf, pos):
            v, pos = base(buf, pos)
            return (datetime.min + timedelta(microseconds=v * scale)).time(), pos
        return dec
    # decimal (and unknown logicals): pass the primitive through untouched
    return base


def compile_decoder(schema: Any) -> Decoder:
    """Compile a parsed avro schema (dict/list/str, as produced by
    ``raycontract.export.avro.to_avro_schema``) into a closure tree — one
    compilation per actor, zero schema interpretation per message."""
    if isinstance(schema, str):
        prim = {
            "null": _decode_null, "boolean": _decode_boolean,
            "int": _read_long, "long": _read_long,
            "float": _decode_float, "double": _decode_double,
            "bytes": _decode_bytes, "string": _decode_string,
        }.get(schema)
        if prim is None:
            raise ValueError(f"unsupported avro type: {schema!r}")
        return prim
    if isinstance(schema, list):  # union: long index selects the branch
        branches = [compile_decoder(s) for s in schema]
        def dec_union(buf, pos):
            idx, pos = _read_long(buf, pos)
            return branches[idx](buf, pos)
        return dec_union
    t = schema["type"]
    if t == "record":
        names = [f["name"] for f in schema["fields"]]
        decs = [compile_decoder(f["type"]) for f in schema["fields"]]
        def dec_record(buf, pos):
            out = {}
            for name, d in zip(names, decs):
                out[name], pos = d(buf, pos)
            return out, pos
        return dec_record
    if t == "array":
        item = compile_decoder(schema["items"])
        def dec_array(buf, pos):
            out = []
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _, pos = _read_long(buf, pos)
                for _ in range(n):
                    v, pos = item(buf, pos)
                    out.append(v)
        return dec_array
    if t == "map":
        val = compile_decoder(schema["values"])
        def dec_map(buf, pos):
            out = {}
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    n = -n
                    _, pos = _read_long(buf, pos)
                for _ in range(n):
                    k, pos = _decode_string(buf, pos)
                    out[k], pos = val(buf, pos)
        return dec_map
    if t == "enum":
        symbols = schema["symbols"]
        def dec_enum(buf, pos):
            idx, pos = _read_long(buf, pos)
            return symbols[idx], pos
        return dec_enum
    if t == "fixed":
        size = schema["size"]
        def dec_fixed(buf, pos):
            return bytes(buf[pos:pos + size]), pos + size
        return dec_fixed
    # logical type riding on a primitive ({"type": "long", "logicalType": ...})
    base = compile_decoder(t)
    logical = schema.get("logicalType")
    return _wrap_logical(base, logical) if logical else base


CONFLUENT_HEADER_LEN = 5  # magic 0x00 + 4-byte big-endian schema id


def decode_wire_message(msg: bytes, decoder: Decoder) -> Any:
    """Decode ONE Confluent wire-format message: validate the magic byte,
    skip the schema id (the contract model is the schema authority, exactly
    like the reference's ``from_avro`` with the contract-derived schema), and
    decode the avro body."""
    if not msg or msg[0] != 0:
        raise ValueError(
            f"not a Confluent wire-format message (magic byte {msg[:1]!r}, expected 0x00)")
    value, _ = decoder(msg, CONFLUENT_HEADER_LEN)
    return value


def iter_frames(blob: bytes):
    """Split a topic-dump file into messages. Dump framing: 4-byte big-endian
    message length, then the message bytes (the shape Kafka's own
    DumpLogSegments / length-prefixed binary dumps use; NDJSON dumps take the
    json branch of the reader instead)."""
    pos = 0
    n = len(blob)
    while pos + 4 <= n:
        (length,) = struct.unpack_from(">I", blob, pos)
        pos += 4
        if pos + length > n:
            raise ValueError(f"truncated frame at byte {pos - 4}: need {length}, have {n - pos}")
        yield blob[pos:pos + length]
        pos += length
    if pos != n:
        raise ValueError(f"trailing {n - pos} bytes after last frame")


def encode_wire_message(value: dict, schema: Any, schema_id: int = 1) -> bytes:
    """Encode one record as a Confluent wire message (test/fixture helper —
    the inverse of ``decode_wire_message``; kept in-module so fixtures and
    round-trip tests don't need an avro library)."""
    body = bytearray(b"\x00" + struct.pack(">I", schema_id))
    _encode(value, schema, body)
    return bytes(body)


def _write_long(v: int, out: bytearray) -> None:
    acc = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _encode(value: Any, schema: Any, out: bytearray) -> None:
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            out.append(1 if value else 0)
        elif schema in ("int", "long"):
            _write_long(int(value), out)
        elif schema == "float":
            out += struct.pack("<f", value)
        elif schema == "double":
            out += struct.pack("<d", value)
        elif schema == "bytes":
            _write_long(len(value), out)
            out += value
        elif schema == "string":
            b = value.encode("utf-8")
            _write_long(len(b), out)
            out += b
        else:
            raise ValueError(f"unsupported avro type: {schema!r}")
        return
    if isinstance(schema, list):  # union — pick the first matching branch
        for i, s in enumerate(schema):
            name = s if isinstance(s, str) else s.get("type")
            if (value is None) == (name == "null"):
                _write_long(i, out)
                _encode(value, s, out)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(value[f["name"]], f["type"], out)
    elif t == "array":
        if value:
            _write_long(len(value), out)
            for v in value:
                _encode(v, schema["items"], out)
        _write_long(0, out)
    elif t == "map":
        if value:
            _write_long(len(value), out)
            for k, v in value.items():
                _encode(k, "string", out)
                _encode(v, schema["values"], out)
        _write_long(0, out)
    elif t == "enum":
        _write_long(schema["symbols"].index(value), out)
    elif t == "fixed":
        out += value
    else:  # logical type on a primitive
        logical = schema.get("logicalType")
        if logical == "date" and isinstance(value, date):
            value = (value - _EPOCH_DATE).days
        elif logical in ("timestamp-millis", "local-timestamp-millis") and isinstance(value, datetime):
            value = int(value.replace(tzinfo=value.tzinfo or timezone.utc).timestamp() * 1000)
        elif logical in ("time-micros", "time-millis") and not isinstance(value, (int, float)):
            us = (value.hour * 3600 + value.minute * 60 + value.second) * 1_000_000 + value.microsecond
            value = us if logical == "time-micros" else us // 1000
        _encode(value, t, out)
