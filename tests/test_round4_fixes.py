"""Regression tests for the round-4 ADVICE fixes.

1. draft-07 numeric exclusiveMinimum/Maximum are INDEPENDENT of
   minimum/maximum (both must apply when both present).
2. asof_join drops null right-timestamp rows and tie-breaks null-safely on
   string columns.
3. hash_sql_expr integer path survives ids >= ~6.9e9 (HUGEINT, no UBIGINT
   overflow) and still matches numpy's wraparound.
4. avro timestamp-micros decodes exactly (no float64 precision loss).
5. topk_per_group orders int64 keys above 2^53 exactly (no float collapse).
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


# ------------------------------------------------ 1. exclusive bounds stack
def test_jsonschema_minimum_and_exclusive_minimum_both_apply():
    from raycontract.stages.jsonrows import compile_jsonschema

    node = compile_jsonschema({"minimum": 5, "exclusiveMinimum": 3})
    # 4 violates minimum:5 even though it satisfies exclusiveMinimum:3
    assert node(4), "minimum:5 must still reject 4"
    assert node(3), "exclusiveMinimum:3 must reject 3"
    assert not node(5)
    node = compile_jsonschema({"maximum": 5, "exclusiveMaximum": 8})
    assert node(6), "maximum:5 must still reject 6"
    assert node(8), "exclusiveMaximum:8 must reject 8"
    assert not node(5)


# ------------------------------------------------ 2. asof_join null safety
def test_asof_join_drops_null_right_timestamps(ray_session):
    from raycontract.pipelines.joins import asof_join

    left = rd.from_arrow(pa.table({
        "k": [1, 1], "lts": [100, 200], "lval": ["a", "b"]}))
    right = rd.from_arrow(pa.table({
        "k": [1, 1, 1],
        "rts": pa.array([None, 150, None], type=pa.int64()),
        "tag": [None, "ok", "bad"]}))
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    right_cols=["tag"], direction="forward").take_all()
    # forward from lts=100 must match rts=150 ('ok'), never a null-ts row
    rows = {r["lts"]: r["tag"] for r in out}
    assert rows == {100: "ok"}, rows


def test_asof_join_string_tie_column_with_nulls(ray_session):
    from raycontract.pipelines.joins import asof_join

    left = rd.from_arrow(pa.table({"k": [1], "lts": [100], "lval": ["x"]}))
    right = rd.from_arrow(pa.table({
        "k": [1, 1, 1], "rts": [50, 50, 50],
        "tag": pa.array([None, "a", "z"], type=pa.string())}))
    # backward ties break by the LARGEST first right column; nulls sort
    # smallest (np.lexsort used to raise TypeError on None in object arrays)
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    right_cols=["tag"], direction="backward").take_all()
    assert len(out) == 1 and out[0]["tag"] == "z"


# ------------------------------------------------ 3. big-id hash, no overflow
def test_hash_sql_expr_big_integer_ids_match_numpy():
    from raycontract.pipelines.sampling import hash_sql_expr, hash_u32

    ids = np.array([0, 1, 6_900_000_000, 2**53 + 1, 2**62, 2**63 - 1],
                   dtype=np.uint64)
    col = pa.array(ids.astype(np.int64), type=pa.int64())
    got = hash_u32(col, salt=7)
    t = pa.table({"id": col})
    want = duckdb.sql(
        f"SELECT {hash_sql_expr('id', salt=7)} AS h FROM t"
    ).fetchnumpy()["h"].astype(np.uint64)
    assert (got == want).all()


def test_hash_split_sql_expr_big_integer_ids_match(ray_session):
    from raycontract.pipelines.curation import hash_split, hash_split_sql_expr

    big = [6_900_000_000, 2**53 + 3, 2**62 + 11, 2**63 - 1, 5]
    ds = rd.from_arrow(pa.table({"id": pa.array(big, type=pa.int64())}))
    out = {r["id"]: r["split"]
           for r in hash_split(ds, "id", [0.5, 0.5], ["a", "b"]).take_all()}
    expr = hash_split_sql_expr("id", [0.5, 0.5], ["a", "b"])
    t = pa.table({"id": pa.array(big, type=pa.int64())})
    want = {r[0]: r[1]
            for r in duckdb.sql(f"SELECT id, {expr} FROM t").fetchall()}
    assert out == want


# ------------------------------------------------ 4. exact avro timestamps
def test_avro_timestamp_micros_exact():
    from datetime import datetime, timezone

    from raycontract.functions.avro_binary import (compile_decoder,
                                                   encode_wire_message)

    # 2023-11-14T22:13:20.000001Z — float64 µs division is off by 1 here
    micros = 1_700_000_000_000_001
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "ts",
         "type": {"type": "long", "logicalType": "timestamp-micros"}}]}
    wire = encode_wire_message({"ts": micros}, schema)
    dec = compile_decoder(schema)
    val, _ = dec(wire[5:], 0)
    want = datetime(1970, 1, 1, tzinfo=timezone.utc)
    from datetime import timedelta
    want = want + timedelta(microseconds=micros)
    assert val["ts"] == want
    assert val["ts"].microsecond == 1


# ------------------------------------------------ 5. topk int64 exactness
def test_topk_per_group_int64_above_2_53(ray_session):
    from raycontract.pipelines.relational import topk_per_group

    base = 2**53
    # consecutive int64 values collapse to the same float64
    t = pa.table({"g": ["a"] * 4, "id": [1, 2, 3, 4],
                  "v": pa.array([base, base + 1, base + 2, base + 3],
                                type=pa.int64())})
    out = topk_per_group(rd.from_arrow(t), "g", "v", k=2,
                         id_col="id", descending=True).take_all()
    assert sorted(r["v"] for r in out) == [base + 2, base + 3]
    out = topk_per_group(rd.from_arrow(t), "g", "v", k=2,
                         id_col="id", descending=False).take_all()
    assert sorted(r["v"] for r in out) == [base, base + 1]
