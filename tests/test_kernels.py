"""Per-kernel unit tests on hand-built Arrow tables, DuckDB as oracle
(SURVEY.md §5 'ours' (1)-(2): NULL / empty / all-invalid edge cases)."""

import duckdb
import pyarrow as pa
import pytest

from raycontract.plans import ConstraintSpec, ModelPlan
from raycontract.stages.stats import StatsKernel, merge_partials


def run_kernel(table: pa.Table, specs, pk=None):
    plan = ModelPlan(model_name="t", pk_column=pk, constraints=list(specs))
    k = StatsKernel(plan)
    out = k(table)
    return merge_partials([out["payload"][0].as_py()])


T = pa.table({
    "s": pa.array(["abc", "x", None, "toolongvalue", "ok!"]),
    "n": pa.array([1.0, -5.0, None, 100.0, 3.0]),
    "e": pa.array(["a", "b", "c", None, "a"]),
})


def oracle(sql):
    con = duckdb.connect()
    con.register("t", T)
    v = con.execute(sql).fetchone()[0]
    con.close()
    return v


def test_not_null():
    m = run_kernel(T, [ConstraintSpec("k", "not_null", "s")])
    assert m["checks"]["k"]["invalid"] == oracle("SELECT count(*) FROM t WHERE s IS NULL")


def test_min_max_length():
    m = run_kernel(T, [ConstraintSpec("k1", "min_length", "s", (2,)),
                       ConstraintSpec("k2", "max_length", "s", (3,))])
    assert m["checks"]["k1"]["invalid"] == oracle("SELECT count(*) FROM t WHERE length(s) < 2")
    assert m["checks"]["k2"]["invalid"] == oracle("SELECT count(*) FROM t WHERE length(s) > 3")


def test_minimum_maximum_not_equal():
    m = run_kernel(T, [ConstraintSpec("a", "minimum", "n", (0,)),
                       ConstraintSpec("b", "maximum", "n", (50,)),
                       ConstraintSpec("c", "not_equal", "n", (3.0,))])
    assert m["checks"]["a"]["invalid"] == oracle("SELECT count(*) FROM t WHERE n < 0")
    assert m["checks"]["b"]["invalid"] == oracle("SELECT count(*) FROM t WHERE n > 50")
    assert m["checks"]["c"]["invalid"] == oracle("SELECT count(*) FROM t WHERE n = 3.0")


def test_enum_nulls_not_invalid():
    m = run_kernel(T, [ConstraintSpec("k", "enum", "e", (("a", "b"),))])
    assert m["checks"]["k"]["invalid"] == oracle(
        "SELECT count(*) FROM t WHERE e IS NOT NULL AND e NOT IN ('a','b')")


def test_regex_partial_match_semantics():
    m = run_kernel(T, [ConstraintSpec("k", "regex", "s", ("^[a-z]+$",))])
    assert m["checks"]["k"]["invalid"] == oracle(
        "SELECT count(*) FROM t WHERE s IS NOT NULL AND NOT regexp_matches(s, '^[a-z]+$')")


def test_samples_carry_pk():
    m = run_kernel(T, [ConstraintSpec("k", "maximum", "n", (50,))], pk="s")
    assert m["checks"]["k"]["samples"] == [("toolongvalue", "100.0")]


def test_empty_table():
    empty = T.slice(0, 0)
    m = run_kernel(empty, [ConstraintSpec("k", "not_null", "s"),
                           ConstraintSpec("k2", "minimum", "n", (0,))])
    assert m["row_count"] == 0
    assert m["checks"]["k"]["invalid"] == 0
    assert m["checks"]["k2"]["invalid"] == 0


def test_all_invalid():
    t = pa.table({"n": pa.array([1.0, 2.0, 3.0])})
    m = run_kernel(t, [ConstraintSpec("k", "minimum", "n", (10,))])
    assert m["checks"]["k"]["invalid"] == 3


def test_min_max_sum_stats():
    m = run_kernel(T, [])
    cs = m["columns"]["n"]
    assert cs["min"] == -5.0 and cs["max"] == 100.0
    assert cs["sum"] == pytest.approx(99.0)
    assert cs["null_count"] == 1
    assert m["row_count"] == 5


def test_merge_partials_across_batches():
    specs = [ConstraintSpec("k", "minimum", "n", (0,))]
    plan = ModelPlan(model_name="t", constraints=specs)
    k = StatsKernel(plan)
    p1 = k(T.slice(0, 2))["payload"][0].as_py()
    p2 = k(T.slice(2))["payload"][0].as_py()
    m = merge_partials([p1, p2])
    assert m["row_count"] == 5
    assert m["checks"]["k"]["invalid"] == 1
    assert m["columns"]["n"]["min"] == -5.0 and m["columns"]["n"]["max"] == 100.0


def test_binary_length_kernel():
    t = pa.table({"b": pa.array([b"ab", b"abcd", None], type=pa.binary())})
    m = run_kernel(t, [ConstraintSpec("k", "min_length", "b", (3,))])
    assert m["checks"]["k"]["invalid"] == 1


def test_hash64_exotic_type_fallback_works():
    """The pandas fallback (for dtypes polars can't hash) must actually
    work: dicts are unhashable by pandas factorize and hash_key must be 16
    bytes — both made the old fallback raise on ANY exotic input."""
    import pyarrow as pa

    from raycontract.functions.hashing import hash64

    d = pa.array([{"a": 1}, {"a": 2}, {"a": 1}])
    h = hash64(d, seed=3)
    assert h.dtype.kind == "u" and len(h) == 3
    assert h[0] == h[2] and h[0] != h[1]
    assert (h != hash64(d, seed=4)).any()  # seed participates
