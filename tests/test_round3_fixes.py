"""Round-3 regression tests: ADVICE r2 bug fixes + scale-safety rewrites."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


# ------------------------------------------------- positional GROUP BY (r2 #1)


def test_resolve_positional_group_by_units():
    from raycontract.engine import _resolve_positional_group_by

    # plain names pass through
    assert _resolve_positional_group_by("a, b", "a, b") == "a, b"
    # positions resolve against a plain-column select list
    assert _resolve_positional_group_by("1, 2", "user_id, status") == "user_id, status"
    assert _resolve_positional_group_by("2", "a, b") == "b"
    # mixed positional + named
    assert _resolve_positional_group_by("1, status", "user_id, status") == "user_id, status"
    # out-of-range or computed select item → unresolvable
    assert _resolve_positional_group_by("3", "a, b") is None
    assert _resolve_positional_group_by("1", "a + 1") is None


def test_positional_group_by_quality_check_matches_oracle(ray_session):
    """ADVICE r2 (medium): GROUP BY 1, 2 grouped by literal constants in the
    per-batch partial, silently flipping the HAVING verdict."""
    import duckdb

    from raycontract import DataContract

    t = pa.table({
        "user_id": pa.array([1, 1, 2, 3, 3, 3], type=pa.int64()),
        "status": pa.array(["a", "a", "b", "c", "c", "d"]),
    })
    query = ("SELECT count(*) FROM (SELECT user_id, status FROM t "
             "GROUP BY 1, 2 HAVING count(*) > 1) x")
    contract = f"""
dataContractSpecification: 1.1.0
id: posgb
info: {{title: t, version: 1.0.0}}
models:
  t:
    fields:
      user_id: {{type: long}}
      status: {{type: string}}
    quality:
      - type: sql
        query: "{query}"
        mustBe: 2
"""
    run = DataContract(data_contract_str=contract).test(datasets={"t": t})
    check = [c for c in run.checks if c.type == "model_quality_sql"][0]
    con = duckdb.connect()
    con.register("t", t)
    oracle = con.execute(query).fetchone()[0]
    assert oracle == 2
    assert int(check.diagnostics["value"]) == oracle
    assert check.result.value == "passed"


# ------------------------------------------------------ sql importer sandbox


def test_import_sql_ignores_side_effect_statements(tmp_path):
    """ADVICE r2 (medium): embedded COPY/ATTACH/CTAS must not execute."""
    from raycontract.imports.sql import import_sql

    out = tmp_path / "exfil.csv"
    ddl = f"""
CREATE TABLE t1 (id BIGINT NOT NULL, name VARCHAR(10));
COPY (SELECT 42 AS x) TO '{out}' (FORMAT CSV);
CREATE TABLE t2 AS SELECT * FROM range(10);
CREATE TABLE t3 (v DOUBLE);
"""
    spec = import_sql(ddl)
    assert not out.exists(), "COPY TO side effect executed during import"
    assert set(spec.models) == {"t1", "t3"}  # CTAS rejected, plain DDL kept
    assert spec.models["t1"].fields["id"].required is True
    assert spec.models["t1"].fields["name"].type == "string"


def test_import_sql_external_access_disabled(tmp_path):
    from raycontract.imports.sql import import_sql

    # a DEFAULT expression calling an external reader must fail loudly, not
    # read the filesystem
    ddl = "CREATE TABLE t (v VARCHAR DEFAULT (SELECT 1 FROM read_csv_auto('/etc/hostname')))"
    with pytest.raises(ValueError):
        import_sql(ddl)


# ----------------------------------------------------- hash_split string ids


def test_hash_split_string_ids_matches_sql_oracle(ray_session):
    import duckdb

    from raycontract.pipelines.curation import hash_split, hash_split_sql_expr

    ids = [f"doc-{i:04d}" for i in range(500)]
    ds = rd.from_arrow(pa.table({"id": pa.array(ids)}))
    out = {r["id"]: r["split"]
           for r in hash_split(ds, "id", [0.8, 0.1, 0.1],
                               ["train", "val", "test"]).take_all()}
    expr = hash_split_sql_expr("id", [0.8, 0.1, 0.1], ["train", "val", "test"],
                               string_id=True)
    con = duckdb.connect()
    con.register("t", pa.table({"id": pa.array(ids)}))
    oracle = dict(con.execute(f"SELECT id, {expr} AS split FROM t").fetchall())
    assert out == oracle
    # all three splits are populated at n=500
    assert {"train", "val", "test"} <= set(out.values())


def test_hash_split_int_sql_expr_matches(ray_session):
    import duckdb

    from raycontract.pipelines.curation import hash_split, hash_split_sql_expr

    ds = rd.from_arrow(pa.table({"id": pa.array(range(1000), type=pa.int64())}))
    out = {r["id"]: r["split"] for r in hash_split(ds, "id", [0.9, 0.1]).take_all()}
    expr = hash_split_sql_expr("id", [0.9, 0.1])
    con = duckdb.connect()
    oracle = dict(con.execute(
        f"SELECT id, {expr} AS split FROM range(1000) r(id)").fetchall())
    assert out == oracle


def test_hash_split_rejects_unsupported_type(ray_session):
    from raycontract.pipelines.curation import hash_split

    ds = rd.from_arrow(pa.table({"id": pa.array([1.5, 2.5])}))
    with pytest.raises(Exception, match="integer or string"):
        hash_split(ds, "id", [0.5, 0.5]).take_all()


# ------------------------------------- connected components with string ids


def test_connected_components_string_ids_distributed(ray_session):
    """ADVICE r2 (low): the distributed path used sum('label') for
    convergence, which fails on string ids."""
    from raycontract.pipelines.dedup import connected_components

    pairs = pa.table({
        "id_a": pa.array(["a", "b", "x", "m"]),
        "id_b": pa.array(["b", "c", "y", "n"]),
    })
    # driver_edge_limit=0 forces the distributed Dataset.join path
    cc = connected_components(rd.from_arrow(pairs), driver_edge_limit=0)
    got = {r["node"]: r["component"] for r in cc.take_all()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x",
                   "m": "m", "n": "m"}


def test_connected_components_round_cap_warns(ray_session, caplog):
    import logging

    from raycontract.pipelines.dedup import connected_components

    # a 6-chain needs ~3 rounds; cap at 1 → split + warning
    pairs = pa.table({"id_a": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                      "id_b": pa.array([2, 3, 4, 5, 6], type=pa.int64())})
    with caplog.at_level(logging.WARNING):
        cc = connected_components(rd.from_arrow(pairs), max_rounds=1)
        cc.take_all()
    assert any("max_rounds" in r.message for r in caplog.records)


# ----------------------------------------- neardup_keep_first without driver


def _toy_corpus_and_pairs():
    ids = pa.table({"vec_id": pa.array(range(20), type=pa.int64())})
    pairs = pa.table({"id_a": pa.array([0, 1, 7], type=pa.int64()),
                      "id_b": pa.array([1, 2, 9], type=pa.int64())})
    return rd.from_arrow(ids), rd.from_arrow(pairs)


def test_neardup_keep_first_broadcast_and_bucketed_agree(ray_session):
    from raycontract.pipelines.dedup import neardup_keep_first

    ds, pairs = _toy_corpus_and_pairs()
    kept_b = sorted(r["vec_id"] for r in
                    neardup_keep_first(ds, pairs, "vec_id").take_all())
    ds, pairs = _toy_corpus_and_pairs()
    kept_a = sorted(r["vec_id"] for r in
                    neardup_keep_first(ds, pairs, "vec_id",
                                       broadcast_limit=0).take_all())
    expect = sorted(set(range(20)) - {1, 2, 9})
    assert kept_b == expect
    assert kept_a == expect


def test_neardup_keep_first_filter_is_vectorized():
    """The corpus filter must run pc.is_in over a broadcast pyarrow array —
    no driver take_all of the component map, no per-row Python membership
    loop (VERDICT r2 'What's wrong' #1)."""
    import inspect

    from raycontract.pipelines.dedup import neardup_keep_first

    src = inspect.getsource(neardup_keep_first)
    assert "pc.is_in" in src
    assert "take_all" not in src
    assert "to_pylist" not in src
    assert "not in drop" not in src  # the old per-row membership test


# ------------------------------------------------- exact distributed quantiles


class TestExactQuantiles:
    """exact_quantiles = DuckDB quantile_disc on every shape, including the
    ones that break naive histogram selection (duplicate runs, heavy skew)."""

    QS = (0.25, 0.5, 0.75, 0.9, 0.99)

    def _check(self, values, qs=QS, **kw):
        import duckdb

        from raycontract.pipelines.relational import exact_quantiles

        t = pa.table({"v": pa.array(values, type=pa.float64())})
        got = exact_quantiles(rd.from_arrow(t), "v", qs=qs, **kw)
        con = duckdb.connect()
        con.register("t", t)
        for q, val in got:
            exp = con.execute(
                f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            assert val == exp, (q, val, exp)

    def test_uniform(self, ray_session):
        rng = np.random.default_rng(7)
        self._check(rng.uniform(-100, 100, 20_000).tolist())

    def test_duplicate_heavy(self, ray_session):
        # 95% of rows share one value: the repeated-run fast path
        vals = [42.0] * 19_000 + list(np.random.default_rng(1).normal(0, 1, 1_000))
        self._check(vals)

    def test_skewed_lognormal(self, ray_session):
        rng = np.random.default_rng(3)
        self._check(np.exp(rng.normal(0, 4, 10_000)).tolist())

    def test_tiny_and_constant(self, ray_session):
        self._check([5.0])
        self._check([3.0, 3.0, 3.0, 3.0])

    def test_with_nulls(self, ray_session):
        self._check([1.0, None, 2.0, None, 3.0, 4.0, None, 5.0])

    def test_forced_multi_round(self, ray_session):
        # collect_limit=8 forces several histogram-narrowing rounds
        rng = np.random.default_rng(11)
        self._check(rng.uniform(0, 1, 5_000).tolist(),
                    buckets=16, collect_limit=8)
