"""Join operators (pipelines/joins.py): as-of, range/interval, broadcast."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd
from raycontract.pipelines.joins import asof_join, broadcast_hash_join, range_join


def _left():
    return rd.from_arrow(pa.table({
        "k": [1, 1, 1, 2, 3],
        "ts": [10, 25, 5, 10, 10],
        "lv": ["a", "b", "c", "d", "e"],
    }))


def _right():
    return rd.from_arrow(pa.table({
        "k": [1, 1, 2, 2, 4],
        "rts": [8, 20, 10, 10, 1],
        "rid": [100, 101, 200, 201, 400],
    }))


class TestAsofJoin:
    def test_backward(self, ray_session):
        out = sorted(asof_join(_left(), _right(), on="k", left_ts="ts",
                               right_ts="rts", right_cols=["rid"]).take_all(),
                     key=lambda r: (r["k"], r["ts"]))
        # k=1: ts=5 has no rts<=5 → dropped; ts=10→rid 100; ts=25→rid 101
        # k=2: ts=10 ties rts=10 twice → max rid 201; k=3: no right → dropped
        assert [(r["ts"], r["rid"]) for r in out] == [(10, 100), (25, 101), (10, 201)]

    def test_forward(self, ray_session):
        out = sorted(asof_join(_left(), _right(), on="k", left_ts="ts",
                               right_ts="rts", right_cols=["rid"],
                               direction="forward").take_all(),
                     key=lambda r: (r["k"], r["ts"]))
        # k=1: ts=5→rts 8; ts=10→rts 20; ts=25 none → dropped
        # k=2: ts=10 ties → min rid 200 (forward keeps smallest tie)
        assert [(r["ts"], r["rid"]) for r in out] == [(5, 100), (10, 101), (10, 200)]

    def test_key_pair_and_suffix(self, ray_session):
        left = rd.from_arrow(pa.table({"uid": [7], "ts": [50], "rid": ["keep"]}))
        right = rd.from_arrow(pa.table({"cid": [7], "rts": [49], "rid": [9]}))
        out = asof_join(left, right, on=("uid", "cid"), left_ts="ts",
                        right_ts="rts", right_cols=["rid"]).take_all()
        assert out == [{"uid": 7, "ts": 50, "rid": "keep", "rid_r": 9}]

    def test_matches_duckdb_asof(self, ray_session):
        import duckdb

        rng = np.random.default_rng(5)
        lt = pa.table({"k": rng.integers(0, 20, 500), "ts": rng.integers(0, 1000, 500),
                       "eid": np.arange(500)})
        rt = pa.table({"k": rng.integers(0, 20, 300), "rts": rng.integers(0, 1000, 300),
                       "rid": np.arange(300)})
        out = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="k",
                        left_ts="ts", right_ts="rts", right_cols=["rid"]).take_all()
        con = duckdb.connect()
        con.register("lt", lt)
        con.register("rt", rt)
        exp = con.execute("""
            WITH r AS (SELECT k, rts, max(rid) AS rid FROM rt GROUP BY 1, 2)
            SELECT eid, rid FROM lt ASOF JOIN r
            ON lt.k = r.k AND lt.ts >= r.rts""").fetchall()
        assert sorted((r["eid"], r["rid"]) for r in out) == sorted(exp)


class TestRangeJoin:
    BANDS = pa.table({"lo": [0.0, 10.0, 20.0], "hi": [10.0, 20.0, 30.0],
                      "band": ["a", "b", "c"]})

    def test_inner(self, ray_session):
        ds = rd.from_arrow(pa.table({"v": [5.0, 10.0, 29.9, 30.0, -1.0, None]}))
        out = range_join(ds, self.BANDS, "v").take_all()
        assert sorted((r["v"], r["band"]) for r in out) == [
            (5.0, "a"), (10.0, "b"), (29.9, "c")]

    def test_left_keeps_unmatched(self, ray_session):
        ds = rd.from_arrow(pa.table({"v": [5.0, 99.0]}))
        out = sorted(range_join(ds, self.BANDS, "v", how="left").take_all(),
                     key=lambda r: r["v"])
        assert [(r["v"], r["band"]) for r in out] == [(5.0, "a"), (99.0, None)]

    def test_closed_both(self, ray_session):
        ds = rd.from_arrow(pa.table({"v": [30.0]}))
        bands = pa.table({"lo": [20.0], "hi": [30.0], "band": ["c"]})
        assert range_join(ds, bands, "v", closed="both").take_all()[0]["band"] == "c"

    def test_overlapping_rejected(self, ray_session):
        bad = pa.table({"lo": [0.0, 5.0], "hi": [10.0, 15.0], "band": ["a", "b"]})
        with pytest.raises(ValueError, match="non-overlapping"):
            range_join(rd.from_arrow(pa.table({"v": [1.0]})), bad, "v")


class TestBroadcastJoin:
    DIM = pa.table({"ck": [1, 2], "name": ["x", "y"]})

    def test_inner(self, ray_session):
        ds = rd.from_arrow(pa.table({"ok": [10, 11, 12], "ck": [1, 2, 9]}))
        out = broadcast_hash_join(ds, self.DIM, on="ck").take_all()
        assert sorted((r["ok"], r["name"]) for r in out) == [(10, "x"), (11, "y")]

    def test_left_and_key_pair(self, ray_session):
        ds = rd.from_arrow(pa.table({"ok": [10, 12], "cust": [1, 9]}))
        out = sorted(broadcast_hash_join(ds, self.DIM, on=("cust", "ck"),
                                         how="left").take_all(),
                     key=lambda r: r["ok"])
        assert [(r["ok"], r["name"]) for r in out] == [(10, "x"), (12, None)]

    def test_clash_suffix(self, ray_session):
        dim = pa.table({"ck": [1], "v": ["dim"]})
        ds = rd.from_arrow(pa.table({"ck": [1], "v": ["fact"]}))
        row = broadcast_hash_join(ds, dim, on="ck").take_all()[0]
        assert row["v"] == "fact" and row["v_r"] == "dim"


class TestShuffleJoin:
    def test_inner_matches_sql(self, ray_session):
        import duckdb

        lt = pa.table({"k": [1, 1, 2, 3], "lv": ["a", "b", "c", "d"]})
        rt = pa.table({"rk": [1, 2, 2, 9], "rv": [10, 20, 21, 90]})
        from raycontract.pipelines.joins import shuffle_hash_join

        out = shuffle_hash_join(rd.from_arrow(lt), rd.from_arrow(rt),
                                on=("k", "rk"), num_partitions=4).take_all()
        con = duckdb.connect()
        con.register("lt", lt)
        con.register("rt", rt)
        exp = con.execute("SELECT k, lv, rv FROM lt JOIN rt ON k = rk").fetchall()
        assert sorted((r["k"], r["lv"], r["rv"]) for r in out) == sorted(exp)

    def test_left_outer(self, ray_session):
        from raycontract.pipelines.joins import shuffle_hash_join

        lt = rd.from_arrow(pa.table({"k": [1, 5], "lv": ["a", "b"]}))
        rt = rd.from_arrow(pa.table({"k": [1], "rv": [10]}))
        out = sorted(shuffle_hash_join(lt, rt, on="k", how="left_outer",
                                       num_partitions=2).take_all(),
                     key=lambda r: r["k"])
        assert [(r["k"], r["rv"]) for r in out] == [(1, 10), (5, None)]


class TestLagDelta:
    def test_matches_window_lag(self, ray_session):
        import duckdb

        rng = np.random.default_rng(9)
        t = pa.table({"id": np.arange(400),
                      "k": rng.integers(0, 10, 400),
                      "ts": rng.integers(0, 100, 400)})  # many ties
        from raycontract.pipelines.joins import lag_delta

        out = lag_delta(rd.from_arrow(t), "k", "ts", "id").take_all()
        con = duckdb.connect()
        con.register("t", t)
        exp = dict(con.execute("""
            SELECT id, ts - LAG(ts) OVER (PARTITION BY k ORDER BY ts, id)
            FROM t""").fetchall())
        assert {r["id"]: r["delta"] for r in out} == exp
