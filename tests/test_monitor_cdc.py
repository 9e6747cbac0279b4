"""Behavior tests for the round-5c monitoring/CDC family: latest_snapshot
(keep-latest full row), control_chart (trailing 3σ volume flag, exact
integer), fd_violations (functional dependency), tukey_outlier_counts
(IQR fences). Oracle parity at the gate SF runs via test_entry_parity."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _ts(us_list):
    return pa.array(np.asarray(us_list, dtype="datetime64[us]"))


def test_latest_snapshot_picks_max_ts_then_id(ray_session):
    from raycontract.pipelines.cdc import latest_snapshot

    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": _ts([100, 300, 300, 50, 200, 200]),
        "k": pa.array([7, 7, 7, 8, None, None], pa.int64()),
        "payload": pa.array(["a", "b", "c", "d", "e", "f"]),
    })
    # force multiple blocks so the fold actually merges partials
    ds = rd.from_arrow(t).repartition(3)
    out = latest_snapshot(ds, "k", "ts", "id").to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    # k=7: ts tie at 300 → max id wins (3); k=8: only id 4;
    # null key partition: ts tie at 200 → id 6
    assert list(out["id"]) == [3, 4, 6]
    assert list(out["payload"]) == ["c", "d", "f"]
    assert set(out.columns) == {"id", "ts", "k", "payload"}


def test_latest_snapshot_null_ts_ranks_lowest(ray_session):
    from raycontract.pipelines.cdc import latest_snapshot

    t = pa.table({
        "id": pa.array([10, 11], pa.int64()),
        "ts": pa.array([None, 5], pa.timestamp("us")),
        "k": pa.array([1, 1], pa.int64()),
    })
    out = latest_snapshot(rd.from_arrow(t), "k", "ts", "id").to_pandas()
    assert list(out["id"]) == [11]  # real ts beats null ts


def test_latest_snapshot_empty(ray_session):
    from raycontract.pipelines.cdc import latest_snapshot

    t = pa.table({"id": pa.array([], pa.int64()),
                  "ts": pa.array([], pa.timestamp("us")),
                  "k": pa.array([], pa.int64())})
    out = latest_snapshot(rd.from_arrow(t), "k", "ts", "id").to_pandas()
    assert len(out) == 0


def test_control_chart_flags_planted_spike(ray_session):
    from raycontract.pipelines.dataprofile import control_chart

    day = 86_400_000_000
    # 10 steady days of 100 rows, then a 500-row spike on day 10
    counts = [100] * 10 + [500]
    ts = np.concatenate([np.full(c, d * day, dtype=np.int64) + np.arange(c)
                         for d, c in enumerate(counts)])
    t = pa.table({"ts": ts.astype("datetime64[us]")})
    out = control_chart(rd.from_arrow(t).repartition(4), "ts",
                        bucket_s=86400, window=7, z=3).to_pandas()
    out = out.sort_values("bucket_us").reset_index(drop=True)
    assert list(out["n_rows"]) == counts
    # steady days unflagged (zero variance, zero deviation: 0 > 0 false),
    # spike day flagged (w·x−s = 7·500−700 → lhs² ≫ 0 = 9·var)
    assert list(out["flagged"]) == [0] * 10 + [1]
    assert out["n_window"].iloc[0] == 0 and out["n_window"].iloc[10] == 7


def test_control_chart_short_history_unflagged(ray_session):
    from raycontract.pipelines.dataprofile import control_chart

    day = 86_400_000_000
    ts = np.concatenate([np.full(c, d * day, dtype=np.int64)
                         for d, c in enumerate([100, 900])])
    t = pa.table({"ts": ts.astype("datetime64[us]")})
    out = control_chart(rd.from_arrow(t), "ts").to_pandas()
    # only 1 trailing day < min_window=3 → never flagged
    assert list(out["flagged"]) == [0, 0]


def test_fd_violations_reports_only_violators(ray_session):
    from raycontract.pipelines.dataprofile import fd_violations

    t = pa.table({
        "det": pa.array([1, 1, 2, 2, 3, None, None], pa.int64()),
        "dep": pa.array(["x", "x", "a", "b", "z", "p", "q"]),
    })
    out = fd_violations(rd.from_arrow(t).repartition(3),
                        "det", "dep").to_pandas()
    got = {(None if row.isna()["det"] else int(row["det"])):
           int(row["n_distinct_dep"]) for _, row in out.iterrows()}
    # det=1 holds (one dep), det=2 violates (2), det=3 holds, null det
    # group violates (2 deps) — SQL GROUP BY keeps the null group
    assert got == {2: 2, None: 2}


def test_fd_violations_holding_fd_is_empty(ray_session):
    from raycontract.pipelines.dataprofile import fd_violations

    t = pa.table({"det": pa.array([1, 1, 2], pa.int64()),
                  "dep": pa.array(["a", "a", "b"])})
    out = fd_violations(rd.from_arrow(t), "det", "dep").to_pandas()
    assert len(out) == 0


def test_tukey_fences_planted_outliers(ray_session):
    from raycontract.pipelines.groupstats import tukey_outlier_counts

    # group 1: tight cluster 10.00..10.09 plus outliers 1000.0 and -1000.0;
    # group 2: uniform spread, no outliers
    g1v = [10.0 + i / 100 for i in range(10)] + [1000.0, -1000.0]
    g2v = [float(i) for i in range(20)]
    t = pa.table({
        "g": pa.array([1] * len(g1v) + [2] * len(g2v), pa.int64()),
        "v": pa.array(g1v + g2v, pa.float64()),
    })
    out = tukey_outlier_counts(rd.from_arrow(t).repartition(3),
                               "g", "v").to_pandas()
    out = out.set_index("g")
    assert out.loc[1, "n_outliers"] == 2
    assert out.loc[2, "n_outliers"] == 0
    assert out.loc[1, "n_rows"] == 12 and out.loc[2, "n_rows"] == 20
    # exact quantile_disc cents: rank ceil(0.25*12)=3 over sorted
    # (-1000, 10.00, 10.01, ...) → 10.01 → 1001
    assert out.loc[1, "q1_cents"] == 1001


def test_tukey_null_values_excluded(ray_session):
    from raycontract.pipelines.groupstats import tukey_outlier_counts

    t = pa.table({"g": pa.array([1, 1, 1, 1], pa.int64()),
                  "v": pa.array([1.0, 2.0, None, 3.0], pa.float64())})
    out = tukey_outlier_counts(rd.from_arrow(t), "g", "v").to_pandas()
    assert out.loc[0, "n_rows"] == 3


def test_pixel_dedup_cross_format(ray_session):
    """Same pixels encoded png AND bmp → one distinct pixel hash, two rows;
    corrupt payload excluded from the dedup universe."""
    from raycontract.functions.codecs import encode_image
    from raycontract.pipelines.multimodal import pixel_dedup_stats

    rng = np.random.default_rng(7)
    img1 = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    img2 = rng.integers(0, 256, (5, 5, 3)).astype(np.uint8)
    t = pa.table({
        "image_id": pa.array(["a", "b", "c", "d"]),
        "bytes": pa.array([encode_image(img1, "png"),
                           encode_image(img1, "bmp"),  # pixel-dup of a
                           encode_image(img2, "ppm"),
                           b"junk"], pa.binary()),
        "fmt": pa.array(["png", "bmp", "ppm", "png"]),
    })
    out = pixel_dedup_stats(rd.from_arrow(t).repartition(2),
                            concurrency=(1, 2)).to_pandas()
    r = out.iloc[0]
    assert (r["n_rows"], r["n_decoded"], r["n_distinct_pixels"],
            r["n_dup_rows"]) == (4, 3, 2, 1)


def test_trend_slope_planted_line(ray_session):
    """Exact line y = 3 + 2x (cents over seconds) → slope 2 cents/s =
    2·86400·1e6 micro/day; a single-timestamp group reports 0."""
    from raycontract.pipelines.dataprofile import trend_slope_by_group

    xs = np.arange(50, dtype=np.int64)
    ts_a = (1_700_000_000_000_000 + xs * 1_000_000)
    val_a = (3 + 2 * xs) / 100.0  # cents → value units
    t = pa.table({
        "g": pa.array(["a"] * 50 + ["b"] * 3 + [None, "a"]),
        "ts": np.concatenate([ts_a,
                              np.full(3, 1_700_000_000_000_000, np.int64),
                              [1_700_000_000_000_000] * 2]
                             ).astype("datetime64[us]"),
        "v": pa.array(list(val_a) + [1.0, 2.0, 3.0] + [4.0, None],
                      pa.float64()),
    })
    out = trend_slope_by_group(rd.from_arrow(t).repartition(4),
                               "g", "ts", "v").to_pandas().set_index("g")
    assert out.loc["a", "slope_day_micro"] == 2 * 86400 * 1_000_000
    assert out.loc["a", "n_rows"] == 50  # null value row excluded
    assert out.loc["b", "slope_day_micro"] == 0  # zero x-variance
    assert "None" not in out.index and None not in out.index


def test_entropy_by_group_uniform_and_collapsed(ray_session):
    from raycontract.pipelines.dataprofile import entropy_by_group

    t = pa.table({
        "g": pa.array(["u"] * 8 + ["c"] * 5 + [None, "u"]),
        "v": pa.array(["a", "b", "c", "d"] * 2  # uniform over 4
                      + ["only"] * 5            # collapsed
                      + ["x", None]),
    })
    out = entropy_by_group(rd.from_arrow(t).repartition(3),
                           "g", "v").to_pandas().set_index("g")
    assert out.loc["u", "entropy_micro"] == round(np.log(4) * 1e6)
    assert out.loc["u", "n_rows"] == 8  # null value row excluded
    assert out.loc["c", "entropy_micro"] == 0
    assert out.loc["c", "n_distinct"] == 1
    assert len(out) == 2  # null group excluded


def test_orphan_rate_daily_planted(ray_session):
    from raycontract.pipelines.dataprofile import orphan_rate_daily

    day = 86_400_000_000
    ev = pa.table({
        "k": pa.array([1, 2, 99, None, 1, 77], pa.int64()),
        "ts": np.array([0, 0, 0, day, day, day],
                       np.int64).astype("datetime64[us]"),
    })
    ref = pa.table({"rk": pa.array([1, 2, 3, 2, None], pa.int64())})
    out = orphan_rate_daily(rd.from_arrow(ev).repartition(3),
                            rd.from_arrow(ref).repartition(2),
                            "k", "rk", "ts").to_pandas()
    out = out.sort_values("bucket_us").reset_index(drop=True)
    # day 0: keys 1,2,99 → one orphan (99); day 1: None,1,77 → two
    # (null key is NOT-EXISTS-orphan, 77 unmatched)
    assert list(out["n_rows"]) == [3, 3]
    assert list(out["n_orphan"]) == [1, 2]


def test_orphan_rate_empty_reference(ray_session):
    from raycontract.pipelines.dataprofile import orphan_rate_daily

    ev = pa.table({"k": pa.array([5], pa.int64()),
                   "ts": np.array([0], np.int64).astype("datetime64[us]")})
    ref = pa.table({"rk": pa.array([], pa.int64())})
    out = orphan_rate_daily(rd.from_arrow(ev), rd.from_arrow(ref),
                            "k", "rk", "ts").to_pandas()
    assert list(out["n_orphan"]) == [1]


def test_snapshot_diff_all_classes(ray_session):
    from raycontract.pipelines.cdc import snapshot_diff_counts

    a = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": pa.array(["x", "y", None, "w"]),
                  "m": pa.array([1.5, 2.5, 3.5, 4.5], pa.float64())})
    # k=1 unchanged, k=2 changed (v), k=3 unchanged (null v both sides),
    # k=4 removed, k=5 added
    b = pa.table({"k": pa.array([1, 2, 3, 5], pa.int64()),
                  "v": pa.array(["x", "Y", None, "new"]),
                  "m": pa.array([1.5, 2.5, 3.5, 5.5], pa.float64())})
    out = snapshot_diff_counts(rd.from_arrow(a).repartition(2),
                               rd.from_arrow(b).repartition(3),
                               "k", ["v", "m"]).to_pandas().iloc[0]
    assert (out["n_a"], out["n_b"]) == (4, 4)
    assert (out["n_added"], out["n_removed"]) == (1, 1)
    assert (out["n_changed"], out["n_unchanged"]) == (1, 2)


def test_snapshot_diff_rejects_duplicate_keys(ray_session):
    from raycontract.pipelines.cdc import snapshot_diff_counts

    a = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "v": pa.array(["x", "y"])})
    b = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array(["x"])})
    # the check runs inside a Ray Data task since the classify stage was
    # distributed; Ray wraps the ValueError, so match on the message
    with pytest.raises(Exception, match="not unique"):
        snapshot_diff_counts(rd.from_arrow(a), rd.from_arrow(b), "k", ["v"])


def test_mad_outliers_planted(ray_session):
    """Tight cluster + two extremes: MAD ignores the extremes (median-based)
    so both are flagged; all-identical group has MAD 0 and any deviation
    flags."""
    from raycontract.pipelines.groupstats import mad_outlier_counts

    g1v = [10.0 + i / 100 for i in range(11)] + [500.0, -500.0]
    g2v = [7.0] * 6 + [7.01]
    t = pa.table({
        "g": pa.array([1] * len(g1v) + [2] * len(g2v), pa.int64()),
        "v": pa.array(g1v + g2v, pa.float64()),
    })
    out = mad_outlier_counts(rd.from_arrow(t).repartition(3),
                             "g", "v").to_pandas().set_index("g")
    # g1: median 10.06? ranks: 13 values sorted (-500, 10.00..10.10, 500)
    # → rank ceil(0.5*13)=7 → 10.05 → 1005; dev median over
    # (0,1..5,5..?,49000..) → small MAD; extremes flagged
    assert out.loc[1, "n_outliers"] == 2
    assert out.loc[1, "median_cents"] == 1005
    # g2: median 700, MAD 0 → only the 7.01 row deviates (dev 1 > 0)
    assert out.loc[2, "mad_cents"] == 0
    assert out.loc[2, "n_outliers"] == 1


def test_ks_identical_and_shifted(ray_session):
    """A group identical to the corpus majority has small KS; a fully
    disjoint-shifted group has KS = its mass separation (here 1.0 against
    its own complement... verified against a hand-computed value)."""
    from raycontract.pipelines.dataprofile import ks_by_group

    # group A: values 1..10 (uniform); group B: values 101..110 — disjoint.
    # Global = A ∪ B. CDF_A runs to 1 by v=10 while global is at 0.5 →
    # KS_A = 0.5; symmetric for B.
    t = pa.table({
        "g": pa.array(["A"] * 10 + ["B"] * 10),
        "v": pa.array(list(range(1, 11)) + list(range(101, 111)), pa.int64()),
    })
    out = ks_by_group(rd.from_arrow(t).repartition(4),
                      "g", "v").to_pandas().set_index("g")
    assert out.loc["A", "ks_micro"] == 500000
    assert out.loc["B", "ks_micro"] == 500000
    # a group that IS the corpus: KS = 0
    t2 = pa.table({"g": pa.array(["only"] * 5),
                   "v": pa.array([1, 2, 2, 3, 9], pa.int64())})
    out2 = ks_by_group(rd.from_arrow(t2), "g", "v").to_pandas()
    assert out2["ks_micro"].iloc[0] == 0


def test_grouped_topk_ties_and_nulls(ray_session):
    from raycontract.pipelines.relational import grouped_topk_values

    t = pa.table({
        "g": pa.array([1, 1, 1, 1, 1, 2, 2, None, None], pa.int64()),
        "v": pa.array(["b", "b", "a", "a", "c", "x", None, "p", "p"]),
    })
    out = grouped_topk_values(rd.from_arrow(t).repartition(3),
                              "g", "v", k=2).to_pandas()
    rows = {(None if pd_isna(r["g"]) else int(r["g"]), r["v"]):
            (int(r["n"]), int(r["rank"])) for _, r in out.iterrows()}
    # g=1: a and b tie at 2 → value-asc breaks: a rank 1, b rank 2, c cut
    assert rows[(1, "a")] == (2, 1) and rows[(1, "b")] == (2, 2)
    assert (1, "c") not in rows
    # g=2: null value ignored → only x
    assert rows[(2, "x")] == (1, 1)
    # null group kept as its own partition
    assert rows[(None, "p")] == (2, 1)


def pd_isna(x):
    import pandas as _pd
    return _pd.isna(x)


def test_grouped_topk_partition_path_matches_driver(ray_session):
    """Force the hash-partition exchange (driver_limit=1) and check it
    matches the driver lexsort path exactly."""
    from raycontract.pipelines.relational import grouped_topk_values

    rng = np.random.default_rng(11)
    t = pa.table({
        "g": pa.array(rng.integers(0, 40, 3000), pa.int64()),
        "v": pa.array([f"v{int(x)}" for x in rng.integers(0, 9, 3000)]),
    })
    ds = rd.from_arrow(t).repartition(5)
    a = grouped_topk_values(ds, "g", "v", k=3).to_pandas()
    b = grouped_topk_values(ds, "g", "v", k=3,
                            driver_limit=1).to_pandas()
    key = ["g", "v", "n", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    import pandas as _pd
    _pd.testing.assert_frame_equal(a, b)


def test_latest_snapshot_epoch_zero_beats_null_ts(ray_session):
    """Regression (review finding): a real ts of exactly epoch 0 must beat
    a null ts even when the null row has the larger tiebreak id."""
    from raycontract.pipelines.cdc import latest_snapshot

    t = pa.table({
        "id": pa.array([5, 9], pa.int64()),
        "ts": pa.array([0, None], pa.timestamp("us")),
        "k": pa.array([1, 1], pa.int64()),
    })
    out = latest_snapshot(rd.from_arrow(t), "k", "ts", "id").to_pandas()
    assert list(out["id"]) == [5]


def test_trend_slope_overflow_guard_raises(ray_session):
    """Regression (review finding): moment sums that would wrap int64 must
    raise loudly, not silently diverge from the HUGEINT oracle."""
    from raycontract.pipelines.dataprofile import trend_slope_by_group

    # span of ~120 years in seconds (~3.8e9) → span² ≈ 1.4e19 > 2^63
    t = pa.table({
        "g": pa.array(["a", "a"]),
        "ts": np.array([0, 3_800_000_000_000_000],
                       np.int64).astype("datetime64[us]"),
        "v": pa.array([1.0, 2.0], pa.float64()),
    })
    with pytest.raises(ValueError, match="moment bound"):
        trend_slope_by_group(rd.from_arrow(t), "g", "ts", "v")


def test_grouped_topk_empty_input_typed(ray_session):
    """Regression (review finding): empty input yields the input's own
    group/value types, not hardcoded int64/string."""
    from raycontract.pipelines.relational import grouped_topk_values

    t = pa.table({"g": pa.array([], pa.string()),
                  "v": pa.array([], pa.int32())})
    out = grouped_topk_values(rd.from_arrow(t), "g", "v", k=2)
    assert out.schema.field("g").type == pa.string()
    assert out.schema.field("v").type == pa.int32()
    assert out.num_rows == 0


def test_join_skew_planted_hot_key(ray_session):
    from raycontract.pipelines.relational import join_skew_profile

    left = pa.table({"k": pa.array([7] * 50 + [1, 2, 3] + [None],
                                   pa.int64())})
    right = pa.table({"k": pa.array([7] * 40 + [1, 1, 9], pa.int64())})
    out = join_skew_profile(rd.from_arrow(left).repartition(3),
                            rd.from_arrow(right).repartition(2),
                            "k", "k", top=3).to_pandas()
    assert list(out["key"]) == [7, 1, 2]  # 2000, 2, 0 (tie 0: key asc)
    assert list(out["n_out"]) == [2000, 2, 0]
    r0 = out.iloc[0]
    assert (r0["n_left"], r0["n_right"]) == (50, 40)


def test_pii_redact_planted_matches_duckdb(ray_session, duck):
    """Planted PII of all four types: engine redaction (Arrow RE2) must be
    byte-identical to DuckDB regexp_replace (also RE2), including nulls."""
    from raycontract.pipelines.curation import pii_redact
    from raycontract.entry_queries import redact_pii_documents_sql

    texts = [
        "mail me at alice.smith+x@example.co.uk today",
        "call (415) 555-1234 or +1-415 555 9999",
        "server at 192.168.0.1 responded",
        "ssn 123-45-6789 leaked",
        "clean text, nothing here",
        None,
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = pii_redact(rd.from_arrow(t).repartition(2),
                     "text", "doc_id").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert "[EMAIL]" in out.loc[0, "text_redacted"]
    assert "[PHONE]" in out.loc[1, "text_redacted"]
    assert "[IPV4]" in out.loc[2, "text_redacted"]
    assert "[SSN]" in out.loc[3, "text_redacted"]
    assert out.loc[4, "text_redacted"] == texts[4]
    assert out.loc[5, "text_redacted"] is None or pd_isna(
        out.loc[5, "text_redacted"])
    # byte-identical to the oracle expression over the same rows
    import duckdb as _duck
    con = _duck.connect()
    con.register("documents", t)
    sql = redact_pii_documents_sql()
    odf = con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)
    import pandas as _pd
    _pd.testing.assert_frame_equal(out, odf)


def test_hard_negatives_planted_clusters(ray_session):
    """Two tight clusters per label: the hard negative must be the nearest
    OTHER-label vector, never a same-label one."""
    from raycontract.pipelines.similarity import hard_negatives

    rng = np.random.default_rng(3)
    # label 0 around +e1, label 1 around a 10°-rotated direction, label 1
    # far cluster around -e1
    base0 = np.array([1.0, 0.0, 0.0])
    base1 = np.array([np.cos(0.17), np.sin(0.17), 0.0])
    base2 = np.array([-1.0, 0.0, 0.0])
    vecs, labs = [], []
    for i in range(6):
        vecs.append(base0 + rng.normal(0, 0.01, 3)); labs.append(0)
    for i in range(6):
        vecs.append(base1 + rng.normal(0, 0.01, 3)); labs.append(1)
    for i in range(4):
        vecs.append(base2 + rng.normal(0, 0.01, 3)); labs.append(1)
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labs, pa.int32()),
    })
    out = hard_negatives(rd.from_arrow(t).repartition(3),
                         "embedding", "vec_id", "label").to_pandas()
    lab = dict(zip(range(len(labs)), labs))
    assert len(out) == len(vecs)
    for _, r in out.iterrows():
        assert lab[r["vec_id"]] != lab[r["hard_negative_id"]]
    # every label-0 vector's hard negative sits in the NEAR label-1
    # cluster (ids 6-11), never the far one (12-15)
    neg0 = out[out["vec_id"] < 6]["hard_negative_id"]
    assert set(neg0).issubset(set(range(6, 12)))


def test_mixture_plan_skewed_sources(ray_session):
    """A 9:1 token-skewed corpus: the heavy source gets rate ≈ 5/9 (uniform
    2-way target), the light one keeps everything (rate capped at 1)."""
    from raycontract.pipelines.sampling import mixture_plan

    t = pa.table({
        "src": pa.array(["big"] * 9 + ["small"] + [None, "big"]),
        "text": pa.array(["a b c d e f g h i j"] * 9   # 10 tokens each
                         + ["x y z w v u q r s t"]      # 10 tokens
                         + ["ignored", None]),
    })
    out = mixture_plan(rd.from_arrow(t).repartition(3),
                       "src", "text").to_pandas().set_index("src")
    assert out.loc["big", "n_tokens"] == 90
    assert out.loc["small", "n_tokens"] == 10
    # total 100, uniform target 50 per source: big rate 50/90, small 1.0
    assert out.loc["big", "rate_micro"] == round(50 / 90 * 1e6)
    assert out.loc["small", "rate_micro"] == 1_000_000
    assert out.loc["big", "share_micro"] == 900_000
    assert len(out) == 2  # null source/text rows excluded


def test_hard_negatives_single_label_empty(ray_session):
    """Regression (review finding): a single-label corpus returns the
    empty table the SQL cross-label join would, not a concat crash."""
    from raycontract.pipelines.similarity import hard_negatives

    t = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([5, 5], pa.int32()),
    })
    out = hard_negatives(rd.from_arrow(t), "embedding", "vec_id", "label")
    assert out.num_rows == 0
    assert out.column_names == ["vec_id", "hard_negative_id"]
