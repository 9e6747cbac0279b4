import numpy as np
import pyarrow as pa

from raycontract.functions.hashing import hash64, splitmix64
from raycontract.functions.sketches import (
    CategoricalCounts,
    Histogram,
    HyperLogLog,
    TDigest,
    ks_distance,
    l1_distance,
)


def test_hll_accuracy_and_merge():
    h = HyperLogLog()
    h.add_hashed(hash64(pa.array([f"v{i}" for i in range(50000)])))
    assert abs(h.estimate() - 50000) / 50000 < 0.05
    h1, h2 = HyperLogLog(), HyperLogLog()
    h1.add_hashed(hash64(pa.array([f"a{i}" for i in range(30000)])))
    h2.add_hashed(hash64(pa.array([f"a{i}" for i in range(15000, 45000)])))
    m = h1.merge(h2)
    assert abs(m.estimate() - 45000) / 45000 < 0.05
    rt = HyperLogLog.from_bytes(m.to_bytes())
    assert rt.estimate() == m.estimate()


def test_hll_small_range_linear_counting():
    h = HyperLogLog()
    h.add_hashed(hash64(pa.array([f"x{i}" for i in range(100)])))
    assert abs(h.estimate() - 100) < 10


def test_tdigest_quantiles_merge_serde():
    rng = np.random.default_rng(7)
    data = rng.normal(0, 1, 100000)
    t1, t2 = TDigest(), TDigest()
    t1.add(data[:50000])
    t2.add(data[50000:])
    m = TDigest.from_bytes(t1.merge(t2).to_bytes())
    for q in (0.05, 0.5, 0.95):
        assert abs(m.quantile(q) - np.quantile(data, q)) < 0.02
    assert m.n == 100000


def test_tdigest_nan_and_empty():
    t = TDigest()
    t.add(np.array([np.nan, np.nan]))
    assert np.isnan(t.quantile(0.5))
    t.add(np.array([1.0]))
    assert t.quantile(0.5) == 1.0


def test_histogram_merge_and_ks():
    edges = np.linspace(0, 10, 21)
    a, b = Histogram(edges), Histogram(edges)
    rng = np.random.default_rng(1)
    a.add(rng.uniform(0, 10, 10000))
    b.add(rng.uniform(0, 10, 10000))
    assert ks_distance(a, b) < 0.05
    shifted = Histogram(edges)
    shifted.add(rng.uniform(3, 10, 10000))
    assert ks_distance(a, shifted) > 0.2
    m = a.merge(b)
    assert m.total() == 20000
    assert a.under == 0 and a.over == 0
    a.add(np.array([-5.0, 15.0]))
    assert a.under == 1 and a.over == 1


def test_categorical_counts_and_l1():
    a, b = CategoricalCounts(), CategoricalCounts()
    a.add(["x", "y"], [50, 50])
    b.add(["x", "y"], [50, 50])
    assert l1_distance(a, b) == 0.0
    c = CategoricalCounts()
    c.add(["x", "z"], [100, 100])
    assert l1_distance(a, c) > 0.3
    m = a.merge(b)
    assert m.counts == {"x": 100, "y": 100}
    cap = CategoricalCounts(cap=2)
    cap.add(["a", "b", "c"], [1, 2, 3])
    assert cap.other == 3


def test_hash64_types_and_splitmix():
    for arr in (pa.array(["a", "b", None]), pa.array([1, 2, 3]),
                pa.array([b"x", b"yy"]), pa.array([1.5, 2.5])):
        h = hash64(arr)
        assert h.dtype == np.uint64 and len(h) == len(arr)
    # deterministic
    assert (hash64(pa.array(["q"])) == hash64(pa.array(["q"]))).all()
    x = splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    assert len(set(x.tolist())) == 3


def test_misra_gries_guarantee_and_merge():
    import numpy as np

    from raycontract.functions.sketches import MisraGries

    rng = np.random.default_rng(4)
    # zipf-ish stream: value 'hot' is 20% of 10k items
    stream = ["hot"] * 2000 + [f"v{int(i)}" for i in rng.integers(0, 3000, 8000)]
    rng.shuffle(stream)
    halves = [stream[:5000], stream[5000:]]
    sketches = []
    for h in halves:
        mg = MisraGries(k=32)
        mg.add(h)
        sketches.append(mg)
    merged = sketches[0].merge(sketches[1])
    assert merged.n == 10000
    cands = merged.candidates()
    assert cands and cands[0][0] == "hot"  # guaranteed: freq 20% >> n/k ≈ 3%
    assert cands[0][1] <= 2000  # counts are lower bounds
    rt = MisraGries.from_bytes(merged.to_bytes())
    assert rt.candidates() == cands
