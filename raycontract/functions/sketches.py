"""Mergeable sketches: HyperLogLog, t-digest, fixed-bin histogram, capped
categorical counts.

These are the per-partition partial aggregates of the stats pass (SURVEY.md
§2e): each worker builds one sketch per (column, batch-group), serializes it,
and the driver (or a tiny reduce stage) merges — merge is associative and
commutative, so tree reduction works and partial results can be checkpointed
per partition.

Implementations are pure numpy from the published algorithms (Flajolet et al.
2007 for HLL; Dunning & Ertl "Computing Extremely Accurate Quantiles Using
t-Digests" for the merging t-digest). No third-party sketch library is used
(none is installable offline).
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np

# ---------------------------------------------------------------- HyperLogLog


class HyperLogLog:
    """HLL with 2^p registers over pre-hashed uint64 values."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: Optional[np.ndarray] = None):
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None else np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)  # remaining 64-p bits in the high positions
        # rank = leading zeros of w + 1 (capped). Highest set bit via float64
        # exponent; clamp handles the rare round-up-to-2^k case.
        wf = w.astype(np.float64)
        with np.errstate(divide="ignore"):
            hbit = np.floor(np.log2(wf, where=w != 0)).astype(np.int64)
        hbit = np.minimum(hbit, 63)
        rank = np.where(w == 0, np.int64(64 - self.p + 1), 63 - hbit + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.exp2(-self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)  # linear counting for small range
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @staticmethod
    def from_bytes(b: bytes) -> "HyperLogLog":
        p = b[0]
        return HyperLogLog(p, np.frombuffer(b[1:], dtype=np.uint8).copy())


# ------------------------------------------------------------------- t-digest


class TDigest:
    """Merging t-digest (Dunning & Ertl): centroids kept within the k1-ish
    size bound 4·N·q(1-q)/δ; supports batch add, merge, quantile, cdf."""

    __slots__ = ("delta", "means", "weights", "_buf_means", "_buf_weights", "n")

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_means: list[np.ndarray] = []
        self._buf_weights: list[np.ndarray] = []
        self.n = 0.0

    def add(self, values: np.ndarray, weights: Optional[np.ndarray] = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self._buf_means.append(v)
        self._buf_weights.append(
            np.ones_like(v) if weights is None else np.asarray(weights, dtype=np.float64)
        )
        self.n += float(self._buf_weights[-1].sum())
        if sum(a.size for a in self._buf_means) > 8 * self.delta:
            self._compress()

    def _compress(self) -> None:
        if not self._buf_means and self.means.size <= self.delta:
            return
        means = np.concatenate([self.means] + self._buf_means) if self._buf_means else self.means
        weights = (
            np.concatenate([self.weights] + self._buf_weights) if self._buf_weights else self.weights
        )
        self._buf_means, self._buf_weights = [], []
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w, cum = means[0], weights[0], 0.0
        for i in range(1, means.size):
            q = (cum + cur_w) / total
            limit = 4.0 * total * max(q * (1.0 - q), 1e-12) / self.delta
            if cur_w + weights[i] <= limit:
                cur_m = (cur_m * cur_w + means[i] * weights[i]) / (cur_w + weights[i])
                cur_w += weights[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        out.n = self.n + other.n
        self._compress()
        other._compress()
        out._buf_means = [self.means, other.means]
        out._buf_weights = [self.weights, other.weights]
        out._compress()
        return out

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def cdf(self, x: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return float(np.interp(x, self.means, cum / self.weights.sum()))

    def to_bytes(self) -> bytes:
        self._compress()
        return pickle.dumps((self.delta, self.means, self.weights, self.n))

    @staticmethod
    def from_bytes(b: bytes) -> "TDigest":
        delta, means, weights, n = pickle.loads(b)
        td = TDigest(delta)
        td.means, td.weights, td.n = means, weights, n
        return td


# ------------------------------------------------------------------ histogram


class Histogram:
    """Fixed-edge histogram (edges chosen by the profile stage and broadcast
    so per-partition counts merge by addition); under/overflow tracked."""

    __slots__ = ("edges", "counts", "under", "over")

    def __init__(self, edges: np.ndarray, counts: Optional[np.ndarray] = None,
                 under: int = 0, over: int = 0):
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = (
            counts if counts is not None else np.zeros(len(self.edges) - 1, dtype=np.int64)
        )
        self.under = under
        self.over = over

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.under += int((v < self.edges[0]).sum())
        self.over += int((v > self.edges[-1]).sum())
        inside = v[(v >= self.edges[0]) & (v <= self.edges[-1])]
        c, _ = np.histogram(inside, bins=self.edges)
        self.counts += c

    def merge(self, other: "Histogram") -> "Histogram":
        assert np.array_equal(self.edges, other.edges)
        return Histogram(self.edges, self.counts + other.counts,
                         self.under + other.under, self.over + other.over)

    def total(self) -> int:
        return int(self.counts.sum()) + self.under + self.over

    def cdf_values(self) -> np.ndarray:
        """Empirical CDF at each bin edge (including clipped mass)."""
        t = max(self.total(), 1)
        c = np.concatenate([[self.under], self.under + np.cumsum(self.counts)])
        return c / t

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.edges, self.counts, self.under, self.over))

    @staticmethod
    def from_bytes(b: bytes) -> "Histogram":
        return Histogram(*pickle.loads(b))


def ks_distance(a: Histogram, b: Histogram) -> float:
    """Kolmogorov–Smirnov distance between two same-edge histograms."""
    return float(np.abs(a.cdf_values() - b.cdf_values()).max())


# --------------------------------------------------- capped categorical counts


class CategoricalCounts:
    """Value→count map capped at ``cap`` keys; overflow mass goes to
    ``other``. Exact for bounded-cardinality (enum-ish) columns, approximate
    beyond the cap (documented; drift on high-cardinality columns should use
    the hashed histogram instead)."""

    __slots__ = ("cap", "counts", "other")

    def __init__(self, cap: int = 1024, counts: Optional[dict] = None, other: int = 0):
        self.cap = cap
        self.counts = counts if counts is not None else {}
        self.other = other

    def add(self, values, counts) -> None:
        for v, c in zip(values, counts):
            if v in self.counts:
                self.counts[v] += int(c)
            elif len(self.counts) < self.cap:
                self.counts[v] = int(c)
            else:
                self.other += int(c)

    def merge(self, o: "CategoricalCounts") -> "CategoricalCounts":
        out = CategoricalCounts(self.cap, dict(self.counts), self.other + o.other)
        out.add(list(o.counts.keys()), list(o.counts.values()))
        return out

    def total(self) -> int:
        return sum(self.counts.values()) + self.other

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.cap, self.counts, self.other))

    @staticmethod
    def from_bytes(b: bytes) -> "CategoricalCounts":
        return CategoricalCounts(*pickle.loads(b))


class MisraGries:
    """Frequent-items (heavy hitters) sketch: k-1 counters guarantee every
    item with frequency > n/k survives. Merge = counter addition + decrement
    compression (Agarwal et al., 'Mergeable Summaries'). Counts are lower
    bounds; exact counts need one verification pass over the candidates."""

    __slots__ = ("k", "counters", "n")

    def __init__(self, k: int = 64, counters: Optional[dict] = None, n: int = 0):
        self.k = k
        self.counters = counters if counters is not None else {}
        self.n = n

    def add(self, values, counts=None) -> None:
        counts = counts if counts is not None else [1] * len(values)
        for v, c in zip(values, counts):
            c = int(c)
            self.n += c
            if v in self.counters:
                self.counters[v] += c
            elif len(self.counters) < self.k - 1:
                self.counters[v] = c
            else:
                # decrement all by the new item's weight; drop depleted
                dec = c
                med = sorted(self.counters.values())[0]
                take = min(dec, med)
                if take:
                    self.counters = {kk: vv - take for kk, vv in self.counters.items()
                                     if vv - take > 0}
                rem = dec - take
                if rem and len(self.counters) < self.k - 1:
                    self.counters[v] = rem

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.k, dict(self.counters), self.n)
        out.add(list(other.counters.keys()), list(other.counters.values()))
        out.n = self.n + other.n
        return out

    def candidates(self, min_fraction: float = 0.0) -> list[tuple]:
        """(value, lower-bound count) sorted by count desc; every true heavy
        hitter above n/k (or min_fraction·n) is guaranteed present."""
        thr = min_fraction * self.n
        return sorted(((v, c) for v, c in self.counters.items() if c >= thr),
                      key=lambda x: (-x[1], str(x[0])))

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.k, self.counters, self.n))

    @staticmethod
    def from_bytes(b: bytes) -> "MisraGries":
        return MisraGries(*pickle.loads(b))


def l1_distance(a: CategoricalCounts, b: CategoricalCounts) -> float:
    """Total-variation (½·L1) distance between two categorical distributions."""
    ta, tb = max(a.total(), 1), max(b.total(), 1)
    keys = set(a.counts) | set(b.counts)
    d = sum(abs(a.counts.get(k, 0) / ta - b.counts.get(k, 0) / tb) for k in keys)
    d += abs(a.other / ta - b.other / tb)
    return 0.5 * d
