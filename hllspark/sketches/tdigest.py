"""t-digest (Dunning & Ertl) — mergeable quantile sketch with relative
accuracy concentrated at the tails.

Merging-digest variant: state is a sorted array of (mean, weight) centroids;
ingest = concatenate + re-cluster in one greedy pass bounded by the k1 scale
function k(q) = (delta / 2pi) * asin(2q - 1).  Everything is numpy; the
greedy pass is a short Python loop over centroids (O(delta) items, never
O(rows) — batches are pre-sorted and pre-clustered vectorized).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .generic import SketchKind

_MAGIC = b"TDG1"


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)


@dataclass
class TDigest:
    delta: float = 100.0
    means: np.ndarray = field(default_factory=lambda: np.empty(0))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.int64))
    n: int = 0

    def update(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return self
        # vectorized pre-clustering: reduce the batch to ~8*delta contiguous
        # equal-count groups (finer than any final centroid), so the greedy
        # sequential pass below runs over O(delta) items, never O(rows)
        bm, bw = _precluster(values, int(8 * self.delta))
        m = np.concatenate([self.means, bm])
        w = np.concatenate([self.weights, bw])
        self.means, self.weights = _cluster(m, w, self.delta)
        self.n += values.size
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("delta mismatch")
        out = TDigest(self.delta)
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        out.means, out.weights = _cluster(m, w, self.delta)
        out.n = self.n + other.n
        return out

    def quantile(self, q) -> np.ndarray | float:
        single = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if single else out
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = self.weights.sum()
        out = np.interp(qs * total, cum, self.means)
        return float(out[0]) if single else out

    def size_bytes(self) -> int:
        return len(encode(self))


def _precluster(values: np.ndarray, groups: int):
    """Reduce a raw batch to contiguous equal-count (mean, weight) groups in
    pure numpy (sort + reduceat)."""
    v = np.sort(values)
    n = v.size
    if n <= groups:
        return v, np.ones(n, dtype=np.int64)
    bounds = np.linspace(0, n, groups + 1).astype(np.int64)
    starts = bounds[:-1]
    counts = np.diff(bounds)
    sums = np.add.reduceat(v, starts)
    return sums / counts, counts


def _cluster(means: np.ndarray, weights: np.ndarray, delta: float):
    """One greedy merging pass (Dunning's merging digest): sort by mean,
    combine adjacent centroids while the accumulated q-span stays within the
    k1 scale bound."""
    order = np.argsort(means, kind="stable")
    means = means[order]
    weights = weights[order]
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[int] = []
    w_done = 0  # total weight already emitted
    q_limit = _q_limit(0.0, delta)
    acc_m, acc_w = means[0], int(weights[0])
    for i in range(1, means.size):
        q = (w_done + acc_w + weights[i] / 2.0) / total
        if q <= q_limit:
            # merge into the running centroid (weighted mean)
            acc_m = (acc_m * acc_w + means[i] * weights[i]) / (acc_w + weights[i])
            acc_w += int(weights[i])
        else:
            out_m.append(acc_m)
            out_w.append(acc_w)
            w_done += acc_w
            q_limit = _q_limit(w_done / total, delta)
            acc_m, acc_w = means[i], int(weights[i])
    out_m.append(acc_m)
    out_w.append(acc_w)
    return np.asarray(out_m), np.asarray(out_w, dtype=np.int64)


def _q_limit(q0: float, delta: float) -> float:
    k0 = float(_k1(np.asarray([q0]), delta)[0])
    # invert k1: q = (sin(k / (delta/2pi)) + 1) / 2
    return float((np.sin((k0 + 1.0) * 2 * np.pi / delta) + 1.0) / 2.0)


def encode(t: TDigest) -> bytes:
    head = _MAGIC + struct.pack("<dQI", t.delta, t.n, t.means.size)
    return (
        head
        + np.ascontiguousarray(t.means, dtype="<f8").tobytes()
        + np.ascontiguousarray(t.weights, dtype="<i8").tobytes()
    )


def decode(buf: bytes) -> TDigest:
    assert buf[:4] == _MAGIC, "bad t-digest header"
    delta, n, c = struct.unpack_from("<dQI", buf, 4)
    off = 4 + struct.calcsize("<dQI")
    t = TDigest(delta)
    t.n = n
    t.means = np.frombuffer(buf, dtype="<f8", offset=off, count=c).copy()
    t.weights = np.frombuffer(buf, dtype="<i8", offset=off + 8 * c, count=c).copy()
    return t


def kind(delta: float = 100.0) -> SketchKind:
    return SketchKind(
        name=f"tdigest_d{int(delta)}",
        zero=lambda: TDigest(delta),
        update=lambda s, v: s.update(
            v.to_numpy(dtype=np.float64) if hasattr(v, "to_numpy") else v
        ),
        merge=lambda a, b: a.merge(b),
        encode=encode,
        decode=decode,
    )
