"""KLL quantile sketch (Karnin, Lang, Liberty 2016, as popularized by Apache
DataSketches): mergeable rank/quantile estimation over doubles.

State: a hierarchy of levels; items at level i carry weight 2^i.  Level
capacities decay geometrically (c = 2/3) from k at the top; an over-full
level is compacted by sorting and keeping every other item (promoted to the
next level with doubled weight).

Determinism note: canonical KLL picks the even/odd compaction offset with a
random bit; we derive the bit from a counter-seeded integer hash instead, so
sketch states are reproducible across task retries (a distributed-exactness
requirement).  The offset sequence is still ~unbiased, and the measured rank
error (see tests) stays within the published ~O(1/k) envelope.

Normalized rank error for k=200 is ~1.65% (DataSketches' published figure
for the same parameterization).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .generic import SketchKind

_MAGIC = b"KLL1"
_C = 2.0 / 3.0
_MIN_CAP = 8


@dataclass
class KLL:
    k: int = 200
    levels: list[np.ndarray] = field(default_factory=list)  # [level] -> float64[]
    n: int = 0
    compactions: int = 0

    def _capacity(self, level: int) -> int:
        height = len(self.levels)
        return max(_MIN_CAP, int(np.ceil(self.k * _C ** (height - 1 - level))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def update(self, values: np.ndarray) -> "KLL":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return self
        if not self.levels:
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[0] = np.concatenate([self.levels[0], values])
        self.n += values.size
        self._compress()
        return self

    def _compress(self) -> None:
        while self._size() > self._total_capacity():
            for i in range(len(self.levels)):
                if len(self.levels[i]) > self._capacity(i):
                    self._compact_level(i)
                    break
            else:
                break

    def _compact_level(self, i: int) -> None:
        buf = np.sort(self.levels[i])
        # deterministic pseudo-random offset bit (see module docstring)
        offset = (self.compactions * 2654435761 >> 13) & 1
        self.compactions += 1
        promoted = buf[offset::2]
        self.levels[i] = np.empty(0, dtype=np.float64)
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("k mismatch")
        out = KLL(self.k)
        out.n = self.n + other.n
        out.compactions = self.compactions + other.compactions
        height = max(len(self.levels), len(other.levels))
        for i in range(height):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]).astype(np.float64))
        out._compress()
        return out

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                vals.append(lv)
                weights.append(np.full(len(lv), 1 << i, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value(s) at normalized rank(s) q in [0, 1]."""
        single = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._weighted()
        if v.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if single else out
        cum = np.cumsum(w)
        targets = qs * cum[-1]
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.clip(idx, 0, v.size - 1)
        out = v[idx]
        return float(out[0]) if single else out

    def rank(self, value: float) -> float:
        """Estimated normalized rank of value."""
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        mask = v <= value
        return float(w[mask].sum() / w.sum())


def encode(s: KLL) -> bytes:
    head = _MAGIC + struct.pack(
        "<IQII", s.k, s.n, s.compactions, len(s.levels)
    )
    parts = [head]
    for lv in s.levels:
        parts.append(struct.pack("<I", len(lv)))
        parts.append(np.ascontiguousarray(lv, dtype="<f8").tobytes())
    return b"".join(parts)


def decode(buf: bytes) -> KLL:
    assert buf[:4] == _MAGIC, "bad KLL header"
    k, n, compactions, height = struct.unpack_from("<IQII", buf, 4)
    s = KLL(k)
    s.n = n
    s.compactions = compactions
    off = 4 + struct.calcsize("<IQII")
    for _ in range(height):
        (cnt,) = struct.unpack_from("<I", buf, off)
        off += 4
        s.levels.append(np.frombuffer(buf, dtype="<f8", offset=off, count=cnt).copy())
        off += cnt * 8
    return s


def kind(k: int = 200) -> SketchKind:
    return SketchKind(
        name=f"kll_k{k}",
        zero=lambda: KLL(k),
        update=lambda s, v: s.update(
            v.to_numpy(dtype=np.float64) if hasattr(v, "to_numpy") else v
        ),
        merge=lambda a, b: a.merge(b),
        encode=encode,
        decode=decode,
    )
