"""Count-Min sketch (Cormode & Muthukrishnan 2005): frequency estimation.

State: int64[depth, width] counters.  Point estimate over-counts only:
  true_count <= estimate <= true_count + eps * N  with prob >= 1 - delta,
  where eps = e / width and delta = e^-depth.

Hashing: Kirsch-Mitzenmacher double hashing over our reference hash chain —
row i uses (h1 + i * h2) mod width with h1 = fingerprint64(x),
h2 = fibonacciHash(x) | 1 (odd, so rows stay distinct) — vectorized numpy,
deterministic across executors.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import fibonacci_hash, hash_items
from .generic import GroupedState, SketchKind

_MAGIC = b"CMS1"


def next_prime(n: int) -> int:
    """Smallest prime >= n (widths should be prime: with Kirsch-Mitzenmacher
    double hashing a power-of-two width aliases badly — measured 2407 vs 2
    max overcount at w~2048 on a zipf stream)."""
    n = max(2, n)
    while True:
        for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31):
            if n % p == 0:
                if n == p:
                    return n
                break
        else:
            i = 37
            while i * i <= n:
                if n % i == 0:
                    break
                i += 2
            else:
                return n
        n += 1


def params_for(eps: float, delta: float) -> tuple[int, int]:
    """(width, depth) achieving error eps (relative to N) with prob 1-delta."""
    width = next_prime(int(np.ceil(np.e / eps)))
    depth = int(np.ceil(np.log(1.0 / delta)))
    return width, depth


def zero(width: int, depth: int) -> np.ndarray:
    return np.zeros((depth, width), dtype=np.int64)


def _row_indices(values, width: int, depth: int) -> np.ndarray:
    h = hash_items(np.asarray(values, dtype=object) if not hasattr(values, "dtype") else values)
    h1 = h
    h2 = fibonacci_hash(h) | np.uint64(1)
    i = np.arange(depth, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(width)).astype(np.int64)


def update(cm: np.ndarray, values) -> np.ndarray:
    depth, width = cm.shape
    if hasattr(values, "to_numpy"):
        values = values.to_numpy()
    if len(values) == 0:
        return cm
    idx = _row_indices(values, width, depth)
    for i in range(depth):
        np.add.at(cm[i], idx[i], 1)
    return cm


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.shape != b.shape:
        raise ValueError("count-min shape mismatch")
    return a + b


def point_estimate(cm: np.ndarray, values) -> np.ndarray:
    """Estimated counts for query values: min over rows."""
    depth, width = cm.shape
    idx = _row_indices(values, width, depth)
    ests = np.stack([cm[i, idx[i]] for i in range(depth)])
    return ests.min(axis=0)


def inner_product(a: np.ndarray, b: np.ndarray) -> int:
    """Join-size / inner-product estimate (Cormode & Muthukrishnan 2005,
    §4.2): min over rows of dot(a_i, b_i).  Never under-estimates the true
    inner product sum_x f_a(x) * f_b(x); over-estimates by at most
    eps * N_a * N_b with probability 1 - delta (eps = e/width,
    delta = e^-depth).  The true inner product of two frequency vectors
    IS the equi-join output size — this is the classic sketch-based join
    cardinality estimator."""
    if a.shape != b.shape:
        raise ValueError("count-min shape mismatch")
    return int((a.astype(np.int64) * b.astype(np.int64)).sum(axis=1).min())


def encode(cm: np.ndarray) -> bytes:
    depth, width = cm.shape
    return _MAGIC + struct.pack("<II", depth, width) + cm.astype("<i8").tobytes()


def decode(buf: bytes) -> np.ndarray:
    assert buf[:4] == _MAGIC, "bad count-min header"
    depth, width = struct.unpack_from("<II", buf, 4)
    return (
        np.frombuffer(buf, dtype="<i8", offset=12, count=depth * width)
        .reshape(depth, width)
        .copy()
    )


def _grouped_update(block: np.ndarray, codes: np.ndarray, values) -> None:
    """Grouped scatter into the (G, depth, width) counter stack: one
    np.add.at per depth row across ALL groups of the batch (same
    Kirsch-Mitzenmacher indices as update(), so counts are identical)."""
    if len(values) == 0:
        return
    depth, width = block.shape[1], block.shape[2]
    idx = _row_indices(values, width, depth)
    for i in range(depth):
        np.add.at(block[:, i, :], (codes, idx[i]), 1)


def kind(width: int = 2053, depth: int = 5) -> SketchKind:
    width = next_prime(width)
    return SketchKind(
        name=f"countmin_w{width}_d{depth}",
        zero=lambda: zero(width, depth),
        update=update,
        merge=merge,
        encode=encode,
        decode=decode,
        grouped=GroupedState(
            zero_block=lambda g: np.zeros((g, depth, width), dtype=np.int64),
            update=_grouped_update,
            to_state=lambda row: row,
        ),
    )
