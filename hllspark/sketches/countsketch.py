"""Count-Sketch (Charikar, Chen & Farach-Colton 2002) + AMS second-moment
estimation (Alon, Matias & Szegedy 1996): UNBIASED frequency estimates,
F2 (= sum_x f_x^2), and inner-product / equi-join-size estimates.

Complements the count-min sketch (sketches/countmin.py), which only ever
over-counts: count-sketch's signed counters make every per-row estimate
unbiased, so the median over ``depth`` rows concentrates around the truth
instead of above it.  Error scales with ||f||_2 (not N = ||f||_1), which
is much tighter on heavy-tailed web-scale key distributions:

  |point_estimate(x) - f_x|  <=  3 * ||f||_2 / sqrt(width)
  |f2_estimate - F2|         <=  ~F2 * sqrt(8 / width)
  inner_product unbiased; per-row std <= ~sqrt(2 * F2(a) * F2(b) / width)

each holding with probability 1 - exp(-Omega(depth)) via the median trick.

State: int64[depth, width] signed counters — fixed shape, so it plugs into
the GroupedState fast path of sketches/generic.py (one np.add.at scatter
per Arrow batch across ALL groups).  Merge is elementwise addition:
commutative, associative, and linear — a sketch of a stream minus a
sketch of deletions is the sketch of the difference (turnstile model),
which count-min's min-estimator does not survive.

Hashing: bucket rows use the same Kirsch-Mitzenmacher double-hash chain as
count-min (h1 + i * h2 mod prime width with h1 = fingerprint64/farmhash,
h2 = fibonacciHash | 1); the sign of row i comes from one bit of an
independent third chain, fibonacciHash(h1 ^ SALT_i), so bucket index and
sign are decorrelated per row.  All vectorized numpy, deterministic
across executors and sessions.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import fibonacci_hash, hash_items
from .countmin import next_prime
from .generic import GroupedState, SketchKind

_MAGIC = b"CSK1"

# one fixed 64-bit odd salt per row for the sign chain (golden-ratio
# multiples; any fixed distinct odd constants work — determinism is the
# requirement, these are NOT secrets)
_SIGN_SALT = np.uint64(0x9E3779B97F4A7C15)


def zero(width: int, depth: int) -> np.ndarray:
    return np.zeros((depth, width), dtype=np.int64)


def _rows(values, width: int, depth: int) -> tuple[np.ndarray, np.ndarray]:
    """(idx[depth, n], sign[depth, n]) for a batch of values."""
    h = hash_items(
        np.asarray(values, dtype=object) if not hasattr(values, "dtype") else values
    )
    h2 = fibonacci_hash(h) | np.uint64(1)
    i = np.arange(depth, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        idx = ((h[None, :] + i * h2[None, :]) % np.uint64(width)).astype(np.int64)
        hs = fibonacci_hash(h[None, :] ^ ((i + np.uint64(1)) * _SIGN_SALT))
    # sign = TOP bit of the golden-ratio mix.  NOT the low bit: for odd
    # multiplier M, (M * x) & 1 == x & 1, so a low-bit sign would collapse
    # to parity(h) xor parity(row) — every row's signs identical up to a
    # global flip (caught by a cross-row agreement probe; top bit measures
    # ~0.50 agreement between rows, as independence requires).
    sign = np.where((hs >> np.uint64(63)).astype(bool), np.int64(1), np.int64(-1))
    return idx, sign


def update(cs: np.ndarray, values) -> np.ndarray:
    depth, width = cs.shape
    if hasattr(values, "to_numpy"):
        values = values.to_numpy()
    if len(values) == 0:
        return cs
    idx, sign = _rows(values, width, depth)
    for i in range(depth):
        np.add.at(cs[i], idx[i], sign[i])
    return cs


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.shape != b.shape:
        raise ValueError("count-sketch shape mismatch")
    return a + b


def point_estimate(cs: np.ndarray, values) -> np.ndarray:
    """Unbiased per-row estimates s_i(x) * C[i, h_i(x)], combined by the
    median over rows (Charikar et al. §3)."""
    depth, width = cs.shape
    idx, sign = _rows(values, width, depth)
    ests = np.stack([cs[i, idx[i]] * sign[i] for i in range(depth)])
    return np.median(ests, axis=0)


def f2_estimate(cs: np.ndarray) -> float:
    """AMS second-moment estimate: each row's sum of squared counters is an
    unbiased estimator of F2 = sum_x f_x^2 (AMS 1996 / the count-sketch
    row IS an AMS sketch with width-wise bucketing); median over rows."""
    row_f2 = (cs.astype(np.float64) ** 2).sum(axis=1)
    return float(np.median(row_f2))


def inner_product(a: np.ndarray, b: np.ndarray) -> float:
    """Unbiased equi-join-size / inner-product estimate: per row,
    dot(a_i, b_i) has expectation sum_x f_a(x) * f_b(x) (cross terms cancel
    in expectation through the independent signs); median over rows.
    Count-min's version (countmin.inner_product) never under-estimates but
    is biased up by eps * N_a * N_b; this one is unbiased with std
    ~sqrt(2 * F2(a) * F2(b) / width) per row."""
    if a.shape != b.shape:
        raise ValueError("count-sketch shape mismatch")
    dots = (a.astype(np.float64) * b.astype(np.float64)).sum(axis=1)
    return float(np.median(dots))


def encode(cs: np.ndarray) -> bytes:
    depth, width = cs.shape
    return _MAGIC + struct.pack("<II", depth, width) + cs.astype("<i8").tobytes()


def decode(buf: bytes) -> np.ndarray:
    assert buf[:4] == _MAGIC, "bad count-sketch header"
    depth, width = struct.unpack_from("<II", buf, 4)
    return (
        np.frombuffer(buf, dtype="<i8", offset=12, count=depth * width)
        .reshape(depth, width)
        .copy()
    )


def _grouped_update(block: np.ndarray, codes: np.ndarray, values) -> None:
    """Grouped scatter into the (G, depth, width) stack: one np.add.at per
    depth row across ALL groups of the batch (same indices/signs as
    update(), so states are byte-identical)."""
    if len(values) == 0:
        return
    depth, width = block.shape[1], block.shape[2]
    idx, sign = _rows(values, width, depth)
    for i in range(depth):
        np.add.at(block[:, i, :], (codes, idx[i]), sign[i])


def kind(width: int = 2053, depth: int = 5) -> SketchKind:
    width = next_prime(width)
    return SketchKind(
        name=f"countsketch_w{width}_d{depth}",
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
