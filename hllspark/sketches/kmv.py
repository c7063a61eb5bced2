"""KMV (k-minimum-values) distinct sketch — Beyer et al., SIGMOD 2007.

State: the k smallest 64-bit hash values seen (sorted uint64 array,
possibly fewer than k).  Mergeable: union = k smallest of the combined
arrays.  Distinct estimate: exact count when |state| < k, else
(k-1) / U(kth_min) where U maps the hash to (0,1].

Why alongside HLL: KMV supports UNBIASED set-operation estimates that
HLL's inclusion-exclusion cannot give for small overlaps —
jaccard(A, B) ≈ |K ∩ A ∩ B| / |K| where K is the k smallest of A ∪ B,
with standard error ~ 1/sqrt(k·J).  hll.overlap_estimates documents this
exact caveat and points here.

Spark plan via sketches.generic (partial per partition, merge per group);
hashing = xxhash64-equivalent chain (hash_items), update per Arrow batch
is one numpy unique + partition against the current kth min.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import hash_items
from .generic import SketchKind

_MAGIC = b"KMV1"
_TWO64 = float(1 << 64)


def zero(k: int) -> np.ndarray:
    """Empty state tagged with k: stored as (k, values)."""
    return (k, np.empty(0, dtype=np.uint64))


def update(state, values):
    k, mins = state
    if hasattr(values, "to_numpy"):
        values = values.to_numpy()
    if len(values) == 0:
        return state
    h = hash_items(np.asarray(values))
    combined = np.union1d(mins, h)  # sorted unique
    return (k, combined[:k])


def merge(a, b):
    ka, ma = a
    kb, mb = b
    if ka != kb:
        raise ValueError("kmv k mismatch")
    return (ka, np.union1d(ma, mb)[:ka])


def estimate(state) -> float:
    k, mins = state
    n = len(mins)
    if n < k:
        return float(n)  # saw fewer than k distinct values: exact
    kth = (float(mins[k - 1]) + 1.0) / _TWO64  # U in (0, 1]
    return (k - 1) / kth


def jaccard(a, b) -> float:
    """Unbiased Jaccard: fraction of the union's k smallest present in
    BOTH input sketches (Beyer et al. §5)."""
    u = merge(a, b)
    _, mu = u
    if len(mu) == 0:
        return 0.0
    in_a = np.isin(mu, a[1])
    in_b = np.isin(mu, b[1])
    return float(np.count_nonzero(in_a & in_b)) / len(mu)


def intersection_estimate(a, b) -> float:
    """|A ∩ B| ≈ jaccard * |A ∪ B| (both from the same union sketch)."""
    u = merge(a, b)
    return jaccard(a, b) * estimate(u)


def difference_estimate(a, b) -> float:
    """|A \\ B| ≈ (fraction of the union's k smallest that are in A only)
    * |A ∪ B| — same union-sample argument as jaccard (Beyer et al. §5);
    the set difference HLL cannot express without inclusion-exclusion
    error blowup."""
    u = merge(a, b)
    _, mu = u
    if len(mu) == 0:
        return 0.0
    only_a = np.isin(mu, a[1]) & ~np.isin(mu, b[1])
    return float(np.count_nonzero(only_a)) / len(mu) * estimate(u)


def encode(state) -> bytes:
    k, mins = state
    return _MAGIC + struct.pack("<II", k, len(mins)) + mins.astype("<u8").tobytes()


def decode(buf: bytes):
    buf = bytes(buf)
    if buf[:4] != _MAGIC:
        raise ValueError("bad kmv header")
    k, n = struct.unpack_from("<II", buf, 4)
    mins = np.frombuffer(buf, dtype="<u8", count=n, offset=12).astype(np.uint64)
    return (k, mins)


def kind(k: int = 1024) -> SketchKind:
    return SketchKind(
        name=f"kmv-{k}",
        zero=lambda: zero(k),
        update=update,
        merge=merge,
        encode=encode,
        decode=decode,
    )
