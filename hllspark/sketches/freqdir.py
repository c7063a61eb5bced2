"""Frequent Directions (Liberty 2013, KDD; Ghashami, Liberty, Phillips &
Woodruff 2016, SIAM J. Comput.): a deterministic MERGEABLE matrix sketch.

Given a stream of rows a_1..a_n in R^d (embedding vectors), maintain a
small matrix B with at most ``ell`` rows such that the sketched Gram
matrix never over-estimates and its spectral error is bounded by the
stream's total energy:

    0  <=  A^T A - B^T B  <=  (||A||_F^2 / ell) * I        (PSD order)

so every direction's captured variance is under-counted by at most
frob_sq / ell.  Setting ell >= r + r/eps additionally gives the
projection guarantee ||A - A pi_{B,r}||_F^2 <= (1 + eps) ||A - A_r||_F^2
(GLPW16 Thm 1.1) — the top-r right singular vectors of B are a provably
good PCA basis computed in ONE streaming pass.

Why it belongs in this engine: it is the matrix member of the mergeable-
summary family (HLL for sets, KLL for ranks, count-sketch for
frequencies, FD for covariance).  merge(sketch(A1), sketch(A2)) obeys the
SAME bound as sketch(A1 ++ A2) (GLPW16 §2: shrinking is associative-
friendly because each shrink discards at most sigma_ell^2 per direction
and those discards ADD across merges while ||A||_F^2 adds too) — so the
per-partition-build + commutative-merge plan of sketches/generic.py
applies unchanged, and a 10^12-row embedding table's covariance/PCA
reduces to one scan plus a (2*ell x d)-bytes-per-partition shuffle.

IMPORTANT semantics note (unlike every other kind in this package): the
sketch STATE is not partition-invariant — shrink points depend on batch
boundaries, so different partitionings yield different B matrices.  What
IS invariant is the guarantee: the PSD sandwich above holds for EVERY
execution order, and frob_sq is exact (a float sum) under any grouping.
Tests therefore gate the bound and the exact-frob invariants across
repartitionings, not byte equality.

All heavy math is numpy (LAPACK SVD on (2*ell, d) blocks); no per-row
Python.  Reference-free: implemented from the published papers.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .generic import SketchKind

_MAGIC = b"FDS1"


@dataclass
class FDState:
    """buf[:n] holds the current sketch rows (n <= 2*ell); frob_sq is the
    EXACT total squared Frobenius norm of everything ever appended (a
    plain float sum — mergeable by addition, used by the error bound)."""

    ell: int
    d: int
    buf: np.ndarray  # (2*ell, d) float64
    n: int
    frob_sq: float


def zero(ell: int, d: int) -> FDState:
    if ell < 2:
        raise ValueError("frequent-directions needs ell >= 2")
    return FDState(ell=ell, d=d, buf=np.zeros((2 * ell, d)), n=0, frob_sq=0.0)


def _shrink(st: FDState) -> None:
    """SVD the filled rows and subtract sigma_ell^2 from every squared
    singular value (Liberty 2013, Fig. 1): the result has < ell nonzero
    rows and Gram error grows by at most sigma_ell^2 * I."""
    if st.n <= st.ell:
        return
    # full_matrices=False: (n, d) -> s (min(n,d),), Vt (min(n,d), d)
    _, s, vt = np.linalg.svd(st.buf[: st.n], full_matrices=False)
    if len(s) >= st.ell:
        delta = s[st.ell - 1] ** 2
    else:
        delta = 0.0
    s2 = np.sqrt(np.maximum(s**2 - delta, 0.0))
    keep = min(st.ell, len(s2))
    st.buf[:keep] = s2[:keep, None] * vt[:keep]
    st.buf[keep:] = 0.0
    st.n = keep


def _append(st: FDState, rows: np.ndarray) -> None:
    cap = st.buf.shape[0]
    i = 0
    while i < len(rows):
        take = min(cap - st.n, len(rows) - i)
        st.buf[st.n : st.n + take] = rows[i : i + take]
        st.n += take
        i += take
        if st.n >= cap:
            _shrink(st)


def update(st: FDState, values) -> FDState:
    """values: a pandas Series / numpy object array of length-d vectors
    (one Arrow batch's worth).  One np.asarray stack, then chunked appends
    with LAPACK shrinks — no per-row Python."""
    if hasattr(values, "to_numpy"):
        values = values.to_numpy()
    if len(values) == 0:
        return st
    rows = np.asarray([np.asarray(v, dtype=np.float64) for v in values])
    if rows.ndim != 2 or rows.shape[1] != st.d:
        raise ValueError(f"expected vectors of dim {st.d}, got {rows.shape}")
    st.frob_sq += float(np.einsum("ij,ij->", rows, rows))
    _append(st, rows)
    return st


def merge(a: FDState, b: FDState) -> FDState:
    """Stack both row sets and shrink once — the GLPW16 merge.  The bound
    telescopes: err(merge) <= err(a) + err(b) + sigma_ell^2(stack), and
    the right-hand sides sum to (frob_a + frob_b) / ell."""
    if a.ell != b.ell or a.d != b.d:
        raise ValueError("frequent-directions shape mismatch")
    out = zero(a.ell, a.d)
    out.frob_sq = a.frob_sq + b.frob_sq
    _append(out, a.buf[: a.n])
    _append(out, b.buf[: b.n])
    return out


def encode(st: FDState) -> bytes:
    return (
        _MAGIC
        + struct.pack("<IIId", st.ell, st.d, st.n, st.frob_sq)
        + st.buf[: st.n].astype("<f8").tobytes()
    )


def decode(buf: bytes) -> FDState:
    assert buf[:4] == _MAGIC, "bad frequent-directions header"
    ell, d, n, frob_sq = struct.unpack_from("<IIId", buf, 4)
    st = zero(ell, d)
    st.n = n
    st.frob_sq = frob_sq
    st.buf[:n] = np.frombuffer(
        buf, dtype="<f8", offset=4 + struct.calcsize("<IIId"), count=n * d
    ).reshape(n, d)
    return st


# ---------------------------------------------------------------- queries


def gram_estimate(st: FDState) -> np.ndarray:
    """B^T B — the (d, d) covariance (Gram) estimate.  Never exceeds the
    exact A^T A in PSD order, under-estimates by at most
    (frob_sq / ell) * I."""
    b = st.buf[: st.n]
    return b.T @ b


def cov_error_bound(st: FDState) -> float:
    """The guaranteed ||A^T A - B^T B||_2 ceiling for THIS stream."""
    return st.frob_sq / st.ell


def top_directions(st: FDState, r: int) -> tuple[np.ndarray, np.ndarray]:
    """(components (r, d) orthonormal rows, squared singular values (r,))
    — the sketch's top-r right singular directions, the one-pass PCA
    basis of the GLPW16 projection guarantee."""
    if r > st.ell:
        raise ValueError(f"r={r} exceeds sketch size ell={st.ell}")
    _, s, vt = np.linalg.svd(st.buf[: st.n], full_matrices=False)
    r = min(r, len(s))
    return vt[:r], s[:r] ** 2


def kind(ell: int = 64, d: int = 64) -> SketchKind:
    """Plug into the shared two-phase plan.  State size is fixed at
    O(ell * d) float64 regardless of input rows — at ell=64, d=768 that
    is 786 KB per (partition, key), the usual sketch-shuffle shape.  The
    state is matrix-valued and shrink-order-dependent, so it takes the
    variable-size fold (no GroupedState scatter is possible: SVD is not
    an elementwise np.*.at reduction)."""
    return SketchKind(
        name=f"freqdir_l{ell}_d{d}",
        zero=lambda: zero(ell, d),
        update=update,
        merge=merge,
        encode=encode,
        decode=decode,
    )
