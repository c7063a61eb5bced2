"""Pure-numpy HyperLogLog core: the in-flight register representation.

Semantics mirror the reference HyperLogLog (HyperLogLog.hpp):

- state           = m = 2**p registers, each holding a 6-bit rank (we keep
                    them as uint8 in flight, bit-packing only at serialization
                    boundaries — see hllspark.sketch);
- update          = scatter-max of rho(hash) into register fibonacci(hash)
                    (HyperLogLog.hpp:41-76), vectorized via np.maximum.at;
- merge           = element-wise max (HyperLogLog.hpp:124-131);
- estimate        = Flajolet et al. 2007 estimator with linear-counting and
                    large-range corrections (HyperLogLog.hpp:95-113).

The batch estimator is 2-D (k sketches x m registers) so grouped estimates
vectorize across groups.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_items, jr_from_hash

REGISTER_MASK = np.uint8(63)  # values are stored in 6 bits (logW = log2(64))


def alpha(m: int) -> float:
    """Bias-correction constant (HyperLogLog.hpp:138-149)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def empty(p: int) -> np.ndarray:
    """A zeroed sketch with m = 2**p registers."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    return np.zeros(1 << p, dtype=np.uint8)


def update_hashes(M: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold a batch of 64-bit hashes into the sketch in place.

    Equivalent to looping addHash (HyperLogLog.hpp:57-62): j = top-p bits of
    fibonacciHash(x), r = clz(x)+1 masked to 6 bits, M[j] = max(M[j], r).
    """
    p = int(np.log2(M.shape[0]))
    j, r = jr_from_hash(hashes, p)
    np.maximum.at(M, j, r)
    return M


def update_items(M: np.ndarray, values, dtype: str = "auto") -> np.ndarray:
    """Hash raw items (ints -> fingerprint64, str/bytes -> farmhash64) and
    fold them in; the composition of the reference's add() chain."""
    return update_hashes(M, hash_items(values, dtype))


def merge(M1: np.ndarray, M2: np.ndarray) -> np.ndarray:
    """Register-wise max (commutative, associative, idempotent)."""
    if M1.shape != M2.shape:
        raise ValueError("register count mismatch")
    return np.maximum(M1, M2)


def estimate(M: np.ndarray) -> float | np.ndarray:
    """Distinct-count estimate. Accepts a single sketch (1-D, m registers) or
    a batch (2-D, k x m); returns float or float64[k]."""
    single = M.ndim == 1
    regs = M[None, :] if single else M
    k, m = regs.shape
    # histogram per sketch: counts[k, 64]
    counts = np.zeros((k, 64), dtype=np.int64)
    # vectorized bincount over rows
    idx = np.arange(k).repeat(m)
    np.add.at(counts, (idx, regs.ravel()), 1)
    pow2 = np.ldexp(1.0, -np.arange(64))  # 2^-r
    E = alpha(m) * m * m / (counts @ pow2)
    V = counts[:, 0]
    out = E.copy()
    small = (E <= 2.5 * m) & (V != 0)
    with np.errstate(divide="ignore"):
        out[small] = m * np.log(m / V[small].astype(np.float64))
    two32 = float(1 << 32)
    large = ~small & (E > (1 << 32) // 30)
    out[large] = -two32 * np.log(1.0 - E[large] / two32)
    return float(out[0]) if single else out


def error_bound(p: int) -> float:
    """The published standard-error bound ~1.04/sqrt(m)."""
    return 1.04 / np.sqrt(1 << p)


def p_for_error(rsd: float) -> int:
    """Smallest precision p whose standard error 1.04/sqrt(2^p) <= rsd
    (the rsd-style sizing Spark's approx_count_distinct uses)."""
    if not 0 < rsd < 1:
        raise ValueError("rsd must be in (0, 1)")
    p = 4
    while error_bound(p) > rsd and p < 18:
        p += 1
    return p


def overlap_estimates(Ma: np.ndarray, Mb: np.ndarray) -> dict:
    """Set-operation estimates from two mergeable sketches: union is native
    (register max, exact on sketch states); intersection via
    inclusion-exclusion |A∩B| = E(A) + E(B) - E(A∪B), whose absolute error
    scales with the UNION's bound (can exceed 100% relative error for tiny
    overlaps of large sets — callers needing tight intersections at low
    Jaccard should use the KMV sketch, hllspark.sketches.kmv, whose
    jaccard/intersection estimators are unbiased; or minhash signatures
    from hllspark.dedup for per-document similarity).
    Returns {a, b, union, intersection, jaccard}."""
    ea, eb = float(estimate(Ma)), float(estimate(Mb))
    eu = float(estimate(merge(Ma, Mb)))
    inter = max(0.0, ea + eb - eu)
    return {
        "a": ea,
        "b": eb,
        "union": eu,
        "intersection": inter,
        "jaccard": inter / eu if eu > 0 else 0.0,
    }


def build_from_hashes(hashes: np.ndarray, p: int) -> np.ndarray:
    M = empty(p)
    return update_hashes(M, hashes)


def build(values, p: int, dtype: str = "auto") -> np.ndarray:
    M = empty(p)
    return update_items(M, values, dtype)


def grouped_scatter(keys: np.ndarray, hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Build one sketch per distinct key in a single vectorized pass.

    keys : int64 group codes (factorized); hashes : uint64.
    Returns (unique_key_codes, registers[k, m]).  This is the per-batch inner
    step of the Spark partial aggregation — one scatter-max over a 2-D target
    instead of a per-group Python loop.
    """
    uniq, inv = np.unique(keys, return_inverse=True)
    m = 1 << p
    regs = np.zeros((uniq.shape[0], m), dtype=np.uint8)
    j, r = jr_from_hash(hashes, p)
    np.maximum.at(regs, (inv, j), r)
    return uniq, regs
