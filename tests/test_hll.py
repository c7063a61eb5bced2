"""HLL core tests — mirrors of /root/reference/hyperlogloglog/test.cpp
categories 3-5 (estimator correctness, unbiasedness, merge semantics,
add-path equivalence)."""

import numpy as np

from hllspark import hll
from hllspark.hashing import fibonacci_hash, fingerprint64, jr_from_hash, rho64


def _reference_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Hand-rolled scalar loop oracle (mirrors test.cpp:557-583)."""
    m = 1 << p
    M = np.zeros(m, dtype=np.uint8)
    for x in hashes:
        j = int(fibonacci_hash(np.uint64(x), p))
        r = int(rho64(np.uint64(x))[0]) & 63
        if r > M[j]:
            M[j] = r
    return M


def test_registers_match_scalar_oracle():
    rng = np.random.default_rng(0)
    hashes = rng.integers(0, 2**64, size=2000, dtype=np.uint64)
    for p in (4, 6, 10):
        M = hll.build_from_hashes(hashes, p)
        np.testing.assert_array_equal(M, _reference_registers(hashes, p))


def test_estimate_closed_form():
    """estimate() equals the closed-form expression incl. the
    linear-counting branch (test.cpp:586-613)."""
    rng = np.random.default_rng(1)
    for p, n in ((6, 10), (6, 500), (10, 50), (10, 100000)):
        m = 1 << p
        hashes = rng.integers(0, 2**64, size=n, dtype=np.uint64)
        M = hll.build_from_hashes(hashes, p)
        Z = np.sum(np.ldexp(1.0, -M.astype(np.int64)))
        E = hll.alpha(m) * m * m / Z
        V = int(np.sum(M == 0))
        if E <= 2.5 * m and V > 0:
            expected = m * np.log(m / V)
        elif E <= (1 << 32) // 30:
            expected = E
        else:
            expected = -(2.0**32) * np.log(1 - E / 2.0**32)
        assert hll.estimate(M) == expected


def test_alpha_constants():
    assert hll.alpha(16) == 0.673
    assert hll.alpha(32) == 0.697
    assert hll.alpha(64) == 0.709
    assert hll.alpha(1024) == 0.7213 / (1.0 + 1.079 / 1024)


def test_merge_equals_union(seed=3):
    """merge(A, B) register- and estimate-identical to a union-fed sketch
    (test.cpp:672-736)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**64, size=3000, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=4000, dtype=np.uint64)
    p = 8
    MA = hll.build_from_hashes(a, p)
    MB = hll.build_from_hashes(b, p)
    MU = hll.build_from_hashes(np.concatenate([a, b]), p)
    merged = hll.merge(MA, MB)
    np.testing.assert_array_equal(merged, MU)
    assert hll.estimate(merged) == hll.estimate(MU)
    # commutative + associative
    np.testing.assert_array_equal(hll.merge(MB, MA), merged)


def test_add_paths_equivalent():
    """add(item) == addHash(hash(item)) == addJr(j, r) given the same hash
    chain (test.cpp:740-781)."""
    items = np.arange(1000, dtype=np.int64)
    p = 6
    via_items = hll.build(items, p)
    hashes = fingerprint64(items.view(np.uint64))
    via_hashes = hll.build_from_hashes(hashes, p)
    M = hll.empty(p)
    j, r = jr_from_hash(hashes, p)
    np.maximum.at(M, j, r)
    np.testing.assert_array_equal(via_items, via_hashes)
    np.testing.assert_array_equal(via_items, M)


def test_unbiasedness():
    """Mean estimate over many reps close to truth (test.cpp:617-637 runs
    5000 reps at m=64, n=1000 distinct items).  We run the same grid fully
    vectorized via grouped_scatter; with std(single) = 1.04/sqrt(64)*1000 =
    130, std(mean of 5000) = 1.84, so |mean - 1000| < 8 is > 4 sigma."""
    reps, n, p = 5000, 1000, 6
    rng = np.random.default_rng(0x11E3EA10)  # the reference INITIAL_SEED
    items = rng.integers(0, 2**64, size=reps * n, dtype=np.uint64)
    hashes = fingerprint64(items)
    keys = np.repeat(np.arange(reps), n)
    _, regs = hll.grouped_scatter(keys, hashes, p)
    estimates = hll.estimate(regs)
    assert abs(float(estimates.mean()) - n) < 8.0


def test_grouped_scatter_matches_per_group_build():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 5, size=3000)
    hashes = rng.integers(0, 2**64, size=3000, dtype=np.uint64)
    uniq, regs = hll.grouped_scatter(keys, hashes, 7)
    for i, k in enumerate(uniq):
        np.testing.assert_array_equal(
            regs[i], hll.build_from_hashes(hashes[keys == k], 7)
        )


def test_error_within_published_bound():
    """Relative error <= ~1.04/sqrt(m) envelope on a cardinality sweep
    (the BASELINE.md acceptance metric, reduced grid)."""
    rng = np.random.default_rng(42)
    for p in (10, 14):
        bound = hll.error_bound(p)
        for n in (100, 1000, 10_000, 100_000):
            items = rng.integers(0, 2**64, size=n, dtype=np.uint64)
            n_true = len(np.unique(items))
            est = hll.estimate(hll.build_from_hashes(fingerprint64(items), p))
            rel = abs(est - n_true) / n_true
            # 1.04/sqrt(m) is one standard error; allow 3 sigma
            assert rel < 3 * bound, (p, n, rel, bound)
