"""HyperLogLogLog tests — mirrors of /root/reference/hyperlogloglog/test.cpp
categories 6-11: minimumBits goldens, the scripted state-machine golden,
HLLL == HLL state equivalence, space optimality, merge, policy variants,
flag validation, and format round-trips."""

import numpy as np
import pytest

from hllspark import hll, hlll, sketch
from hllspark.hashing import jr_from_hash

# test.cpp:785-816
MINIMUM_BITS_GOLDEN = [
    ([8, 4, 2, 1, 4, 2, 5, 3, 5, 4, 6, 2, 5, 4, 3, 4], 48),
    (
        [7, 4, 9, 5, 10, 8, 6, 3, 6, 9, 4, 6, 6, 5, 6, 6, 9,
         4, 7, 5, 6, 7, 7, 6, 7, 5, 5, 8, 7, 6, 6, 5],
        96,
    ),
    (
        [12, 10, 9, 9, 8, 8, 8, 11, 9, 8, 9, 6, 9, 9, 7, 9,
         9, 9, 9, 9, 8, 6, 11, 9, 10, 9, 9, 13, 10, 13, 8,
         10, 7, 7, 6, 7, 11, 9, 7, 13, 9, 8, 8, 6, 9, 8, 8,
         10, 6, 9, 8, 9, 9, 9, 8, 9, 9, 9, 9, 9, 7, 6, 7, 12],
        192,
    ),
    (
        [11, 10, 13, 8, 11, 12, 11, 9, 11, 10, 10, 12, 11,
         11, 10, 17, 8, 12, 11, 11, 11, 12, 9, 10, 10, 13,
         9, 12, 13, 10, 9, 9, 12, 9, 16, 13, 10, 9, 11, 10,
         11, 11, 12, 10, 9, 16, 10, 10, 10, 10, 9, 13, 12,
         12, 11, 9, 10, 12, 8, 12, 11, 9, 12, 14, 15, 10, 9,
         9, 11, 14, 10, 13, 12, 12, 9, 10, 11, 10, 10, 15,
         11, 10, 7, 11, 13, 13, 12, 8, 11, 11, 11, 12, 11,
         10, 12, 13, 10, 12, 12, 10, 11, 13, 13, 12, 13, 10,
         12, 7, 10, 10, 11, 11, 11, 12, 11, 11, 11, 11, 10,
         9, 10, 10, 9, 13, 11, 11, 11, 10],
        449,
    ),
]


def test_minimum_bits_golden():
    for M, expected in MINIMUM_BITS_GOLDEN:
        assert hlll.minimum_bits(M, 3, 6) == expected


def test_scripted_state_machine_golden():
    """Exact replay of the reference scripted sequence (test.cpp:820-979):
    bitSize, |S|, B, lowerBound, compressCount, rebaseCount after each add."""
    sm = hlll.HLLLStateMachine(16)
    def check(bits, ns, B, lb, cc, rc):
        assert sm.bit_size() == bits
        assert len(sm.S) == ns
        assert sm.B == B
        assert sm.lower_bound == lb
        assert sm.compress_count == cc
        assert sm.rebase_count == rc

    check(48, 0, 0, 0, 0, 0)
    sm.add_jr(0, 1); check(48, 0, 0, 0, 1, 0)
    assert sm.get(0) == 1 and all(sm.get(i) == 0 for i in range(1, 16))
    sm.add_jr(1, 7); check(48, 0, 0, 0, 2, 0)
    sm.add_jr(2, 8); check(58, 1, 0, 0, 3, 0)
    assert sorted(sm.S.items()) == [(2, 8)]
    sm.add_jr(3, 8); check(68, 2, 0, 0, 4, 0)
    assert sorted(sm.S.items()) == [(2, 8), (3, 8)]
    sm.add_jr(2, 9); check(68, 2, 0, 0, 5, 0)
    assert sorted(sm.S.items()) == [(2, 9), (3, 8)]
    sm.add_jr(4, 9); check(78, 3, 0, 0, 6, 0)
    sm.add_jr(5, 9); sm.add_jr(6, 9); check(98, 5, 0, 0, 8, 0)
    sm.add_jr(7, 9); sm.add_jr(8, 9); check(118, 7, 0, 0, 10, 0)
    sm.add_jr(9, 9); check(118, 7, 7, 0, 11, 1)
    sm.add_jr(10, 9); check(108, 6, 7, 0, 12, 1)
    for j in (11, 12, 13, 14, 15):
        sm.add_jr(j, 2)
    check(58, 1, 2, 1, 17, 2)
    sm.add_jr(0, 2); check(48, 0, 2, 2, 18, 2)
    # fast-rejected adds change nothing
    sm.add_jr(0, 1); sm.add_jr(15, 1)
    sm.add_jr(10, 5)
    assert sm.compress_count == 18 and sm.rebase_count == 2


@pytest.mark.parametrize(
    "flags",
    [
        hlll.COMPRESS_DEFAULT,
        hlll.COMPRESS_WHEN_APPEND | hlll.COMPRESS_TYPE_FULL,
        hlll.COMPRESS_WHEN_ALWAYS | hlll.COMPRESS_TYPE_INCREASE,
        hlll.COMPRESS_WHEN_APPEND | hlll.COMPRESS_TYPE_INCREASE,
        hlll.COMPRESS_BOTTOM,
    ],
)
def test_hlll_equals_hll_after_every_add(flags):
    """The big invariant (test.cpp:1078-1126, 1243-1345): every HLLL variant
    has registers and estimate identical to a plain HLL after every add;
    under default flags bitSize() == minimumBits at all times."""
    m, p = 64, 6
    rng = np.random.default_rng(99)
    sm = hlll.HLLLStateMachine(m, 3, flags)
    M = hll.empty(p)
    for _ in range(300):
        j = int(rng.integers(0, m))
        r = int(np.ceil(-np.log2(1 - rng.random())))  # Geometric(1/2), as inputgenerator.cpp:84
        r = min(r, 63)
        sm.add_jr(j, r)
        old = M[j]
        if r > old:
            M[j] = r
        np.testing.assert_array_equal(sm.registers(), M)
        if flags == hlll.COMPRESS_DEFAULT:
            assert sm.bit_size() == hlll.minimum_bits(M)
        assert sm.estimate() == hll.estimate(M)
    if flags == hlll.COMPRESS_BOTTOM:
        assert sm.B == int(M.min())  # bottom invariant (test.cpp:1281-1284)


def test_hlll_merge_equals_union():
    """Merge == union-fed, registers + estimate (test.cpp:1130-1184),
    randomized rounds."""
    m, p = 256, 8
    rng = np.random.default_rng(5)
    for _ in range(20):
        ja = rng.integers(0, m, size=400)
        ra = np.minimum(np.ceil(-np.log2(1 - rng.random(400))).astype(int), 63)
        jb = rng.integers(0, m, size=400)
        rb = np.minimum(np.ceil(-np.log2(1 - rng.random(400))).astype(int), 63)
        A = hlll.HLLLStateMachine(m)
        B = hlll.HLLLStateMachine(m)
        U = hlll.HLLLStateMachine(m)
        for j, r in zip(ja, ra):
            A.add_jr(int(j), int(r)); U.add_jr(int(j), int(r))
        for j, r in zip(jb, rb):
            B.add_jr(int(j), int(r)); U.add_jr(int(j), int(r))
        merged = A.merge(B)
        np.testing.assert_array_equal(merged.registers(), U.registers())
        assert merged.estimate() == U.estimate()
        # merge is register-space commutative
        np.testing.assert_array_equal(B.merge(A).registers(), merged.registers())


def test_flag_validation():
    """Invalid flag combos throw (test.cpp:1246-1261)."""
    for bad in (
        hlll.COMPRESS_BOTTOM | hlll.COMPRESS_WHEN_ALWAYS,
        hlll.COMPRESS_BOTTOM | hlll.COMPRESS_TYPE_FULL,
        0x20,
        0,
    ):
        with pytest.raises(ValueError):
            hlll.HLLLStateMachine(16, 3, bad)
    with pytest.raises(ValueError):
        hlll.HLLLStateMachine(10)  # not a power of two


def test_from_registers_round_trip():
    """HLLL <-> HLL conversions preserve state (test.cpp:1403-1487)."""
    rng = np.random.default_rng(11)
    hashes = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    M = hll.build_from_hashes(hashes, 6)
    sm = hlll.HLLLStateMachine.from_registers(M)
    np.testing.assert_array_equal(sm.registers(), M)
    assert sm.bit_size() == hlll.minimum_bits(M)


# --- serialization formats -------------------------------------------------

def _random_registers(p, n, seed):
    rng = np.random.default_rng(seed)
    hashes = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    return hll.build_from_hashes(hashes, p)


@pytest.mark.parametrize("algo", ["hll", "hlll", "hllzstd"])
@pytest.mark.parametrize("p,n", [(4, 10), (8, 1000), (12, 100000)])
def test_encode_decode_round_trip(algo, p, n):
    M = _random_registers(p, n, seed=p * 1000 + n)
    buf = sketch.encode(M, algo)
    np.testing.assert_array_equal(sketch.decode(buf), M)
    info = sketch.decode_info(buf)
    assert info["algo"] == algo and info["p"] == p


def test_encode_deterministic():
    M = _random_registers(10, 5000, seed=1)
    for algo in ("hll", "hlll", "hllzstd"):
        assert sketch.encode(M, algo) == sketch.encode(M.copy(), algo)


def test_hlll_bit_size_is_minimal():
    """The serialized HLLL bit size equals the reference's provable minimum
    (== what default-flag HLLL maintains online, test.cpp:1099)."""
    for p, n in ((8, 2000), (10, 50000), (14, 200000)):
        M = _random_registers(p, n, seed=p + n)
        buf = sketch.encode(M, "hlll")
        assert sketch.bit_size(buf) == hlll.minimum_bits(M)


def test_hlll_space_reduction_vs_hll():
    """At realistic n/m the HLLL payload is substantially below HLL's 6m bits
    (the paper's headline ~40% claim: 3m + |S|(log2 m + 6) << 6m)."""
    p, m = 12, 1 << 12
    M = _random_registers(p, 500_000, seed=42)
    ratio = sketch.bit_size(sketch.encode(M, "hlll")) / (6 * m)
    assert ratio < 0.75  # typically ~0.55-0.65 at this density
