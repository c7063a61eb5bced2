"""Property-based tests (hypothesis) — the reference's randomized-oracle
strategy (test.cpp:194-272, 322-423, 1130-1184 run thousands of random ops
against std::vector / std::map / plain-HLL oracles) expressed as properties
over generated inputs instead of fixed seeds.

Pure numpy cores only — no Spark session, so this file stays fast.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from hllspark import hll, hlll, sketch

P = 6  # m = 64: small enough for exhaustive-ish exploration
M = 1 << P

jr_seq = st.lists(
    st.tuples(st.integers(0, M - 1), st.integers(1, 63)), max_size=120
)


@settings(max_examples=60, deadline=None)
@given(jr_seq)
def test_hlll_state_equals_hll_after_every_add(seq):
    """test.cpp:1078-1126 as a property: after EVERY add, every HLLL policy
    variant has registers and estimate identical to plain HLL, and the
    default policy's bitSize is the provable minimum."""
    dense = hll.empty(P)
    sms = {
        flags: hlll.HLLLStateMachine(M, 3, flags)
        for flags in (
            hlll.COMPRESS_DEFAULT,
            hlll.COMPRESS_WHEN_ALWAYS | hlll.COMPRESS_TYPE_INCREASE,
            hlll.COMPRESS_BOTTOM,
        )
    }
    for j, r in seq:
        dense[j] = max(dense[j], r)
        for flags, sm in sms.items():
            sm.add_jr(j, r)
            np.testing.assert_array_equal(sm.registers(), dense)
            assert sm.estimate() == hll.estimate(dense)
    default = sms[hlll.COMPRESS_DEFAULT]
    assert default.bit_size() == hlll.minimum_bits(dense, 3)


@settings(max_examples=60, deadline=None)
@given(jr_seq, jr_seq)
def test_merge_commutative_associative_equals_union(a, b):
    """Merge semantics (test.cpp:672-736, 1130-1184): merge(A, B) ==
    union-fed sketch, commutative, and idempotent on overlap."""
    A, B, U = hll.empty(P), hll.empty(P), hll.empty(P)
    for j, r in a:
        A[j] = max(A[j], r)
        U[j] = max(U[j], r)
    for j, r in b:
        B[j] = max(B[j], r)
        U[j] = max(U[j], r)
    np.testing.assert_array_equal(hll.merge(A, B), U)
    np.testing.assert_array_equal(hll.merge(B, A), U)
    np.testing.assert_array_equal(hll.merge(U, A), U)

    ha = hlll.HLLLStateMachine(M)
    hb = hlll.HLLLStateMachine(M)
    for j, r in a:
        ha.add_jr(j, r)
    for j, r in b:
        hb.add_jr(j, r)
    merged = ha.merge(hb)
    np.testing.assert_array_equal(merged.registers(), U)
    assert merged.bit_size() == hlll.minimum_bits(U, 3)


@settings(max_examples=80, deadline=None)
@given(
    st.integers(1, 12),
    st.lists(st.integers(0, (1 << 12) - 1), min_size=0, max_size=200),
)
def test_pack_unpack_round_trip(width, values):
    """PackedVector get/set equivalence (test.cpp:25-318): arbitrary widths
    incl. word-boundary crossing round-trip losslessly."""
    vals = np.array([v & ((1 << width) - 1) for v in values], dtype=np.uint64)
    buf = sketch.pack_uints(vals, width)
    assert len(buf) == (len(vals) * width + 7) // 8
    out = sketch.unpack_uints(buf, len(vals), width)
    np.testing.assert_array_equal(out, vals)


@settings(max_examples=60, deadline=None)
@given(jr_seq, st.sampled_from(["hll", "hlll", "hllzstd"]))
def test_encode_decode_round_trip_property(seq, algo):
    regs = hll.empty(P)
    for j, r in seq:
        regs[j] = max(regs[j], r)
    buf = sketch.encode(regs, algo)
    np.testing.assert_array_equal(sketch.decode(buf), regs)
    if algo == "hlll":
        # serialized HLLL reports exactly the reference's minimal bit size
        assert sketch.bit_size(buf) == hlll.minimum_bits(regs, 3)


@settings(max_examples=60, deadline=None)
@given(jr_seq, st.sampled_from(["hll", "hlll", "hllzstd"]),
       st.sampled_from(["hll", "hlll", "hllzstd"]))
def test_convert_round_trip_property(seq, a, b):
    """Format conversions (reference toHyperLogLog/fromHyperLogLog,
    test.cpp:1403-1487): a -> b -> a preserves registers and, for HLLL,
    the minimal serialized bit size."""
    regs = hll.empty(P)
    for j, r in seq:
        regs[j] = max(regs[j], r)
    buf_a = sketch.encode(regs, a)
    buf_b = sketch.convert(buf_a, b)
    assert sketch.decode_info(buf_b)["algo"] == b
    np.testing.assert_array_equal(sketch.decode(buf_b), regs)
    back = sketch.convert(buf_b, a)
    np.testing.assert_array_equal(sketch.decode(back), regs)
    if a == "hlll":
        assert sketch.bit_size(back) == hlll.minimum_bits(regs, 3)


# ---------------------------------------------------------------------------
# PackedVector dynamic ops (reference PackedVector.hpp:156-219)
# ---------------------------------------------------------------------------


@given(
    width=st.integers(min_value=1, max_value=63),
    ops=st.lists(
        st.tuples(
            st.sampled_from(["append", "insert", "erase", "set"]),
            st.integers(min_value=0, max_value=1 << 63),
            st.integers(min_value=0, max_value=200),
        ),
        max_size=60,
    ),
)
@settings(max_examples=60, deadline=None)
def test_packed_vector_matches_list_model(width, ops):
    """Model-based property test: PackedVector behaves exactly like a plain
    Python list of width-masked ints under arbitrary op sequences,
    including values straddling 64-bit word boundaries."""
    from hllspark.packedvector import PackedVector

    pv = PackedVector(width)
    model = []
    mask = (1 << width) - 1
    for op, value, pos in ops:
        if op == "append":
            pv.append(value)
            model.append(value & mask)
        elif op == "insert":
            i = pos % (len(model) + 1)
            pv.insert(i, value)
            model.insert(i, value & mask)
        elif op == "erase" and model:
            i = pos % len(model)
            pv.erase(i)
            del model[i]
        elif op == "set" and model:
            i = pos % len(model)
            pv.set(i, value)
            model[i] = value & mask
    assert len(pv) == len(model)
    assert [pv.get(i) for i in range(len(pv))] == model
    np.testing.assert_array_equal(
        pv.to_numpy(), np.array(model, dtype=np.uint64)
    )


@given(
    width=st.integers(min_value=1, max_value=63),
    values=st.lists(st.integers(min_value=0, max_value=1 << 63), max_size=100),
)
@settings(max_examples=40, deadline=None)
def test_packed_vector_round_trip(width, values):
    from hllspark.packedvector import PackedVector

    mask = (1 << width) - 1
    pv = PackedVector.from_numpy(
        np.array([v & mask for v in values], dtype=np.uint64), width
    )
    np.testing.assert_array_equal(
        pv.to_numpy(), np.array([v & mask for v in values], dtype=np.uint64)
    )
    assert pv.capacity >= len(values)


@given(
    p=st.integers(min_value=4, max_value=16),
    n=st.integers(min_value=0, max_value=3000),
)
@settings(max_examples=30, deadline=None)
def test_hll_sparse_dense_round_trip(p, n):
    """encode_hll auto-selects sparse vs dense deterministically; decode is
    transparent and exact either way, and the sparse form is strictly
    smaller whenever it is chosen."""
    rng = np.random.default_rng(p * 1000 + n)
    M = hll.build_from_hashes(
        rng.integers(0, 2**64, size=n, dtype=np.uint64), p
    )
    buf = sketch.encode_hll(M)
    np.testing.assert_array_equal(sketch.decode(buf), M)
    nnz = int(np.count_nonzero(M))
    sparse_bytes = 4 + (nnz * (p + 6) + 7) // 8
    if sparse_bytes < (1 << p):
        assert len(buf) == 8 + sparse_bytes  # sparse chosen
    else:
        assert len(buf) == 8 + (1 << p)  # dense chosen
    # the REPORTED metric is the reference's 6m regardless of payload
    # (HyperLogLog.hpp:32-34 protocol); the wire win shows in len(buf)
    assert sketch.bit_size(buf) == 6 * (1 << p)


@given(
    kw=st.integers(min_value=4, max_value=20),
    vw=st.integers(min_value=1, max_value=8),
    ops=st.lists(
        st.tuples(
            st.sampled_from(["set", "erase", "get"]),
            st.integers(min_value=0, max_value=300),
            st.integers(min_value=0, max_value=1 << 8),
        ),
        max_size=80,
    ),
)
@settings(max_examples=50, deadline=None)
def test_packed_map_matches_dict_model(kw, vw, ops):
    """Randomized upsert/erase/get equivalence against a plain dict with
    the sortedness invariant asserted after every mutation — the mirror of
    the reference's std::map-equivalence PackedMap test (test.cpp:322-423,
    sortedness test.cpp:420-422)."""
    from hllspark.packedvector import PackedMap

    pm = PackedMap(kw, vw)
    model = {}
    kmask, vmask = (1 << kw) - 1, (1 << vw) - 1
    for op, key, value in ops:
        key &= kmask
        if op == "set":
            pm.set(key, value)
            model[key] = value & vmask
        elif op == "erase":
            assert pm.erase(key) == (key in model)
            model.pop(key, None)
        else:
            assert pm.get(key) == model.get(key)
            assert (key in pm) == (key in model)
        ks = pm.keys()
        assert list(ks) == sorted(model)  # sorted, no dups
    assert {int(k): int(v) for k, v in zip(pm.keys(), pm.values())} == model
