"""Vectorized (numpy) reimplementations of the reference hash chain.

Parity targets (public reference: mkarppa/hyperlogloglog + google/farmhash):

- ``fingerprint64``    == farmhash::Fingerprint(uint64)   (reference Hash.hpp:27-30,
  external/farmhash/farmhash.h:172-180; golden vectors test.cpp:439-454)
- ``fibonacci_hash``   == hyperlogloglog::fibonacciHash   (Hash.hpp:13-17;
  golden vectors test.cpp:491-504)
- ``rho64``            == hyperlogloglog::rho = clz(x)+1  (common.hpp:26-29)
- ``farmhash64``       == farmhash::Hash64(str)           (Hash.hpp:22-25;
  golden vectors test.cpp:428-437)

FarmHash note: the reference builds farmhash WITHOUT ``NDEBUG`` (its Makefile
defines no NDEBUG), so farmhash's ``DebugTweak`` post-mix
(``~bswap64(h * k1)``) IS part of the observed behavior and of the golden
vectors; we apply it by default.  The reference dispatch for x86-64+SSE4.2
(its Makefile compiles -march=native) routes lengths < 512 through the
scalar ``farmhashxo`` path and lengths >= 512 through the SSE
``farmhashte::Hash64Long`` state machine — BOTH reproduced exactly here
(the te path as a numpy uint8[16]-register transcription of the public
farmhash.cc), golden-verified against the reference's own vendored
farmhash compiled with its own flags across lengths 0..10000.

Everything here is pure numpy uint64 arithmetic over Arrow-backed buffers —
no per-row Python in any hot path.  These functions run inside pandas UDFs /
mapInPandas on executors; the recommended *production* hash for the Spark agg
layer is JVM-side ``xxhash64`` (whole-stage codegen), with farmhash as the
reference-parity mode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64
_M64 = U64(0xFFFFFFFFFFFFFFFF)

K0 = U64(0xC3A5C85C97CB3127)
K1 = U64(0xB492B66FBE98F273)
K2 = U64(0x9AE16A3B2F90404F)
K_MUL = U64(0x9DDFEA08EB382D69)  # Hash128to64 / Fingerprint multiplier
FIB = U64(0x9E3779B97F4A7C15)

def _u64(x) -> np.ndarray:
    return np.asarray(x, dtype=U64)


def fingerprint64(x) -> np.ndarray:
    """farmhash::Fingerprint(uint64) — murmur-style mix. Exact parity."""
    with np.errstate(over="ignore"):
        b = _u64(x) * K_MUL
        b ^= b >> U64(44)
        b *= K_MUL
        b ^= b >> U64(41)
        b *= K_MUL
    return b


def fibonacci_hash(x, b: int = 64) -> np.ndarray:
    """hyperlogloglog::fibonacciHash: (golden-ratio * x) >> (64-b)."""
    with np.errstate(over="ignore"):
        return (FIB * _u64(x)) >> U64(64 - b)


def clz64(x) -> np.ndarray:
    """Count of leading zeros of uint64 (clz(0) = 64), vectorized and exact.

    Split into 32-bit halves; a uint32 converts to float64 exactly (<= 2^53),
    so frexp's exponent gives the bit length with no rounding hazard."""
    x = np.atleast_1d(_u64(x))
    hi = (x >> U64(32)).astype(np.uint32)
    lo = (x & U64(0xFFFFFFFF)).astype(np.uint32)
    hi_nz = hi != 0
    v = np.where(hi_nz, hi, lo).astype(np.float64)
    e = np.frexp(v)[1]  # bit length; 0 for v == 0
    return np.where(hi_nz, 32 - e, 64 - e).astype(np.int64)


def rho64(x) -> np.ndarray:
    """rho(x) = clz(x) + 1 (reference common.hpp:26-29); rho(0) defined = 65."""
    return clz64(x) + 1


def jr_from_hash(x, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Derive (register index j, rank r) from a 64-bit hash exactly as the
    reference does (HyperLogLog.hpp:57-62): j = top p bits of
    fibonacciHash(x); r = clz(x)+1 of the ORIGINAL hash, masked to 6 bits
    the way PackedVector::set masks stored values (PackedVector.hpp:130)."""
    x = _u64(x)
    j = fibonacci_hash(x, p).astype(np.int64)
    r = (rho64(x) & 63).astype(np.uint8)  # rho==64 (x==1) wraps to 0, as stored by the reference
    return j, r


def jr_split(x, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Standard disjoint-bits HLL split used by the engine's JVM-hash modes:
    j = top p bits of the hash, r = clz(hash << p) + 1, with the all-zero
    suffix (hash << p == 0, probability 2^-(64-p) per row) capped at the
    standard maximal rank 64 - p + 1.  For p >= 4 every rank fits in 6 bits
    without masking (max 61), so the decode is monotone in the unsigned
    shifted hash — which is what lets hllspark.agg aggregate min(w) instead
    of max(r) on the hot path.

    This is the numpy twin of the pure-Spark-SQL expression in
    hllspark.agg (shiftrightunsigned / bit-smear / bit_count), so the
    'sql' and 'pandas' implementations produce byte-identical sketches."""
    x = _u64(x)
    with np.errstate(over="ignore"):
        j = (x >> U64(64 - p)).astype(np.int64)
        w = x << U64(p)
    r = np.where(w == 0, 64 - p + 1, clz64(w) + 1).astype(np.uint8)
    return j, r


# ---------------------------------------------------------------------------
# FarmHash64 over variable-length byte strings, vectorized via Arrow buffers
# ---------------------------------------------------------------------------

def _rot(x: np.ndarray, n: int) -> np.ndarray:
    n = U64(n)
    with np.errstate(over="ignore"):
        return (x >> n) | (x << (U64(64) - n))


def _shift_mix(x: np.ndarray) -> np.ndarray:
    return x ^ (x >> U64(47))


def _hash_len_16_mul(u, v, mul):
    with np.errstate(over="ignore"):
        a = (u ^ v) * mul
        a ^= a >> U64(47)
        b = (v ^ a) * mul
        b ^= b >> U64(47)
        b *= mul
    return b


def _hash_128_to_64(lo, hi):
    return _hash_len_16_mul(lo, hi, K_MUL)  # identical algebra, kMul fixed


def _fetch64(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Little-endian 8-byte loads at arbitrary offsets (gather)."""
    out = buf[pos].astype(U64)
    for k in range(1, 8):
        out |= buf[pos + k].astype(U64) << U64(8 * k)
    return out


def _fetch32(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    out = buf[pos].astype(U64)
    for k in range(1, 4):
        out |= buf[pos + k].astype(U64) << U64(8 * k)
    return out


def _weak_hash_32_seeds(buf, pos, a, b):
    """farmhashna::WeakHashLen32WithSeeds over 32 bytes at pos."""
    w = _fetch64(buf, pos)
    x = _fetch64(buf, pos + 8)
    y = _fetch64(buf, pos + 16)
    z = _fetch64(buf, pos + 24)
    with np.errstate(over="ignore"):
        a = a + w
        b = _rot(b + a + z, 21)
        c = a
        a = a + x + y
        b = b + _rot(a, 44)
        return a + z, b + c


def _h32(buf, pos, length, mul, seed0=None, seed1=None):
    """farmhashxo::H32 over `length` bytes at pos (length is scalar 32 here)."""
    with np.errstate(over="ignore"):
        a = _fetch64(buf, pos) * K1
        b = _fetch64(buf, pos + 8)
        c = _fetch64(buf, pos + length - 8) * mul
        d = _fetch64(buf, pos + length - 16) * K2
        u = _rot(a + b, 43) + _rot(c, 30) + d
        v = a + _rot(b + K2, 18) + c
        if seed0 is not None:
            u = u + seed0
        if seed1 is not None:
            v = v + seed1
        a = _shift_mix((u ^ v) * mul)
        b = _shift_mix((v ^ a) * mul)
        return b


def _len0(n):
    return np.full(n, K2, dtype=U64)


def _len1to3(buf, st, ln):
    with np.errstate(over="ignore"):
        a = buf[st].astype(U64)
        b = buf[st + (ln >> 1)].astype(U64)
        c = buf[st + ln - 1].astype(U64)
        y = a + (b << U64(8))
        z = ln.astype(U64) + (c << U64(2))
        return _shift_mix(y * K2 ^ z * K0) * K2


def _len4to7(buf, st, ln):
    with np.errstate(over="ignore"):
        mul = K2 + ln.astype(U64) * U64(2)
        a = _fetch32(buf, st)
        return _hash_len_16_mul(ln.astype(U64) + (a << U64(3)), _fetch32(buf, st + ln - 4), mul)


def _len8to16(buf, st, ln):
    with np.errstate(over="ignore"):
        mul = K2 + ln.astype(U64) * U64(2)
        a = _fetch64(buf, st) + K2
        b = _fetch64(buf, st + ln - 8)
        c = _rot(b, 37) * mul + a
        d = (_rot(a, 25) + b) * mul
        return _hash_len_16_mul(c, d, mul)


def _len17to32(buf, st, ln):
    with np.errstate(over="ignore"):
        mul = K2 + ln.astype(U64) * U64(2)
        a = _fetch64(buf, st) * K1
        b = _fetch64(buf, st + 8)
        c = _fetch64(buf, st + ln - 8) * mul
        d = _fetch64(buf, st + ln - 16) * K2
        return _hash_len_16_mul(
            _rot(a + b, 43) + _rot(c, 30) + d, a + _rot(b + K2, 18) + c, mul
        )


def _len33to64(buf, st, ln):
    with np.errstate(over="ignore"):
        mul0 = K2 - U64(30)
        mul1 = K2 - U64(30) + ln.astype(U64) * U64(2)
        h0 = _h32(buf, st, 32, mul0)
        h1 = _h32(buf, st + ln - 32, 32, mul1)
        return (h1 * mul1 + h0) * mul1


def _len65to96(buf, st, ln):
    with np.errstate(over="ignore"):
        mul0 = K2 - U64(114)
        mul1 = K2 - U64(114) + ln.astype(U64) * U64(2)
        h0 = _h32(buf, st, 32, mul0)
        h1 = _h32(buf, st + 32, 32, mul1)
        h2 = _h32(buf, st + ln - 32, 32, mul1, h0, h1)
        return (h2 * U64(9) + (h0 >> U64(17)) + (h1 >> U64(21))) * mul1


def _len97to256(buf, st, ln, nblocks):
    """farmhashna::Hash64 long loop; all rows share the same block count."""
    with np.errstate(over="ignore"):
        seed = U64(81)
        lnu = ln.astype(U64)
        x = seed * K2 + _fetch64(buf, st)
        y = np.full(ln.shape, seed * K1 + U64(113), dtype=U64)
        z = np.full(ln.shape, _shift_mix(y[:1] * K2 + U64(113))[0] * K2, dtype=U64)
        v0 = np.zeros(ln.shape, U64); v1 = np.zeros(ln.shape, U64)
        w0 = np.zeros(ln.shape, U64); w1 = np.zeros(ln.shape, U64)
        s = st.copy()
        for _ in range(nblocks):
            x = _rot(x + y + v0 + _fetch64(buf, s + 8), 37) * K1
            y = _rot(y + v1 + _fetch64(buf, s + 48), 42) * K1
            x = x ^ w1
            y = y + v0 + _fetch64(buf, s + 40)
            z = _rot(z + w0, 33) * K1
            v0, v1 = _weak_hash_32_seeds(buf, s, v1 * K1, x + w0)
            w0, w1 = _weak_hash_32_seeds(buf, s + 32, z + w1, y + _fetch64(buf, s + 16))
            z, x = x, z
            s = s + 64
        mul = K1 + ((z & U64(0xFF)) << U64(1))
        s = st + ln - 64  # last64
        tail = ((lnu - U64(1)) & U64(63))
        w0 = w0 + tail
        v0 = v0 + w0
        w0 = w0 + v0
        x = _rot(x + y + v0 + _fetch64(buf, s + 8), 37) * mul
        y = _rot(y + v1 + _fetch64(buf, s + 48), 42) * mul
        x = x ^ (w1 * U64(9))
        y = y + v0 * U64(9) + _fetch64(buf, s + 40)
        z = _rot(z + w0, 33) * mul
        v0, v1 = _weak_hash_32_seeds(buf, s, v1 * mul, x + w0)
        w0, w1 = _weak_hash_32_seeds(buf, s + 32, z + w1, y + _fetch64(buf, s + 16))
        z, x = x, z
        return _hash_len_16_mul(
            _hash_len_16_mul(v0, w0, mul) + _shift_mix(y) * K0 + z,
            _hash_len_16_mul(v1, w1, mul) + x,
            mul,
        )


def _len257plus(buf, st, ln, nblocks):
    """farmhashuo::Hash64WithSeeds(s, len, 81, 0); same-block-count rows."""
    with np.errstate(over="ignore"):
        seed0 = U64(81)
        seed1 = U64(0)
        lnu = ln.astype(U64)
        n = ln.shape[0]
        x = np.full(n, seed0, U64)
        y = np.full(n, seed1 * K2 + U64(113), U64)
        z = _shift_mix(y * K2) * K2
        v0 = np.full(n, seed0, U64); v1 = np.full(n, seed1, U64)
        w0 = np.zeros(n, U64); w1 = np.zeros(n, U64)
        u = x - z
        x = x * K2
        mul = K2 + (u & U64(0x82))
        s = st.copy()
        for _ in range(nblocks):
            a0 = _fetch64(buf, s); a1 = _fetch64(buf, s + 8)
            a2 = _fetch64(buf, s + 16); a3 = _fetch64(buf, s + 24)
            a4 = _fetch64(buf, s + 32); a5 = _fetch64(buf, s + 40)
            a6 = _fetch64(buf, s + 48); a7 = _fetch64(buf, s + 56)
            x = x + a0 + a1
            y = y + a2
            z = z + a3
            v0 = v0 + a4
            v1 = v1 + a5 + a1
            w0 = w0 + a6
            w1 = w1 + a7
            x = _rot(x, 26) * U64(9)
            y = _rot(y, 29)
            z = z * mul
            v0 = _rot(v0, 33)
            v1 = _rot(v1, 30)
            w0 = (w0 ^ x) * U64(9)
            z = _rot(z, 32) + w1
            w1 = w1 + z
            z = z * U64(9)
            u, y = y, u
            z = z + a0 + a6
            v0 = v0 + a2
            v1 = v1 + a3
            w0 = w0 + a4
            w1 = w1 + a5 + a6
            x = x + a1
            y = y + a7
            y = y + v0
            v0 = v0 + (x - y)
            v1 = v1 + w0
            w0 = w0 + v1
            w1 = w1 + (x - y)
            x = x + w1
            w1 = _rot(w1, 34)
            u, z = z, u
            s = s + 64
        s = st + ln - 64
        u = u * U64(9)
        v1 = _rot(v1, 28)
        v0 = _rot(v0, 20)
        w0 = w0 + ((lnu - U64(1)) & U64(63))
        u = u + y
        y = y + u
        x = _rot(y - x + v0 + _fetch64(buf, s + 8), 37) * mul
        y = _rot(y ^ v1 ^ _fetch64(buf, s + 48), 42) * mul
        x = x ^ (w1 * U64(9))
        y = y + v0 + _fetch64(buf, s + 40)
        z = _rot(z + w0, 33) * mul
        v0, v1 = _weak_hash_32_seeds(buf, s, v1 * mul, x + w0)
        w0, w1 = _weak_hash_32_seeds(buf, s + 32, z + w1, y + _fetch64(buf, s + 16))

        def _uo_h(a, b, m, r):
            t = (a ^ b) * m
            t ^= t >> U64(47)
            t2 = (b ^ t) * m
            return _rot(t2, r) * m

        return _uo_h(
            _hash_len_16_mul(v0 + x, w0 ^ y, mul) + z - u,
            _uo_h(v1 + y, w1 + z, K2, 30) ^ x,
            K2,
            31,
        )


# ---------------------------------------------------------------------------
# farmhashte::Hash64Long — the SSE path the reference's -march=native build
# takes for len >= 512 (public google/farmhash farmhash.cc, farmhashte
# namespace), re-expressed over numpy uint8[16] "registers".  Each __m128i
# op maps to a dtype view: Add=_mm_add_epi64 -> two uint64 lanes,
# Mul=_mm_mullo_epi32 -> four uint32 lanes, Shuf=_mm_shuffle_epi8 -> byte
# gather.  Inherently sequential per string (a 12-register state machine
# over 256-byte blocks), so this runs per string — acceptable: >=512-byte
# keys are the rare tail, and parity beats throughput on a parity path.
# Golden-tested against the reference's own -O3 -march=native farmhash
# build across lengths 512..10000 (tests/test_hashing.py).
# ---------------------------------------------------------------------------

# _mm_set_epi8 takes bytes MSB-first; these are the little-endian layouts
_TE_SHUF = np.array(
    [1, 3, 7, 0, 13, 14, 2, 12, 9, 6, 15, 8, 5, 10, 11, 4], dtype=np.intp
)
_TE_MULT = np.array(
    [0x51, 0x2D, 0x9E, 0xCC, 0xED, 0x33, 0x3E, 0x34,
     0x03, 0xFA, 0x54, 0x45, 0x39, 0x33, 0xD6, 0xBD],
    dtype=np.uint8,
)


def _te_add(x, y):
    with np.errstate(over="ignore"):
        return (
            np.ascontiguousarray(x).view("<u8")
            + np.ascontiguousarray(y).view("<u8")
        ).view(np.uint8)


def _te_mul(x, y):
    with np.errstate(over="ignore"):
        return (
            np.ascontiguousarray(x).view("<u4")
            * np.ascontiguousarray(y).view("<u4")
        ).view(np.uint8)


def _te_shuf(x):
    return x[..., _TE_SHUF]


def _te_cvt64_rows(vals, k):
    out = np.zeros((k, 16), dtype=np.uint8)
    out.view("<u8")[:, 0] = np.asarray(vals, dtype=np.uint64)
    return out


def _te_set1_32_rows(v, k):
    row = np.tile(np.frombuffer(np.uint32(v & 0xFFFFFFFF).tobytes(), np.uint8), 4)
    return np.broadcast_to(row, (k, 16)).copy()


def _te_hash64_long_batch(buf, st, ln, nblocks, seed0: int, seed1: int):
    """farmhashte::Hash64Long vectorized over k same-block-count strings:
    each __m128i register becomes a (k, 16) uint8 matrix and every step of
    the 256-byte-block state machine runs for all strings at once."""
    rot = lambda x, r: ((x >> r) | (x << (64 - r))) & 0xFFFFFFFFFFFFFFFF
    k = st.shape[0]
    idx16 = np.arange(16)
    seed2 = ((seed0 + 113) * (seed1 + 9)) & 0xFFFFFFFFFFFFFFFF
    seed3 = ((rot(seed0, 23) + 27) * (rot(seed1, 30) + 111)) & 0xFFFFFFFFFFFFFFFF
    d0 = _te_cvt64_rows(np.full(k, seed0, np.uint64), k)
    d1 = _te_cvt64_rows(np.full(k, seed1, np.uint64), k)
    d2 = _te_shuf(d0)
    d3 = _te_shuf(d1)
    d4 = d0 ^ d1
    d5 = d1 ^ d2
    d6 = d2 ^ d4
    d7 = _te_set1_32_rows(seed2 >> 32, k)
    d8 = _te_mul(_TE_MULT, d2)
    d9 = _te_set1_32_rows(seed3 >> 32, k)
    d10 = _te_set1_32_rows(seed3, k)
    d11 = _te_add(d2, _te_set1_32_rows(seed2, k))
    for blk in range(nblocks):
        base = st + blk * 256
        f = lambda off: buf[(base + off)[:, None] + idx16]
        z = f(0)
        d0 = _te_add(d0, z); d1 = _te_shuf(d1); d2 = d2 ^ d0
        d4 = d4 ^ z; d4 = d4 ^ d1
        d0, d6 = d6, d0
        z = f(16)
        d5 = _te_add(d5, z); d6 = _te_shuf(d6); d8 = _te_shuf(d8)
        d7 = d7 ^ d5; d0 = d0 ^ z; d0 = d0 ^ d6
        d5, d11 = d11, d5
        z = f(32)
        d1 = _te_add(d1, z); d2 = _te_shuf(d2); d4 = _te_shuf(d4)
        d5 = d5 ^ z; d5 = d5 ^ d2
        d10, d4 = d4, d10
        z = f(48)
        d6 = _te_add(d6, z); d7 = _te_shuf(d7); d0 = _te_shuf(d0)
        d8 = d8 ^ d6; d1 = d1 ^ z; d1 = _te_add(d1, d7)
        z = f(64)
        d2 = _te_add(d2, z); d5 = _te_shuf(d5); d4 = _te_add(d4, d2)
        d6 = d6 ^ z; d6 = d6 ^ d11
        d8, d2 = d2, d8
        z = f(80)
        d7 = d7 ^ z; d8 = _te_shuf(d8); d1 = _te_shuf(d1)
        d0 = _te_add(d0, d7); d2 = _te_add(d2, z); d2 = _te_add(d2, d8)
        d1, d7 = d7, d1
        z = f(96)
        d4 = _te_shuf(d4); d6 = _te_shuf(d6); d8 = _te_mul(_TE_MULT, d8)
        d5 = d5 ^ d11; d7 = d7 ^ z; d7 = _te_add(d7, d4)
        d6, d0 = d0, d6
        z = f(112)
        d8 = _te_add(d8, z); d0 = _te_shuf(d0); d2 = _te_shuf(d2)
        d1 = d1 ^ d8; d10 = d10 ^ z; d10 = d10 ^ d0
        d11, d5 = d5, d11
        z = f(128)
        d4 = _te_add(d4, z); d5 = _te_shuf(d5); d7 = _te_shuf(d7)
        d6 = _te_add(d6, d4); d8 = d8 ^ z; d8 = d8 ^ d5
        d4, d10 = d10, d4
        z = f(144)
        d0 = _te_add(d0, z); d1 = _te_shuf(d1); d2 = _te_add(d2, d0)
        d4 = d4 ^ z; d4 = d4 ^ d1
        z = f(160)
        d5 = _te_add(d5, z); d6 = _te_shuf(d6); d8 = _te_shuf(d8)
        d7 = d7 ^ d5; d0 = d0 ^ z; d0 = d0 ^ d6
        d2, d8 = d8, d2
        z = f(176)
        d1 = _te_add(d1, z); d2 = _te_shuf(d2); d4 = _te_shuf(d4)
        d5 = _te_mul(_TE_MULT, d5); d5 = d5 ^ z; d5 = d5 ^ d2
        d7, d1 = d1, d7
        z = f(192)
        d6 = _te_add(d6, z); d7 = _te_shuf(d7); d0 = _te_shuf(d0)
        d8 = _te_add(d8, d6); d1 = d1 ^ z; d1 = d1 ^ d7
        d0, d6 = d6, d0
        z = f(208)
        d2 = _te_add(d2, z); d5 = _te_shuf(d5); d4 = d4 ^ d2
        d6 = d6 ^ z; d6 = d6 ^ d9
        d5, d11 = d11, d5
        z = f(224)
        d7 = _te_add(d7, z); d8 = _te_shuf(d8); d1 = _te_shuf(d1)
        d0 = d0 ^ d7; d2 = d2 ^ z; d2 = d2 ^ d8
        d10, d4 = d4, d10
        z = f(240)
        d3 = _te_add(d3, z); d4 = _te_shuf(d4); d6 = _te_shuf(d6)
        d7 = _te_mul(_TE_MULT, d7); d5 = _te_add(d5, d3)
        d7 = d7 ^ z; d7 = d7 ^ d4
        d3, d9 = d9, d3
    d6 = _te_add(
        _te_mul(_TE_MULT, d6), _te_cvt64_rows(ln.astype(np.uint64), k)
    )
    rem_mask = (ln % 256) != 0
    if rem_mask.any():
        ridx = np.nonzero(rem_mask)[0]
        # _mm_shuffle_epi32(d8, 0b00111001): 32-bit lanes [1, 2, 3, 0]
        rot32 = d8[ridx].reshape(-1, 4, 4)[:, [1, 2, 3, 0]].reshape(-1, 16)
        d7[ridx] = _te_add(rot32, d7[ridx])
        # farmhashxo::Hash64 of each residue (< 256 bytes): recursion into
        # the vectorized short-string paths
        tails = np.array(
            [
                buf[int(st[i] + nblocks * 256) : int(st[i] + ln[i])].tobytes()
                for i in ridx
            ],
            dtype=object,
        )
        th = farmhash64(tails, debug_tweak=False)
        d8[ridx] = _te_add(
            _te_mul(_TE_MULT, d8[ridx]), _te_cvt64_rows(th, ridx.size)
        )
    mulshufmul = lambda d: _te_mul(
        _TE_MULT, _te_shuf(_te_mul(_TE_MULT, d))
    )
    d0 = mulshufmul(d0)
    d3 = mulshufmul(d3)
    d9 = mulshufmul(d9)
    d1 = mulshufmul(d1)
    d0 = _te_add(d11, d0)
    d3 = d7 ^ d3
    d9 = _te_add(d8, d9)
    d1 = _te_add(d10, d1)
    d4 = _te_add(d3, d4)
    d5 = _te_add(d9, d5)
    d6 = d1 ^ d6
    d2 = _te_add(d0, d2)
    t = np.concatenate([d0, d3, d9, d1, d4, d5, d6, d2], axis=1)  # (k, 128)
    blobs = np.array([row.tobytes() for row in t], dtype=object)
    return farmhash64(blobs, debug_tweak=False)


def _len512plus_te(buf, st, ln, nblocks):
    """Rows of len >= 512 through the te state machine, batched per block
    count (farmhashte::Hash64(s, len) = Hash64Long(s, len, k2, k1))."""
    return _te_hash64_long_batch(buf, st, ln, nblocks, int(K2), int(K1))


def _debug_tweak(h: np.ndarray) -> np.ndarray:
    """farmhash DebugTweak for 64-bit: ~bswap64(x * k1) — active in the
    reference's builds (no NDEBUG in its Makefile), hence in its goldens."""
    with np.errstate(over="ignore"):
        return (~((h * K1).byteswap())) & _M64


def farmhash64(strings, debug_tweak: bool = True) -> np.ndarray:
    """Vectorized farmhash::Hash64 over a sequence of str/bytes.

    Accepts a pandas Series, numpy object array, list, or pyarrow Array.
    Returns np.uint64 array.  Exact parity with the reference build for
    len < 512 (see module docstring).
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        arr = pa.array(strings)
    else:
        arr = strings
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    elif not pa.types.is_large_binary(arr.type):
        raise TypeError(f"farmhash64 expects strings/bytes, got {arr.type}")
    n = len(arr)
    out = np.zeros(n, dtype=U64)
    if n == 0:
        return out
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=n + 1)
    data_buf = arr.buffers()[2]
    raw = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(0, np.uint8)
    )
    # pad so gathers up to pos+63 never go out of bounds
    buf = np.concatenate([raw, np.zeros(64, np.uint8)])
    st = offsets[:-1].astype(np.int64)
    ln = (offsets[1:] - offsets[:-1]).astype(np.int64)

    def fill(mask, fn, *extra):
        idx = np.nonzero(mask)[0]
        if idx.size:
            out[idx] = fn(buf, st[idx], ln[idx], *extra)

    zero = ln == 0
    out[zero] = K2
    fill((ln >= 1) & (ln <= 3), _len1to3)
    fill((ln >= 4) & (ln <= 7), _len4to7)
    fill((ln >= 8) & (ln <= 16), _len8to16)
    fill((ln >= 17) & (ln <= 32), _len17to32)
    fill((ln >= 33) & (ln <= 64), _len33to64)
    fill((ln >= 65) & (ln <= 96), _len65to96)
    # looped paths: group rows by block count so each group runs an exact
    # fixed-trip vectorized loop (no masking overhead)
    for lo, hi, fn in ((97, 256, _len97to256), (257, 511, _len257plus)):
        mask = (ln >= lo) & (ln <= hi)
        if mask.any():
            nb = (ln - 1) // 64  # number of full 64-byte blocks before last64
            for blocks in np.unique(nb[mask]):
                fill(mask & (nb == blocks), fn, int(blocks))
    # len >= 512: the reference's -march=native build dispatches to the SSE
    # farmhashte::Hash64Long — exact parity via the batched state machine,
    # grouped by 256-byte block count like the other looped paths
    te_mask = ln >= 512
    if te_mask.any():
        nb256 = ln // 256
        for blocks in np.unique(nb256[te_mask]):
            fill(te_mask & (nb256 == blocks), _len512plus_te, int(blocks))
    if debug_tweak:
        out = _debug_tweak(out)
    return out


def hash_items(values, dtype: str = "auto") -> np.ndarray:
    """Hash a column of items to uint64 exactly like the reference's
    ``add`` entry point (Hash.hpp:22-30): farmhash::Fingerprint for 64-bit
    ints, farmhash::Hash64 for strings/bytes."""
    if dtype == "auto":
        sample = None
        try:
            sample = values.dtype
        except AttributeError:
            pass
        if sample is not None and np.issubdtype(sample, np.integer):
            dtype = "uint64"
        else:
            dtype = "str"
    if dtype in ("uint64", "int64", "long"):
        return fingerprint64(np.asarray(values).astype(np.int64).view(np.uint64))
    return farmhash64(values)
