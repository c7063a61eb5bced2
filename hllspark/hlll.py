"""HyperLogLogLog (KDD'22 Karppa & Pagh): compressed HLL register storage.

Two layers, per the design in SURVEY.md §7:

1. ``minimum_bits`` / ``choose_base`` — the space-optimality oracle and the
   boundary encoder used by the Spark pipeline.  In flight we keep plain
   uint8 registers (provably identical to HLLL state at all times — the
   reference asserts register equivalence after every add,
   test.cpp:1078-1126); HLLL's base+offset+exception compression is applied
   only when a sketch crosses a serialization boundary (shuffle, checkpoint,
   output).  With a full base search this reproduces exactly the bit size the
   reference maintains under its default flags (bitSize == minimumBits,
   test.cpp:1099).

2. ``HLLLStateMachine`` — a faithful sequential reimplementation of the
   reference's online state machine (HyperLogLogLog.hpp:108-498) including
   all four compression-policy flag variants and the compress/rebase
   counters.  This exists to mirror the reference's scripted goldens
   (test.cpp:820-1074) and is NOT on the Spark hot path.
"""

from __future__ import annotations

import numpy as np

# Compression-policy flags (HyperLogLogLog.hpp:19-32)
COMPRESS_WHEN_ALWAYS = 0x1
COMPRESS_WHEN_APPEND = 0x2
COMPRESS_TYPE_FULL = 0x4
COMPRESS_TYPE_INCREASE = 0x8
COMPRESS_BOTTOM = 0x10
COMPRESS_DEFAULT = COMPRESS_WHEN_ALWAYS | COMPRESS_TYPE_FULL

S_BITS = 6  # sparse value width = log2(64)


def minimum_bits(M: np.ndarray | list, m_bits: int = 3, s_bits: int = S_BITS) -> int:
    """Minimal HLLL size in bits over all base choices
    (HyperLogLogLog.hpp:539-553): min_B |{j : M[j]<B or M[j]>B+2^mBits-1}|
    * (log2 m + sBits) + m*mBits, B ranging over distinct register values."""
    M = np.asarray(M, dtype=np.int64)
    m = M.shape[0]
    log_m = int(m).bit_length() - 1
    max_offset = (1 << m_bits) - 1
    counts = np.bincount(M, minlength=65)
    csum = np.concatenate([[0], np.cumsum(counts)])  # csum[v] = #registers < v
    bases = np.unique(M)
    # in-window count for base B = csum[min(B+maxOffset, 63)+1] - csum[B]
    hi = np.minimum(bases + max_offset, 64)
    ns = m - (csum[hi + 1] - csum[bases])
    best_ns = int(ns.min()) if bases.size else m
    return best_ns * (log_m + s_bits) + m * m_bits


def choose_base(M: np.ndarray, m_bits: int = 3) -> tuple[int, np.ndarray]:
    """Pick the base minimizing the exception count (smallest such base) and
    return (base, exception_index_array).  Deterministic — the same register
    state always encodes to the same bytes regardless of which executor or
    task attempt produced it."""
    M = np.asarray(M, dtype=np.int64)
    m = M.shape[0]
    max_offset = (1 << m_bits) - 1
    counts = np.bincount(M, minlength=65)
    csum = np.concatenate([[0], np.cumsum(counts)])
    bases = np.unique(M)
    hi = np.minimum(bases + max_offset, 64)
    ns = m - (csum[hi + 1] - csum[bases])
    b = int(bases[np.argmin(ns)])  # argmin returns first (= smallest base) on ties
    exceptions = np.nonzero((M < b) | (M > b + max_offset))[0]
    return b, exceptions


class HLLLStateMachine:
    """Sequential HLLL with exact reference semantics, used for the scripted
    state-machine parity tests (test.cpp:820-1074).

    State: dense offsets ``off`` (masked to mBits on store, like
    PackedVector::set), sorted exception dict ``S``, base ``B``,
    ``lower_bound`` fast-reject, ``min_value_count``, and the two counters.
    """

    def __init__(self, m: int, m_bits: int = 3, flags: int = COMPRESS_DEFAULT):
        if m & (m - 1) or m <= 0:
            raise ValueError("m must be a power of two")
        # flag fixups + validation (HyperLogLogLog.hpp:53-69)
        if flags in (COMPRESS_TYPE_FULL, COMPRESS_TYPE_INCREASE):
            flags |= COMPRESS_WHEN_ALWAYS
        if flags in (COMPRESS_WHEN_ALWAYS, COMPRESS_WHEN_APPEND):
            flags |= COMPRESS_TYPE_FULL
        if (flags & COMPRESS_BOTTOM) and flags != COMPRESS_BOTTOM:
            raise ValueError("invalid flags")
        if flags != COMPRESS_BOTTOM:
            if not (flags & (COMPRESS_TYPE_FULL | COMPRESS_TYPE_INCREASE)) or not (
                flags & (COMPRESS_WHEN_ALWAYS | COMPRESS_WHEN_APPEND)
            ):
                raise ValueError("invalid flags")
        self.m = m
        self.log_m = m.bit_length() - 1
        self.m_bits = m_bits
        self.s_bits = S_BITS
        self.flags = flags
        self.max_offset = (1 << m_bits) - 1
        self.off = [0] * m  # dense offsets (value semantics of PackedVector)
        self.S: dict[int, int] = {}  # exception dict (sorted views on demand)
        self.B = 0
        self.lower_bound = 0
        self.min_value_count = m
        self.compress_count = 0
        self.rebase_count = 0

    # -- observers ---------------------------------------------------------
    def get(self, j: int) -> int:
        return self.S[j] if j in self.S else self.off[j] + self.B

    def registers(self) -> np.ndarray:
        return np.array([self.get(j) for j in range(self.m)], dtype=np.uint8)

    def bit_size(self) -> int:
        return self.m * self.m_bits + len(self.S) * (self.log_m + self.s_bits)

    def estimate(self) -> float:
        from .hll import estimate

        return estimate(self.registers())

    # -- mutators ----------------------------------------------------------
    def add_jr(self, j: int, r: int) -> None:
        """HyperLogLogLog.hpp:108-138."""
        if r <= self.lower_bound:
            return
        updated = False
        size_increased = False
        in_s = j in self.S
        r0 = self.S[j] if in_s else self.off[j] + self.B
        if r0 < r:
            if self.B <= r <= self.B + self.max_offset:
                if in_s:
                    del self.S[j]
                self.off[j] = (r - self.B) & self.max_offset
            else:
                size_increased = not in_s
                self.S[j] = r
            if r0 == self.lower_bound:
                self.min_value_count -= 1
            updated = True
        if (
            (updated and self.flags & COMPRESS_WHEN_ALWAYS)
            or (size_increased and self.flags & COMPRESS_WHEN_APPEND)
            or (self.min_value_count == 0 and self.flags == COMPRESS_BOTTOM)
        ):
            self._compress()

    def add_hash(self, x: int) -> None:
        from .hashing import jr_from_hash

        j, r = jr_from_hash(np.array([x], dtype=np.uint64), self.log_m)
        self.add_jr(int(j[0]), int(r[0]))

    def _iter_values(self):
        for j in range(self.m):
            yield self.S[j] if j in self.S else self.off[j] + self.B

    def _compress(self) -> None:
        if self.flags & COMPRESS_TYPE_FULL:
            self._compress_full()
        elif self.flags & COMPRESS_TYPE_INCREASE:
            self._compress_increase()
        elif self.flags == COMPRESS_BOTTOM:
            self._compress_bottom()
        self.compress_count += 1

    def _compress_full(self) -> None:
        """Full base search with cumulative early exit
        (HyperLogLogLog.hpp:417-458): scan candidate bases ascending from the
        minimum register value; nBelowB (a running count of registers whose
        value has fallen below the scan point) lower-bounds every later
        candidate's exception count, so the loop stops as soon as it reaches
        the best seen.  Ties keep the incumbent base."""
        vals = list(self._iter_values())
        best_ns = len(self.S)
        best_base = self.B
        potential = min(vals)
        self.lower_bound = potential
        n_below = 0
        while n_below < best_ns and potential < (1 << self.s_bits):
            next_potential = 1 << self.s_bits
            ns = 0
            for r in vals:
                if r < potential or r > potential + self.max_offset:
                    ns += 1
                if r == potential:
                    n_below += 1
                if potential < r < next_potential:
                    next_potential = r
            if ns < best_ns:
                best_ns = ns
                best_base = potential
            potential = next_potential
        if best_base != self.B:
            self._rebase(best_base)

    def _compress_increase(self) -> None:
        """HyperLogLogLog.hpp:462-480 — only consider raising the base to the
        next distinct value above it."""
        vals = list(self._iter_values())
        potential = 1 << self.s_bits
        self.lower_bound = min(vals)
        for r in vals:
            if self.B < r < potential:
                potential = r
        ns = sum(1 for r in vals if r < potential or r > potential + self.max_offset)
        if ns < len(self.S):
            self._rebase(potential)

    def _compress_bottom(self) -> None:
        """HyperLogLogLog.hpp:484-498 — keep B = min register value."""
        vals = list(self._iter_values())
        self.lower_bound = min(vals)
        self.min_value_count = sum(1 for r in vals if r == self.lower_bound)
        if self.lower_bound > self.B:
            self._rebase(self.lower_bound)

    def _rebase(self, new_b: int) -> None:
        """HyperLogLogLog.hpp:362-377."""
        for i in range(self.m):
            in_s = i in self.S
            r = self.S[i] if in_s else self.off[i] + self.B
            if new_b <= r <= new_b + self.max_offset:
                self.off[i] = (r - new_b) & self.max_offset
                if in_s:
                    del self.S[i]
            else:
                self.S[i] = r
        self.B = new_b
        self.rebase_count += 1

    # -- algebra -----------------------------------------------------------
    def merge(self, other: "HLLLStateMachine") -> "HLLLStateMachine":
        """Register-wise max then a final compress
        (HyperLogLogLog.hpp:192-283; the reference walks both exception lists
        with two pointers — the resulting state is the register-wise max,
        routed through the same M/S split and compress, which is what we
        compute here)."""
        if self.m != other.m:
            raise ValueError("register count mismatch")
        if self.m_bits != other.m_bits or self.flags != other.flags:
            raise ValueError("parameter mismatch")
        out = HLLLStateMachine(self.m, self.m_bits, self.flags)
        out.B = max(self.B, other.B)
        for j in range(self.m):
            r = max(self.get(j), other.get(j))
            if out.B <= r <= out.B + out.max_offset:
                out.off[j] = (r - out.B) & out.max_offset
            else:
                out.S[j] = r
        out._compress()
        out.compress_count = 1
        return out

    @classmethod
    def from_registers(
        cls, M: np.ndarray, m_bits: int = 3, flags: int = COMPRESS_DEFAULT
    ) -> "HLLLStateMachine":
        """fromHyperLogLog (HyperLogLogLog.hpp:322-331): feed each register
        through add_jr in index order."""
        sm = cls(len(M), m_bits, flags)
        for j, r in enumerate(np.asarray(M)):
            sm.add_jr(j, int(r))
        return sm
