"""Dynamic bit-packed unsigned-int vector — the reference's PackedVector
storage primitive (PackedVector.hpp:109-219) completed on the Python side.

The engine keeps in-flight register state as plain numpy uint8 (decode cost
beats the 2 idle bits — see hllspark.sketch), so round 1 ported only the
pack/unpack boundary (sketch.pack_uints).  This class supplies the
remaining dynamic surface for parity: O(1) get/set with the reference's
store-time value mask (PackedVector.hpp:130), amortized append with
capacity doubling (PackedVector.hpp:156-170), and O(n) insert/erase that
shift the packed tail (PackedVector.hpp:178-219 — the reference memmoves
words; we repack the tail, same asymptotics).

Storage layout: element i occupies bits [i*w, (i+1)*w) of a uint64 word
array, LSB-first within and across words (the reference's little-endian
word layout).  Values may straddle a word boundary.
"""

from __future__ import annotations

import numpy as np

_WORD = 64


class PackedVector:
    def __init__(self, width: int, capacity: int = 0):
        if not 1 <= width <= 63:
            raise ValueError("width must be in [1, 63]")
        self.width = width
        self._mask = np.uint64((1 << width) - 1)
        self._n = 0
        self._words = np.zeros(
            (capacity * width + _WORD - 1) // _WORD, dtype=np.uint64
        )

    # -- size/capacity ------------------------------------------------------

    def __len__(self) -> int:
        return self._n

    @property
    def capacity(self) -> int:
        return (len(self._words) * _WORD) // self.width

    def _ensure_capacity(self, n: int) -> None:
        need_words = (n * self.width + _WORD - 1) // _WORD
        if need_words <= len(self._words):
            return
        new_len = max(need_words, 2 * len(self._words), 1)
        grown = np.zeros(new_len, dtype=np.uint64)
        grown[: len(self._words)] = self._words
        self._words = grown

    # -- O(1) element access ------------------------------------------------

    def get(self, i: int) -> int:
        if not 0 <= i < self._n:
            raise IndexError(i)
        bit = i * self.width
        w, off = divmod(bit, _WORD)
        off = np.uint64(off)
        v = self._words[w] >> off
        spill = int(off) + self.width - _WORD
        if spill > 0:
            v |= self._words[w + 1] << np.uint64(_WORD - int(off))
        return int(v & self._mask)

    def set(self, i: int, value: int) -> None:
        if not 0 <= i < self._n:
            raise IndexError(i)
        v = np.uint64(value) & self._mask  # store-time mask, never a check
        bit = i * self.width
        w, off = divmod(bit, _WORD)
        off64 = np.uint64(off)
        self._words[w] = (self._words[w] & ~(self._mask << off64)) | (v << off64)
        spill = off + self.width - _WORD
        if spill > 0:
            keep = np.uint64(_WORD - off)
            self._words[w + 1] = (
                self._words[w + 1] & ~(self._mask >> keep)
            ) | (v >> keep)

    # -- dynamic ops --------------------------------------------------------

    def append(self, value: int) -> None:
        self._ensure_capacity(self._n + 1)
        self._n += 1
        self.set(self._n - 1, value)

    def insert(self, i: int, value: int) -> None:
        """Shift elements [i, n) right by one slot, then store at i."""
        if not 0 <= i <= self._n:
            raise IndexError(i)
        tail = self.to_numpy()[i:]
        self._ensure_capacity(self._n + 1)
        self._n += 1
        for k, tv in enumerate(tail, start=i + 1):
            self.set(k, int(tv))
        self.set(i, value)

    def erase(self, i: int) -> None:
        """Remove element i, shifting [i+1, n) left by one slot."""
        if not 0 <= i < self._n:
            raise IndexError(i)
        tail = self.to_numpy()[i + 1 :]
        for k, tv in enumerate(tail, start=i):
            self.set(k, int(tv))
        self._n -= 1
        # clear the vacated slot so packed bytes stay canonical
        bit = self._n * self.width
        w, off = divmod(bit, _WORD)
        off64 = np.uint64(off)
        self._words[w] &= ~(self._mask << off64)
        if off + self.width > _WORD:
            self._words[w + 1] &= ~(self._mask >> np.uint64(_WORD - off))

    # -- bulk conversion ----------------------------------------------------

    def to_numpy(self) -> np.ndarray:
        bits = np.unpackbits(
            self._words.astype("<u8").view(np.uint8), bitorder="little"
        )[: self._n * self.width]
        if self._n == 0:
            return np.zeros(0, dtype=np.uint64)
        shifts = np.arange(self.width, dtype=np.uint64)
        return (bits.reshape(self._n, self.width).astype(np.uint64) << shifts).sum(
            axis=1, dtype=np.uint64
        )

    @classmethod
    def from_numpy(cls, values: np.ndarray, width: int) -> "PackedVector":
        pv = cls(width, capacity=len(values))
        for v in np.asarray(values, dtype=np.uint64):
            pv.append(int(v))
        return pv


class PackedMap:
    """Sorted bit-packed key/value map — the reference's PackedMap
    (PackedMap.hpp:39-117): two parallel PackedVectors (keys ascending,
    values aligned), O(log n) membership via binary search over the packed
    keys, O(n) upsert/erase via the vectors' tail shift.  This is the
    exception dictionary of the HyperLogLogLog sketch; the engine keeps
    exceptions as numpy arrays in flight (hllspark.sketch serializes the
    same sorted layout), so like PackedVector this class exists for full
    storage-primitive parity, mirrored by the reference's randomized
    std::map-equivalence test (test.cpp:322-423)."""

    def __init__(self, key_width: int, value_width: int):
        self._keys = PackedVector(key_width)
        self._vals = PackedVector(value_width)

    def __len__(self) -> int:
        return len(self._keys)

    def _lower_bound(self, key: int) -> int:
        lo, hi = 0, len(self._keys)
        while lo < hi:
            mid = (lo + hi) // 2
            if self._keys.get(mid) < key:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def __contains__(self, key: int) -> bool:
        i = self._lower_bound(key)
        return i < len(self._keys) and self._keys.get(i) == key

    def get(self, key: int, default=None):
        i = self._lower_bound(key)
        if i < len(self._keys) and self._keys.get(i) == key:
            return self._vals.get(i)
        return default

    def set(self, key: int, value: int) -> None:
        """Upsert preserving ascending key order (the sortedness invariant
        the reference asserts after every mutation, test.cpp:420-422)."""
        i = self._lower_bound(key)
        if i < len(self._keys) and self._keys.get(i) == key:
            self._vals.set(i, value)
            return
        self._keys.insert(i, key)
        self._vals.insert(i, value)

    def erase(self, key: int) -> bool:
        i = self._lower_bound(key)
        if i < len(self._keys) and self._keys.get(i) == key:
            self._keys.erase(i)
            self._vals.erase(i)
            return True
        return False

    def keys(self) -> np.ndarray:
        return self._keys.to_numpy()

    def values(self) -> np.ndarray:
        return self._vals.to_numpy()
