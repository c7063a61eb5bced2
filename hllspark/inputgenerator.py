"""`inputgenerator` CLI — reference inputgenerator.cpp reimplemented.

    python -m hllspark.inputgenerator <n> <datatype> <seed> [--len L] [--m M]

Emits the reference wire format on stdout (big-endian u64 stream /
contiguous fixed-length alphanumeric strings / big-endian u32 (j, r)
pairs), generation distributions per inputgenerator.cpp:31-99:

    uint64  x ~ Uniform[0, 2^64)
    str     each char uniform over the 62-char alphanumeric alphabet
    jr      j ~ Uniform[0, m), r = ceil(-log2(1 - U))  (Geometric(1/2))

Value parity with the reference binary is explicitly NOT claimed: the
reference draws through libstdc++ uniform_int_distribution, whose mapping
from raw engine output to values is implementation-defined. The wire
format, distributions, and determinism-per-seed are the portable contract;
our streams are deterministic per (n, datatype, seed) via numpy MT19937.

Pipe into the measure CLI exactly like the reference harness:

    python -m hllspark.inputgenerator 100000 uint64 299792458 | \
        python -m hllspark.measure query hyperlogloglog uint64 1024 100000
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from . import io as hio

ALPHABET = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789", np.uint8
)


def generate(n: int, dt: str, seed: int, length: int = 8, m: int = 1024) -> bytes:
    rng = np.random.Generator(np.random.MT19937(seed))
    if dt == "uint64":
        xs = rng.integers(0, 1 << 64, n, dtype=np.uint64)
        return hio.wire_encode_uint64(xs)
    if dt == "str":
        idx = rng.integers(0, len(ALPHABET), n * length)
        return ALPHABET[idx].tobytes()
    if dt == "jr":
        j = rng.integers(0, m, n, dtype=np.uint32)
        u = rng.random(n)
        r = np.ceil(-np.log2(1.0 - u)).astype(np.uint32)
        return hio.wire_encode_jr(j, r)
    raise ValueError(f"unknown datatype {dt!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m hllspark.inputgenerator")
    ap.add_argument("n", type=int)
    ap.add_argument("datatype", choices=["uint64", "str", "jr"])
    ap.add_argument("seed", type=int)
    ap.add_argument("--len", type=int, default=8, dest="length")
    ap.add_argument("--m", type=int, default=1024)
    args = ap.parse_args(argv)
    sys.stdout.buffer.write(
        generate(args.n, args.datatype, args.seed, args.length, args.m)
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
