"""The measure/inputgenerator CLI pair (reference measure.cpp +
inputgenerator.cpp): wire-format pipe end-to-end, 5-line report format,
CLI validations, and query-vs-merge consistency."""

import subprocess
import sys

import numpy as np

from hllspark import hashing, hll, inputgenerator, sketch


def _run(gen_args, measure_args):
    blob = inputgenerator.generate(*gen_args)
    proc = subprocess.run(
        [sys.executable, "-m", "hllspark.measure", *measure_args],
        input=blob,
        capture_output=True,
    )
    assert proc.returncode == 0, proc.stderr.decode()
    lines = proc.stdout.decode().strip().split("\n")
    assert [ln.split()[0] for ln in lines] == [
        "time", "estimate", "bitsize", "compressCount", "rebaseCount"
    ]
    return {ln.split()[0]: float(ln.split()[1]) for ln in lines}


def test_query_matches_numpy_oracle():
    n, m = 20000, 1024
    rep = _run((n, "uint64", 42), ["query", "hyperloglog", "uint64", str(m), str(n)])
    xs = inputgenerator.generate(n, "uint64", 42)
    vals = np.frombuffer(xs, dtype=">u8").astype(np.uint64)
    M = hll.update_hashes(hll.empty(10), hashing.fingerprint64(vals))
    assert rep["estimate"] == round(float(hll.estimate(M)), 6)
    assert rep["bitsize"] == 6 * m


def test_merge_equals_query_estimate():
    n, m = 10000, 512
    q = _run((n, "uint64", 7), ["query", "hyperlogloglog", "uint64", str(m), str(n)])
    g = _run((n, "uint64", 7), ["merge", "hyperlogloglog", "uint64", str(m), str(n)])
    assert q["estimate"] == g["estimate"]  # merge(A,B) == union-fed
    assert q["bitsize"] == g["bitsize"]


def test_statemachine_engine_counters():
    n, m = 2000, 256
    rep = _run(
        (n, "jr", 5, 8, m),
        ["query", "hyperlogloglog", "jr", str(m), str(n), "--engine", "statemachine"],
    )
    assert rep["compressCount"] >= 1


def test_cli_validations():
    for bad in (
        ["query", "hyperloglog", "uint64", "1000", "10"],   # m not power of 2
        ["merge", "hashonly", "uint64", "1024", "10"],      # hashonly merge
        ["query", "hashonly", "jr", "1024", "10"],          # hashonly jr
        ["query", "str", "str", "1024", "10"],              # bad algo
    ):
        proc = subprocess.run(
            [sys.executable, "-m", "hllspark.measure", *bad],
            input=b"", capture_output=True,
        )
        assert proc.returncode != 0


def test_generator_deterministic():
    assert inputgenerator.generate(100, "uint64", 9) == inputgenerator.generate(
        100, "uint64", 9
    )
    assert inputgenerator.generate(100, "str", 9, 8) != inputgenerator.generate(
        100, "str", 10, 8
    )


def test_spark_engine_estimate_parity():
    """The distributed engine must produce the exact numpy-engine estimate
    (same hash chain, same registers) for the same piped input."""
    n, m = 5000, 1024
    numpy_rep = _run((n, "uint64", 3), ["query", "hyperloglog", "uint64", str(m), str(n)])
    spark_rep = _run(
        (n, "uint64", 3),
        ["merge", "hyperloglog", "uint64", str(m), str(n), "--engine", "spark"],
    )
    assert spark_rep["estimate"] == numpy_rep["estimate"]
    assert spark_rep["bitsize"] == numpy_rep["bitsize"]


def test_apache_hll_baseline():
    """Comparison baseline through the same CLI protocol (reference ships
    these as separate binaries): DataSketches HLL via Spark built-ins."""
    n, m = 20000, 4096
    rep = _run((n, "uint64", 5), ["query", "apache-hll", "uint64", str(m), str(n)])
    assert abs(rep["estimate"] - n) / n < 0.05
    assert rep["bitsize"] > 0


def _run_cpc(gen_args, measure_args):
    blob = inputgenerator.generate(*gen_args)
    proc = subprocess.run(
        [sys.executable, "-m", "hllspark.measure", *measure_args],
        input=blob,
        capture_output=True,
    )
    assert proc.returncode == 0, proc.stderr.decode()
    lines = proc.stdout.decode().strip().split("\n")
    assert [ln.split()[0] for ln in lines] == [
        "time", "estimate", "bitsize", "compressCount", "rebaseCount",
        "cpcEntropyBits",
    ]
    return {ln.split()[0]: float(ln.split()[1]) for ln in lines}


def test_cpc_cli_reports_entropy_bound():
    """cpc mode: 5-line protocol + cpcEntropyBits (arithmetic-coder size
    bound, the apples-to-apples column vs DataSketches CPC bitsizes).
    The bound must be positive, below the dense-matrix ceiling, and below
    the DEFLATE transport size at sketch-sparse cardinalities."""
    n, k = 20000, 2048
    rep = _run_cpc((n, "uint64", 42), ["query", "cpc", "uint64", str(k), str(n)])
    from hllspark.sketches import cpc

    assert abs(rep["estimate"] / n - 1.0) < 5 * cpc.rse(k)
    assert 0 < rep["cpcEntropyBits"] < 64 * k
    assert rep["cpcEntropyBits"] < rep["bitsize"]
    # merge protocol: merge(A, B) == union-fed build, same report
    gm = _run_cpc((n, "uint64", 42), ["merge", "cpc", "uint64", str(k), str(n)])
    assert gm["estimate"] == rep["estimate"]
    assert gm["cpcEntropyBits"] == rep["cpcEntropyBits"]
