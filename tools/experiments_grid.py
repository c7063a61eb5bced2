"""Experiment-grid driver — Spark analog of the reference's experiments.py.

The reference composes `inputgenerator | measure {query,merge}` over a grid
of (mode x algo x datatype x m x n) and stores 5-field measurement records
(time / estimate / bitsize / compressCount / rebaseCount) into HDF5, then
flattens to CSV (experiments.py:57-205, data_export.py:9-29,
measure.cpp:154-166).  Here the same grid runs through the Spark engine:

- data: deterministic synthetic columns (seeded, like inputgenerator.cpp
  31-72 — uint64 stream / fixed-length alphanumeric strings), generated as
  Spark SQL expressions so the input is a pure function of (dt, n, seed);
- query mode: time the full build (scan -> hash -> register agg -> sketch);
- merge mode: pre-build per-half sketches (untimed), time only the merge
  (measure.cpp:193-213's split-in-half protocol);
- record sink: one parquet metrics table + CSV flatten (the HDF5/CSV
  analog); compressCount/rebaseCount are properties of the sequential C++
  state machine (exercised in tests/test_hlll.py goldens) and are recorded
  as null here — the vectorized engine compresses once at the boundary.

Usage: python tools/experiments_grid.py [out_dir]  (default .bench_data/grid)
Env:   HLLSPARK_GRID_SMALL=1  -> tiny smoke grid (used by tests)
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

INITIAL_SEED = 0x11E3EA10  # experiments.py:35

SMALL = os.environ.get("HLLSPARK_GRID_SMALL") == "1"
MODES = ("query", "merge")
ALGOS = ("hll", "hlll", "hllzstd", "cpc")
DTS = ("uint64", "str")
MS = (1 << 8, 1 << 12) if SMALL else (1 << 10, 1 << 14)
NS = (1 << 10,) if SMALL else (1 << 12, 1 << 16, 1 << 20)
STR_LEN = 8  # experiments.py:34


def synth(spark: SparkSession, dt: str, n: int, seed: int, parts: int = 32):
    """Seeded synthetic item column as pure SQL exprs (inputgenerator's
    role; not bit-compatible with its mt19937 streams — parity of the
    *sketch layer* against reference bytes is covered by the farmhash
    fixtures in tests)."""
    df = spark.range(n, numPartitions=parts)
    h = F.xxhash64(F.col("id"), F.lit(seed))
    if dt == "uint64":
        return df.select(h.alias("v"))
    # fixed-length alphanumeric string from the hash (62-char alphabet)
    alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    chars = [
        F.substring(
            F.lit(alphabet),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1 + i)), F.lit(62)) + 1
             ).cast("int"),
            1,
        )
        for i in range(STR_LEN)
    ]
    return df.select(F.concat(*chars).alias("v"))


def run_grid(spark: SparkSession, out_dir: str) -> list[dict]:
    from hllspark import agg

    records = []
    seed = INITIAL_SEED
    for mode, algo, dt, m, n in itertools.product(MODES, ALGOS, DTS, MS, NS):
        p = m.bit_length() - 1
        seed += 1  # sequential per instance, experiments.py:41-53
        df = synth(spark, dt, n, seed)
        if algo == "cpc":
            # §2.6 coupon-sketch baseline through the same grid protocol;
            # bitsize = enumerative wire bits (encode_entropy, round 4),
            # entropyBits = the first-order bound it provably stays at or
            # below (+ gamma'd counts) — both comparable to DataSketches
            # CPC's arithmetic-coded sizes
            from hllspark.sketches import cpc as _cpc
            from hllspark.sketches import generic as _generic

            kind = _cpc.kind(m)
            if mode == "query":
                t0 = time.perf_counter()
                blob = bytes(
                    _generic.sketch_agg(df, "v", kind).first()["sketch"]
                )
                dt_sec = time.perf_counter() - t0
            else:
                ids = df.withColumn(
                    "h", F.pmod(F.xxhash64("v", F.lit(3)), F.lit(2)).cast("int")
                )
                halves = _generic.sketch_agg(df=ids, value_col="v", kind=kind,
                                             keys=["h"]).cache()
                states = [
                    _cpc.decode(bytes(r["sketch"])) for r in halves.collect()
                ]
                halves.unpersist()
                t0 = time.perf_counter()
                st = states[0]
                for s in states[1:]:
                    st = _cpc.merge(st, s)
                blob = _cpc.encode(st)
                dt_sec = time.perf_counter() - t0
            st = _cpc.decode(blob)
            records.append(
                {
                    "mode": mode, "algo": algo, "dt": dt, "m": m, "n": n,
                    "seed": seed, "time": round(dt_sec, 5),
                    "estimate": _cpc.estimate(st),
                    "bitsize": 8 * len(_cpc.encode_entropy(st)),
                    "deflateBits": 8 * len(blob),
                    "compressCount": None, "rebaseCount": None,
                    "entropyBits": _cpc.entropy_bound_bits(st),
                }
            )
            print(json.dumps(records[-1]), file=sys.stderr)
            continue
        if mode == "query":
            t0 = time.perf_counter()
            row = agg.sketch_by(df, "v", p=p, algo=algo).first()
            dt_sec = time.perf_counter() - t0
        else:  # merge: build halves untimed, time only the re-merge
            ids = df.withColumn(
                "h", F.pmod(F.xxhash64("v", F.lit(3)), F.lit(2)).cast("int")
            )
            halves = agg.sketch_by(ids, "v", keys=["h"], p=p, algo=algo).cache()
            halves.count()  # materialize builds outside the clock
            t0 = time.perf_counter()
            row = agg.merge_sketches(halves, algo=algo).first()
            dt_sec = time.perf_counter() - t0
            halves.unpersist()
        from hllspark import hll as _hll
        from hllspark import sketch as _sk

        blob = bytes(row["sketch"])
        records.append(
            {
                "mode": mode,
                "algo": algo,
                "dt": dt,
                "m": m,
                "n": n,
                "seed": seed,
                "time": round(dt_sec, 5),
                "estimate": float(_hll.estimate(_sk.decode(blob))),
                "bitsize": _sk.bit_size(blob),
                "compressCount": None,
                "rebaseCount": None,
                "entropyBits": None,
            }
        )
        print(json.dumps(records[-1]), file=sys.stderr)
    os.makedirs(out_dir, exist_ok=True)
    rec_df = spark.createDataFrame(
        records,
        "mode string, algo string, dt string, m long, n long, seed long, "
        "time double, estimate double, bitsize long, "
        "compressCount long, rebaseCount long, entropyBits long",
    )
    rec_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "measurements.parquet")
    )
    # CSV flatten (data_export.py analog)
    rec_df.toPandas().to_csv(os.path.join(out_dir, "measurements.csv"), index=False)
    return records


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".bench_data", "grid"
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hllspark-grid")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    records = run_grid(spark, out_dir)
    ok = all(
        abs(r["estimate"] / min(r["n"], 2**64) - 1.0) <= 3 * 1.04 / (r["m"] ** 0.5)
        for r in records
        if r["n"] >= r["m"] / 4  # skip tiny-n where exact == n anyway holds
    )
    print(json.dumps({"instances": len(records), "all_within_3sigma": ok,
                      "out": out_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
