"""Two-parallelism-level scaling probe for the priority-sampling sketch
(sketches.priority.sample_agg) — the north_rule N -> 4N protocol:
same job, same input, local[8] vs local[32], fresh JVM per level, plus
the empty-codegen platform ceiling (range -> xxhash64 -> max) measured
at BOTH levels in the same sessions (see BENCH/BASELINE.md
"Scaling-efficiency protocol"; structure mirrors tools/scaling_tfidf.py).

The shape under test: parquet scan -> md5-priority codegen column ->
mapInPandas top-k partial per (partition, lang) -> grouped merge of
serialized k-item sketches.  The shuffle carries ONE sketch row per
(partition, lang) — ~28 KB each at k=1024 — so the op should scale like
the scan, not like a data shuffle; this probe evidences that.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

N_ROWS = int(os.environ.get("HLLSPARK_PSAMPLE_ROWS", str(1_000_000)))
K = int(os.environ.get("HLLSPARK_PSAMPLE_K", "1024"))
FIXTURE = os.path.join(REPO, ".bench_data", f"pages_html_{N_ROWS}")
REPS = int(os.environ.get("HLLSPARK_PSAMPLE_REPS", "3"))
CEILING_ROWS = 8_000_000_000
LEVELS = (8, 32)


def _worker(cpus: int) -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from hllspark.sketches import priority

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = (
        spark.read.parquet(FIXTURE)
        .select("url", "lang", F.length("text").cast("double").alias("w"))
    )

    def job():
        return (
            priority.sample_agg(pages, "url", "w", k=K, keys=["lang"], seed=3)
            .select(F.sum(F.length("sketch")))
            .collect()
        )

    def ceiling():
        spark.range(CEILING_ROWS, numPartitions=512).select(
            F.max(F.xxhash64("id"))
        ).collect()

    out = {}
    for name, fn, rows in (
        ("ceiling", ceiling, CEILING_ROWS),
        ("psample", job, N_ROWS),
    ):
        fn()
        fn()  # two warm-ups (JVM C2 + page cache)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        out[name] = {
            "median_s": round(med, 4),
            "rows_per_sec": round(rows / med),
            "reps_s": [round(t, 4) for t in ts],
        }
    print("WORKER_JSON:" + json.dumps({"cpus": cpus, "jobs": out}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        if len(sys.argv) < 3:
            raise SystemExit("usage: scaling_priority.py --worker <cpus>")
        _worker(int(sys.argv[2]))
        return

    if not os.path.exists(os.path.join(FIXTURE, "_SUCCESS")):
        from pyspark.sql import SparkSession

        from hllspark import io as hio

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        hio.generate_pages(spark, N_ROWS, num_partitions=256).write.mode(
            "overwrite"
        ).parquet(FIXTURE)
        spark.stop()

    levels = {}
    for cpus in LEVELS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = next(
            (l for l in r.stdout.splitlines() if l.startswith("WORKER_JSON:")),
            None,
        )
        if line is None:
            sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
            raise SystemExit(f"worker {cpus} failed")
        levels[cpus] = json.loads(line[len("WORKER_JSON:"):])["jobs"]

    lo, hi = LEVELS

    def eff(job: str) -> float:
        return round(
            (levels[hi][job]["rows_per_sec"] / levels[lo][job]["rows_per_sec"])
            / (hi / lo),
            3,
        )

    report = {
        "metric": "priority_sample N->4N scaling (local[8] vs local[32])",
        "rows": N_ROWS,
        "k": K,
        "levels": levels,
        "raw_efficiency": {j: eff(j) for j in ("ceiling", "psample")},
        "engine_relative_efficiency": round(
            eff("psample") / eff("ceiling"), 3
        ),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
