"""Two-parallelism-level scaling probe for PageRank (crawl.pagerank) —
the north_rule N -> 4N protocol applied to the iterative-join shape:
same job, same input, local[8] vs local[32], fresh JVM per level, plus
the empty-codegen platform ceiling measured at BOTH levels in the same
sessions (protocol identical to tools/scaling_html_extract.py /
scaling_tfidf.py; see BENCH/BASELINE.md "Scaling-efficiency protocol").

PageRank is the most coordination-bound shape in the engine — per
iteration one join + one aggregate + a 1-row collect + a
localCheckpoint barrier — so its number bounds the family from below.

Usage:
  python tools/scaling_pagerank.py             # parent: both levels
  python tools/scaling_pagerank.py --worker N  # internal
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

N_EDGES = int(os.environ.get("HLLSPARK_PR_EDGES", str(8_000_000)))
N_NODES = int(os.environ.get("HLLSPARK_PR_NODES", str(400_000)))
ITERS = int(os.environ.get("HLLSPARK_PR_ITERS", "3"))
FIXTURE = os.path.join(REPO, ".bench_data", f"edges_{N_EDGES}_{N_NODES}")
REPS = int(os.environ.get("HLLSPARK_PR_REPS", "3"))
CEILING_ROWS = 8_000_000_000
LEVELS = (8, 32)


def _worker(cpus: int) -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from hllspark import crawl

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(FIXTURE)

    def job():
        return (
            crawl.pagerank(edges, iters=ITERS, num_partitions=cpus)
            .agg(F.sum("rank"))
            .collect()
        )

    def ceiling():
        spark.range(CEILING_ROWS, numPartitions=512).select(
            F.max(F.xxhash64("id"))
        ).collect()

    out = {}
    for name, fn, rows in (
        ("ceiling", ceiling, CEILING_ROWS),
        ("pagerank", job, N_EDGES * ITERS),
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
            raise SystemExit("usage: scaling_pagerank.py --worker <cpus>")
        _worker(int(sys.argv[2]))
        return

    if not os.path.exists(os.path.join(FIXTURE, "_SUCCESS")):
        import pyspark.sql.functions as F
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(N_EDGES).select(
            (F.col("id") % N_NODES).cast("string").alias("src"),
            ((F.col("id") * 2654435761) % N_NODES).cast("string").alias("dst"),
        ).repartition(64).write.mode("overwrite").parquet(FIXTURE)
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
        "metric": "pagerank N->4N scaling (local[8] vs local[32])",
        "edges": N_EDGES,
        "nodes": N_NODES,
        "iters": ITERS,
        "levels": levels,
        "raw_efficiency": {j: eff(j) for j in ("ceiling", "pagerank")},
        "engine_relative_efficiency": round(
            eff("pagerank") / eff("ceiling"), 3
        ),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
