"""Two-parallelism-level scaling probe for hashed TF-IDF vectorization
(text.hashed_tfidf) — the north_rule N -> 4N protocol applied to the
round-5 text->embedding bridge: same job, same input, local[8] vs
local[32], fresh JVM per level, plus the empty-codegen platform ceiling
(range -> xxhash64 -> max) measured at BOTH levels in the same sessions
(see BENCH/BASELINE.md "Scaling-efficiency protocol" and
tools/scaling_html_extract.py, whose structure this mirrors).

Unlike the extraction probe (zero exchanges), tfidf is a SHUFFLING
operator — two dim-bounded exchanges plus two broadcasts plus an Arrow
scatter stage — so its efficiency number speaks for the coordination-
heavy shape, not just scan CPU.

Usage:
  python tools/scaling_tfidf.py             # parent: both levels
  python tools/scaling_tfidf.py --worker N  # internal
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

N_ROWS = int(os.environ.get("HLLSPARK_TFIDF_ROWS", str(200_000)))
DIM = int(os.environ.get("HLLSPARK_TFIDF_DIM", "256"))
FIXTURE = os.path.join(REPO, ".bench_data", f"pages_html_{N_ROWS}")
REPS = int(os.environ.get("HLLSPARK_TFIDF_REPS", "3"))
CEILING_ROWS = 8_000_000_000
LEVELS = (8, 32)


def _worker(cpus: int) -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from hllspark import text as htext

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
        .select("text")
        .withColumn("rid", F.xxhash64("text"))
    )

    def job():
        out = htext.hashed_tfidf(
            pages, text_col="text", id_col="rid", dim=DIM, attach=False
        )
        return out.select(
            F.max(
                F.aggregate(
                    F.transform("tfidf", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, b: a + b,
                )
            )
        ).collect()

    def ceiling():
        spark.range(CEILING_ROWS, numPartitions=512).select(
            F.max(F.xxhash64("id"))
        ).collect()

    out = {}
    for name, fn, rows in (
        ("ceiling", ceiling, CEILING_ROWS),
        ("tfidf", job, N_ROWS),
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
            raise SystemExit("usage: scaling_tfidf.py --worker <cpus>")
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
        "metric": "hashed_tfidf N->4N scaling (local[8] vs local[32])",
        "rows": N_ROWS,
        "dim": DIM,
        "levels": levels,
        "raw_efficiency": {j: eff(j) for j in ("ceiling", "tfidf")},
        "engine_relative_efficiency": round(
            eff("tfidf") / eff("ceiling"), 3
        ),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
