"""Two-parallelism-level scaling probe for Y4M video frame sampling
(multimodal.frame_sample_stats) — the north_rule N -> 4N protocol:
same job, same input, local[8] vs local[32], fresh JVM per level, plus
the empty-codegen platform ceiling (range -> xxhash64 -> max) measured
at BOTH levels in the same sessions (see BENCH/BASELINE.md
"Scaling-efficiency protocol"; structure mirrors tools/scaling_priority.py).

The shape under test: parquet scan of whole video objects -> per-object
header-token parse + FRAME-marker walk (O(1) per frame header) ->
every-6th luma plane sliced and reduced.  Each video decodes
independently and the only shuffle is the final 1-row agg, so the op
should scale like the scan; this probe evidences that.

LEVELS is (4, 16) — the same 4x factor as the other probes' (8, 32) —
because payload-heavy Python stages keep TWO threads busy per task (the
JVM Arrow serializer and the Python worker), so 32 concurrent tasks on
this 32-vCPU VM means 64 runnable threads and the host's scheduler
falls off a cliff (measured: local[16] 1.1-1.7 s stable, local[32]
16-48 s with 2x spread — full matrix in PLANS §53).  4 -> 16 measures
the same scaling factor below that oversubscription knee; on a real
cluster the equivalent guidance is executor cores x python pipes <=
node vCPUs (or spark.task.cpus=2 for these stages).
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

N_VIDEOS = int(os.environ.get("HLLSPARK_Y4M_VIDEOS", "4000"))
EVERY_N = 6
W, H, NF = 128, 72, 36
FIXTURE = os.path.join(REPO, ".bench_data", f"y4m_{N_VIDEOS}")
REPS = int(os.environ.get("HLLSPARK_Y4M_REPS", "5"))
CEILING_ROWS = 8_000_000_000
LEVELS = (4, 16)
SAMPLED_FRAMES = N_VIDEOS * ((NF + EVERY_N - 1) // EVERY_N)


def _worker(cpus: int) -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from hllspark import multimodal as mm

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # payload-heavy Arrow: at ~331 KB/video, default 10k-row batches
        # would be ~3 GB — bound batches to ~5 MB and split the scan into
        # ~16 MB input partitions so BOTH levels have even, small tasks
        # (first probe version measured local[32] SLOWER than local[8]
        # purely from 24 oversized partitions + giant Arrow batches)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    videos = spark.read.parquet(FIXTURE)

    def job():
        return (
            mm.frame_sample_stats(videos, every_n=EVERY_N)
            .agg(F.sum("luma_sum"), F.count(F.lit(1)))
            .collect()
        )

    def ceiling():
        spark.range(CEILING_ROWS, numPartitions=512).select(
            F.max(F.xxhash64("id"))
        ).collect()

    out = {}
    for name, fn, rows in (
        ("ceiling", ceiling, CEILING_ROWS),
        ("y4m_frames", job, SAMPLED_FRAMES),
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
            raise SystemExit("usage: scaling_y4m.py --worker <cpus>")
        _worker(int(sys.argv[2]))
        return

    if not os.path.exists(os.path.join(FIXTURE, "_SUCCESS")):
        from pyspark.sql import SparkSession

        from hllspark import multimodal as mm

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                ids = pdf["id"].to_numpy()
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "payload": [
                            mm.make_y4m(W, H, NF, seed=int(i)) for i in ids
                        ],
                    }
                )

        spark.range(N_VIDEOS, numPartitions=256).mapInPandas(
            gen, "media_id long, payload binary"
        ).write.mode("overwrite").parquet(FIXTURE)
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
        "metric": (
            f"y4m_frame_sample N->4N scaling (local[{lo}] vs local[{hi}], "
            "below the 2-threads-per-task oversubscription knee)"
        ),
        "n_videos": N_VIDEOS,
        "sampled_frames": SAMPLED_FRAMES,
        "levels": levels,
        "raw_efficiency": eff("y4m_frames"),
        "ceiling_efficiency": eff("ceiling"),
        "engine_relative_efficiency": round(
            eff("y4m_frames") / eff("ceiling"), 3
        ),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
