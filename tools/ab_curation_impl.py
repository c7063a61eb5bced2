"""A/B the two repetition_features implementations on the q17 workload.

VERDICT r4 flagged q17 (arrow-path curation) spreading 4.7-26s across
runs of identical code.  This runs impl='arrow' and impl='expr' on the
SAME 500k-page sample in the SAME session, interleaved, >= 5 timed reps
each, and prints per-rep times + median/min/max/spread so the default
for full-corpus runs is backed by numbers (PLANS.md).

Usage: python tools/ab_curation_impl.py [reps]
"""

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from hllspark import curation
from hllspark import io as hio

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab-curation-impl")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages_path = "/tmp/hllspark_bench_pages_2000000"
    if not os.path.exists(f"{pages_path}/_SUCCESS"):
        hio.generate_pages(spark, 2_000_000, num_partitions=2 * CPUS).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages_500k = (
        spark.read.parquet(pages_path)
        .where(F.pmod(F.xxhash64("url"), F.lit(4)) == 0)
        .select("lang", "text")
        .cache()
    )
    n = pages_500k.count()

    def run(impl: str) -> float:
        t0 = time.perf_counter()
        curation.pii_features(
            curation.repetition_features(pages_500k, ngram_ns=(2,), impl=impl)
        ).groupBy("lang").agg(
            F.count(F.lit(1)),
            F.avg("dup_word_frac"),
            F.avg("top2gram_char_frac"),
            F.sum("pii_total"),
        ).collect()
        return time.perf_counter() - t0

    # warm both paths once, then interleave timed reps (interleaving
    # means any slow host phase hits both arms equally)
    run("expr")
    run("arrow")
    times: dict[str, list[float]] = {"expr": [], "arrow": []}
    for _ in range(REPS):
        for impl in ("arrow", "expr"):
            times[impl].append(round(run(impl), 3))

    report = {"n_docs": n, "reps": REPS}
    for impl, ts in times.items():
        s = sorted(ts)
        report[impl] = {
            "times": ts,
            "median": s[len(s) // 2],
            "min": s[0],
            "max": s[-1],
            "spread": round(s[-1] / s[0], 2),
        }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
