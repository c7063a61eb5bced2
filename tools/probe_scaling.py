"""Diagnostic: which stage limits 8->32-core scaling?  Times three jobs at
one parallelism level (run via subprocess per level):
  range_hash   — spark.range -> xxhash64 -> sum  (no scan: scheduler + CPU)
  scan_hash    — pages parquet -> xxhash64(url) -> sum  (adds parquet decode)
  scan_agg     — pages parquet -> groupBy(lang, j).max(r)  (adds hash agg)
Usage: python tools/probe_scaling.py <cpus>
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

CPUS = int(sys.argv[1])
FIXTURE = os.path.join(REPO, ".bench_data", "pages_32m")
RANGE_N = 2_000_000_000

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

base = spark.read.parquet(FIXTURE)
pages = base
for _ in range(7):
    pages = pages.union(base)

from hllspark import agg as hagg  # noqa: E402


def range_hash():
    spark.range(RANGE_N, numPartitions=8 * CPUS).select(
        F.max(F.xxhash64("id"))
    ).collect()


def scan_hash():
    pages.select(F.max(F.xxhash64("url"))).collect()


def scan_agg():
    hagg._maxed_registers_sql(pages, "url", ["lang"], 14, "xxhash64").select(
        F.count("*")
    ).collect()


for name, fn, rows in (
    ("range_hash", range_hash, RANGE_N),
    ("scan_hash", scan_hash, 256_000_000),
    ("scan_agg", scan_agg, 256_000_000),
):
    fn()
    best = min(
        (lambda: (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter()))()
        for _ in range(3)
    )
    print(f"{name} cpus={CPUS} sec={best:.3f} rows_per_sec={rows/best:,.0f}",
          flush=True)
spark.stop()
