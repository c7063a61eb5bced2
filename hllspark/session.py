"""Session configuration for hllspark jobs, local dev through 100 TB runs.

The sketch plans themselves are size-oblivious (shuffles bounded by
#keys x m rows per map task — see PLANS.md), so nearly all scale tuning
is generic Spark hygiene.  This module encodes it in one place instead of
scattering configs across jobs, and documents WHY each knob matters for
the sketch workload specifically.

Usage:
    spark = configured_builder("my-job", cores=32).getOrCreate()   # local
    spark = apply_cluster_defaults(SparkSession.builder).getOrCreate()
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Configs that matter for the sketch workload at any scale.
SKETCH_DEFAULTS: dict[str, str] = {
    # AQE re-plans at runtime: coalesces the tiny post-aggregate exchanges
    # (<= #keys x m rows) and splits skewed scan partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for every pandas UDF boundary (sketch assembly,
    # estimate, dedup/similarity kernels).  Batch size bounds Python-side
    # peak memory: 64k rows x ~(m + keys) bytes per assembly batch.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Vectorized first-level aggregate hash map: the register aggregate
    # probes (keys, j) per row; the columnar fast map measured ~6% faster
    # than the default row-based first level on the 20M-row grouped build.
    "spark.sql.codegen.aggregate.map.vectorized.enable": "true",
    # Scan-partition sizing: 128 MiB splits keep per-task register maps
    # (<= #keys x m entries of 16 bytes in the partial HashAggregate)
    # far below executor memory even at p=18.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Sketch build is deterministic per input split and merge is
    # commutative/associative, so speculation is SAFE for results — but we
    # disable it in benchmarks for stable timings.  Leave enabled here.
    # Kryo not needed: everything crossing the wire is Tungsten rows.
}

# Additional knobs that only make sense on a real multi-executor cluster.
CLUSTER_DEFAULTS: dict[str, str] = {
    # One shuffle partition per ~2 cores is enough: the only data-sized
    # exchange carries <= #keys x m rows per MAP TASK, so reducer counts
    # scale with key cardinality, not input bytes.  Jobs with very large
    # key domains (url-host grouping) should raise this to cores x 2.
    "spark.sql.shuffle.partitions": "auto",  # AQE initialNum below governs
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "2048",
    # Map-side combine collapses each task's rows to <= #keys x m before
    # the wire, so shuffle compression is cheap and effective.
    "spark.shuffle.compress": "true",
    "spark.io.compression.codec": "zstd",
    # Executor Python workers are reused across pandas-UDF batches.
    "spark.python.worker.reuse": "true",
}


def configured_builder(
    app_name: str = "hllspark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession.Builder:
    """Builder with sketch-workload defaults for local/dev use.

    cores=None -> local[*].  shuffle_partitions defaults to the core count
    (every exchange after the scan is tiny; more would be pure overhead)."""
    import os

    from . import jvmagg

    b = SparkSession.builder.appName(app_name).master(
        f"local[{cores}]" if cores else "local[*]"
    )
    for k, v in SKETCH_DEFAULTS.items():
        b = b.config(k, v)
    if shuffle_partitions or cores:
        b = b.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions or cores)
        )
    if os.path.exists(jvmagg.jar_path()):
        # JVM register-aggregate fast path (impl='jvm' auto-selects);
        # must land on the driver classpath before JVM launch
        b = b.config("spark.driver.extraClassPath", jvmagg.jar_path()).config(
            "spark.jars", jvmagg.jar_path()
        )
    return b


def apply_cluster_defaults(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Layer sketch + cluster defaults onto an externally-managed builder
    (spark-submit provides master/executor sizing; we only set semantics).

    For the JVM fast path under spark-submit, ship the jar yourself:
    ``--jars hllspark/jars/hllspark-jvm.jar --driver-class-path
    hllspark/jars/hllspark-jvm.jar`` (tools/bench_cluster.py does exactly
    this against a real standalone cluster)."""
    for k, v in SKETCH_DEFAULTS.items():
        builder = builder.config(k, v)
    for k, v in CLUSTER_DEFAULTS.items():
        if v != "auto":
            builder = builder.config(k, v)
    return builder
