"""Optional JVM fast path for the HLL register build.

The declarative SQL build (hllspark.agg impl='sql') pays a per-row
HashAggregate probe on (keys, j); Spark's own approx_count_distinct avoids
that with an imperative register buffer.  java/src/hllspark/
HllRegAggregator.java is the same trick for OUR register semantics: a typed
Aggregator whose buffer is the dense byte[m] register array, planned as
ObjectHashAggregate with partial aggregation (one m-byte buffer per group
per map task crosses the shuffle).  Measured on local[32], 20M rows: the
JVM build runs at ~0.95-1.1x Spark's built-in HLL++ (vs 3.2x slower for the
SQL formulation) and produces byte-identical registers to impl='sql' /
impl='pandas' (same jr_split convention; pytest-gated).

Availability: the pre-built jar ships at hllspark/jars/hllspark-jvm.jar
(source + build script under java/); it must be on the DRIVER classpath at
JVM launch — e.g.::

    SparkSession.builder
      .config("spark.driver.extraClassPath", hllspark.jvmagg.jar_path())
      .config("spark.jars", hllspark.jvmagg.jar_path())   # executors

Sessions without the jar (e.g. an externally-created SparkSession) simply
report ``is_available() == False`` and hllspark.agg falls back to the pure
SQL plan — results are identical either way, only speed differs.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Column, SparkSession

_AGG_CLASS = "hllspark.HllRegAggregator"
_availability: dict[str, bool] = {}
_registered: set[tuple[str, int]] = set()


def jar_path() -> str:
    return os.path.join(os.path.dirname(__file__), "jars", "hllspark-jvm.jar")


def _session_key(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


def is_available(spark: SparkSession) -> bool:
    """True iff the aggregator class is loadable in this session's JVM.
    Probed once per application (instantiation attempt via py4j)."""
    key = _session_key(spark)
    if key not in _availability:
        try:
            spark._jvm.hllspark.HllRegAggregator(4)  # ctor validates p
            _availability[key] = True
        except Exception:
            _availability[key] = False
    return _availability[key]


def register(spark: SparkSession, p: int) -> str:
    """Register (idempotently) the register-build UDAF for precision ``p``
    and return its SQL function name."""
    name = f"hllspark_regs_p{p}"
    key = (_session_key(spark), p)
    if key in _registered:
        return name
    if not is_available(spark):
        raise RuntimeError(
            "hllspark JVM fast path unavailable: put "
            f"{jar_path()} on spark.driver.extraClassPath (see "
            "hllspark.jvmagg docstring)"
        )
    jvm = spark._jvm
    udaf = jvm.org.apache.spark.sql.functions.udaf(
        jvm.hllspark.HllRegAggregator(p),
        jvm.org.apache.spark.sql.Encoders.LONG(),
    )
    spark._jsparkSession.udf().register(name, udaf)
    _registered.add(key)
    return name


def regs_agg_column(spark: SparkSession, p: int, hash_col: str) -> Column:
    """Aggregate expression building the raw dense byte[2^p] register array
    from a bigint hash column."""
    return F.expr(f"{register(spark, p)}(`{hash_col}`)")
