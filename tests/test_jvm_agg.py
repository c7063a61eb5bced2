"""JVM fast-path (hllspark.jvmagg + java/HllRegAggregator) parity tests.

The jvm impl must be a pure drop-in for impl='sql': byte-identical sketch
serialization, identical estimates, partition invariance.  Skipped when the
pre-built jar is not loadable in the test session.
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from hllspark import agg, jvmagg, sketch
from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_TEST}/events.parquet")


@pytest.fixture(autouse=True)
def _require_jvm(spark):
    if not jvmagg.is_available(spark):
        pytest.skip("hllspark-jvm.jar not on session classpath")


def test_default_impl_resolves_to_jvm(spark, events):
    assert agg._resolve_impl(events, "xxhash64", None) == "jvm"
    assert agg._resolve_impl(events, "farmhash", None) == "pandas"
    assert agg._resolve_impl(events, "xxhash64", "sql") == "sql"


@pytest.mark.parametrize("keys", [None, ["event_type"]])
@pytest.mark.parametrize("algo", ["hll", "hlll", "hllzstd"])
def test_jvm_sketch_byte_identical_to_sql(spark, events, keys, algo):
    def build(impl):
        rows = agg.sketch_by(
            events, "user_id", keys, p=10, algo=algo, impl=impl
        ).collect()
        if keys:
            return {r["event_type"]: bytes(r["sketch"]) for r in rows}
        return {None: bytes(rows[0]["sketch"])}

    assert build("jvm") == build("sql")


def test_jvm_estimate_equals_sql_estimate(spark, events):
    jv = {
        r["event_type"]: r["distinct_estimate"]
        for r in agg.approx_distinct(
            events, "user_id", ["event_type"], p=12, impl="jvm"
        ).collect()
    }
    # sketch-path estimate (numpy estimator over identical registers)
    sq = {
        r["event_type"]: r["distinct_estimate"]
        for r in agg.with_estimate(
            agg.sketch_by(events, "user_id", ["event_type"], p=12, impl="sql")
        ).collect()
    }
    assert jv == sq  # bit-identical doubles: same registers, same estimator


def test_jvm_partition_invariance(spark, events):
    outs = [
        bytes(
            agg.sketch_by(
                events.repartition(parts), "user_id", p=10, impl="jvm"
            ).first()["sketch"]
        )
        for parts in (1, 4, 16)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_jvm_zero_suffix_rank_edge(spark):
    p = 14
    df = spark.createDataFrame(
        [(5 << (64 - p),), ((5 << (64 - p)) | (1 << (64 - p - 3)),)], "v long"
    )
    regs = sketch.decode(
        agg.sketch_by(df, "v", p=p, hash_mode="prehashed", impl="jvm").first()[
            "sketch"
        ]
    )
    assert regs[5] == 64 - p + 1
    assert regs.sum() == 64 - p + 1


def test_jvm_empty_input_is_empty_sketch(spark):
    df = spark.createDataFrame([], "v long")
    est = agg.approx_distinct(df, "v", p=10, impl="jvm").collect()
    assert len(est) == 1 and est[0]["distinct_estimate"] == 0.0


def test_jvm_null_values_ignored(spark):
    df = spark.createDataFrame([(1,), (None,), (2,), (None,)], "v long")
    p = 12
    est = agg.approx_distinct(
        df, "v", p=p, impl="jvm"
    ).first()["distinct_estimate"]
    assert round(est) == 2  # linear-counting regime: exact


def test_raw_registers_api_with_estimate_udf(spark, events):
    """The raw-register building blocks compose: regs_agg_column produces
    dense register bytes whose estimate_raw_udf estimate equals the
    all-in-JVM approx_distinct output bit for bit."""
    projected = events.where(F.col("user_id").isNotNull()).select(
        "event_type", F.xxhash64("user_id").alias("__h")
    )
    regs = projected.groupBy("event_type").agg(
        jvmagg.regs_agg_column(spark, 12, "__h").alias("__regs")
    )
    via_raw = {
        r["event_type"]: r["est"]
        for r in regs.select(
            "event_type", agg.estimate_raw_udf(F.col("__regs")).alias("est")
        ).collect()
    }
    via_jvm = {
        r["event_type"]: r["distinct_estimate"]
        for r in agg.approx_distinct(
            events, "user_id", ["event_type"], p=12, impl="jvm"
        ).collect()
    }
    assert via_raw == via_jvm
