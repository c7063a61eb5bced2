"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (smoke check at sf0.001).
queries()     — one entry per implemented operator from SURVEY.md §2.
oracle_sql()  — DuckDB-equivalent SQL for every SQL-expressible query.

Sketch ESTIMATES are approximate, so they cannot be oracle-checked against
exact SQL values directly; instead each estimate query has a companion
"within_bound" query that returns the per-group boolean (as int) of the
published-error-bound assertion |est/exact - 1| <= 3 * 1.04/sqrt(m), whose
oracle is simply `1` per group — turning the accuracy guarantee itself into
an oracle-checked result.  Raw-estimate queries stay rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hllspark import agg


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-language distinct-document estimates with sketch sizes
    over the documents table at sf0.001."""
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    sk = agg.sketch_by(docs, "text", ["lang"], p=12, algo="hlll")
    return (
        agg.with_estimate(sk)
        .withColumn("sketch_bits", agg.bit_size_udf(F.col("sketch")))
        .select("lang", "distinct_estimate", "sketch_bits")
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

_P = 12  # default precision for oracle-checked bound queries
_BOUND = 3 * 1.04 / (1 << (_P // 2))  # 3 sigma of 1.04/sqrt(2^p); p even


def _q_exact_distinct_users_by_type(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("distinct_users"))
        .orderBy("event_type")
    )


def _q_exact_distinct_docs_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.countDistinct("text").alias("distinct_texts"))
        .orderBy("lang")
    )


def _q_hll_users_by_type_estimate(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    return agg.approx_distinct(ev, "user_id", ["event_type"], p=_P).orderBy(
        "event_type"
    )


def _within_bound(est_df: DataFrame, exact_df: DataFrame, key: str) -> DataFrame:
    j = est_df.join(exact_df, key)
    return (
        j.select(
            key,
            (
                (F.abs(F.col("distinct_estimate") - F.col("exact")) / F.col("exact"))
                <= F.lit(_BOUND)
            )
            .cast("int")
            .alias("within_bound"),
        )
        .orderBy(key)
    )


def _q_hll_users_within_bound(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    est = agg.approx_distinct(ev, "user_id", ["event_type"], p=_P)
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact"))
    return _within_bound(est, exact, "event_type")


def _q_hll_docs_within_bound(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    est = agg.approx_distinct(docs, "text", ["lang"], p=_P)
    exact = docs.groupBy("lang").agg(F.countDistinct("text").alias("exact"))
    return _within_bound(est, exact, "lang")


def _q_hll_merge_reagg_consistent(spark: SparkSession, sf: str) -> DataFrame:
    """Per-day sketches re-merged == directly-built global sketch
    (merge associativity, reference test.cpp:672-736 at plan level)."""
    ev = _t(spark, sf, "events").withColumn("day", F.to_date("ts"))
    daily = agg.sketch_by(ev, "user_id", ["day"], p=10)
    remerged = agg.merge_sketches(daily).select(
        F.col("sketch").alias("s1")
    )
    direct = agg.sketch_by(ev, "user_id", p=10).select(F.col("sketch").alias("s2"))
    return remerged.crossJoin(direct).select(
        (F.col("s1") == F.col("s2")).cast("int").alias("merge_consistent")
    )


def _q_hlll_smaller_than_hll(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLogLog compression beats dense HLL's 6m bits per group
    (the paper's space claim, HyperLogLogLog.hpp:145-147)."""
    docs = _t(spark, sf, "documents")
    sk = agg.sketch_by(docs, "text", ["lang"], p=_P, algo="hlll")
    return (
        sk.select(
            "lang",
            (agg.bit_size_udf(F.col("sketch")) < F.lit(6 * (1 << _P)))
            .cast("int")
            .alias("hlll_smaller"),
        )
        .orderBy("lang")
    )


def _q_hll_linear_counting_exact_small(spark: SparkSession, sf: str) -> DataFrame:
    """For n << m the linear-counting branch (HyperLogLog.hpp:104-105)
    rounds to the exact distinct count — deterministic, oracle-checkable."""
    ev = _t(spark, sf, "events")
    est = agg.approx_distinct(ev, "event_type", p=_P)
    return est.select(
        F.round("distinct_estimate").cast("long").alias("distinct_event_types")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_distinct_users_by_type": _q_exact_distinct_users_by_type,
        "exact_distinct_docs_by_lang": _q_exact_distinct_docs_by_lang,
        "hll_users_by_type_estimate": _q_hll_users_by_type_estimate,
        "hll_users_within_bound": _q_hll_users_within_bound,
        "hll_docs_within_bound": _q_hll_docs_within_bound,
        "hll_merge_reagg_consistent": _q_hll_merge_reagg_consistent,
        "hlll_smaller_than_hll": _q_hlll_smaller_than_hll,
        "hll_linear_counting_exact_small": _q_hll_linear_counting_exact_small,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_distinct_users_by_type": (
            "SELECT event_type, count(DISTINCT user_id) AS distinct_users "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "exact_distinct_docs_by_lang": (
            "SELECT lang, count(DISTINCT text) AS distinct_texts "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        # hll_users_by_type_estimate: rows-only (approximate values)
        "hll_users_within_bound": (
            "SELECT event_type, 1 AS within_bound FROM events "
            "GROUP BY event_type ORDER BY event_type"
        ),
        "hll_docs_within_bound": (
            "SELECT lang, 1 AS within_bound FROM documents "
            "GROUP BY lang ORDER BY lang"
        ),
        "hll_merge_reagg_consistent": "SELECT 1 AS merge_consistent",
        "hlll_smaller_than_hll": (
            "SELECT lang, 1 AS hlll_smaller FROM documents "
            "GROUP BY lang ORDER BY lang"
        ),
        "hll_linear_counting_exact_small": (
            "SELECT count(DISTINCT event_type) AS distinct_event_types FROM events"
        ),
    }
