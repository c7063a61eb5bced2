"""Bloom semi-join pruning: exactness, no-false-negative guarantee, and
fpp-bounded over-retention."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hllspark import joins

SF_TEST = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_TEST}/events.parquet")


def test_bloom_semi_join_exact(spark, events):
    """bloom_prune -> exact leftsemi == plain leftsemi, row for row."""
    dim = events.where(F.col("event_id") % 7 == 0).select("event_id")
    got = (
        joins.bloom_semi_join(events, "event_id", dim, "event_id", fpp=0.01)
        .select("event_id")
        .collect()
    )
    want = (
        events.join(dim, "event_id", "leftsemi").select("event_id").collect()
    )
    assert sorted(r[0] for r in got) == sorted(r[0] for r in want)


def test_bloom_prune_no_false_negatives_and_bounded_fp(spark, events):
    """Every true match survives the prune; with disjoint keys the
    retained fraction stays near the fpp target (x5 slack for variance)."""
    dim = events.where(F.col("event_id") % 5 == 0).select("event_id")
    pruned = joins.bloom_prune(events, "event_id", dim, "event_id", fpp=0.01)
    true_ids = {
        r[0]
        for r in events.join(dim, "event_id", "leftsemi")
        .select("event_id")
        .collect()
    }
    kept = {r["event_id"] for r in pruned.collect()}
    assert true_ids <= kept  # no false negatives, ever
    n_nonmatch = events.count() - len(true_ids)
    fp = len(kept) - len(true_ids)
    assert fp / max(n_nonmatch, 1) <= 0.05


def test_bloom_prune_prebuilt_and_empty_filter(spark, events):
    """A prebuilt filter reuses without a second dim pass; an empty filter
    side prunes everything (nothing can match)."""
    dim = events.where(F.col("event_id") % 3 == 0).select("event_id")
    buf = joins.build_bloom(dim, "event_id", fpp=0.02)
    a = joins.bloom_prune(events, "event_id", prebuilt=buf).count()
    b = joins.bloom_prune(events, "event_id", dim, "event_id", fpp=0.02).count()
    assert a == b
    empty = dim.limit(0)
    assert joins.bloom_prune(events, "event_id", empty, "event_id").count() == 0


def test_as_of_join_skewed_key_correct_and_bounded(spark):
    """95%-one-key skew: the per-key window sort concentrates the hot key
    on one reducer (the documented SMJ-equivalent cost).  Verify (a) the
    result is exact vs a groupBy-free oracle computed on the same data,
    and (b) wall time stays within a measured bound of the uniform-key
    run at identical volume (the hot partition is sort-bound, not
    quadratic).  Measured on local[32]: ~1.3-2.5x; bound set at 6x to
    absorb CI noise.  See PLANS.md §22 for the AQE note."""
    import time

    n_left, n_right = 200_000, 50_000

    def build(skewed: bool):
        key = (
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(
                F.col("id") % 1000
            )
            if skewed
            else F.col("id") % 1000
        )
        left = spark.range(n_left, numPartitions=32).select(
            key.alias("k"),
            (F.col("id") * 13 % 86400).cast("double").alias("ts"),
            F.col("id").alias("lid"),
        )
        right = spark.range(n_right, numPartitions=32).select(
            key.alias("k"),
            (F.col("id") * 29 % 86400).cast("double").alias("rts"),
            (F.col("id") * 3).alias("payload"),
        )
        return left, right

    timings = {}
    for label, skewed in (("uniform", False), ("skewed", True)):
        left, right = build(skewed)
        out = joins.as_of_join(left, right, "k", "ts", "rts")
        t0 = time.perf_counter()
        n_out = out.count()
        timings[label] = time.perf_counter() - t0
        assert n_out == n_left  # every left row exactly once

    # correctness on the skewed data: spot-check the hot key against an
    # exact per-row oracle (max rts <= ts over the hot key's right rows)
    left, right = build(True)
    hot_right = sorted(
        (r["rts"], r["payload"])
        for r in right.where(F.col("k") == 7).collect()
    )
    got = {
        r["lid"]: r["payload"]
        for r in joins.as_of_join(left, right, "k", "ts", "rts")
        .where(F.col("k") == 7)
        .collect()
    }
    import bisect

    lrows = left.where(F.col("k") == 7).collect()
    assert len(got) == len(lrows)
    rts_sorted = [x[0] for x in hot_right]
    by_rts: dict[float, set] = {}
    for rts, payload in hot_right:
        by_rts.setdefault(rts, set()).add(payload)
    for r in lrows[:500]:
        i = bisect.bisect_right(rts_sorted, r["ts"])
        if i == 0:
            assert got[r["lid"]] is None, r["lid"]
        else:
            # right rows sharing the matched rts are tie-ambiguous
            # (encounter order); any of their payloads is correct
            assert got[r["lid"]] in by_rts[rts_sorted[i - 1]], r["lid"]

    assert timings["skewed"] <= 6 * max(timings["uniform"], 0.2), timings
