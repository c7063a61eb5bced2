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
