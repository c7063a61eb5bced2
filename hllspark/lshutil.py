"""Shared LSH plumbing: bucket-size capping for self-join candidate stages.

Every LSH near-dup operator in this engine self-joins a banded table on
(band, bucket).  That join is O(sum over buckets of bucket_size^2): sound
when buckets are small, quadratic when a degenerate bucket appears (empty
documents, boilerplate pages, zero vectors).  At test scale a bad bucket is
invisible; at 10^12 rows it is the scale-killer.  ``drop_oversize_buckets``
bounds the join by removing buckets above a size cap — loudly, never
silently: the dropped bucket count / row mass is logged at WARNING level,
and callers can pass ``max_bucket_size=None`` to disable the cap.

Rows in an over-cap bucket are usually exact or near-exact duplicates of
each other (that is WHY the bucket is huge); the intended pipeline handles
those upstream with exact dedup (hllspark.dedup.deduplicate_exact), which
is O(n log n), not O(bucket^2).
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

logger = logging.getLogger("hllspark.lsh")


def drop_oversize_buckets(
    banded: DataFrame,
    bucket_cols: Sequence[str],
    max_bucket_size: int | None,
    op_name: str = "lsh",
) -> DataFrame:
    """Remove all rows belonging to (bucket_cols) groups with more than
    ``max_bucket_size`` members.  No-op when ``max_bucket_size`` is None.

    The over-cap bucket list is computed eagerly (one aggregation job over
    ``banded`` — callers persist the banded table anyway, so this is one
    cheap pass) so the dropped mass can be REPORTED, not silently lost.
    When no bucket exceeds the cap — the overwhelmingly common case — the
    returned plan is ``banded`` itself, unchanged.
    """
    if max_bucket_size is None:
        return banded
    if max_bucket_size < 2:
        raise ValueError("max_bucket_size must be >= 2 (or None to disable)")
    bucket_cols = list(bucket_cols)
    counts = banded.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("__bn"))
    over = counts.where(F.col("__bn") > max_bucket_size)
    stats = over.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.coalesce(F.sum("__bn"), F.lit(0)).alias("n_rows"),
    ).first()
    if stats["n_buckets"] == 0:
        return banded
    logger.warning(
        "%s: dropping %d over-cap bucket(s) holding %d banded rows "
        "(cap=%d) — pairs within these buckets are NOT reported; run "
        "exact dedup upstream to collapse degenerate duplicate groups",
        op_name,
        stats["n_buckets"],
        stats["n_rows"],
        max_bucket_size,
    )
    # left_anti on the bucket key: co-partitioned with the downstream
    # self-join, so the cap adds no extra row-scale shuffle of `banded`
    return banded.join(over.select(*bucket_cols), bucket_cols, "left_anti")
