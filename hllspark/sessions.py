"""Gap-based sessionization over event streams — pure JVM window plan.

A session is a maximal run of events for one key where consecutive
event-times are no more than ``gap_sec`` apart (the standard web-analytics
definition; the reference has no session operator — this extends the
engine per the north-rule's web-pages/events workload).

Plan shape (no Python on the data path):

  scan -> shuffle once on ``key_col`` -> window (lag + running sum) ->
  [optional groupBy (key, session_seq) — same partitioning, no 2nd shuffle]

Scale: ONE hash shuffle on the session key; the per-key window sort is
bounded by per-key event counts (web analytics: thousands, not billions,
per user).  Timestamps are compared in integer microseconds
(``unix_micros``) so Spark and external oracles agree bit-for-bit —
epoch-double comparisons drift in the last ulp across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import TimestampNTZType


def _micros(df: DataFrame, ts_col: str) -> Column:
    """Event time as int64 microseconds since the epoch.  TIMESTAMP_NTZ is
    diffed against a naive epoch literal (timezone-free, matches DuckDB's
    epoch_us bit-for-bit); zoned TIMESTAMP uses unix_micros."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            f"`{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_sec: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """``df`` plus a ``session_seq`` column: 1-based index of the session
    each row belongs to within its key, sessions split where the gap to
    the previous event exceeds ``gap_sec``.

    ``order_cols`` breaks event-time ties deterministically (default: the
    timestamp alone; pass e.g. ``["event_id"]`` when timestamps can
    collide — determinism of the split point requires a total order).
    """
    if gap_sec <= 0:
        raise ValueError("gap_sec must be positive")
    tie = [F.col(c) for c in (order_cols or [])]
    us = _micros(df, ts_col)
    w = Window.partitionBy(key_col).orderBy(us, *tie)
    gap_us = int(round(gap_sec * 1_000_000))
    prev = F.lag(us).over(w)
    is_new = (prev.isNull() | ((us - prev) > F.lit(gap_us))).cast("long")
    run = Window.partitionBy(key_col).orderBy(us, *tie).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # two projection steps: a running sum OVER a lag must not nest window
    # expressions in one select (Catalyst rejects nested window functions)
    return (
        df.withColumn("__is_new", is_new)
        .withColumn("session_seq", F.sum("__is_new").over(run))
        .drop("__is_new")
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_sec: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session aggregate:
    (key, session_seq, n_events, duration_us, duration_sec).

    Same single shuffle as :func:`sessionize` — the groupBy keys are a
    superset of the window partition key, so Catalyst reuses the exchange.
    ``duration_us`` is the exact (last - first) event time in integer
    microseconds (cross-engine reproducible bit-for-bit); ``duration_sec``
    is the same as a convenience double."""
    s = sessionize(df, key_col, ts_col, gap_sec, order_cols)
    us = _micros(df, ts_col)
    return (
        s.groupBy(key_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(us) - F.min(us)).alias("duration_us"),
        )
        .withColumn("duration_sec", F.col("duration_us") / F.lit(1_000_000.0))
    )


def session_count(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_sec: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Sessions per key: (key, n_sessions) — max of the running index."""
    s = sessionize(df, key_col, ts_col, gap_sec, order_cols)
    return s.groupBy(key_col).agg(F.max("session_seq").alias("n_sessions"))
