"""Sketch-accelerated join pruning: Bloom semi-join for shuffle reduction.

At warehouse scale the expensive part of `fact JOIN dim` is shuffling the
fact side; when the join is selective, most shuffled fact rows never find
a partner.  ``bloom_prune`` builds a Bloom filter over the dim keys with
the engine's own distributed mergeable Bloom (sketches/bloom.py — the
reference's add-entry hash chain, Hash.hpp:22-30, so the filter is
byte-compatible with every other Bloom in the library) and filters the
fact side BEFORE its shuffle:

  scan(dim) -> per-partition Bloom partials -> OR-merge to ONE bitmap
  (m/8 bytes, bounded by fpp target, independent of fact size)
  -> broadcast -> Arrow-batched probe on the fact scan.

No false negatives (every real match survives), false positives bounded
by ``fpp``, so `bloom_prune -> exact join` returns exactly the join
result while shuffling only ~(selectivity + fpp) of the fact table.
This is the user-controlled analogue of Spark's runtime row-level
filtering, usable where AQE can't inject one (pre-aggregated inputs,
non-equi follow-up logic, or a filter side that is itself the output of
a sketch pipeline).
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .sketches import bloom
from .sketches.generic import sketch_agg


def build_bloom(
    filter_df: DataFrame,
    filter_key: str,
    fpp: float = 0.01,
    n_expected: int | None = None,
) -> bytes:
    """One serialized Bloom filter over ``filter_df[filter_key]``, built
    distributed (partial bitmaps OR-merged; one m/8-byte row per partition
    crosses the wire).  ``n_expected`` defaults to a COUNT of the filter
    side — one cheap pass over the SMALL side that sizes the filter for
    the requested false-positive rate."""
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    if n_expected is None:
        n_expected = filter_df.where(F.col(filter_key).isNotNull()).count()
    if n_expected <= 0:
        return b""
    m_bits, k = bloom.params_for(n_expected, fpp)
    row = sketch_agg(filter_df, filter_key, bloom.kind(m_bits, k)).first()
    return bytes(row["sketch"])


def bloom_prune(
    df: DataFrame,
    key_col: str,
    filter_df: DataFrame | None = None,
    filter_key: str | None = None,
    fpp: float = 0.01,
    n_expected: int | None = None,
    prebuilt: bytes | None = None,
) -> DataFrame:
    """Rows of ``df`` whose ``key_col`` MIGHT appear in
    ``filter_df[filter_key]`` — a superset of the exact semi-join
    (no false negatives; false positives <= ~fpp).  Null keys are dropped
    (SQL join semantics: NULL never matches).

    Pass ``prebuilt`` (from ``build_bloom``) to reuse one filter across
    several prunes or a stream.  The probe is a single Arrow-batched
    vectorized pass with the bitmap broadcast once per executor; nothing
    about the fact side is collected or shuffled."""
    if prebuilt is None:
        if filter_df is None or filter_key is None:
            raise ValueError("need filter_df+filter_key or prebuilt")
        prebuilt = build_bloom(filter_df, filter_key, fpp, n_expected)
    out = df.where(F.col(key_col).isNotNull())
    if not prebuilt:  # empty filter side: nothing can match
        return out.limit(0)
    bc = df.sparkSession.sparkContext.broadcast(prebuilt)
    cache: dict = {}

    @F.pandas_udf("boolean")
    def _probe(s: pd.Series) -> pd.Series:
        if "bk" not in cache:  # decode once per python worker, not per batch
            cache["bk"] = bloom.decode_view(bc.value)  # read-only probe
        bits, k = cache["bk"]
        return pd.Series(bloom.might_contain(bits, s.to_numpy(), k))

    return out.where(_probe(F.col(key_col)))


def bloom_semi_join(
    df: DataFrame,
    key_col: str,
    filter_df: DataFrame,
    filter_key: str,
    fpp: float = 0.01,
    n_expected: int | None = None,
) -> DataFrame:
    """EXACT semi-join with Bloom pre-pruning: ``bloom_prune`` removes
    ~(1 - selectivity - fpp) of ``df`` before the shuffle, then a real
    left-semi join removes the Bloom's false positives.  Result is
    identical to ``df.join(filter_df, on, 'leftsemi')``; only the pruned
    remainder is shuffled."""
    pruned = bloom_prune(df, key_col, filter_df, filter_key, fpp, n_expected)
    dim = filter_df.select(F.col(filter_key).alias(key_col)).distinct()
    return pruned.join(dim, key_col, "leftsemi")


def approx_join_size(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    width: int = 8209,
    depth: int = 7,
) -> float:
    """Estimated row count of ``df_a JOIN df_b ON key_a = key_b`` WITHOUT
    running the join — the count-min inner-product estimator (Cormode &
    Muthukrishnan 2005): build one CM frequency sketch per side (two
    parallel scans, partial tables merged map-side; depth*width int64
    cells cross the wire per partition, independent of input size), then
    min-of-row-dot-products on the two bounded tables.

    Guarantee: true <= estimate <= true + (e/width) * |A| * |B| with
    probability 1 - e^-depth.  Use it to pick a join strategy (broadcast
    vs shuffle vs pre-aggregate) before paying for the join itself —
    planner-style cardinality estimation as a user-level primitive."""
    from .sketches import countmin

    kind = countmin.kind(width, depth)
    sk_a = sketch_agg(df_a.where(F.col(key_a).isNotNull()), key_a, kind).first()
    sk_b = sketch_agg(df_b.where(F.col(key_b).isNotNull()), key_b, kind).first()
    if sk_a is None or sk_b is None or sk_a["sketch"] is None or sk_b["sketch"] is None:
        return 0.0
    cm_a = countmin.decode(bytes(sk_a["sketch"]))
    cm_b = countmin.decode(bytes(sk_b["sketch"]))
    return float(countmin.inner_product(cm_a, cm_b))


def approx_join_size_unbiased(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    width: int = 8209,
    depth: int = 7,
) -> float:
    """Unbiased variant of :func:`approx_join_size`: count-SKETCH inner
    product (Charikar et al. 2002 signed counters / the AMS estimator).
    Same two-scan, bounded-state plan shape, but the estimate is centered
    on the true join size instead of biased up by (e/width)*|A|*|B| —
    per-row std ~sqrt(2 * F2(A) * F2(B) / width), median over ``depth``
    rows.  Prefer this when over-estimation would mis-route a borderline
    broadcast decision; prefer count-min when a guaranteed upper bound
    matters more than centering."""
    from .sketches import countsketch

    kind = countsketch.kind(width, depth)
    sk_a = sketch_agg(df_a.where(F.col(key_a).isNotNull()), key_a, kind).first()
    sk_b = sketch_agg(df_b.where(F.col(key_b).isNotNull()), key_b, kind).first()
    if sk_a is None or sk_b is None or sk_a["sketch"] is None or sk_b["sketch"] is None:
        return 0.0
    cs_a = countsketch.decode(bytes(sk_a["sketch"]))
    cs_b = countsketch.decode(bytes(sk_b["sketch"]))
    return float(countsketch.inner_product(cs_a, cs_b))


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of (nearest-event) join: every ``left`` row picks the single
    ``right`` row with the same key and the latest ``right_ts`` <=
    ``left_ts`` (direction='backward', inclusive — DuckDB/pandas
    ``merge_asof`` semantics) or the earliest >= (direction='forward').
    Unmatched left rows keep nulls; ``tolerance_sec`` voids matches
    farther than the tolerance.

    Spark has no native as-of join; the classic range-join rewrite
    explodes into an O(|L| x |R|/key) inequality join.  This plans as
    union -> ONE hash exchange on the keys -> per-key sort ->
    last(payload, ignorenulls) running window: linear in |L| + |R|,
    no row multiplication, the same shuffle/sort shape as a
    sort-merge join — at 100 TB the cost is one co-partitioning of
    both sides, exactly what the equivalent SMJ would pay.  Right rows
    order BEFORE left rows at equal timestamps, making the match
    inclusive.  Rows with null keys or null timestamps never match.
    Tie-break between right rows with identical (key, ts) is the last
    in encounter order (undefined, matching other engines).

    Right payload columns colliding with left names get ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if isinstance(on, str):
        on = [on]
    right_ts = right_ts or left_ts
    payload = [c for c in right.columns if c not in on]
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload}

    l2 = left.select(
        *left.columns,
        F.lit(1).alias("__is_left"),
        F.col(left_ts).alias("__ats"),
    )
    # SQL join semantics: null keys / null timestamps on the right can
    # never be matched — drop them before the union
    r_valid = right.where(F.col(right_ts).isNotNull())
    for c in on:
        r_valid = r_valid.where(F.col(c).isNotNull())
    r2 = r_valid.select(
        *on,
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__ats"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(out_names[c]) for c in payload],
        ).alias("__rpay"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    from pyspark.sql import Window

    ts_order = F.col("__ats").asc() if direction == "backward" else F.col("__ats").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("__m", F.last("__rpay", ignorenulls=True).over(w))
        .where((F.col("__is_left") == 1) & F.col("__ats").isNotNull())
    )
    if tolerance_sec is not None:
        gap = F.abs(
            F.col("__ats").cast("timestamp_ltz").cast("double")
            - F.col("__m.__rts").cast("timestamp_ltz").cast("double")
        )
        matched = matched.withColumn(
            "__m",
            F.when(gap <= F.lit(float(tolerance_sec)), F.col("__m")),
        )
    null_ts = left.where(F.col(left_ts).isNull()).select(
        *left.columns,
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in payload],
    )
    return matched.select(
        *left.columns,
        *[F.col(f"__m.{out_names[c]}").alias(out_names[c]) for c in payload],
    ).unionByName(null_ts)


def range_join(
    points: DataFrame,
    t_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    on: list[str] | str | None = None,
    bucket: float | None = None,
) -> DataFrame:
    """Point-in-interval join: every ``points`` row paired with every
    ``intervals`` row where ``start <= t < end`` (and equal ``on`` keys,
    if given).  Columns are numeric (cast timestamps to epoch first).

    Spark plans a bare inequality join as BroadcastNestedLoop /
    cartesian — O(|P| x |I|).  With ``bucket`` (a width in t's units)
    this becomes the standard bucketed range join: each interval is
    EXPLODED to the ceil(len/bucket)+1 buckets it overlaps (sequence +
    explode, codegen), each point maps to its one bucket, and the
    pairing is a plain hash equi-join on (keys..., bucket) followed by
    the exact range filter.  Shuffle = |P| + |I| x avg_spans rows;
    correct for ANY interval length (an interval spanning many buckets
    appears in each, and each point exists in exactly one bucket, so no
    duplicate pairs are produced).  Choose bucket ~ the typical interval
    length: spans ~ 2, near-minimal replication.

    Without ``bucket``, falls back to the exact inequality join (fine
    when one side broadcasts)."""
    on = [on] if isinstance(on, str) else list(on or [])
    for c in on:
        intervals = intervals.where(F.col(c).isNotNull())
        points = points.where(F.col(c).isNotNull())
    cond_keys = [points[c] == intervals[c] for c in on]
    rng = (points[t_col] >= intervals[start_col]) & (
        points[t_col] < intervals[end_col]
    )
    if bucket is None:
        out = points.join(intervals, cond_keys + [rng] if on else [rng])
    else:
        if bucket <= 0:
            raise ValueError("bucket must be positive")
        b = F.lit(float(bucket))
        lb = F.floor(F.col(start_col) / b)
        ub0 = F.floor(F.col(end_col) / b)
        # end is EXCLUSIVE: a bucket-aligned end does not reach its bucket
        ub = ub0 - F.when(F.col(end_col) == ub0 * b, F.lit(1)).otherwise(F.lit(0))
        ib = (
            # empty/inverted intervals match nothing and would make
            # sequence() run descending — drop them before the explode
            intervals.where(F.col(start_col) < F.col(end_col))
            .withColumn("__bk", F.explode(F.sequence(lb, ub)))
        )
        pb = points.withColumn("__bk", F.floor(F.col(t_col) / b))
        out = pb.join(
            ib, [pb[c] == ib[c] for c in on] + [pb["__bk"] == ib["__bk"]]
        ).where(
            (pb[t_col] >= ib[start_col]) & (pb[t_col] < ib[end_col])
        )
        dup = [c for c in on] + ["__bk"]
        out = out.drop(*[ib[c] for c in dup]).drop("__bk")
    return out


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the fact side gets a salt in [0, salt)
    and the dim side is replicated once per salt value (sequence +
    explode), so a hot key's rows spread over ``salt`` reducers instead
    of melting one.  Result identical to ``fact.join(dim, on, how)`` for
    how in ('inner', 'left'); dim should be the smaller side (it is
    replicated salt-fold — cost salt x |dim| shuffle rows, the explicit
    trade for breaking the hot partition).

    Complements AQE's skew-join split (which needs statistics and only
    kicks in post-shuffle): salting is decided at plan time and also
    covers the partial-aggregate-free first hop.  The salt is not
    row-deterministic (any assignment is correct — dim carries every
    salt value), only well-spread."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    on = [on] if isinstance(on, str) else list(on)
    f = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return f.join(d, on + ["__salt"], how).drop("__salt")


def estimated_fpp(n: int, m_bits: int, k: int) -> float:
    """Published Bloom false-positive probability after n inserts."""
    return (1.0 - math.exp(-k * n / m_bits)) ** k
