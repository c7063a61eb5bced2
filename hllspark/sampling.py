"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is non-reproducible across retries,
partitioning changes, and engines — useless for dataset curation where a
sample must be re-derivable byte-for-byte months later.  Everything here
keys the decision on a HASH of the row's stable key, so the same row makes
the same decision on any cluster, any partitioning, any engine:

- ``hash_sample``    — Bernoulli(rate) by key hash.  No shuffle, no sort:
                       a pure filter pushed into the scan stage; the scale
                       path for sampling 100 TB.
- ``stratified_sample`` — EXACT ``ceil(rate * n_g)`` rows per stratum,
                       chosen by hash order (deterministic "random").
                       One shuffle on the strata; per-stratum window sort,
                       so intended for bounded strata (languages, sources,
                       shards) — for huge uniform strata use hash_sample.

Two hash backends:

- ``method='xxhash64'`` (default): JVM codegen ``xxhash64`` — fastest,
  zero Python, whole-stage-codegen inline.
- ``method='md5'``: portable across engines that agree on MD5 (Spark,
  DuckDB, Trino, Postgres…) — the decision is a lexicographic compare of
  the first 8 hex chars against a threshold, so an external system can
  reproduce the exact sample membership with vanilla SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# separator for multi-column keys: ASCII unit separator, vanishingly rare
# in real keys and identical in any engine's concat_ws
_SEP = "\x1f"


def _md5_hex8(cols: list[Column], seed: int) -> Column:
    return F.substring(
        F.md5(F.concat_ws(_SEP, *[c.cast("string") for c in cols], F.lit(str(seed)))),
        1,
        8,
    )


def md5_threshold(rate: float) -> str:
    """8-hex-digit threshold such that P(md5_prefix < thr) == rate (to
    1/2^32).  Exposed so oracles/tests can embed the same literal."""
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def hash_sample(
    df: DataFrame,
    key_cols: list[str] | str,
    rate: float,
    seed: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_cols``.

    Pure filter — no shuffle, no state; rows with equal keys always agree
    (so sampling by document id keeps or drops ALL copies of a doc, the
    property train/eval splits need).  Disjoint seeds give independent
    samples of the same data."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError("rate must be in [0, 1]")
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    cols = [F.col(c) for c in key_cols]
    if rate >= 1.0:
        return df
    if method == "xxhash64":
        # pmod maps the signed hash into [0, 2^32); compare vs rate scaled
        bucket = F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(2**32))
        return df.where(bucket < F.lit(int(rate * 2**32)))
    if method == "md5":
        return df.where(_md5_hex8(cols, seed) < F.lit(md5_threshold(rate)))
    raise ValueError(f"unknown method {method!r}")


def split(
    df: DataFrame,
    key_cols: list[str] | str,
    weights: list[float],
    seed: int = 0,
) -> list[DataFrame]:
    """Deterministic disjoint partition of ``df`` into len(weights) splits
    (e.g. train/val/test) by key hash — unlike ``randomSplit`` the
    assignment is stable across runs and partitionings, and a given key
    always lands in the same split."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    total = sum(weights)
    if total <= 0 or any(w < 0 for w in weights):
        raise ValueError("weights must be non-negative with positive sum")
    cols = [F.col(c) for c in key_cols]
    bucket = F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(2**32))
    bounds, acc = [], 0.0
    for w in weights:
        acc += w / total
        bounds.append(int(acc * 2**32))
    bounds[-1] = 2**32  # close the last split despite float rounding
    out, lo = [], 0
    for hi in bounds:
        out.append(df.where((bucket >= F.lit(lo)) & (bucket < F.lit(hi))))
        lo = hi
    return out


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    strata_cols: list[str] | str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row gets priority ``-ln(u) / w`` with
    ``u`` a hash-uniform in (0, 1] derived from md5(key, seed); the k
    smallest priorities are the sample, so inclusion probability is
    proportional to ``weight_col`` — and the whole draw is reproducible
    on any engine (u is the first 52 bits of the md5, exact in a double;
    ln/divide are IEEE-identical across engines).

    Rows with null or non-positive weight are excluded (zero-weight rows
    can never be drawn in A-ES).

    Global (default): sort-free ``TakeOrdered(k)`` — no full shuffle-sort
    at any scale.  With ``strata_cols``: k per stratum via a row_number
    window (one shuffle on the strata)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # u in (0, 1]: (h + 1) / 2^52, h = first 13 md5 hex digits — 52 bits,
    # exactly representable in a double
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    _SEP, F.col(key_col).cast("string"), F.lit(str(seed))
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(float(2**52))
    pri = -F.log(u) / F.col(weight_col).cast("double")
    base = df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    if strata_cols is None:
        return (
            base.withColumn("__pri", pri)
            .orderBy("__pri")
            .limit(k)
            .drop("__pri")
        )
    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    w = Window.partitionBy(*strata_cols).orderBy(pri, F.col(key_col))
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def shuffle_rows(
    df: DataFrame,
    key_cols: list[str] | str,
    seed: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic global shuffle — the training-order randomization
    pass every pretraining pipeline runs before sequence packing: rows
    are globally ordered by a hash of their stable key, so the "random"
    order is reproducible across runs, partitionings and engines, and
    disjoint seeds give independent epoch orders.

    Plans as a range sort (sample boundaries -> range exchange -> local
    sort): fully parallel, never a single-partition collapse.  Feed the
    result straight into pack_sequences using the same hash as the order
    column.  ``method='md5'`` is the engine-portable variant (same
    lexicographic order in any MD5-agreeing SQL engine)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    cols = [F.col(c) for c in key_cols]
    if method == "xxhash64":
        h = F.xxhash64(*cols, F.lit(seed))
    elif method == "md5":
        h = _md5_hex8(cols, seed)
    else:
        raise ValueError(f"unknown method {method!r}")
    return df.orderBy(h, *cols)


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    target_props: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Language/source-balanced sampling to TARGET MIXTURE PROPORTIONS —
    the pretraining-corpus rebalancing op ("train on 50% en, 30% de,
    20% fr"): returns the LARGEST sample whose stratum shares follow
    ``target_props`` exactly (up to flooring) without oversampling any
    stratum.  Scale factor s = min_g(count_g / prop_g); stratum g
    contributes floor(prop_g * s) rows, selected by md5 hash order of
    ``key_col`` (deterministic, engine-portable — same selection rule as
    :func:`stratified_sample`).  Strata absent from ``target_props`` are
    excluded.  A target stratum with no rows at all forces s = 0 (the
    result is empty): no sample can follow the target exactly without
    it, and silently re-normalising over the present strata would
    mis-state the mixture.

    Plan: one tiny count aggregate joined to a literal proportions table,
    a one-row global min folded back via crossJoin(broadcast) — all
    in-plan, no driver collect — then one shuffle on the strata for the
    per-stratum hash-rank window.  The window grain is the same shape as
    stratified_sample: bounded strata (languages, sources)."""
    if not target_props:
        raise ValueError("target_props must be non-empty")
    if any(p <= 0 for p in target_props.values()):
        raise ValueError("target proportions must be positive")
    spark = df.sparkSession
    props = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(target_props.items())],
        f"{strata_col} string, __prop double",
    )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    # LEFT join from the target table: a target stratum with ZERO rows
    # must force cap 0 (hence s = 0 and an empty sample) — an inner
    # join would silently drop the stratum and violate the exact-
    # proportions guarantee (round-5 ADVICE fix)
    caps = props.join(F.broadcast(counts), strata_col, "left").select(
        F.col(strata_col),
        "__prop",
        (
            F.coalesce(F.col("__n"), F.lit(0)).cast("double")
            / F.col("__prop")
        ).alias("__cap"),
    )
    s = caps.agg(F.min("__cap").alias("__s"))
    takes = caps.crossJoin(F.broadcast(s)).select(
        F.col(strata_col),
        F.floor(F.col("__prop") * F.col("__s")).cast("long").alias("__take"),
    )
    h = _md5_hex8([F.col(key_col)], seed)
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.join(F.broadcast(takes), strata_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.col("__take"))
        .drop("__rn", "__take")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    temperature: float,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based corpus rebalancing (the multilingual-pretraining
    standard, mBERT/XLM-R/mT5): target proportions p_g ∝ n_g^(1/T), so
    T = 1 keeps the natural distribution (everything sampled) and larger
    T flattens it toward uniform, up-weighting low-resource strata
    RELATIVELY by down-sampling the head.  Returns the LARGEST sample
    whose stratum shares follow p_g exactly (flooring) without
    oversampling any stratum — the same largest-feasible semantics as
    :func:`mixture_sample`, with the proportions DERIVED IN-PLAN from
    the stratum counts (no driver-side distribution knowledge needed).

    Plan: one tiny count aggregate -> weights n^(1/T) (``sqrt`` when
    T = 2 — IEEE-exact in every engine, which is what the contract
    oracle uses) -> total via a broadcast 1-row cross join -> per-
    stratum take = floor(p_g * min_g(n_g / p_g)) -> md5-hash-rank
    window membership.  Everything before the final window is
    broadcast-sized; the one real shuffle is the per-stratum window,
    same as mixture_sample."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    inv = 1.0 / float(temperature)
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    nn = F.col("__n").cast("double")
    w = F.sqrt(nn) if inv == 0.5 else F.pow(nn, F.lit(inv))
    weights = counts.select(F.col(strata_col), "__n", w.alias("__w"))
    tot = weights.agg(F.sum("__w").alias("__tw"))
    caps = weights.crossJoin(F.broadcast(tot)).select(
        F.col(strata_col),
        (F.col("__w") / F.col("__tw")).alias("__prop"),
        (F.col("__n").cast("double") / (F.col("__w") / F.col("__tw"))).alias(
            "__cap"
        ),
    )
    s = caps.agg(F.min("__cap").alias("__s"))
    takes = caps.crossJoin(F.broadcast(s)).select(
        F.col(strata_col),
        F.floor(F.col("__prop") * F.col("__s")).cast("long").alias("__take"),
    )
    h = _md5_hex8([F.col(key_col)], seed)
    win = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.join(F.broadcast(takes), strata_col)
        .withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= F.col("__take"))
        .drop("__rn", "__take")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str] | str,
    key_col: str,
    rate: float,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``ceil(rate * n_g)`` rows from every stratum g, selected by
    md5 hash order of ``key_col`` (deterministic, engine-portable).

    One shuffle (on the strata); within each stratum a window sort by the
    hash — use for bounded-cardinality strata where per-group exactness
    matters; for huge strata prefer :func:`hash_sample` (no sort)."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError("rate must be in [0, 1]")
    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    h = _md5_hex8([F.col(key_col)], seed)
    w_rank = Window.partitionBy(*strata_cols).orderBy(h, F.col(key_col))
    w_all = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w_rank))
        .withColumn("__take", F.ceil(F.count(F.lit(1)).over(w_all) * F.lit(rate)))
        .where(F.col("__rn") <= F.col("__take"))
        .drop("__rn", "__take")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str] | str,
    key_col: str,
    k: int,
    order_cols: list | None = None,
    salt_buckets: int = 0,
    seed: int = 0,
) -> DataFrame:
    """Per-group document cap — the RefinedWeb/Dolma-style domain
    rebalancing pass ("keep at most k pages per registered domain"):
    keep the first ``k`` rows of every group, drop the rest.

    Order within a group is ``order_cols`` (e.g. a quality score,
    descending) broken by ``key_col``; with no ``order_cols`` the
    survivors are the k smallest by md5 hash of the key — deterministic
    "random", engine-portable, same selection rule as
    :func:`stratified_sample`.

    Skew is the whole problem at crawl scale: a plain per-group window
    puts EVERY row of a mega-host in one task, so one 100M-page domain
    stalls the stage.  ``salt_buckets = s > 1`` runs two phases:

    * phase 1 windows over (group, salt) — salt is a hash of the key,
      uniform by construction — keeping at most k per bucket, so the
      heavy group's rows spread over s tasks;
    * phase 2 windows over the group on the pre-capped stream, whose
      per-group size is now <= s*k no matter how large the group was.

    Exact, not approximate: any row in a group's global top-k is in its
    own bucket's top-k, so phase 2 always sees all global survivors —
    salted and unsalted membership are identical (pytest-gated)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if order_cols is None:
        pri = [_md5_hex8([F.col(key_col)], seed)]
    else:
        pri = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    order = [*pri, F.col(key_col)]
    out = df
    if salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(salt_buckets))
        w1 = Window.partitionBy(*group_cols, salt).orderBy(*order)
        out = (
            out.withColumn("__rn", F.row_number().over(w1))
            .where(F.col("__rn") <= k)
            .drop("__rn")
        )
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def gumbel_top_k(
    df: DataFrame,
    key_col: str,
    logweight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement with weights
    given IN THE LOG DOMAIN: take the k largest ``logw + g`` with Gumbel
    noise g = -ln(-ln(u)), u the md5(key, seed) 52-bit uniform in (0, 1].

    This is the same draw as ``weighted_sample`` with w = exp(logw) —
    ranking by largest logw - ln(-ln u) is ranking by smallest
    -ln(u)/w — but it never materializes exp(logw), so importance
    weights of any magnitude (DSIR log weights are unbounded in both
    directions) cannot overflow.  Null log weights are excluded.
    Sort-free TakeOrdered(k); ties (measure-zero for real inputs) break
    by key for cross-engine determinism."""
    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    _SEP, F.col(key_col).cast("string"), F.lit(str(seed))
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(float(2**52))
    g = -F.log(-F.log(u))
    return (
        df.where(F.col(logweight_col).isNotNull())
        .withColumn("__g", F.col(logweight_col).cast("double") + g)
        .orderBy(F.desc("__g"), F.col(key_col))
        .limit(k)
        .drop("__g")
    )
