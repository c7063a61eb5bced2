"""Similarity search over embedding columns (array<float>).

- brute_force_top_k      : exact cosine top-k per query — the correctness
                           baseline.  Query set is broadcast (small side);
                           dot products are native SQL (zip_with/aggregate,
                           codegen'd), top-k via window over partial top-ks.
- lsh_top_k              : random-hyperplane (sign) LSH buckets — the scale
                           path: candidates share at least one band bucket;
                           exact cosine re-rank on candidates only.
- near_duplicates_by_cosine : all pairs above a cosine threshold via the
                           same LSH bucketing (embedding near-dup dedup).

Hyperplanes are generated deterministically from a seed via the same
xxhash64-expression trick used everywhere else — no RNG state, no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score every pair JVM-side, keep top-k per query.
    Returns (query_id, vec_id, cosine, rank)."""
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _planes(dim: int, n_planes: int, seed: int):
    """Deterministic hyperplane matrix, computed ONCE at plan-build time in
    numpy and embedded as array literals.  (An earlier pure-SQL variant
    derived components from xxhash64 inside a lambda; Catalyst cannot
    constant-fold lambda bodies, so every row re-hashed n_planes x dim
    components — plan-time literals remove that entirely.)"""
    import numpy as np

    rng = np.random.default_rng(
        (seed * 0x9E3779B97F4A7C15 + dim * 1013 + n_planes) % (1 << 64)
    )
    return rng.uniform(-1.0, 1.0, size=(n_planes, dim)).round(6)


def signature_bits(vec, dim: int, n_planes: int = 16, seed: int = 5):
    """Random-hyperplane signature: bit i = sign(vec . plane_i).  Returns a
    bigint (n_planes <= 63 bits).  Planes are plan-time literals; per row
    only the n_planes dot products remain (the irreducible LSH cost)."""
    planes = _planes(dim, n_planes, seed)
    bits = [
        F.when(
            _dot(vec, F.lit([float(x) for x in planes[i]])) > 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(n_planes)
    ]
    acc = bits[0]
    for b in bits[1:]:
        acc = acc + b
    return acc


def _banded_buckets(sig_col, bands: int, rows: int):
    """Split an LSH signature into band buckets (band idx, band value).
    Unrolled in Python: shift amounts must be literal ints."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(sig_col, b * rows)
                .bitwiseAND(F.lit((1 << rows) - 1))
                .alias("val"),
            )
            for b in range(bands)
        ]
    )


def lsh_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    n_planes: int = 24,
    bands: int = 8,
    seed: int = 5,
) -> DataFrame:
    """Approximate top-k: sign-LSH band buckets join (co-partitioned on
    bucket — no cross product), exact cosine re-rank on candidates.
    At 10^12 scale the bucket join replaces the O(corpus x queries)
    cross join with O(collisions)."""
    rows = n_planes // bands
    # signature materialized in its own projection (referenced `bands`
    # times by the bucket array -> CollapseProject keeps it; the n_planes
    # dot products run once per row, not once per band)
    c = (
        corpus.select(
            id_col,
            vec_col,
            signature_bits(F.col(vec_col), dim, n_planes, seed).alias("__sig"),
        )
        .select(
            id_col,
            vec_col,
            F.explode(_banded_buckets(F.col("__sig"), bands, rows)).alias("bb"),
        )
        .select(id_col, vec_col, "bb.band", "bb.val")
    )
    q = (
        queries.select(
            query_id_col,
            query_vec_col,
            signature_bits(F.col(query_vec_col), dim, n_planes, seed).alias(
                "__sig"
            ),
        )
        .select(
            query_id_col,
            query_vec_col,
            F.explode(_banded_buckets(F.col("__sig"), bands, rows)).alias("bb"),
        )
        .select(query_id_col, query_vec_col, "bb.band", "bb.val")
    )
    cand = (
        c.join(q, ["band", "val"])
        .select(query_id_col, id_col, vec_col, query_vec_col)
        .distinct()
    )
    scored = cand.select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def near_duplicates_by_cosine(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 24,
    bands: int = 8,
    seed: int = 5,
) -> DataFrame:
    """Embedding near-dup pairs: sign-LSH self-join then exact cosine
    filter. Returns (id_a, id_b, cosine) with id_a < id_b."""
    rows = n_planes // bands
    sigs = (
        df.select(
            id_col,
            vec_col,
            signature_bits(F.col(vec_col), dim, n_planes, seed).alias("__sig"),
        )
        .select(
            id_col,
            vec_col,
            F.explode(_banded_buckets(F.col("__sig"), bands, rows)).alias("bb"),
        )
        .select(id_col, vec_col, "bb.band", "bb.val")
    )
    l, r = sigs.alias("l"), sigs.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{vec_col}").alias("va"),
            F.col(f"r.{vec_col}").alias("vb"),
        )
        .distinct()
    )
    return cand.select(
        "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine")
    ).where(F.col("cosine") >= threshold)
