"""Similarity search over embedding columns (array<float>).

- brute_force_top_k      : exact cosine top-k per query — the correctness
                           baseline.  Query set is broadcast (small side);
                           dot products are native SQL (zip_with/aggregate,
                           codegen'd), top-k via window over partial top-ks.
- lsh_top_k              : random-hyperplane (sign) LSH buckets — scale
                           path A: candidates share at least one band
                           bucket; exact cosine re-rank on candidates only.
- ivf_top_k              : inverted-file index — scale path B: spherical
                           k-means cells fit on a bounded sample, corpus
                           bucketed by nearest cell, queries probe their
                           nprobe nearest cells; nprobe == n_centroids
                           degrades gracefully to exact brute force.
- near_duplicates_by_cosine : all pairs above a cosine threshold via the
                           same LSH bucketing (embedding near-dup dedup).
- fit_pq_codebooks / pq_encode / pq_top_k : product quantization (round
                           5) — 8 bytes per vector instead of 256
                           (dim=64 float32), scored in the compressed
                           domain via ADC lookup tables; the storage
                           path for 10^12-row embedding tables.
- write_pq_index / pq_top_k_indexed : IVF-PQ — cell-partitioned parquet
                           of PQ codes; probes are partition-pruned
                           scans of 8-byte rows scored via ADC.
- kmeans_fit_distributed : spherical Lloyd k-means over the FULL corpus
                           (round 5) — Arrow-matmul assignment + ONE
                           map-side-combined (cell, pos) aggregate per
                           iteration; only k*dim partial sums ever reach
                           the driver.
- assign_cells / semantic_dedup : SemDeDup (Abbas et al. 2023) —
                           cluster the embedding space, drop semantic
                           duplicates (cosine >= eps) within each
                           cluster under the engine-wide keep-min-id
                           rule; the embedding-side complement of
                           MinHash near-dedup.

Hyperplanes are generated deterministically from a seed via the same
xxhash64-expression trick used everywhere else — no RNG state, no Python.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed to resolve pandas_udf type hints
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
    """Zero-norm-safe: a zero vector (e.g. an empty doc's hashed-TF-IDF)
    is defined to have similarity 0.0 to everything rather than raising
    DIVIDE_BY_ZERO under ANSI mode — one degenerate row must not kill a
    corpus-scale job."""
    den = _norm(a) * _norm(b)
    return F.when(den != 0, _dot(a, b) / den).otherwise(F.lit(0.0))


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
    # dot products run once per row, not once per band).  The banded
    # tables carry IDS ONLY — vectors are re-attached once per distinct
    # candidate pair, so the bucket join and the dedup exchange never
    # shuffle embeddings.
    c = (
        corpus.select(
            id_col,
            signature_bits(F.col(vec_col), dim, n_planes, seed).alias("__sig"),
        )
        .select(
            id_col,
            F.explode(_banded_buckets(F.col("__sig"), bands, rows)).alias("bb"),
        )
        .select(id_col, "bb.band", "bb.val")
    )
    q = (
        queries.select(
            query_id_col,
            signature_bits(F.col(query_vec_col), dim, n_planes, seed).alias(
                "__sig"
            ),
        )
        .select(
            query_id_col,
            F.explode(_banded_buckets(F.col("__sig"), bands, rows)).alias("bb"),
        )
        .select(query_id_col, "bb.band", "bb.val")
    )
    cand = c.join(q, ["band", "val"]).select(query_id_col, id_col).distinct()
    # no explicit broadcast hint on the query vectors: the function imposes
    # no bound on the query-set size, so let AQE pick broadcast vs shuffle
    # from the actual size (an unconditional hint OOMs the driver on large
    # query sets; round-2 advice)
    scored = (
        cand.join(corpus.select(id_col, vec_col), id_col)
        .join(queries.select(query_id_col, query_vec_col), query_id_col)
        .select(
            query_id_col,
            id_col,
            cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def fit_centroids(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 7,
    iters: int = 8,
):
    """Deterministic spherical k-means on a bounded driver-side sample.

    The sample is `orderBy(xxhash64(json(vec))).limit(sample_rows)` — Spark
    plans that as TakeOrdered (per-partition top-k + driver merge, NO full
    sort shuffle), so the collect is O(sample_rows) regardless of corpus
    size; everything downstream of the fitted centroids stays distributed.
    Returns a unit-normalized numpy float64 matrix (n_centroids, dim).
    """
    import numpy as np

    sample = (
        corpus.select(F.col(vec_col).alias("v"))
        .where(F.col("v").isNotNull())
        .orderBy(F.xxhash64(F.to_json(F.struct("v"))))
        .limit(sample_rows)
        .collect()
    )
    if not sample:
        raise ValueError(
            "fit_centroids: corpus has no non-null vectors to sample"
        )
    X = np.asarray([r.v for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(X))
    # k-means++-lite init: first pick seeded, then iteratively farthest point
    idx = [int(rng.integers(len(X)))]
    for _ in range(1, k):
        d = 1.0 - np.max(X @ X[idx].T, axis=1)  # cosine distance to nearest
        idx.append(int(np.argmax(d)))
    C = X[idx].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
            else:  # empty cell: reseed to the globally worst-served point
                C[c] = X[np.argmin(np.max(X @ C.T, axis=1))]
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def _assign_cells_udf(centroids, nprobe: int):
    """Arrow-batched nearest-centroid assignment: one numpy matmul per
    batch (no per-row Python).  Returns the nprobe nearest cell ids."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    n = min(nprobe, len(C))

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch: np.asarray([]) is 1-D
            return pd.Series([], dtype=object)
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        top = np.argsort(-sims, axis=1)[:, :n]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return assign


def ivf_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_rows: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path next
    to sign-LSH.  Fit centroids once (bounded sample), assign every corpus
    vector to its nearest cell, assign each query to its nprobe nearest
    cells, equi-join on cell id, exact cosine re-rank inside the probed
    cells.  With nprobe == n_centroids the probed cells cover the whole
    corpus and the result equals brute force exactly.

    At 10^12 scale: the corpus side can be written bucketed/partitioned by
    `__cell`, making the probe join a partition-pruned scan of nprobe/
    n_centroids of the data instead of a full pass.
    """
    C = fit_centroids(
        corpus, dim, n_centroids, vec_col, sample_rows=sample_rows, seed=seed
    )
    one_cell = _assign_cells_udf(C, 1)
    probe_cells = _assign_cells_udf(C, nprobe)
    c = corpus.select(
        id_col, vec_col, F.element_at(one_cell(F.col(vec_col)), 1).alias("__cell")
    )
    q = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(probe_cells(F.col(query_vec_col))).alias("__cell"),
    )
    cand = c.join(F.broadcast(q), "__cell").select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 7,
):
    """Materialize the IVF index as a parquet table PARTITIONED BY cell —
    the write-side half of the 10^12-scale story: once the corpus lives in
    per-cell directories, a probe query's cell filter becomes a partition
    filter and the scan reads only nprobe/n_centroids of the files instead
    of the whole corpus (verified in tests via PartitionFilters +
    scanned-row counts).  Centroids are saved next to the data
    (_ivf_centroids.json) so probes reuse the exact fitted cells.

    Returns the fitted centroid matrix.  The JSON sidecar write uses the
    local filesystem API; on an object store, write it through the same
    FileSystem the parquet goes to.
    """
    import json
    import os

    C = fit_centroids(
        corpus, dim, n_centroids, vec_col, sample_rows=sample_rows, seed=seed
    )
    one_cell = _assign_cells_udf(C, 1)
    (
        corpus.select(
            id_col,
            vec_col,
            F.element_at(one_cell(F.col(vec_col)), 1).alias("__cell"),
        )
        .write.mode("overwrite")
        .partitionBy("__cell")
        .parquet(path)
    )
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as fh:
        json.dump(C.tolist(), fh)
    return C


def ivf_top_k_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe a written IVF index (write_ivf_index) with PARTITION-PRUNED
    scans: the distinct probed cells (bounded by n_centroids — a tiny,
    bounded collect) become a static ``__cell IN (...)`` predicate, which
    Spark turns into a partition filter so only the probed cell directories
    are read.  Everything after the scan matches ivf_top_k: broadcast the
    exploded query-probe table, equi-join on cell, exact cosine re-rank."""
    import json
    import os

    import numpy as np

    with open(os.path.join(index_path, "_ivf_centroids.json")) as fh:
        C = np.asarray(json.load(fh), dtype=np.float64)
    from pyspark import StorageLevel

    probe_cells = _assign_cells_udf(C, nprobe)
    q = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(probe_cells(F.col(query_vec_col))).alias("__cell"),
    )
    # persist: the cell-list collect below and the broadcast join would
    # otherwise each run the centroid-assignment UDF over the full queries
    # lineage (caller owns cache lifetime, cf. estimate_grouping_sets)
    if q.storageLevel == StorageLevel.NONE:
        q = q.persist(StorageLevel.MEMORY_AND_DISK)
    cells = sorted(r[0] for r in q.select("__cell").distinct().collect())
    corpus = spark.read.parquet(index_path).where(F.col("__cell").isin(cells))
    cand = corpus.join(F.broadcast(q), "__cell").select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# product quantization (round 5): compressed-domain ANN.  At 10^12 rows the
# raw float32 embedding table IS the storage bill — PQ (Jegou, Douze,
# Schmid 2011, "Product Quantization for Nearest Neighbor Search") stores
# one byte per subspace instead of 4 bytes per dimension (dim=64, m=8 ->
# 32x smaller), and queries score the compressed codes directly via ADC
# lookup tables without ever reconstructing vectors.
# ---------------------------------------------------------------------------


def fit_pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    nbits: int = 8,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 7,
    iters: int = 10,
):
    """Deterministic PQ codebooks: the corpus is unit-normalized (so ADC
    dot products approximate cosine), split into ``m`` equal subvectors,
    and each subspace gets its own L2 k-means codebook of ``2**nbits``
    centroids, fit on the same bounded TakeOrdered driver sample as
    :func:`fit_centroids` — O(sample_rows) collect regardless of corpus
    size.  Returns a numpy (m, 2**nbits, dim//m) float64 array."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ks = 1 << nbits
    dsub = dim // m
    sample = (
        corpus.select(F.col(vec_col).alias("v"))
        .where(F.col("v").isNotNull())
        .orderBy(F.xxhash64(F.to_json(F.struct("v"))))
        .limit(sample_rows)
        .collect()
    )
    if not sample:
        raise ValueError("fit_pq_codebooks: no non-null vectors to sample")
    X = np.asarray([r.v for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    books = np.zeros((m, ks, dsub))
    for j in range(m):
        S = np.ascontiguousarray(X[:, j * dsub : (j + 1) * dsub])
        k = min(ks, len(S))
        # k-means++-lite init (cf. fit_centroids), then Lloyd iterations
        idx = [int(rng.integers(len(S)))]
        d2 = np.sum((S - S[idx[0]]) ** 2, axis=1)
        for _ in range(1, k):
            nxt = int(np.argmax(d2))
            idx.append(nxt)
            d2 = np.minimum(d2, np.sum((S - S[nxt]) ** 2, axis=1))
        C = S[idx].copy()
        for _ in range(iters):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j, :k] = C
        if k < ks:
            books[j, k:] = C[0]  # degenerate fill; codes never select it
    return books


def _pq_encode_udf(codebooks):
    """Arrow-batched PQ encoder: normalize, split, one (batch x ks)
    distance matrix per subspace — no per-row Python.  Emits m bytes."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ks, dsub = B.shape

    @pandas_udf("binary")
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(X), m), dtype=np.uint8)
        for j in range(m):
            S = X[:, j * dsub : (j + 1) * dsub]
            # ||s - c||^2 = |s|^2 - 2 s.c + |c|^2; |s|^2 constant per row
            d = -2.0 * (S @ B[j].T) + (B[j] ** 2).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d, axis=1)
        return pd.Series([c.tobytes() for c in codes])

    return encode


def pq_encode(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pq_code binary) — m bytes per vector; with dim=64 float32
    input that is a 32x storage reduction.  Deterministic: numpy argmin
    ties resolve to the lowest centroid index on every partitioning."""
    enc = _pq_encode_udf(codebooks)
    return corpus.select(
        F.col(id_col), enc(F.col(vec_col)).alias("pq_code")
    )


def pq_top_k(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k over PQ codes via ADC (asymmetric
    distance computation): each query becomes an (m, 2**nbits) lookup
    table of subvector dot products, and every corpus code is scored as
    m table lookups — the vectors themselves are never read.

    Plan: the query set is collected driver-side to build the LUT tensor
    (bounded by contract — same shape as the brute-force baseline's
    broadcast query side), the LUTs ride into an Arrow-batched
    mapInPandas that emits only the per-batch top-k per query, and one
    final window takes the global top-k — shuffle rows are bounded by
    n_batches x n_queries x k, never by the corpus.  Returns
    (query_id, vec_id, score, rank); ``score`` approximates the cosine
    of the normalized vectors."""
    import numpy as np

    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ks, dsub = B.shape
    qrows = queries.select(query_id_col, query_vec_col).collect()
    if not qrows:
        return codes.sparkSession.createDataFrame(
            [], f"{query_id_col} long, {id_col} long, score double, rank int"
        )
    qids = np.asarray([r[0] for r in qrows])
    Q = np.asarray([r[1] for r in qrows], dtype=np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # luts[q, j, c] = dot(query_subvec_j, codebook[j, c])
    luts = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), m, dsub), B)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.frombuffer(
                b"".join(pdf[code_col]), dtype=np.uint8
            ).reshape(len(pdf), m)
            # scores[q, i] = sum_j luts[q, j, C[i, j]] — index arrays
            # (1, m) x (n, m) broadcast to (n, m), giving (nq, n, m)
            s = luts[:, np.arange(m)[None, :], C].sum(axis=2)
            ids = pdf[id_col].to_numpy()
            kk = min(k, s.shape[1])
            # per-batch partial top-k per query, ordered (score desc,
            # id asc) so boundary ties are partition-invariant — the
            # same rule the final window applies
            rows_q, rows_i, rows_s = [], [], []
            for qi in range(len(qids)):
                order = np.lexsort((ids, -s[qi]))[:kk]
                rows_q.append(np.full(kk, qids[qi]))
                rows_i.append(ids[order])
                rows_s.append(s[qi, order])
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(rows_q),
                    id_col: np.concatenate(rows_i),
                    "score": np.concatenate(rows_s),
                }
            )

    partial = codes.mapInPandas(
        score, f"{query_id_col} long, {id_col} long, score double"
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return partial.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def write_pq_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    m: int = 8,
    nbits: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 7,
):
    """IVF-PQ: the two 10^12-scale levers composed — IVF cell
    partitioning (probe reads nprobe/n_centroids of the FILES) times PQ
    compression (each row is id + m bytes instead of id + dim floats).
    Writes a parquet table (id, pq_code) partitioned by ``__cell`` with
    a JSON sidecar holding both the IVF centroids and the PQ codebooks,
    so probes reproduce the exact fitted quantizers.  Returns
    (centroids, codebooks)."""
    import json
    import os

    C = fit_centroids(
        corpus, dim, n_centroids, vec_col, sample_rows=sample_rows, seed=seed
    )
    books = fit_pq_codebooks(
        corpus, dim, m, nbits, vec_col, sample_rows=sample_rows, seed=seed
    )
    one_cell = _assign_cells_udf(C, 1)
    enc = _pq_encode_udf(books)
    (
        corpus.select(
            id_col,
            enc(F.col(vec_col)).alias("pq_code"),
            F.element_at(one_cell(F.col(vec_col)), 1).alias("__cell"),
        )
        .write.mode("overwrite")
        .partitionBy("__cell")
        .parquet(path)
    )
    with open(os.path.join(path, "_pq_index.json"), "w") as fh:
        json.dump({"centroids": C.tolist(), "codebooks": books.tolist()}, fh)
    return C, books


def pq_top_k_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe a written IVF-PQ index: the union of every query's nprobe
    nearest cells becomes a static partition filter (only those cell
    directories are READ — 8-byte rows at that), and the pruned code
    scan feeds straight into :func:`pq_top_k`'s ADC scoring.  Scoring a
    scanned row against a query that did not probe its cell only ever
    ADDS recall, so the per-query result is a superset-quality version
    of strict per-query probing at identical scan cost."""
    import json
    import os

    import numpy as np

    with open(os.path.join(index_path, "_pq_index.json")) as fh:
        meta = json.load(fh)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    probe_cells = _assign_cells_udf(C, nprobe)
    cells = sorted(
        r[0]
        for r in queries.select(
            F.explode(probe_cells(F.col(query_vec_col))).alias("__cell")
        )
        .distinct()
        .collect()
    )
    codes = spark.read.parquet(index_path).where(F.col("__cell").isin(cells))
    return pq_top_k(
        codes.select(id_col, "pq_code"),
        queries,
        books,
        k,
        id_col=id_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    )


def near_duplicates_by_cosine(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 24,
    bands: int = 8,
    seed: int = 5,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Embedding near-dup pairs: sign-LSH self-join then exact cosine
    filter. Returns (id_a, id_b, cosine) with id_a < id_b.

    The banded table and the candidate-dedup exchange carry ids only —
    embeddings are re-attached ONCE per distinct pair for the exact cosine
    re-rank (the earlier formulation shuffled both full vectors through the
    pair distinct).  Buckets above ``max_bucket_size`` are dropped with a
    logged warning (hllspark.lshutil): a degenerate bucket — zero vectors,
    templated embeddings — would make the self-join O(bucket^2).
    """
    from pyspark import StorageLevel

    from .lshutil import drop_oversize_buckets

    rows = n_planes // bands
    sigs = (
        df.select(
            id_col,
            signature_bits(F.col(vec_col), dim, n_planes, seed).alias("__sig"),
        )
        .select(
            id_col,
            F.explode(_banded_buckets(F.col("__sig"), bands, rows)).alias("bb"),
        )
        .select(id_col, "bb.band", "bb.val")
    )
    # persist: both self-join sides would otherwise recompute the
    # n_planes-dot-product signatures (cf. dedup.minhash_lsh_candidates);
    # the banded table is three scalars per (doc, band) — no vectors
    if sigs.storageLevel == StorageLevel.NONE:
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    sigs = drop_oversize_buckets(
        sigs, ["band", "val"], max_bucket_size, "near_duplicates_by_cosine"
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
        )
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Distributed Lloyd k-means + SemDeDup-style semantic dedup (round 5)
# ---------------------------------------------------------------------------


def _seed_rows(
    corpus: DataFrame, k: int, id_col: str, vec_col: str, seed: int
) -> list:
    """The k (id, vec) rows with the smallest md5(id || seed) — a
    deterministic, engine-portable pseudo-random sample.  Spark plans the
    orderBy().limit() as TakeOrdered (per-partition top-k + driver merge,
    no sort shuffle), so the collect is O(k) regardless of corpus size."""
    return (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .where(F.col("v").isNotNull())
        .orderBy(
            F.md5(
                F.concat_ws("|", F.col("i").cast("string"), F.lit(str(seed)))
            ),
            F.col("i"),
        )
        .limit(k)
        .collect()
    )


def kmeans_fit_distributed(
    corpus: DataFrame,
    dim: int,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
):
    """Spherical Lloyd k-means over the FULL corpus — the scale-up of
    `fit_centroids` (which irons a 4096-row driver sample).  Every
    iteration is two distributed steps and one bounded collect:

    1. assignment: one Arrow-batched matmul per batch against the
       broadcast (k, dim) centroid matrix (`_assign_cells_udf`) — no
       shuffle, no per-row Python;
    2. centroid update: L2-normalize each member vector in-plan, then
       `posexplode` to (cell, pos, x) and ONE map-side-combined
       `groupBy(cell, pos).agg(sum, count)` — the reduce side sees at
       most k*dim rows no matter the corpus size, and that k*dim-row
       result is the only thing collected (Lloyd centroids are driver
       state by definition; same contract as the grouped-cumsum collects
       elsewhere in the engine).

    Init is the k rows with smallest md5(id || seed) (deterministic,
    engine-portable — see `_seed_rows`).  Empty cells keep their previous
    centroid.  Returns a unit-normalized float64 numpy matrix (k, dim).

    At 10^12 rows the per-iteration cost is one corpus scan + one
    (cell, pos)-keyed shuffle of k*dim partial sums per partition —
    exactly the shape MLlib's KMeans uses, expressed in DataFrame ops.
    """
    import numpy as np

    rows = _seed_rows(corpus, k, id_col, vec_col, seed)
    if not rows:
        raise ValueError("kmeans_fit_distributed: corpus has no vectors")
    C = np.asarray([r.v for r in rows], dtype=np.float64)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    base = corpus.select(F.col(vec_col).alias("v")).where(F.col("v").isNotNull())
    for _ in range(iters):
        sums = (
            base.mapInArrow(
                _lloyd_partials(C), "cell int, pos int, s double, n long"
            )
            .groupBy("cell", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        nxt = C.copy()
        seen = set()
        for r in sums:
            nxt[r.cell, r.pos] = r.s / r.n
            seen.add(r.cell)
        nrm = np.maximum(np.linalg.norm(nxt, axis=1, keepdims=True), 1e-12)
        nxt /= nrm
        for c in range(len(C)):  # empty cell: keep previous centroid
            if c not in seen:
                nxt[c] = C[c]
        C = nxt
    return C


def _lloyd_partials(centroids):
    """One Lloyd iteration's map side as an Arrow-batch kernel: assign the
    batch (one matmul), scatter-add unit vectors per cell (np.add.at), and
    emit AT MOST k*dim partial-sum rows per batch — the treeAggregate
    shape: per-partition build, commutative merge.  (The earlier
    formulation — pandas-UDF assignment + posexplode + groupBy — shipped
    every (row, pos) pair through the aggregate AND re-evaluated the
    Python UDF under the generator: 30s/iteration at 10^5 x 512 where
    this kernel takes well under a second.)"""
    import numpy as np

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    k, dim = C.shape

    def partials(batches):
        import pyarrow as pa

        for batch in batches:
            vecs = batch.column(0).to_pylist()
            if not vecs:
                continue
            X = np.asarray(vecs, dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            cells = np.argmax(X @ C.T, axis=1)
            S = np.zeros((k, dim))
            np.add.at(S, cells, X)
            n = np.bincount(cells, minlength=k).astype("int64")
            live = np.flatnonzero(n)
            cell_rep = np.repeat(live, dim).astype("int32")
            pos_rep = np.tile(np.arange(dim, dtype="int32"), len(live))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cell_rep, type=pa.int32()),
                    pa.array(pos_rep, type=pa.int32()),
                    pa.array(S[live].ravel(), type=pa.float64()),
                    pa.array(
                        np.repeat(n[live], dim).astype("int64"),
                        type=pa.int64(),
                    ),
                ],
                names=["cell", "pos", "s", "n"],
            )

    return partials


def assign_cells(
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Nearest-centroid (max cosine) assignment → (id_col, vec_col, cell).

    impl='arrow' (default): one numpy matmul per Arrow batch — the scale
    path.  impl='expr': broadcast cross-join against a k-row centroid
    table with the cosine computed in native SQL and the argmax taken as
    `row_number() over (partition by id order by cos desc, cell asc)` —
    fully declarative and replicable verbatim in any SQL engine (the
    contract-oracle path).  Both tie-break toward the lowest cell id.
    """
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    if impl == "arrow":
        # unit-normalize so the batch matmul's dot-product argmax IS the
        # cosine argmax even for caller-supplied raw centroids (the expr
        # path needs nothing: cosine() normalizes internally)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        one = _assign_cells_udf(C, 1)
        return corpus.select(
            id_col, vec_col, F.element_at(one(F.col(vec_col)), 1).alias("cell")
        )
    if impl != "expr":
        raise ValueError(f"assign_cells: unknown impl {impl!r}")
    spark = corpus.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(C)],
        "cell int, __c array<double>",
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("__cos"), F.asc("cell")
    )
    return (
        corpus.select(id_col, vec_col)
        .crossJoin(F.broadcast(cents))
        .withColumn("__cos", cosine(F.col(vec_col), F.col("__c")))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, vec_col, "cell")
    )


def semantic_dedup(
    corpus: DataFrame,
    dim: int,
    eps: float = 0.95,
    n_clusters: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    impl: str = "arrow",
    max_cluster_size: int | None = 65536,
    seed: int = 7,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space with k-means, then drop semantic duplicates WITHIN
    each cluster — the embedding-side complement of MinHash (which sees
    token overlap but not paraphrase).  Returns
    (id_col, cell int, kept boolean); survivors = ``where(kept)``.

    Keep policy (deterministic, order-free): a document is dropped iff
    some LOWER-id document in the SAME cluster has cosine >= eps with it
    — the engine-wide keep-min-id rule, expressed as one anti-join.

    Plan shape: assignment (Arrow matmul, zero exchanges — or the
    declarative 'expr' path, one broadcast cross-join), then a cell-keyed
    self-join carrying (id, cell) plus ONE vector re-attach per side, then
    an id-keyed anti-join.  The quadratic blow-up inside a degenerate
    cluster (templated embeddings) is capped by ``max_cluster_size`` with
    the dropped mass logged (`hllspark.lshutil`), same contract as the
    LSH buckets — over-cap clusters keep ALL their members.  At 10^12
    rows k is sized so clusters stay ~10^5 (the paper runs k=50k), and
    the self-join input carries 12-byte rows, not vectors.

    ``centroids`` (array-like (k, dim)) skips the k-means fit — the
    reproducibility path (fit once, reuse across corpus snapshots) and
    the contract-oracle path.

    The two impls score pairs differently but decide identically
    (pytest-gated equivalence): 'arrow' runs ONE `applyInPandas` over
    the cell groups — a blockwise unit-vector matmul per cluster, so the
    whole dedup is a single cell-keyed exchange and the pair scoring is
    vectorized numpy (the declarative self-join evaluates an interpreted
    higher-order-function cosine per pair — measured 10x slower at 10^5
    rows / k=512); 'expr' keeps the fully declarative join form the
    DuckDB contract oracle replicates verbatim.
    """
    from .lshutil import drop_oversize_buckets, logger as _lshlog

    if centroids is None:
        centroids = kmeans_fit_distributed(
            corpus, dim, k=n_clusters, iters=iters,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
    assigned = assign_cells(corpus, centroids, id_col, vec_col, impl)

    if impl == "arrow":
        id_type = corpus.schema[id_col].dataType.simpleString()
        out_schema = f"{id_col} {id_type}, cell int, kept boolean"
        cap = max_cluster_size

        def dedup_cell(pdf):
            import numpy as np
            import pandas as pd

            ids = pdf[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            cell = pdf["cell"].iloc[0]
            kept = np.ones(len(ids), dtype=bool)
            if cap is None or len(ids) <= cap:
                U = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )[order]
                U /= np.maximum(
                    np.linalg.norm(U, axis=1, keepdims=True), 1e-12
                )
                # blockwise: never materialize the full c x c sim matrix
                for lo in range(1, len(ids), 1024):
                    hi = min(lo + 1024, len(ids))
                    sims = U[lo:hi] @ U.T  # rows lo..hi vs ALL
                    for j in range(lo, hi):
                        if (sims[j - lo, :j] >= eps).any():
                            kept[j] = False
            return pd.DataFrame(
                {id_col: ids, "cell": cell, "kept": kept}
            )

        if cap is not None:
            over = (
                assigned.groupBy("cell")
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > cap)
                .agg(F.count(F.lit(1)), F.coalesce(F.sum("__n"), F.lit(0)))
                .first()
            )
            if over[0]:
                _lshlog.warning(
                    "semantic_dedup: %d over-cap cluster(s) holding %d rows "
                    "(cap=%d) keep ALL their members — raise n_clusters or "
                    "max_cluster_size to dedup inside them",
                    over[0], over[1], cap,
                )
        return assigned.groupBy("cell").applyInPandas(dedup_cell, out_schema)

    ids = assigned.select(id_col, "cell")
    ids = ids.localCheckpoint(eager=True)  # cut the lineage: assignment
    # is reused by the self-join (twice) and the final projection
    joinable = drop_oversize_buckets(
        ids, ["cell"], max_cluster_size, "semantic_dedup"
    )
    l, r = joinable.alias("l"), joinable.alias("r")
    cand = l.join(
        r,
        (F.col("l.cell") == F.col("r.cell"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    drops = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .where(cosine(F.col("va"), F.col("vb")) >= eps)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return ids.join(drops.withColumn("__d", F.lit(True)), id_col, "left").select(
        id_col, "cell", F.coalesce(~F.col("__d"), F.lit(True)).alias("kept")
    )


def gram_matrix(corpus: DataFrame, dim: int, vec_col: str = "embedding"):
    """EXACT Gram matrix A^T A of an embedding column as a (dim, dim)
    numpy array — the verification / exact-PCA counterpart of the
    frequent-directions sketch (sketches/freqdir.py).

    Same treeAggregate shape as kmeans_fit_distributed: one Arrow-batch
    X^T X matmul per batch (map-side), then ONE groupBy(i, j) sum whose
    reduce side sees at most dim*(dim+1)/2 rows per partition regardless
    of corpus size, and only that bounded triangle is collected (a Gram
    matrix is driver state by definition, like Lloyd centroids).  At
    dim=768 the collect is ~295k scalar rows — fine; the corpus itself
    never shuffles."""
    import numpy as np
    import pyarrow as pa

    iu = np.triu_indices(dim)
    ii = iu[0].astype("int32")
    jj = iu[1].astype("int32")

    def partials(batches):
        for batch in batches:
            vecs = batch.column(0).to_pylist()
            if not vecs:
                continue
            X = np.asarray(vecs, dtype=np.float64)
            G = X.T @ X
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ii, type=pa.int32()),
                    pa.array(jj, type=pa.int32()),
                    pa.array(G[iu], type=pa.float64()),
                ],
                names=["i", "j", "s"],
            )

    rows = (
        corpus.select(F.col(vec_col).alias("v"))
        .where(F.col("v").isNotNull())
        .mapInArrow(partials, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    G = np.zeros((dim, dim))
    for r in rows:
        G[r.i, r.j] = r.s
        G[r.j, r.i] = r.s
    return G


def fd_sketch(
    corpus: DataFrame,
    dim: int,
    ell: int = 64,
    vec_col: str = "embedding",
    keys=None,
):
    """Frequent-directions covariance/PCA sketch of an embedding column
    through the shared two-phase plan: DataFrame[keys..., sketch binary]
    (one O(ell*dim) state per group; the corpus never shuffles raw rows).
    Decode with sketches.freqdir.decode; query with gram_estimate /
    top_directions / cov_error_bound."""
    from .sketches import freqdir, generic

    return generic.sketch_agg(corpus, vec_col, freqdir.kind(ell, dim), keys=keys)


def pca_project(
    corpus: DataFrame,
    components,
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Project embeddings onto an (r, dim) orthonormal row basis (e.g.
    freqdir.top_directions of an fd_sketch): adds ``out_col`` as
    array<double> of length r.  One broadcast (r, dim) matrix + one
    matmul per Arrow batch — no shuffle, composes with pq_encode /
    ivf_top_k downstream (dimensionality reduction before quantization,
    the classic IVF-PQ preprocessing)."""
    import numpy as np

    P = np.ascontiguousarray(components, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def proj(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        Y = X @ P.T
        return pd.Series(list(Y))

    return corpus.withColumn(out_col, proj(F.col(vec_col)))
