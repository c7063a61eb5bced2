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
