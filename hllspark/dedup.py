"""Deduplication operators for large-scale training-data pipelines.

All plans are shuffle-conscious:
- exact dedup         : hash-groupBy on a 64-bit content fingerprint (one
                        shuffle of (fingerprint, id) pairs, never raw text).
- minhash + LSH       : shingle -> minhash signature (pure SQL aggregate) ->
                        band buckets -> self-join within buckets only
                        (classic LSH: candidate pairs ~ O(similar pairs),
                        not O(n^2)).
- simhash             : 64-bit simhash from token hashes (pure SQL bit ops),
                        near-dup = same value in rotated prefix buckets or
                        hamming distance <= k on candidates.
- n-gram jaccard      : exact verification operator for candidate pairs.
- duplicate clusters  : connected components over the near-dup pair graph
                        (min-label propagation; one bounded join + min-agg
                        per round) -> deduplicate_near keeps one
                        representative per cluster.
- embedding cosine    : see hllspark.similarity (near_duplicates_by_cosine).

Every LSH self-join routes through lshutil.drop_oversize_buckets (bounded
worst case + logged drop telemetry).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .text import content_fingerprint, shingles, words_col


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical (normalized) documents: returns
    (fingerprint, n_copies, doc_ids array) for groups with > 1 member.
    Shuffles only (fingerprint, id)."""
    fp = df.select(
        content_fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col)
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_copies") > 1)
    )


def deduplicate_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per identical-content group.
    Window over fingerprint — a single hash-partitioned shuffle."""
    w = Window.partitionBy(content_fingerprint(F.col(text_col))).orderBy(
        F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    text, k: int = 3, num_hashes: int = 64, seed: int = 7
):
    """num_hashes-wide MinHash signature as array<bigint>, entirely in SQL:
    per permutation i, min over shingles of xxhash64(shingle, seed+i).
    Documents with no shingles get an empty signature.

    Column-expression form: fine for one-off use, but the shingle
    construction is re-evaluated per permutation at runtime (lambda bodies
    are not CSE'd across higher-order-function calls) — the dataframe-level
    builders below materialize the gram array once instead."""
    grams = shingles(text, k)
    return F.when(F.size(grams) < 1, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(grams, lambda g: F.xxhash64(g, i + F.lit(seed)))
            ),
        )
    )


def _minhash_signatures_df(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    num_hashes: int,
    seed: int,
) -> DataFrame:
    """(id, __sig) with the gram array materialized in its OWN projection.

    The permutation array is unrolled in Python so the gram column is
    referenced num_hashes times at the top level — Catalyst's
    CollapseProject keeps a non-cheap alias referenced more than once
    un-inlined, so shingling runs once per row instead of once per
    permutation (verified via .explain: Project(__grams) survives).
    Docs with fewer than k tokens (no shingles) are pre-filtered with a
    cheap pushable predicate.  Signature values are identical to
    minhash_signature."""
    has_shingles = F.size(words_col(F.col(text_col))) >= F.lit(k)
    grams = df.where(has_shingles).select(
        F.col(id_col), shingles(F.col(text_col), k).alias("__grams")
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("__grams"), lambda g, i=i: F.xxhash64(g, F.lit(seed + i))
                )
            )
            for i in range(num_hashes)
        ]
    )
    return grams.select(F.col(id_col), sig.alias("__sig"))


def _banded_df(sig: DataFrame, id_col: str, bands: int, rows: int) -> DataFrame:
    """(id, band, bucket) from an (id, __sig) signature table.  Bands are
    unrolled in Python: __sig referenced `bands` times keeps its projection
    un-collapsed, so the signature is computed once per row, not per band.
    The bucket is xxhash64 over the band's `rows` signature LONGS directly
    (round 5) — the previous cast-to-string/array_join form allocated
    bands x rows strings per row for no semantic gain.  Bucket values
    changed with this; persisted indexes are guarded by _read_meta's
    layout check (the round-5 batch-directory layout changed in the same
    release, so any older index already fails loudly there)."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at(F.col("__sig"), b * rows + j + 1)
                        for j in range(rows)
                    ]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    rows = num_hashes / bands hashes per band; two docs collide if any band
    of their signatures is identical.  Plan: explode to (band_id,
    band_hash, id) -> groupBy bucket -> pairs within bucket.  The self-join
    is on (band_id, band_hash) — co-partitioned, no broadcast of the corpus.
    Returns distinct (id_a, id_b) with id_a < id_b.

    ``max_bucket_size`` bounds the within-bucket self-join: a degenerate
    bucket (boilerplate corpus, thousands of identical documents) is
    O(bucket^2) and would dominate at 10^12-row scale; buckets above the
    cap are dropped with a logged warning (see hllspark.lshutil) — collapse
    exact duplicates upstream with deduplicate_exact first
    (deduplicate_near composes that collapse automatically).

    NOTE: with a cap set, CONSTRUCTING this plan runs one eager aggregation
    job over the banded table (the drop-telemetry pass — measured ~1% of
    the end-to-end near-dup cost, see PLANS.md §2); build the plan once and
    reuse it rather than re-calling this in a loop.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows = num_hashes // bands
    sig = _minhash_signatures_df(df, text_col, id_col, k, num_hashes, seed)
    banded = _banded_df(sig, id_col, bands, rows)
    # persist: the self-join's two aliases would otherwise each re-derive
    # the full signature lineage (shingling + num_hashes permutations) —
    # the banded table is tiny (#docs x bands rows of three scalars)
    from pyspark import StorageLevel

    from .lshutil import drop_oversize_buckets

    if banded.storageLevel == StorageLevel.NONE:
        banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    banded = drop_oversize_buckets(
        banded, ["band", "bucket"], max_bucket_size, "minhash_lsh_candidates"
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact word-k-gram Jaccard similarity for candidate pairs — the
    verification stage after LSH.  Joins the (small) pair list against the
    corpus twice, then set arithmetic on shingle arrays."""
    # shingle ONLY the documents that appear in a candidate pair: the gram
    # construction over full long documents dominates (measured 6s for the
    # whole corpus at sf0.1 vs 0.4s for the ~2x#pairs docs actually
    # needed), and join order can't fix what the projection computes.
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    g = (
        docs.join(F.broadcast(ids), id_col)
        .select(
            F.col(id_col),
            F.array_distinct(shingles(F.col(text_col), k)).alias("__g"),
        )
    )
    from pyspark import StorageLevel

    if g.storageLevel == StorageLevel.NONE:
        g = g.persist(StorageLevel.MEMORY_AND_DISK)  # shared by both joins
    out = (
        pairs.join(
            g.withColumnRenamed(id_col, "id_a").withColumnRenamed("__g", "ga"),
            "id_a",
        )
        .join(
            g.withColumnRenamed(id_col, "id_b").withColumnRenamed("__g", "gb"),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return out.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter / union).otherwise(0.0).alias("jaccard"),
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact jaccard filter."""
    cand = minhash_lsh_candidates(
        df, text_col, id_col, k, num_hashes, bands, seed, max_bucket_size
    )
    return ngram_jaccard(cand, df, text_col, id_col, k).where(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al. 2014, 'Connected Components in
    MapReduce and Beyond'): every node connects its strictly-LARGER
    neighbors to the minimum of its closed neighborhood.  One groupBy +
    one join, both keyed on the node — shuffle bounded by the edge count."""
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = und.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("__m")
    )
    return (
        und.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient each edge high->low, then every node links
    ALL its smaller neighbors (and itself) to the minimum one."""
    oriented = edges.where(F.col("src") != F.col("dst")).select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("__m"))
    joined = oriented.join(mins, "src")
    lo_links = joined.where(F.col("dst") != F.col("__m")).select(
        F.col("dst").alias("src"), F.col("__m").alias("dst")
    )
    hi_links = joined.select(F.col("src"), F.col("__m").alias("dst"))
    return lo_links.unionByName(hi_links).distinct()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components of the (undirected) pair graph: returns
    (id, component) where component is the smallest id in the node's
    component — the canonical representative used by near-dup clustering.

    Algorithm: alternating large-star / small-star rounds (Kiveris et al.
    2014) — each round is two bounded-shuffle groupBy+join passes over the
    CURRENT edge set (never the corpus), and the edge set contracts toward
    a star per component in O(log n) rounds even on pathological
    chain/path graphs (the round-2 min-label-propagation version needed
    graph-diameter rounds and raised on long chains; pytest covers a
    10k-node path converging in ~15 rounds).  Edges are
    localCheckpoint()ed each round to keep the lineage flat (the same
    reason GraphX/Pregel materializes per superstep); convergence =
    small-star output identical to the previous round's, detected with one
    exceptAll count per round.  Raises if not converged within
    ``max_iterations`` (needs ~2*log2(n) rounds — 50 covers any
    realistically material graph).  Ids keep their native type
    (string/long alike — only ordering is required).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # singleton pairs (id_a == id_b) still name a node: remember every node
    # seen in the input so the label output covers them
    nodes = (
        pairs.select(F.col(id_a).alias("id"))
        .unionByName(pairs.select(F.col(id_b).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        changed = new_edges.exceptAll(edges).count() + edges.exceptAll(
            new_edges
        ).count()
        edges = new_edges
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    # converged star edges are (member, root) with root = component min;
    # nodes absent from the star edges are their own component
    members = edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = nodes.join(
        edges.select(F.col("src").alias("id")), "id", "left_anti"
    ).select("id", F.col("id").alias("component"))
    return members.unionByName(roots)


def deduplicate_near(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Near-duplicate corpus dedup end to end: exact-duplicate collapse ->
    MinHash+LSH pairs over the per-fingerprint representatives ->
    connected components -> keep the smallest id per component (plus all
    documents in no near-dup pair).  The anti-join removes only non-
    representative members, so the output schema equals the input schema.

    The exact collapse (fingerprint groupBy, min-id representative) is NOT
    just an optimization — it is what makes the over-cap bucket guard safe:
    a degenerate corpus with thousands of byte-identical copies previously
    flooded an LSH bucket past ``max_bucket_size``, and the dropped bucket
    silently lost real near-dup pairs.  Collapsing identical documents
    first means an over-cap bucket can only arise from thousands of
    DISTINCT texts colliding in one band — the true pathological case the
    cap exists for.  Exact duplicates are clustered transitively through
    their representative: component(doc) = component(rep(fingerprint(doc)))
    and the representative (min id per fingerprint group) preserves the
    min-id-per-component survivor rule.

    Documents too short to shingle (< k tokens) are OUTSIDE near-dup
    semantics (k-gram jaccard is undefined on them) and are always kept —
    so they are also excluded from the exact collapse, keeping this
    operator's keep-set exactly the jaccard-threshold definition the
    exhaustive oracle computes."""
    has_shingles = F.size(words_col(F.col(text_col))) >= F.lit(k)
    fp = df.select(
        F.col(id_col),
        F.when(has_shingles, content_fingerprint(F.col(text_col))).alias(
            "__fp"
        ),
    )
    doc2rep = (
        fp.join(
            fp.where(F.col("__fp").isNotNull())
            .groupBy("__fp")
            .agg(F.min(id_col).alias("__rep")),
            "__fp",
            "left",
        )
        .select(
            id_col, F.coalesce(F.col("__rep"), F.col(id_col)).alias("__rep")
        )
    )
    reps = df.join(
        doc2rep.where(F.col(id_col) == F.col("__rep")).select(id_col), id_col
    )
    pairs = minhash_near_duplicates(
        reps, text_col, id_col, threshold, k, num_hashes, bands, seed,
        max_bucket_size,
    )
    comp = connected_components(pairs)
    doc_comp = doc2rep.join(
        comp, doc2rep["__rep"] == comp["id"], "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col("__rep")).alias("__component"),
    )
    losers = doc_comp.where(F.col(id_col) != F.col("__component")).select(
        F.col(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_from_hashes(hashes) -> "F.Column":
    """64-bit SimHash from a precomputed array<bigint> of token hashes:
    for each bit b, the sign of sum over tokens of (bit b set ? +1 : -1).

    Separated from :func:`simhash` for callers that already carry a
    token-hash array (it composes with :func:`token_hashes`).  NOTE this
    is NOT the PLANS §31 lambda-capture trap: the 64 bit-vote references
    to ``hashes`` are SIBLINGS at the projection top level, which
    codegen's subexpression elimination already collapses — measured at
    parity (0.24s vs 0.25s, 200k pages) with the materialized-column
    form.  The trap only bites when the repeated expression sits INSIDE
    a lambda (per-element re-evaluation), as winnowing's sliding window
    did."""

    def bit(b):  # b: Column bit index
        return F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc + F.when(F.getbit(h, b) == 1, 1).otherwise(-1),
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    def half(hi, lo):  # MSB-first acc*2+bit: fits 32 bits, no ANSI overflow
        return F.aggregate(
            F.sequence(F.lit(hi), F.lit(lo), F.lit(-1)),
            F.lit(0).cast("long"),
            lambda acc, b: acc * 2 + bit(b),
        )

    return F.shiftleft(half(63, 32), 32).bitwiseOR(half(31, 0))


def simhash(text, seed: int = 11):
    """64-bit SimHash of the whitespace tokens, pure SQL: for each bit b,
    the sign of sum over tokens of (bit b of xxhash64(token) ? +1 : -1)."""
    words = words_col(text)
    hashes = F.transform(words, lambda w: F.xxhash64(w, F.lit(seed)))
    return simhash_from_hashes(hashes)


def token_hashes(text, seed: int = 11):
    """array<bigint> of xxhash64(token, seed) for the engine tokenizer's
    tokens — the materialization target for simhash_from_hashes."""
    return F.transform(words_col(text), lambda w: F.xxhash64(w, F.lit(seed)))


def winnow_fingerprint_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(id, fingerprint) — one row per distinct winnowing fingerprint of
    each document (Schleimer et al. 2003 selection over word-k-gram
    xxhash64 values; text.sliding_min).

    The k-gram hash array gets its OWN projection: sliding_min references
    it ``window`` times as HOF/slice arguments, and expressions containing
    lambda functions are excluded from codegen subexpression elimination —
    but CollapseProject keeps a non-cheap alias referenced more than once
    un-inlined (same trick as _minhash_signatures_df), so the shingle+hash
    chain runs once per row instead of once per reference.  Measured
    (200k ~100-token pages, PLANS §32): 638 rows/s (pre-round-5
    transform(sequence) form) -> 5.2k (sliding_min column form) -> 20.0k
    rows/s (this shape), identical fingerprints."""
    from .text import shingles, sliding_min

    hashed = df.select(
        F.col(id_col),
        F.transform(
            shingles(F.col(text_col), k), lambda g: F.xxhash64(g)
        ).alias("__h"),
    )
    return hashed.select(
        F.col(id_col),
        F.explode(sliding_min(F.col("__h"), window)).alias("fingerprint"),
    )


def winnow_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    min_overlap: float = 0.5,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Near-dup pairs by WINNOWING fingerprints (Schleimer et al. 2003 —
    the MOSS scheme): each document keeps the per-window minima of its
    k-gram hashes (text.winnow_fingerprints); documents sharing at least
    ``min_shared`` fingerprints AND a shared fraction >= ``min_overlap``
    (of the smaller document's fingerprint set) are reported as
    (id_a, id_b, n_shared, overlap).

    Complementary to MinHash-LSH: winnowing GUARANTEES detection of any
    shared run of >= window + k - 1 tokens (a positional/substring
    signal), while MinHash estimates whole-document set Jaccard.  Plan:
    explode fingerprints (a few % of tokens), cap degenerate fingerprint
    buckets (hllspark.lshutil, the O(bucket^2) guard), fingerprint-
    co-partitioned self-join, pair-grain count — shuffle carries (id,
    fp) longs only."""
    from .lshutil import drop_oversize_buckets

    # localCheckpoint, not persist: the fingerprint table feeds the cap
    # pass, the per-doc counts and both self-join sides, but the returned
    # plan escapes this function so a persist could never be unpersisted
    # (the round-4 cache-lifecycle rule; blocks free on GC)
    fps = (
        winnow_fingerprint_rows(df, text_col, id_col, k, window)
        .withColumnRenamed("fingerprint", "__fp")
        .localCheckpoint(eager=True)
    )
    counts = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("__nfp"))
    capped = drop_oversize_buckets(fps, ["__fp"], max_bucket_size, "winnow")
    a = capped.select(F.col(id_col).alias("id_a"), "__fp")
    b = capped.select(F.col(id_col).alias("id_b"), "__fp")
    shared = (
        a.join(b, "__fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= F.lit(int(min_shared)))
    )
    out = (
        shared.join(
            counts.select(F.col(id_col).alias("id_a"), F.col("__nfp").alias("__na")),
            "id_a",
        )
        .join(
            counts.select(F.col(id_col).alias("id_b"), F.col("__nfp").alias("__nb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_shared",
            (
                F.col("n_shared")
                / F.least(F.col("__na"), F.col("__nb")).cast("double")
            ).alias("overlap"),
        )
        .where(F.col("overlap") >= F.lit(float(min_overlap)))
    )
    return out


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 11,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket by 4 x 16-bit chunks (any pair
    within hamming distance 3 shares at least one identical chunk —
    pigeonhole), then verify hamming distance on candidates. Self-join is
    chunk-co-partitioned.  Buckets above ``max_bucket_size`` are dropped
    with a logged warning (hllspark.lshutil) — the O(bucket^2) guard."""
    sh = df.select(F.col(id_col), simhash(F.col(text_col), seed).alias("__sh"))
    chunks = sh.select(
        id_col,
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("__sh"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "__sh", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))
    # persist: both self-join aliases would otherwise recompute the
    # simhash (token hashing + 64 bit-votes) lineage per side
    from pyspark import StorageLevel

    from .lshutil import drop_oversize_buckets

    if chunks.storageLevel == StorageLevel.NONE:
        chunks = chunks.persist(StorageLevel.MEMORY_AND_DISK)
    chunks = drop_oversize_buckets(
        chunks, ["chunk", "val"], max_bucket_size, "simhash_near_duplicates"
    )
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.__sh").alias("sha"),
            F.col("r.__sh").alias("shb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# incremental near-dup index (dedup new batches against a stored corpus)
# ---------------------------------------------------------------------------

_LSH_META = "_lsh_meta.json"


def write_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
) -> None:
    """Persist the corpus LSH state so FUTURE batches dedup against it
    without re-signaturing the corpus: ``signatures/`` (id, sig) and
    ``banded/`` (id, band, bucket) parquet tables plus a parameter
    sidecar.  At 100 TB this is the shape incremental ingest needs — the
    index holds ~(64 longs + 16 band rows) per document, ~1% of the
    text, and one write amortizes over every later batch.

    Crash safety: each ingest (this initial write and every
    :func:`append_to_index`) lands under ``signatures/batch=<n>`` /
    ``banded/batch=<n>`` and becomes visible only when the sidecar's
    committed-batch list is atomically replaced (write-temp +
    ``os.replace``) AFTER both parquet writes succeed.  A crash mid-
    write leaves orphan uncommitted directories that readers never
    touch; re-running the ingest picks a fresh batch id.  The sidecar
    protocol assumes a SINGLE WRITER at a time (the ingest-loop shape);
    concurrent appends need an external lock.  Sidecar I/O is driver-
    side posix — swap for the Hadoop FS API on an object store."""
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows = num_hashes // bands
    from pyspark import StorageLevel

    sig = _minhash_signatures_df(df, text_col, id_col, k, num_hashes, seed)
    sig = sig.select(F.col(id_col).alias("id"), F.col("__sig").alias("sig"))
    if sig.storageLevel == StorageLevel.NONE:
        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    sig.write.mode("overwrite").parquet(f"{path}/signatures/batch=0")
    _banded_df(sig.select(F.col("id"), F.col("sig").alias("__sig")), "id", bands, rows) \
        .write.mode("overwrite").parquet(f"{path}/banded/batch=0")
    sig.unpersist()
    _commit_meta(
        path,
        {
            "k": k,
            "num_hashes": num_hashes,
            "bands": bands,
            "seed": seed,
            "batches": [0],
        },
    )


def _commit_meta(path: str, meta: dict) -> None:
    """Atomically publish the sidecar: write-temp + ``os.replace`` so a
    reader sees either the old or the new committed-batch list, never a
    torn file. Single-writer by contract."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    tmp = f"{path}/{_LSH_META}.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, f"{path}/{_LSH_META}")


def _read_meta(path: str) -> dict:
    import json

    with open(f"{path}/{_LSH_META}") as fh:
        meta = json.load(fh)
    if "batches" not in meta:
        raise ValueError(
            f"LSH index at {path!r} was written by an older hllspark "
            "(pre-batch-directory layout / string band buckets); rebuild "
            "it with write_minhash_index"
        )
    return meta


def _next_batch_id(path: str, meta: dict) -> int:
    """First id above BOTH the committed list and any orphan directory a
    crashed append left behind — never write into an orphan."""
    import os
    import re

    used = set(meta.get("batches", [0]))
    for sub in ("signatures", "banded"):
        d = f"{path}/{sub}"
        if os.path.isdir(d):
            for name in os.listdir(d):
                m = re.fullmatch(r"batch=(\d+)", name)
                if m:
                    used.add(int(m.group(1)))
    return max(used) + 1


def append_to_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Promote a (already deduplicated) batch into an existing index
    WITHOUT rewriting it: the batch's signatures and banded rows land
    under a fresh ``batch=<n>`` directory pair and become visible in ONE
    atomic step — the sidecar's committed-batch list is replaced (write-
    temp + ``os.replace``) only after BOTH parquet writes succeed, so a
    crash at any point leaves the index exactly as it was (orphan
    uncommitted directories are skipped by readers and by future batch-
    id allocation).  Single-writer by contract; see
    :func:`write_minhash_index`.  Signature parameters (k, num_hashes,
    bands, seed) come from the sidecar, so appended rows are always
    comparable with the original corpus rows.  The intended ingest
    loop::

        batch = deduplicate_near(batch, ...)          # within-batch
        survivors = dedup_against_index(batch, path)  # vs corpus
        append_to_index(survivors, path)              # promote

    Note the loop's keep-set is first-arrival-wins; a one-shot
    ``deduplicate_near`` over the concatenated corpus keeps min-id per
    near-dup component instead.  The two agree whenever near-duplicate
    chains do not straddle batches (A~B, B~C with A,C unrelated in
    different batches keeps {A, C} here but {A} in one shot).
    """
    meta = _read_meta(path)
    k, num_hashes = meta["k"], meta["num_hashes"]
    bands, seed = meta["bands"], meta["seed"]
    rows = num_hashes // bands
    n = _next_batch_id(path, meta)
    from pyspark import StorageLevel

    sig = _minhash_signatures_df(new_docs, text_col, id_col, k, num_hashes, seed)
    sig = sig.select(F.col(id_col).alias("id"), F.col("__sig").alias("sig"))
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        sig.write.mode("overwrite").parquet(f"{path}/signatures/batch={n}")
        _banded_df(
            sig.select(F.col("id"), F.col("sig").alias("__sig")), "id", bands, rows
        ).write.mode("overwrite").parquet(f"{path}/banded/batch={n}")
    finally:
        sig.unpersist()
    # the commit point: both tables durable -> publish atomically
    meta["batches"] = sorted(meta.get("batches", [0]) + [n])
    meta["appends"] = meta.get("appends", 0) + 1
    _commit_meta(path, meta)


def index_near_matches(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """(new_id, index_id, est_jaccard) for every new document whose
    signature-estimated Jaccard against some indexed document reaches
    ``threshold`` (estimate = fraction of equal MinHash components;
    exactly 1.0 for exact copies).

    Plan shape — the INDEX never shuffles: the new batch's banded rows
    and candidate id lists are broadcast, so both index tables are read
    in one map-side pass each (bucket join against ``banded/``, semi
    fetch against ``signatures/``).  Shuffle volume is bounded by the
    new batch x bands, independent of corpus size.

    Reads ONLY the sidecar's committed ``batch=<n>`` directories —
    orphans from a crashed append are invisible."""
    spark = new_docs.sparkSession
    meta = _read_meta(path)
    k, num_hashes = meta["k"], meta["num_hashes"]
    bands, seed = meta["bands"], meta["seed"]
    rows = num_hashes // bands

    # localCheckpoint, not persist: the batch signatures feed both the
    # banded build and the final estimate join, but the returned plan
    # escapes this function, so an explicit persist could never be
    # unpersisted and would pin blocks for the session lifetime.
    # Checkpoint blocks are released when the result is GC'd.  The new
    # batch is small by contract (that is the point of the index).
    new_sig = _minhash_signatures_df(
        new_docs, text_col, id_col, k, num_hashes, seed
    ).select(
        F.col(id_col).alias("new_id"), F.col("__sig").alias("new_sig")
    ).localCheckpoint(eager=True)
    new_banded = _banded_df(
        new_sig.select(F.col("new_id").alias("id"), F.col("new_sig").alias("__sig")),
        "id", bands, rows,
    ).withColumnRenamed("id", "new_id")

    committed = meta.get("batches", [0])
    idx_banded = spark.read.parquet(
        *[f"{path}/banded/batch={b}" for b in committed]
    )
    cand = (
        idx_banded.join(F.broadcast(new_banded), ["band", "bucket"])
        .select(F.col("new_id"), F.col("id").alias("index_id"))
        .distinct()
    )
    idx_sig = spark.read.parquet(
        *[f"{path}/signatures/batch={b}" for b in committed]
    )
    matched = idx_sig.join(
        F.broadcast(cand.select(F.col("index_id").alias("id")).distinct()), "id"
    ).select(F.col("id").alias("index_id"), F.col("sig").alias("idx_sig"))
    est = F.size(
        F.filter(
            F.zip_with(
                F.col("new_sig"), F.col("idx_sig"),
                lambda a, b: F.when(a == b, 1).otherwise(0),
            ),
            lambda v: v == 1,
        )
    ) / F.lit(float(num_hashes))
    return (
        cand.join(F.broadcast(new_sig), "new_id")
        .join(matched, "index_id")
        .select("new_id", "index_id", est.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )


def dedup_against_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """New-batch rows that are NOT near-duplicates of any INDEXED
    document (within-batch duplicates are out of scope — run
    deduplicate_near on the batch first, then this against the corpus).
    Original schema preserved; anti-join on the flagged new ids."""
    flagged = (
        index_near_matches(new_docs, path, text_col, id_col, threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_docs.join(flagged, id_col, "left_anti")


# ---------------------------------------------------------------------------
# exact-substring (duplicate token-run) removal
# ---------------------------------------------------------------------------

def duplicate_run_starts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_run: int = 50,
    min_count: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """(id, starts) — sorted 0-based token positions at which a duplicated
    run of ``min_run`` tokens begins.  A position is duplicated when its
    ``min_run``-gram occurs at least ``min_count`` times corpus-wide
    (counting repeats inside the same document, like the suffix-array
    ExactSubstr dedup of Lee et al. 2022, arXiv:2107.06499).  With
    ``keep_first`` the single occurrence with the smallest (id, pos) is
    exempted, so one copy of each duplicated passage survives.

    Plan: gram identity is a 64-bit ROLLING hash over per-token
    xxhash64 values (acc = xxhash64(acc, next_token_hash), zip_with
    chained like decontam.ngram_col) — gram STRINGS are never built,
    which matters at min_run=50 where the concat form would copy ~50x
    the text per position (measured 1.6x end-to-end at min_run=20, see
    PLANS §33); the token-hash array is materialized as a real column
    first so the chain reuses it (§32 lesson).  Corpus-wide counts come
    from a groupBy(h) with map-side combine (reduce side sees one row
    per DISTINCT gram — boilerplate grams do not hotspot the agg), and
    the keep-first exemption is min(struct(id, pos)) in the SAME agg,
    then one h-keyed join back (AQE splits the skewed h partitions that
    a window over h could not).  Output shuffles (id, pos) pairs only.
    """
    if min_run < 1:
        raise ValueError("min_run must be >= 1")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")

    base = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(
            token_hashes(F.col(text_col)), F.array().cast("array<bigint>")
        ).alias("th"),
    )
    th = F.col("th")
    n = F.size(th)
    null_long = F.lit(None).cast("long")
    g = th
    for k in range(1, min_run):
        shifted = F.slice(th, k + 1, F.greatest(n - k, F.lit(1)))
        g = F.zip_with(
            g,
            shifted,
            lambda a, b: F.when(
                a.isNull() | b.isNull(), null_long
            ).otherwise(F.xxhash64(a, b)),
        )
    grams = base.select(
        "id", F.posexplode(g).alias("pos", "h")
    ).where(F.col("h").isNotNull())
    per_gram = (
        grams.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct("id", "pos")).alias("first"),
        )
        .where(F.col("c") >= min_count)
    )
    dup = grams.join(per_gram, "h")
    if keep_first:
        dup = dup.where(
            (F.col("id") != F.col("first.id")) | (F.col("pos") != F.col("first.pos"))
        )
    return dup.groupBy("id").agg(
        F.sort_array(F.collect_list("pos")).alias("starts")
    )


def remove_duplicate_runs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_run: int = 50,
    min_count: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """ExactSubstr-style dedup (Lee et al. 2022): cut every token that
    lies inside a duplicated run of ``min_run`` tokens, keeping the rest
    of the document.  Adds ``n_tokens`` (before), ``n_removed`` and
    ``kept_text`` (surviving tokens joined by single spaces — the engine
    tokenizer normalizes whitespace, like every text operator here).

    After duplicate_run_starts, everything is per-row array math in the
    scan stage: the sorted starts merge into disjoint [lo, hi) intervals
    (one aggregate pass — interval count is <= n_tokens/min_run + 1, so
    the quadratic array-rebuild inside the fold is bounded), and the kept
    text is the concatenation of the gap SLICES between intervals — no
    per-token membership test, O(n_tokens + intervals) per doc.  Docs
    with no duplicated run pass through the left join untouched.

    Raises when ``df`` already carries one of the added output columns
    (``n_tokens``/``n_removed``/``kept_text``) — silent duplicates would
    make every downstream reference ambiguous.
    """
    clash = {"n_tokens", "n_removed", "kept_text"} & set(df.columns)
    if clash:
        raise ValueError(
            f"remove_duplicate_runs adds columns {sorted(clash)} that the "
            "input already has; rename or drop them first"
        )
    starts_df = (
        duplicate_run_starts(df, text_col, id_col, min_run, min_count, keep_first)
        .withColumnRenamed("id", id_col)
        .withColumnRenamed("starts", "__rdr_starts")
    )
    base = df.withColumn(
        "__rdr_toks",
        F.coalesce(words_col(F.col(text_col)), F.array().cast("array<string>")),
    )
    joined = base.join(starts_df, id_col, "left")

    toks = F.col("__rdr_toks")
    n = F.size(toks)
    sts = F.coalesce(F.col("__rdr_starts"), F.array().cast("array<int>"))
    empty_iv = F.array().cast("array<struct<lo:int,hi:int>>")
    hi_of = lambda s: (s + F.lit(min_run)).cast("int")
    merged = F.aggregate(
        sts,
        empty_iv,
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= F.element_at(acc, -1)["hi"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["lo"].alias("lo"),
                        hi_of(s).alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc, F.array(F.struct(s.cast("int").alias("lo"), hi_of(s).alias("hi")))
            )
        ),
    )
    kept = F.aggregate(
        merged,
        F.struct(
            F.lit(0).alias("prev"), F.array().cast("array<string>").alias("kept")
        ),
        lambda acc, iv: F.struct(
            iv["hi"].alias("prev"),
            F.concat(
                acc["kept"],
                F.slice(
                    toks, acc["prev"] + 1, F.greatest(iv["lo"] - acc["prev"], F.lit(0))
                ),
            ).alias("kept"),
        ),
        lambda acc: F.concat(
            acc["kept"],
            F.slice(toks, acc["prev"] + 1, F.greatest(n - acc["prev"], F.lit(0))),
        ),
    )
    return joined.select(
        *df.columns,
        n.alias("n_tokens"),
        (n - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("kept_text"),
    )
