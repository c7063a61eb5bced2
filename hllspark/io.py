"""Data fixtures + checkpoint/resume (snapshot-commit emulation).

``generate_pages`` builds the Common-Crawl-style pages table from
BASELINE.json input_hint — (url string, warc_ts timestamp, html binary,
text string, lang string) — as a deterministic pure function of row id,
entirely in Spark SQL expressions (no Python, no RNG state): the same
(n_rows, seed) always yields byte-identical rows on any partitioning, which
is what lets correctness tests pin exact distinct counts and lets the
scaling protocol claim "same input" across parallelism levels.

Properties (mirrors /root/repo/FIXTURES.md §1 and the reference input
generator's role, inputgenerator.cpp:31-99):
- exact true distinct-url count = min(n_rows, n_distinct) (duplicates are
  id % n_distinct collisions);
- url host is power-law skewed over n_hosts synthetic hosts (hot-key
  fixture for salting), path is the base-36 url id;
- lang is skewed categorical (en-heavy);
- text is a deterministic token sequence derived from the url id; html is
  an exact wrapper of text, so extract_text(html) == text byte-identically
  (the input_hint per-row invariant);
- warc_ts is uniform over a 30-day window (per-day GROUP BY fixture).

``SnapshotWriter``/``resume_remaining`` emulate the Iceberg
snapshot-commit + resume-without-rescan semantics with parquet plus an
atomic JSON manifest (Iceberg jars are unavailable in this sandbox; the
seam is documented so a real catalog is a config swap).  The reference
analogue is experiments.py:243-246 (skip instances whose .hdf5 exists).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_LANGS = [("en", 60), ("de", 12), ("fr", 10), ("fi", 8), ("es", 6), ("ja", 4)]
_VOCAB = [
    "data", "spark", "query", "table", "row", "column", "hash", "sketch",
    "count", "merge", "batch", "stream", "page", "crawl", "web", "text",
    "index", "shard", "byte", "word", "value", "key", "scan", "join",
    "group", "order", "window", "filter", "range", "array", "map", "list",
]


def generate_pages(
    spark: SparkSession,
    n_rows: int,
    n_distinct: int | None = None,
    n_hosts: int = 1000,
    seed: int = 42,
    num_partitions: int = 128,
    start_ts: str = "2024-06-01 00:00:00",
    vocab_scale: int = 1,
) -> DataFrame:
    """Deterministic pages DataFrame; a pure function of (args).

    ``vocab_scale`` > 1 suffixes each base token with a per-position
    hash bucket, growing the effective vocabulary to 32 * vocab_scale
    distinct tokens.  The default (1) keeps the original 32-word soup
    byte-identical; the pipeline benchmark uses a larger scale so the
    3-gram shingle space is realistic — with only 32 words every
    document LSH-collides with every other and near-dedup degenerates
    into an all-pairs candidate flood no real crawl exhibits."""
    n_distinct = n_distinct or max(1, int(n_rows * 0.8))
    df = spark.range(n_rows, numPartitions=num_partitions)
    uid = F.col("id") % F.lit(n_distinct)  # url id; distinct = min(n_rows, n_distinct)
    h1 = F.xxhash64(uid, F.lit(seed))
    # uniform [0,1) from the hash's low 30 bits
    u = (F.pmod(h1, F.lit(1 << 30))).cast("double") / F.lit(float(1 << 30))
    host = F.floor(F.lit(float(n_hosts)) * F.pow(u, F.lit(3.0))).cast("long")
    lang = _categorical(u * 997 % 1.0, _LANGS)
    n_tok = (F.pmod(F.xxhash64(uid, F.lit(seed + 1)), F.lit(196)) + 5).cast("int")
    base = lambda i: F.element_at(
        F.lit(_VOCAB), (F.pmod(F.xxhash64(uid, F.lit(seed + 2) + i), F.lit(32)) + 1).cast("int")
    )
    if vocab_scale > 1:
        token = lambda i: F.concat(
            base(i),
            F.pmod(F.xxhash64(uid, F.lit(seed + 7) + i), F.lit(vocab_scale))
            .cast("string"),
        )
    else:
        token = base
    words = F.transform(F.sequence(F.lit(1), n_tok), lambda i: token(i))
    text = F.concat(F.array_join(words, " "), F.lit(" ["), lang, F.lit("]"))
    url = F.concat(
        F.lit("https://host"),
        host.cast("string"),
        F.lit(".example.com/"),
        F.conv(uid.cast("string"), 10, 36),
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start_ts).cast("timestamp"))
        + F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(30 * 86400))
    )
    html = F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")).cast(
        "binary"
    )
    return df.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def _categorical(u, weighted: list[tuple[str, int]]):
    total = sum(w for _, w in weighted)
    expr = None
    acc = 0
    for name, w in weighted[:-1]:
        acc += w
        cond = u < F.lit(acc / total)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(weighted[-1][0])


def write_pages(
    spark: SparkSession, path: str, n_rows: int, **kw
) -> str:
    """Materialize the fixture once (idempotent by marker file)."""
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        generate_pages(spark, n_rows, **kw).write.mode("overwrite").parquet(path)
    return path


# ---------------------------------------------------------------------------
# Snapshot-commit + resume (Iceberg-emulation seam)
# ---------------------------------------------------------------------------

class SnapshotWriter:
    """Committed, resumable sketch-checkpoint table.

    Layout:
        <root>/data/part=<unit_id>/...parquet   (task-atomic parquet writes)
        <root>/_snapshots/<n>.json              (manifest: committed units,
                                                 lineage + metrics per unit)

    A "unit" is a caller-defined slice of input (e.g. a partition range or a
    date).  ``commit`` appends a new manifest atomically (write temp +
    rename), so readers always see a consistent snapshot; a killed job
    re-runs only units absent from the latest manifest
    (``resume_remaining``), without re-scanning completed input — the
    north_rule checkpoint/lineage requirement.  With a real Iceberg catalog
    this class collapses to `df.writeTo(table).append()` + snapshot reads.
    """

    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    def _manifests(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.snap_dir) if f.endswith(".json")
        )

    def latest_manifest(self) -> dict:
        ms = self._manifests()
        if not ms:
            return {"snapshot": 0, "units": {}}
        with open(os.path.join(self.snap_dir, ms[-1])) as fh:
            return json.load(fh)

    def committed_units(self) -> set[str]:
        return set(self.latest_manifest()["units"])

    def unit_path(self, unit_id: str) -> str:
        return os.path.join(self.root, "data", f"unit={unit_id}")

    def write_unit(
        self, df: DataFrame, unit_id: str, lineage: dict | None = None
    ) -> dict:
        """Write one unit's rows then commit it to a new snapshot. The
        parquet write is to a unit-scoped directory; the commit (manifest
        append) is atomic, so a crash mid-write leaves the unit uncommitted
        and it will simply be re-run on resume."""
        t0 = time.time()
        path = self.unit_path(unit_id)
        df.write.mode("overwrite").parquet(path)
        meta = {
            "path": path,
            "lineage": lineage or {},
            "committed_at": time.time(),
            "write_seconds": round(time.time() - t0, 3),
        }
        manifest = self.latest_manifest()
        manifest["snapshot"] += 1
        manifest["units"][unit_id] = meta
        tmp = os.path.join(self.snap_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.snap_dir, f"{manifest['snapshot']:010d}.json"))
        return meta

    def read_committed(self, spark: SparkSession) -> DataFrame | None:
        units = self.latest_manifest()["units"]
        if not units:
            return None
        paths = [m["path"] for m in units.values()]
        return spark.read.parquet(*paths)


def resume_remaining(writer: SnapshotWriter, all_units: list[str]) -> list[str]:
    """Units still to process after a restart (anti-join against the last
    committed snapshot — no input re-scan)."""
    done = writer.committed_units()
    return [u for u in all_units if u not in done]


# ---------------------------------------------------------------------------
# reference wire formats (measure.hpp:16-67, inputgenerator.cpp:31-99)
# ---------------------------------------------------------------------------
# The reference exchanges data between inputgenerator and measure as raw
# binary on a pipe: uint64 streams and (j, r) pairs big-endian on the wire
# (htonll/htonl, common.hpp:38-50), strings as contiguous fixed-length
# byte blobs.  These codecs read/write that exact format so reference-
# generated fixtures can be replayed through the Spark engine (and ours
# through the reference CLI).  Generator parity note: the *values* the
# reference emits depend on libstdc++'s uniform_int_distribution, which is
# implementation-defined — the portable contract is the wire format, not
# the stream contents.


def wire_encode_uint64(values) -> bytes:
    """n big-endian u64s, the `uint64` datatype blob (measure.hpp:16-28)."""
    import numpy as np

    return np.asarray(values, dtype=np.uint64).astype(">u8").tobytes()


def wire_decode_uint64(buf: bytes):
    import numpy as np

    return np.frombuffer(buf, dtype=">u8").astype(np.uint64)


def wire_encode_str(strings, length: int) -> bytes:
    """n fixed-length byte strings, contiguous (measure.hpp:32-45)."""
    out = bytearray()
    for s in strings:
        b = s.encode() if isinstance(s, str) else bytes(s)
        if len(b) != length:
            raise ValueError(f"string length {len(b)} != {length}")
        out += b
    return bytes(out)


def wire_decode_str(buf: bytes, length: int) -> list[str]:
    if len(buf) % length:
        raise ValueError("blob length not a multiple of string length")
    return [
        buf[i : i + length].decode() for i in range(0, len(buf), length)
    ]


def wire_encode_jr(j, r) -> bytes:
    """n (j, r) pairs of big-endian u32s (measure.hpp:49-67)."""
    import numpy as np

    j = np.asarray(j, dtype=np.uint32)
    r = np.asarray(r, dtype=np.uint32)
    inter = np.empty(2 * len(j), dtype=np.uint32)
    inter[0::2] = j
    inter[1::2] = r
    return inter.astype(">u4").tobytes()


def wire_decode_jr(buf: bytes):
    import numpy as np

    flat = np.frombuffer(buf, dtype=">u4").astype(np.uint32)
    return flat[0::2], flat[1::2]


def wire_jr_df(spark: SparkSession, buf: bytes, num_partitions: int = 8) -> DataFrame:
    """A (j, r) DataFrame from a reference jr blob, ready for
    agg.sketch_from_jr.  Decoded driver-side (reference fixtures are
    small); a petabyte-scale blob store would instead land as parquet and
    skip the wire format entirely."""
    import pandas as pd

    j, r = wire_decode_jr(buf)
    pdf = pd.DataFrame({"j": j.astype("int64"), "r": r.astype("int64")})
    return spark.createDataFrame(pdf).repartition(num_partitions)


# ---------------------------------------------------------------------------
# bucketed tables: shuffle-free co-located joins (round 4)
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a BUCKETED parquet table: rows are hashed on
    ``bucket_cols`` into ``num_buckets`` files per partition at WRITE
    time, so every later join or aggregation on those columns (between
    tables bucketed the same way) runs with ZERO Exchange — the shuffle
    is paid once at ingest instead of once per query.  This is the 100 TB
    fact-to-fact join story: at petabyte fact sizes the per-query shuffle
    IS the bottleneck, and bucketing removes it for the whole query
    corpus keyed on the same columns (plan-asserted in
    tests/test_io_text.py::test_bucketed_join_no_exchange).

    ``sort_cols`` additionally sorts within buckets (enables sort-merge
    without the sort).  ``path`` makes the table external (else it lands
    in spark.sql.warehouse.dir).  Bucket metadata lives in the session
    catalog — at production scale back the catalog with a metastore so
    bucketing survives sessions."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket columns.  With
    matching bucket counts Spark plans a sort-merge join with NO Exchange
    on either side (bucketing IS the partitioning); a disabled/mismatched
    bucket layout silently degrades to a normal shuffled join — the test
    asserts the plan, not just the result."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
