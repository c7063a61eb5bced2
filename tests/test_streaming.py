"""Structured Streaming sketch maintenance — streaming results must equal
the batch build byte-for-byte (the monoid property, reference
HyperLogLog.hpp:124-131, extended to unbounded input)."""

import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from hllspark import agg, hll, io as hio, sketch, streaming


def _write_events(spark, path, n=5000, n_users=1200, files=1):
    df = spark.range(n).select(
        (F.col("id") % n_users).alias("user_id"),
        (F.col("id") % 4).cast("string").alias("grp"),
        F.timestamp_seconds(F.lit(1717200000) + F.col("id") * 10).alias("ts"),
    )
    df.repartition(files).write.mode("overwrite").parquet(path)
    return df


def _run_stream(sdf, sink, checkpoint):
    q = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_sketch_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    batch_df = _write_events(spark, src, files=1)
    sdf = spark.readStream.schema(
        "user_id long, grp string, ts timestamp"
    ).parquet(src)

    out = streaming.sketch_stream(sdf, "user_id", ["grp"], p=10)
    rows = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            rows[r["grp"]] = r

    _run_stream(out, sink, str(tmp_path / "ck"))

    expected = {
        r["grp"]: bytes(r["sketch"])
        for r in agg.sketch_by(batch_df, "user_id", ["grp"], p=10).collect()
    }
    assert set(rows) == set(expected)
    for g, r in rows.items():
        assert bytes(r["sketch"]) == expected[g]
        regs = sketch.decode(bytes(r["sketch"]))
        assert r["distinct_estimate"] == pytest.approx(float(hll.estimate(regs)))


def test_sketch_stream_incremental_across_batches(spark, tmp_path):
    """maxFilesPerTrigger=1 forces multiple micro-batches; the final state
    must equal the batch sketch over all input (incremental add == bulk)."""
    src = str(tmp_path / "src")
    batch_df = _write_events(spark, src, files=3)
    sdf = (
        spark.readStream.schema("user_id long, grp string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming.sketch_stream(sdf, "user_id", p=10)
    final = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            final["g"] = bytes(r["sketch"])
            final["batches"] = final.get("batches", 0) + 1

    _run_stream(out, sink, str(tmp_path / "ck"))
    assert final["batches"] >= 2  # actually exercised incrementality
    expected = bytes(
        agg.sketch_by(batch_df, "user_id", p=10).first()["sketch"]
    )
    assert final["g"] == expected


def test_register_stream_native_agg(spark, tmp_path):
    """The fully-native streaming register aggregate (zero Python) matches
    the batch register table."""
    src = str(tmp_path / "src")
    batch_df = _write_events(spark, src, files=1)
    sdf = spark.readStream.schema(
        "user_id long, grp string, ts timestamp"
    ).parquet(src)
    out = streaming.register_stream(sdf, "user_id", ["grp"], p=8)
    got = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            got[(r["grp"], r["__hllspark_j"])] = r["__hllspark_r"]

    _run_stream(out, sink, str(tmp_path / "ck"))

    exp_df = agg._maxed_registers_sql(batch_df, "user_id", ["grp"], 8, "xxhash64")
    exp = {
        (r["grp"], r["__hllspark_j"]): r["__hllspark_r"] for r in exp_df.collect()
    }
    assert got == exp


def test_windowed_stream_with_watermark(spark, tmp_path):
    """Windowed register rows -> assemble_window_sketches finalizer: per
    window+key estimates within the HLL bound of exact windowed distincts."""
    src = str(tmp_path / "src")
    batch_df = _write_events(spark, src, n=6000, n_users=900, files=1)
    sdf = spark.readStream.schema(
        "user_id long, grp string, ts timestamp"
    ).parquet(src)
    win = streaming.windowed_register_stream(
        sdf, "user_id", "ts", "6 hours", ["grp"], p=12, watermark_delay="1 minute"
    )
    got = {}

    def sink(bdf, bid):
        done = streaming.assemble_window_sketches(bdf, ["grp"], p=12)
        for r in done.collect():
            got[(r["window"]["start"], r["grp"])] = r["distinct_estimate"]

    q = (
        win.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    exact = {
        (r["ws"], r["grp"]): r["exact"]
        for r in batch_df.groupBy(
            F.window("ts", "6 hours")["start"].alias("ws"), "grp"
        )
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    # append mode emits only watermark-closed windows; all closed ones must
    # be present and accurate (the last window may stay open)
    assert len(got) >= len(exact) - 4
    bound = 3 * hll.error_bound(12)
    for key, est in got.items():
        assert abs(est / exact[key] - 1.0) <= bound


def test_snapshot_sink_resumable(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_events(spark, src, files=2)
    sdf = (
        spark.readStream.schema("user_id long, grp string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming.sketch_stream(sdf, "user_id", ["grp"], p=8)
    writer = hio.SnapshotWriter(str(tmp_path / "snap"))
    _run_stream(out, streaming.snapshot_sink(writer, {"source": src}), str(tmp_path / "ck"))

    units = writer.committed_units()
    assert len(units) >= 2
    committed = writer.read_committed(spark)
    assert committed.where(F.col("sketch").isNotNull()).count() >= 4
    man = writer.latest_manifest()
    assert all("batch_id" in u["lineage"] for u in man["units"].values())
    # replaying an already-committed batch id is a no-op (restart semantics)
    sink = streaming.snapshot_sink(writer)
    before = writer.latest_manifest()["snapshot"]
    sink(committed.limit(1), 0)
    assert writer.latest_manifest()["snapshot"] == before


def test_sketch_stream_estimate_within_bound(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_events(spark, src, n=20000, n_users=5000, files=1)
    sdf = spark.readStream.schema(
        "user_id long, grp string, ts timestamp"
    ).parquet(src)
    out = streaming.sketch_stream(sdf, "user_id", p=12)
    est = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            est["v"] = r["distinct_estimate"]

    _run_stream(out, sink, str(tmp_path / "ck"))
    assert abs(est["v"] / 5000.0 - 1.0) <= 3 * hll.error_bound(12)


def test_dedup_stream_exact(spark, tmp_path):
    """Exact streaming dedup: each user_id emitted exactly once across
    micro-batches, regardless of how many duplicates arrive."""
    src = str(tmp_path / "dsrc")
    # two files -> two micro-batches with heavy cross-batch duplication
    spark.range(4000).select((F.col("id") % 700).alias("user_id"),
                             (F.col("id") % 2).alias("half")) \
        .repartition(2, "half").drop("half") \
        .write.mode("overwrite").parquet(src)
    sdf = spark.readStream.schema("user_id long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming.dedup_stream(sdf, ["user_id"])
    seen = []

    def sink(bdf, bid):
        seen.extend(r["user_id"] for r in bdf.collect())

    _run_stream(out, sink, str(tmp_path / "dck"))
    assert len(seen) == 700            # every key exactly once
    assert len(set(seen)) == 700


def test_dedup_stream_approx_bounded_state(spark, tmp_path):
    """Bloom-bucket streaming dedup: no duplicates emitted; drop rate of
    genuinely-new keys bounded by fpp (here ~0 at this fill)."""
    src = str(tmp_path / "asrc")
    spark.range(3000).select((F.col("id") % 500).cast("string").alias("doc")) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    sdf = spark.readStream.schema("doc string").parquet(src)
    out = streaming.dedup_stream_approx(sdf, "doc", n_buckets=8,
                                        capacity_per_bucket=10000, fpp=0.01)
    seen = []

    def sink(bdf, bid):
        seen.extend(r["doc"] for r in bdf.collect())

    _run_stream(out, sink, str(tmp_path / "ack"))
    assert len(seen) == len(set(seen))          # never a duplicate
    assert len(seen) >= 500 * 0.98              # few false-positive drops
    assert len(seen) <= 500


def test_generic_sketch_stream_cpc_byte_identical(spark, tmp_path):
    """CPC streams through generic_sketch_stream: the OR-matrix monoid is
    order-invariant, so the final streamed state must equal the batch
    build byte for byte, per group."""
    from hllspark.sketches import cpc, generic

    src = str(tmp_path / "src")
    batch_df = _write_events(spark, src, files=3)
    sdf = spark.readStream.schema(
        "user_id long, grp string, ts timestamp"
    ).parquet(src)
    kind = cpc.kind(512)
    out = streaming.generic_sketch_stream(sdf, "user_id", kind, ["grp"])
    rows = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            rows[r["grp"]] = bytes(r["sketch"])

    _run_stream(out, sink, str(tmp_path / "ck"))
    expected = {
        r["grp"]: bytes(r["sketch"])
        for r in generic.sketch_agg(batch_df, "user_id", kind, ["grp"]).collect()
    }
    assert rows == expected


def test_generic_sketch_stream_countsketch_byte_identical(spark, tmp_path):
    """Count-sketch streams through generic_sketch_stream unchanged: the
    signed-counter addition monoid is order-invariant, so the streamed
    state equals the batch build byte for byte, and its F2 query works on
    the streamed blobs."""
    import numpy as np

    from hllspark.sketches import countsketch, generic

    src = str(tmp_path / "src")
    batch_df = _write_events(spark, src, files=3)
    kind = countsketch.kind(1031, 4)
    sdf = spark.readStream.schema(
        "user_id long, grp string, ts timestamp"
    ).parquet(src)
    out = streaming.generic_sketch_stream(sdf, "user_id", kind, ["grp"])
    rows = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            rows[r["grp"]] = bytes(r["sketch"])

    _run_stream(out, sink, str(tmp_path / "ck"))
    expected = {
        r["grp"]: bytes(r["sketch"])
        for r in generic.sketch_agg(batch_df, "user_id", kind, ["grp"]).collect()
    }
    assert rows == expected
    exact_f2 = {
        r["grp"]: float(r["f2"])
        for r in batch_df.groupBy("grp", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("grp")
        .agg(F.sum(F.col("c") * F.col("c")).alias("f2"))
        .collect()
    }
    for grp, blob in rows.items():
        est = countsketch.f2_estimate(countsketch.decode(blob))
        assert abs(est - exact_f2[grp]) <= exact_f2[grp] * np.sqrt(8.0 / 1031)


def test_generic_sketch_stream_kll_quantiles(spark, tmp_path):
    """KLL streams with bounded per-key state; streamed quantiles agree
    with the exact ranks within the published error."""
    from hllspark.sketches import kll

    src = str(tmp_path / "src")
    _write_events(spark, src, n=8000, files=2)
    sdf = spark.readStream.schema(
        "user_id long, grp string, ts timestamp"
    ).parquet(src)
    kind = kll.kind(200)
    out = streaming.generic_sketch_stream(sdf, "user_id", kind)
    blobs = []

    def sink(bdf, bid):
        blobs.extend(bytes(r["sketch"]) for r in bdf.collect())

    _run_stream(out, sink, str(tmp_path / "ck2"))
    assert blobs
    s = kll.decode(blobs[-1])
    med = float(np.asarray(s.quantile([0.5]))[0])
    # user_id is uniform over [0, 1200): true median ~600
    assert abs(med - 600) / 600 < 0.1


def test_sketch_stream_with_idle_ttl(spark, tmp_path):
    """The TTL-bounded variant produces the same per-key results within a
    single availableNow pass (no timeout can fire mid-pass); its state
    registers a processing-time timeout so idle keys are evicted on later
    triggers — the bounded-state mode for unbounded key domains."""
    src = str(tmp_path / "src")
    batch_df = _write_events(spark, src, files=2)
    sdf = spark.readStream.schema(
        "user_id long, grp string, ts timestamp"
    ).parquet(src)
    out = streaming.sketch_stream(
        sdf, "user_id", ["grp"], p=10, idle_ttl_ms=60_000
    )
    rows = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            rows[r["grp"]] = bytes(r["sketch"])

    _run_stream(out, sink, str(tmp_path / "ck_ttl"))
    expected = {
        r["grp"]: bytes(r["sketch"])
        for r in agg.sketch_by(batch_df, "user_id", ["grp"], p=10).collect()
    }
    assert rows == expected


def test_windowed_generic_stream_cpc_byte_identical(spark, tmp_path):
    """Windowed CPC stream (update mode): the last emitted sketch per
    (window, grp) is byte-identical to a per-window batch build — the
    OR-matrix monoid is order-invariant, so streaming == batch exactly."""
    from hllspark.sketches import cpc, generic

    src = str(tmp_path / "src")
    batch_df = _write_events(spark, src, n=4000, n_users=700, files=1)
    sdf = spark.readStream.schema(
        "user_id long, grp string, ts timestamp"
    ).parquet(src)
    kind = cpc.kind(256)
    out = streaming.windowed_generic_stream(
        sdf, "user_id", "ts", "6 hours", kind, ["grp"],
        watermark_delay="1 minute",
    )
    got = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            got[(r["window"]["start"], r["grp"])] = bytes(r["sketch"])

    _run_stream(out, sink, str(tmp_path / "ck"))

    expected = {
        (r["ws"], r["grp"]): bytes(r["sketch"])
        for r in generic.sketch_agg(
            batch_df.withColumn("ws", F.window("ts", "6 hours")["start"]),
            "user_id",
            kind,
            ["ws", "grp"],
        ).collect()
    }
    assert set(got) == set(expected)
    assert got == expected


def test_windowed_generic_stream_drops_late_rows(spark, tmp_path):
    """Rows later than the watermark delay must be filtered before the
    stateful operator: a second run over the same checkpoint with one
    late row (event time far behind the persisted watermark) must not
    change the closed window's sketch."""
    from hllspark.sketches import cpc

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = spark.range(2000).select(
        (F.col("id") % 400).alias("user_id"),
        F.lit("a").alias("grp"),
        F.timestamp_seconds(F.lit(1717200000) + F.col("id")).alias("ts"),
    )
    base.coalesce(1).write.mode("append").parquet(src)
    kind = cpc.kind(256)

    def stream():
        sdf = spark.readStream.schema(
            "user_id long, grp string, ts timestamp"
        ).parquet(src)
        return streaming.windowed_generic_stream(
            sdf, "user_id", "ts", "10 minutes", kind, ["grp"],
            watermark_delay="30 seconds",
        )

    got = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            got[(r["window"]["start"], r["grp"])] = bytes(r["sketch"])

    _run_stream(stream(), sink, str(tmp_path / "ck"))
    first_window_key = min(got)
    closed_blob = got[first_window_key]

    # second run: one row 2h ahead (advances watermark past everything),
    # plus one LATE row targeting the first window with a NEW user — if the
    # late row were accepted, the first window's sketch would change
    late = spark.createDataFrame(
        [(999_999, "a", 1717200001), (12, "a", 1717200000 + 7200)],
        "user_id long, grp string, late_s long",
    ).select(
        "user_id", "grp", F.timestamp_seconds(F.col("late_s")).alias("ts")
    )
    late.coalesce(1).write.mode("append").parquet(src)
    got.clear()
    _run_stream(stream(), sink, str(tmp_path / "ck"))
    assert (
        first_window_key not in got or got[first_window_key] == closed_blob
    )


def test_windowed_generic_stream_final_emits_closed_once(spark, tmp_path):
    """emit='final': nothing while a window is open; when the watermark
    passes window.end the sketch is emitted exactly once and state
    dropped."""
    from hllspark.sketches import cpc, generic

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = spark.range(3000).select(
        (F.col("id") % 500).alias("user_id"),
        (F.col("id") % 2).cast("string").alias("grp"),
        F.timestamp_seconds(F.lit(1717200000) + F.col("id") * 10).alias("ts"),
    )
    base.coalesce(1).write.mode("append").parquet(src)
    kind = cpc.kind(256)

    def stream():
        sdf = spark.readStream.schema(
            "user_id long, grp string, ts timestamp"
        ).parquet(src)
        return streaming.windowed_generic_stream(
            sdf, "user_id", "ts", "2 hours", kind, ["grp"],
            watermark_delay="0 seconds", emit="final",
        )

    emitted = []

    def sink(bdf, bid):
        emitted.extend(
            ((r["window"]["start"], r["grp"]), bytes(r["sketch"]))
            for r in bdf.collect()
        )

    def run_append(sdf):
        q = (
            sdf.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_append(stream())
    # push the watermark far forward so every earlier window times out
    spark.range(1).select(
        F.lit(0).cast("long").alias("user_id"),
        F.lit("0").alias("grp"),
        F.timestamp_seconds(F.lit(1717200000 + 86400 * 30)).alias("ts"),
    ).coalesce(1).write.mode("append").parquet(src)
    run_append(stream())

    keys = [k for k, _ in emitted]
    assert len(keys) == len(set(keys))  # exactly once per (window, grp)
    expected = {
        (r["ws"], r["grp"]): bytes(r["sketch"])
        for r in generic.sketch_agg(
            base.withColumn("ws", F.window("ts", "2 hours")["start"]),
            "user_id",
            kind,
            ["ws", "grp"],
        ).collect()
    }
    done = dict(emitted)
    for k, blob in done.items():
        assert expected[k] == blob, k
    # all original windows must have closed and been emitted
    assert set(expected).issubset(set(done))


def test_session_stream_matches_batch(spark, tmp_path):
    # controlled gaps incl. one spacing EXACTLY == gap (300s) to pin the
    # boundary rule shared with the batch op (<= gap merges)
    base = 1717200000
    rows = (
        [(0, base + o) for o in (0, 10, 20, 2000, 2010)]
        + [(1, base)]
        + [(2, base), (2, base + 300), (2, base + 900)]
    )
    src = str(tmp_path / "sess_src")
    df = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds("sec").alias("ts")
    )
    df.repartition(1).write.mode("overwrite").parquet(src)
    # two sentinel batches from user 99 push the watermark past every real
    # session so append mode flushes them (emission happens one batch after
    # the watermark advance)
    for k in (1, 2):
        spark.createDataFrame([(99, base + k * 10**7)], "user_id long, sec long").select(
            "user_id", F.timestamp_seconds("sec").alias("ts")
        ).repartition(1).write.mode("append").parquet(src)
    sdf = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    out = streaming.session_stream(sdf, "user_id", "ts", 300.0)
    got = []

    def sink(bdf, bid):
        got.extend(
            (r["user_id"], r["n_events"], r["duration_us"])
            for r in bdf.collect()
            if r["user_id"] != 99
        )

    # session windows only support append mode: sessions emit once the
    # watermark passes session end + gap
    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    from hllspark import sessions

    batch = sessions.session_stats(df, "user_id", "ts", 300.0)
    want = [
        (r["user_id"], r["n_events"], r["duration_us"]) for r in batch.collect()
    ]
    assert sorted(got) == sorted(want)
    # the exact-gap spacing (300s == gap) merged, the 600s one split —
    # same boundary rule in stream and batch
    assert (2, 2, 300_000_000) in got and (2, 1, 0) in got


def test_streaming_curation_filter_matches_batch(spark, tmp_path):
    """Stateless curation (quality_filter + PII features) composes with
    Structured Streaming unchanged: a readStream through the SAME plan
    keeps exactly the batch survivors with identical redactions — the
    streaming-ingest curation shape (filter at ingest, not in a later
    batch sweep)."""
    import pandas as pd

    from hllspark import curation

    src = str(tmp_path / "docs_src")
    good = " ".join(f"tok{i % 97} word{i % 89}" for i in range(60))
    bad = "spam ham " * 80
    pii = good + " reach me a.b@mail.example.org or 555-010-1234"
    batch_df = spark.createDataFrame(
        [(1, good), (2, bad), (3, pii)], "doc_id long, text string"
    )
    batch_df.write.mode("overwrite").parquet(src)

    def curate(df):
        return curation.pii_features(
            curation.quality_filter(df, min_words=10)
        ).select("doc_id", "pii_total", "redacted")

    sdf = spark.readStream.schema("doc_id long, text string").parquet(src)
    rows = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            rows[r["doc_id"]] = r

    _run_stream(curate(sdf), sink, str(tmp_path / "ck"))

    want = {r["doc_id"]: r for r in curate(batch_df).collect()}
    assert set(rows) == set(want) == {1, 3}
    for k in want:
        assert rows[k]["pii_total"] == want[k]["pii_total"]
        assert rows[k]["redacted"] == want[k]["redacted"]
    assert "<EMAIL>" in rows[3]["redacted"] and "<PHONE>" in rows[3]["redacted"]


def test_streaming_ingest_dedup_matches_batch(spark, tmp_path):
    """dedup-at-ingest (round 5): three micro-batches through
    streaming.ingest_dedup_sink (bootstrap -> dedup_against_index ->
    append_to_index per batch) keep exactly the one-shot
    deduplicate_near survivor set — the streamed twin of
    test_minhash_index_append_three_batch_ingest."""
    import os
    import time

    from hllspark import dedup

    batches = [
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        [(10, "alpha beta gamma delta epsilon zeta"),   # dup of 1
         (11, "red green blue cyan magenta yellow")],   # fresh
        [(20, "one two three four five six seven"),     # dup of 2
         (21, "red green blue cyan magenta yellow"),    # dup of 11
         (22, "lorem ipsum dolor sit amet consectetur")],  # fresh
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    # one parquet FILE per batch with strictly increasing mtimes so the
    # file source replays them in arrival order (survivorship is
    # first-arrival-wins, so order is part of the contract)
    t0 = time.time()
    for i, rows in enumerate(batches):
        d = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(d)
        (part,) = [f for f in os.listdir(d) if f.endswith(".parquet")]
        dst = f"{src}/batch_{i}.parquet"
        os.rename(f"{d}/{part}", dst)
        os.utime(dst, (t0 + 10 * i, t0 + 10 * i))

    index_path = str(tmp_path / "idx")
    survivors: set[int] = set()
    n_batches = []

    def collect(keep, bid):
        survivors.update(r["doc_id"] for r in keep.select("doc_id").collect())
        n_batches.append(bid)

    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(
            streaming.ingest_dedup_sink(index_path, collector=collect)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert len(n_batches) == 3, n_batches
    one_shot_rows = [r for b in batches for r in b]
    one_shot = {
        r["doc_id"]
        for r in dedup.deduplicate_near(
            spark.createDataFrame(one_shot_rows, "doc_id long, text string")
        ).select("doc_id").collect()
    }
    assert survivors == one_shot == {1, 2, 11, 22}
    # the index is live and committed: a re-probe of any survivor dedups
    probe = spark.createDataFrame(
        [(99, "lorem ipsum dolor sit amet consectetur")],
        "doc_id long, text string",
    )
    assert dedup.dedup_against_index(probe, index_path).count() == 0
    assert dedup._read_meta(index_path)["batches"] == [0, 1, 2]


def test_generic_sketch_stream_freqdir_bound(spark, tmp_path):
    """Frequent Directions streams through generic_sketch_stream with NO
    special-casing (a matrix-valued, array-column kind).  FD state is
    shrink-order-dependent, so the gate is the kind's actual guarantee:
    the streamed final sketch satisfies the PSD Gram sandwich
    0 <= A^T A - B^T B <= (frob/ell) I against the exact Gram of
    everything streamed, and frob_sq is exact."""
    import numpy as np

    from hllspark import similarity
    from hllspark.sketches import freqdir

    src = str(tmp_path / "src")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.select("embedding").repartition(3).write.mode("overwrite").parquet(src)
    batch_df = spark.read.parquet(src)
    sdf = spark.readStream.schema("embedding array<float>").parquet(src)
    kind = freqdir.kind(ell=12, d=64)
    out = streaming.generic_sketch_stream(sdf, "embedding", kind)
    blobs = []

    def sink(bdf, bid):
        blobs.extend(bytes(r["sketch"]) for r in bdf.collect())

    _run_stream(out, sink, str(tmp_path / "ckfd"))
    assert blobs
    st = freqdir.decode(blobs[-1])
    G = similarity.gram_matrix(batch_df, 64)
    ev = np.linalg.eigvalsh(G - freqdir.gram_estimate(st))
    assert ev.min() > -1e-6
    assert ev.max() <= freqdir.cov_error_bound(st) + 1e-9
    assert abs(st.frob_sq - float(np.trace(G))) < 1e-6 * float(np.trace(G))


def test_priority_sample_stream_ingest_byte_identical(spark, tmp_path):
    """Priority-sampling sketch at ingest: each micro-batch is sampled
    with sample_agg and folded into a running sketch in foreachBatch —
    the dedup-at-ingest shape a crawler runs.  Deterministic md5
    priorities make the state exactly partition- AND batch-invariant,
    so the streamed accumulation must equal the batch one-shot byte for
    byte, per group."""
    from hllspark.sketches import priority

    src = str(tmp_path / "src")
    df = spark.range(4000).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (1.0 + (F.col("id") % 97)).alias("w"),
    )
    df.repartition(4).write.mode("overwrite").parquet(src)
    batch_df = spark.read.parquet(src)
    sdf = (
        spark.readStream.schema("url string, lang string, w double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    acc: dict = {}

    def sink(bdf, bid):
        for r in priority.sample_agg(
            bdf, "url", "w", k=32, keys=["lang"], seed=6
        ).collect():
            st = priority.decode(bytes(r["sketch"]))
            prev = acc.get(r["lang"])
            acc[r["lang"]] = st if prev is None else priority.merge(prev, st)

    _run_stream(sdf, sink, str(tmp_path / "ckps"))
    expected = {
        r["lang"]: bytes(r["sketch"])
        for r in priority.sample_agg(
            batch_df, "url", "w", k=32, keys=["lang"], seed=6
        ).collect()
    }
    assert {g: priority.encode(s) for g, s in acc.items()} == expected
