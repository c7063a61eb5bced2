"""hllspark benchmark — headline sketch queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "extra": {...rows/sec, baselines...}}

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  HLLSPARK_BENCH_REPS timed reps per query, median reported (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from hllspark import agg, curation, decontam, dedup, joins, sessions, similarity
from hllspark.sketches import priority as psample
from hllspark.text import extract_text_html, hashed_tfidf, token_count

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("HLLSPARK_BENCH_REPS", "3"))
SYNTH_ROWS = int(os.environ.get("HLLSPARK_BENCH_SYNTH_ROWS", str(20_000_000)))


def build_session() -> SparkSession:
    from hllspark import jvmagg

    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("hllspark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        # UI on (random port): its REST status endpoint feeds the
        # composed-pipeline stage metrics; the listener that backs it
        # runs regardless, so this only starts the HTTP server
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
    )
    if os.path.exists(jvmagg.jar_path()):
        builder = builder.config(
            "spark.driver.extraClassPath", jvmagg.jar_path()
        ).config("spark.jars", jvmagg.jar_path())
    return builder.getOrCreate()


def ratio_interleaved(fn_num, fn_den, pairs: int = 5) -> float:
    """Median of back-to-back per-pair time ratios — host drift between
    two separately-timed sub-second queries moves a ratio-of-medians by
    up to ~1.6x on this VM; pairing cancels it."""
    ratios = []
    for _ in range(pairs):
        t0 = time.perf_counter()
        fn_num()
        t1 = time.perf_counter()
        fn_den()
        t2 = time.perf_counter()
        ratios.append((t1 - t0) / (t2 - t1))
    ratios.sort()
    return round(ratios[len(ratios) // 2], 3)


def timed(fn, reps: int = REPS) -> float:
    fn()
    fn()  # two warm-ups: JVM C2 compilation of codegen'd stages needs >1 pass
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    lineitem = t("lineitem").cache()
    events = t("events").cache()
    documents = t("documents").cache()
    n_lineitem = lineitem.count()
    n_events = events.count()
    documents.count()

    # global JVM warm-up: exercise codegen'd agg + shuffle machinery once so
    # per-query timings measure steady state, not C2 compilation
    agg.approx_distinct(
        spark.range(2_000_000, numPartitions=CPUS).select(F.col("id").alias("v")),
        "v",
        p=12,
    ).collect()

    # synthetic high-volume stream: measures pure sketch-build throughput
    # (JVM hash -> Arrow -> numpy scatter) without parquet-scan noise
    synth = spark.range(SYNTH_ROWS, numPartitions=4 * CPUS).select(
        (F.col("id") * 2654435761).alias("v"),
        (F.col("id") % 8).cast("string").alias("g"),
    )
    # 100k-cardinality string keys: the group-key-probe-bound shape
    synth_100k = spark.range(SYNTH_ROWS, numPartitions=4 * CPUS).select(
        (F.col("id") * 2654435761).alias("v"),
        F.concat(
            F.lit("hostkey_"), (F.col("id") % 100_000).cast("string")
        ).alias("gs"),
    )

    # selective dim side for the Bloom-pruned semi-join (~20% of orders)
    urgent_orders = (
        t("orders").where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        .cache()
    )
    urgent_orders.count()

    # north-rule input shape: Common-Crawl-style pages (url, warc_ts, html,
    # text, lang).  Materialized to parquet ONCE, untimed — the reference
    # likewise excludes ingest/generation from timing (measure.hpp:16-28
    # slurps stdin before the clock starts); q0 then times scan -> hash ->
    # aggregate, i.e. the engine, not the synthetic-string generator.
    from hllspark import io as hio

    pages_path = f"/tmp/hllspark_bench_pages_{2_000_000}"
    if not os.path.exists(f"{pages_path}/_SUCCESS"):
        hio.generate_pages(spark, 2_000_000, num_partitions=2 * CPUS).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    # deterministic 25% sample for the curation pass (q17): per-doc feature
    # extraction is compute-bound, so a bounded sample keeps the bench
    # wall time stable while rows/sec still measures the operator
    pages_500k = (
        pages.where(F.pmod(F.xxhash64("url"), F.lit(4)) == 0)
        .select("lang", "text")
        .cache()
    )
    n_pages_500k = pages_500k.count()
    # 5% slice for the winnow fingerprint key (q20): fingerprint selection
    # is compute-bound per document, so a bounded slice keeps wall time
    # stable while rows/sec still measures the operator
    pages_100k = (
        pages.where(F.pmod(F.xxhash64("url"), F.lit(20)) == 0)
        .select("url", "text")
        .cache()
    )
    n_pages_100k = pages_100k.count()
    # q25 scans its ==1 hash slice straight from parquet (uncached by
    # design — extraction is scan-side work); count it once so the
    # docs/sec denominator is the real row count, not a nominal 500k
    n_pages_q25 = pages.where(
        F.pmod(F.xxhash64("url"), F.lit(4)) == 1
    ).count()

    # WARC ingest corpus (q23): 64k records / 32 files (half plain, half
    # per-record-gzip), ~1 KB bodies — synthesized ONCE, untimed, like the
    # pages parquet; the timed query is the read: one task per file
    # (binaryFile = the Common-Crawl work granularity), streaming record
    # walk, HTTP split, then a count+bytes reduction
    from hllspark import warc as hwarc

    warc_dir = "/tmp/hllspark_bench_warc_64k"
    if not os.path.exists(warc_dir) or len(os.listdir(warc_dir)) != 32:
        import shutil

        shutil.rmtree(warc_dir, ignore_errors=True)
        hwarc.synthesize_warc_files(
            warc_dir, 64_000, records_per_file=2_000, body_scale=30
        )
    n_warc_records = 64_000

    # Y4M video corpus (q29): 1200 mono streams, 128x72 x 36 frames
    # (~400 MB of raw planes) — synthesized ONCE as parquet binary, like
    # the WARC corpus; the timed query is the scan + FRAME-marker walk +
    # every-6th luma-plane slice + stats (multimodal.frame_sample_stats)
    from hllspark import multimodal as hmm

    y4m_dir = "/tmp/hllspark_bench_y4m_1200"
    if not os.path.exists(os.path.join(y4m_dir, "_SUCCESS")):

        def _gen_y4m(batches):
            import pandas as _pd

            for pdf in batches:
                ids = pdf["id"].to_numpy()
                yield _pd.DataFrame(
                    {
                        "media_id": ids,
                        "payload": [
                            hmm.make_y4m(128, 72, 36, seed=int(i)) for i in ids
                        ],
                    }
                )

        spark.range(1200, numPartitions=CPUS).mapInPandas(
            _gen_y4m, "media_id long, payload binary"
        ).write.mode("overwrite").parquet(y4m_dir)
    y4m_videos = spark.read.parquet(y4m_dir)
    n_y4m_sampled_frames = 1200 * 6

    # zone-mapped pages copy (q30): the 2M-page corpus in a SHUFFLED
    # 64-file layout — the honest hard case where every file spans the
    # full url range, so parquet's own footer min/max cannot prune and
    # only the Bloom layer can (a url-sorted layout is already pruned by
    # parquet row-group stats; zone maps ADD power on arbitrary keys).
    # Sidecar built ONCE, untimed (write-time work); the timed query is
    # the needle read: driver-side pyarrow manifest probe (64 rows) +
    # scan of only the surviving files
    from hllspark import zonemap as hzm

    zm_path = "/tmp/hllspark_bench_zm_pages_2m"
    if not os.path.exists(os.path.join(zm_path, "_zonemaps", "_meta.json")):
        hzm.write_with_zonemaps(
            pages.repartition(64),
            zm_path,
            ["url"],
            expected_keys_per_file=40_000,
            fpp=0.01,
        )
    zm_probe_urls = [r["url"] for r in pages.limit(5).collect()]

    # trained lang-id model (q24): fit on a deterministic 1% slice (one
    # gram x lang aggregate), weight/stat dims cached + materialized so
    # the timed reps measure SCORING, not refitting
    from hllspark.text import nb_lang_id, nb_lang_weights

    langid_train = pages.where(
        F.pmod(F.xxhash64("url"), F.lit(100)) == 1
    ).select("text", "lang")
    langid_w, langid_stats = nb_lang_weights(langid_train, n=2)
    langid_w = langid_w.cache()
    langid_stats = langid_stats.cache()
    langid_w.count(), langid_stats.count()
    pages_100k_ids = pages_100k.withColumn("rid", F.xxhash64("text"))

    # synthetic link graph for q27 (pagerank): 2M edges over 100k nodes,
    # Knuth-hash destinations so in-degree is spread; materialized to
    # parquet ONCE, untimed, like the pages fixture
    from hllspark import crawl as hcrawl

    edges_path = "/tmp/hllspark_bench_edges_2m"
    if not os.path.exists(f"{edges_path}/_SUCCESS"):
        spark.range(2_000_000).select(
            (F.col("id") % 100_000).cast("string").alias("src"),
            ((F.col("id") * 2654435761) % 100_000).cast("string").alias("dst"),
        ).write.mode("overwrite").parquet(edges_path)
    pr_edges = spark.read.parquet(edges_path)

    # planted-skew corpus for q9: one document duplicated 2000x
    one_text = documents.where(F.col("doc_id") == 0).first()["text"]
    poisoned_docs = (
        documents.select("doc_id", "text")
        .unionByName(
            spark.range(2000).select(
                (F.col("id") + 10_000_000).alias("doc_id"),
                F.lit(one_text).alias("text"),
            )
        )
        .cache()
    )
    poisoned_docs.count()

    # eval slice for q14: 5% of the corpus by deterministic hash
    eval_docs = documents.where(F.pmod(F.xxhash64("doc_id"), F.lit(20)) == 0)

    # synthetic embedding corpus for q22: 50k deterministic 16-dim
    # directions, each present twice (the second copy scaled 1.001 ->
    # cosine exactly 1), so SemDeDup must drop one copy per direction
    emb_100k = (
        spark.range(100_000, numPartitions=2 * CPUS)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: (
                    F.pmod(
                        F.xxhash64(F.pmod(F.col("id"), F.lit(50_000)), i),
                        F.lit(2001),
                    ).cast("double")
                    / F.lit(1000.0)
                    - F.lit(1.0)
                )
                * F.when(F.col("id") < 50_000, F.lit(1.0)).otherwise(
                    F.lit(1.001)
                ),
            ).alias("embedding"),
        )
        .cache()
    )
    emb_100k.count()

    # derived per-type value intervals for the range-join query
    value_intervals = (
        events.where(F.col("event_id") % 37 == 0)
        .select(
            "event_type",
            (F.floor(F.col("value") / 10) * 10).cast("double").alias("lo"),
            (F.floor(F.col("value") / 10) * 10 + 7).cast("double").alias("hi"),
        )
        .distinct()
        .cache()
    )
    value_intervals.count()

    queries = {
        "q0_pages_2m_urls_by_lang": lambda: agg.approx_distinct(
            pages, "url", ["lang"], p=14
        ).collect(),
        "q1_hll_lineitem_grouped": lambda: agg.approx_distinct(
            lineitem, "l_orderkey", ["l_returnflag"], p=14
        ).collect(),
        "q2_hll_lineitem_global": lambda: agg.approx_distinct(
            lineitem, "l_partkey", p=14
        ).collect(),
        "q3_hlll_docs_by_lang_farmhash": lambda: agg.approx_distinct(
            documents, "text", ["lang"], p=12, algo="hlll", hash_mode="farmhash"
        ).collect(),
        "q4_events_daily_remerge": lambda: agg.merge_sketches(
            agg.sketch_by(
                events.withColumn("day", F.to_date("ts")), "user_id", ["day"], p=12
            )
        ).collect(),
        "q5_synth_20m_build": lambda: agg.approx_distinct(synth, "v", p=14).collect(),
        "q6_synth_20m_grouped": lambda: agg.approx_distinct(
            synth, "v", ["g"], p=12
        ).collect(),
        # operator-breadth queries: multi-grain sketch re-aggregation and
        # text near-dup dedup (training-pipeline ops, graded alongside §2)
        # fused build+rollup: native GROUPING SETS Expand + one JVM register
        # aggregate — one base scan, zero Python (round 3; the round-2
        # sketch_by->sketch_rollup formulation paid 3 python merge stages and
        # its r1 number was a plan-cache artifact, see PLANS.md)
        "q7_events_rollup_3grains": lambda: agg.approx_distinct_rollup(
            events.withColumn("day", F.to_date("ts")),
            "user_id",
            ["event_type", "day"],
            p=12,
        ).collect(),
        "q8_minhash_neardup_docs": lambda: dedup.minhash_near_duplicates(
            documents, threshold=0.7
        ).count(),
        # degenerate-bucket stress: 2k copies of one document flood the LSH
        # buckets; the cap keeps the self-join bounded (uncapped this is
        # O(copies^2) candidate pairs — the 100 TB failure mode)
        "q9_skewed_neardup_capped": lambda: dedup.minhash_near_duplicates(
            poisoned_docs, threshold=0.7, max_bucket_size=1024
        ).count(),
        # high-cardinality string group keys (the 100 TB lang x url-host
        # grouping shape): probe on xxhash64(key) longs, key carried via
        # FIRST (key_encode='hash64', round 3 — PLANS.md §8 A/B: 1.3x over
        # the plain string probe, dictionary broadcast-join rejected at 3.8x
        # SLOWER)
        "q10_synth_100k_strkeys": lambda: agg.approx_distinct(
            synth_100k, "v", ["gs"], p=12, key_encode="hash64"
        ).count(),
        # N overlapping event-time windows from ONE base scan: per-day
        # register build, exploded re-merge per window end (round 3 —
        # PLANS.md §13 A/B: 5.2x over per-end re-scan at 30 ends, and the
        # gap grows linearly with #ends)
        "q11_events_rolling7": lambda: agg.rolling_distinct(
            events, "user_id", "ts", 7, p=12
        ).collect(),
        # Bloom semi-join pruning: distributed Bloom over the selective dim
        # side probes the fact scan before its shuffle (round 3 — PLANS.md
        # §14; exact result, only ~(selectivity+fpp) of the fact shuffles)
        "q12_bloom_semijoin": lambda: joins.bloom_semi_join(
            lineitem, "l_orderkey", urgent_orders, "o_orderkey", fpp=0.01
        ).count(),
        # gap-based sessionization: lag + running-sum window then per-session
        # agg, all off ONE exchange on user_id (round 3, sessions.py — the
        # groupBy keys are a superset of the window partition key so Catalyst
        # reuses the shuffle; plan-verified 1 Exchange)
        "q13_sessionize_events": lambda: sessions.session_stats(
            events, "user_id", "ts", 1800.0, order_cols=["event_id"]
        ).count(),
        # train/eval n-gram decontamination: codegen trigrams, broadcast
        # semi-join on gram hashes, per-doc overlap ratio (round 3,
        # decontam.py; Bloom prune measured off — PLANS.md §15)
        "q14_decontam_docs": lambda: decontam.ngram_overlap(
            documents, eval_docs, "doc_id", "text", n=3
        ).count(),
        # as-of join: every click attributed to the user's latest error —
        # union + one exchange + running last() window (round 3, PLANS.md §18)
        "q15_asof_click_error": lambda: joins.as_of_join(
            events.where(F.col("event_type") == "click").select(
                "event_id", "user_id", "ts"
            ),
            events.where(F.col("event_type") == "error").select(
                "user_id", F.col("ts").alias("err_ts"), F.col("value")
            ),
            "user_id",
            "ts",
            "err_ts",
        ).count(),
        # bucketed range join: explode-to-buckets + equi-join, no cartesian
        "q16_range_join": lambda: joins.range_join(
            events.select("event_id", "event_type", "value"),
            "value",
            value_intervals,
            "lo",
            "hi",
            on="event_type",
            bucket=10.0,
        ).count(),
        # full Gopher-style curation scan (repetition stats via the
        # mapInArrow fast path — pyarrow C kernels + numpy, no Python
        # objects; PII regexes JVM-side), 500k-page deterministic sample;
        # the only exchange is the per-lang average (round 3, PLANS.md §21)
        "q17_curation_pages_500k": lambda: curation.pii_features(
            curation.repetition_features(
                pages_500k, ngram_ns=(2,), impl="arrow"
            )
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)),
            F.avg("dup_word_frac"),
            F.avg("top2gram_char_frac"),
            F.sum("pii_total"),
        )
        .collect(),
        # GPT-style sequence packing of the 2M-page token stream: two-phase
        # distributed cumsum (range shuffle + one-row-per-partition prefix
        # collect), never a single-partition global window (PLANS.md §20)
        "q18_pack_pages_2m": lambda: curation.pack_sequences(
            pages.select(
                "url",
                token_count(F.col("text")).alias("n_tokens"),
            ),
            "url",
            "n_tokens",
            2048,
            num_partitions=CPUS,
        )
        .agg(F.max("chunk_id"), F.sum("n_chunks_spanned"))
        .collect(),
        # URL canonicalization over the full 2M-page crawl (round 4):
        # pure codegen string work inside the scan stage, reduced to one
        # hash so nothing but the operator is measured
        "q19_canonical_urls_2m": lambda: pages.select(
            F.max(F.xxhash64(curation.canonical_url(F.col("url"))))
        ).collect(),
        # winnowing fingerprint extraction (MOSS selection) over a 100k-page
        # deterministic slice — the substring-signal dedup hot path; round 5
        # made it 31x faster (zip_with sliding min + materialized hash array,
        # PLANS §32), this key guards the throughput
        "q20_winnow_fps_100k": lambda: dedup.winnow_fingerprint_rows(
            pages_100k, "text", "url"
        ).count(),
        # ExactSubstr duplicate-run removal over the same 100k-page slice:
        # rolling-hash gram stream -> groupBy(h) -> starts join -> gap-slice
        # text rebuild (PLANS §33); the reduction forces kept_text so the
        # whole removal path is measured, not just the gram counts
        "q21_exact_substr_100k": lambda: dedup.remove_duplicate_runs(
            pages_100k, text_col="text", id_col="url", min_run=20
        )
        .select(F.sum("n_removed"), F.max(F.xxhash64("kept_text")))
        .collect(),
        # SemDeDup over 100k synthetic 16-dim embeddings (50k directions x 2
        # copies): distributed spherical-Lloyd fit (1 iter, k=512, Arrow
        # partial-sum kernel) + matmul assignment + per-cell blockwise
        # pairwise dedup in ONE applyInPandas exchange (PLANS §35); the
        # reduction forces the kept flags so the whole path is measured
        "q22_semantic_dedup_100k": lambda: similarity.semantic_dedup(
            emb_100k, 16, eps=0.95, n_clusters=512, iters=1
        )
        .agg(F.sum(F.col("kept").cast("int")))
        .collect(),
        # trained NB lang-id (round 5): model fit once in setup (one-time
        # cost per corpus, like the pages materialization); the timed path
        # is the hot loop — 100k pages scored through the vectorized numpy
        # kernel (impl='arrow': utf-32 codes -> packed keys -> searchsorted
        # -> segment reduceat; 5x the explode path, PLANS §40)
        "q24_nb_langid_100k": lambda: nb_lang_id(
            pages_100k_ids, langid_w, langid_stats, id_col="rid",
            impl="arrow",
        )
        .groupBy("lang")
        .count()
        .collect(),
        # WARC ingest (round 5): parse 64k records from 32 mixed
        # plain/record-gzip files — file listing, gzip-member walk, header
        # parse, Content-Length slicing, HTTP split, reduced to one row so
        # the reader is measured, not a collect of 64k payloads
        "q23_warc_parse_64k": lambda: hwarc.read_warc(spark, warc_dir)
        .agg(F.count(F.lit(1)), F.sum(F.length("payload")))
        .collect(),
        # real HTML -> text extraction (round 5): the ~15-pass codegen
        # regexp chain over a deterministic 25% page slice, scan included
        # (extraction IS scan-side work at ingest), reduced to one hash
        "q25_html_extract_500k": lambda: pages.where(
            F.pmod(F.xxhash64("url"), F.lit(4)) == 1
        )
        .select(F.max(F.xxhash64(extract_text_html(F.col("html")))))
        .collect(),
        # PageRank over a 2M-edge / 100k-node synthetic link graph, 2
        # iterations — the iterative-join shape (rank-onto-edges join +
        # map-side-combined groupBy(dst) + per-iteration checkpoint)
        "q27_pagerank_2m_edges": lambda: hcrawl.pagerank(
            pr_edges, iters=2, num_partitions=CPUS
        )
        .agg(F.sum("rank"))
        .collect(),
        # priority-sampling sketch (DLT'07): per-lang k=1024 mergeable
        # weighted sample of all 2M pages by text length — scan + md5
        # priority column + one sketch-row-per-(partition,lang) shuffle
        "q28_priority_sample_2m": lambda: psample.sample_agg(
            pages.withColumn("w", F.length("text").cast("double")),
            "url",
            "w",
            k=1024,
            keys=["lang"],
            seed=3,
        )
        .select(F.sum(F.length("sketch")))
        .collect(),
        # REAL video frame sampling (round 5): parquet scan of 1200 Y4M
        # streams -> header-token parse + FRAME-marker walk (O(1)/frame)
        # -> every-6th luma plane sliced + reduced; decode cost is
        # O(sampled planes), embarrassingly parallel, zero pre-agg shuffle
        "q29_y4m_frame_sample": lambda: hmm.frame_sample_stats(
            y4m_videos, every_n=6
        )
        .agg(F.sum("luma_sum"), F.count(F.lit(1)))
        .collect(),
        # sketch-backed file pruning (round 5): needle IN-predicate over
        # the 64-file zone-mapped pages table — manifest probe, then scan
        # of only the surviving files; compare q30b (same predicate, full
        # scan) for the pruning payoff
        "q30_zonemap_needle": lambda: hzm.read_pruned(
            spark, zm_path, "url", zm_probe_urls
        )
        .agg(F.count(F.lit(1)), F.sum(F.length("text")))
        .collect(),
        "q30b_fullscan_needle": lambda: spark.read.parquet(zm_path)
        .where(F.col("url").isin(zm_probe_urls))
        .agg(F.count(F.lit(1)), F.sum(F.length("text")))
        .collect(),
        # crawl snapshot diff (round 5): old = all 2M pages, new = 90%
        # kept (10% removed / 10% of kept rewritten / none added) — the
        # recurring-crawl delta; only (url, xxhash64) pairs shuffle into
        # one full-outer join, bodies never move
        "q31_snapshot_delta_2m": lambda: hcrawl.snapshot_delta(
            pages.select("url", "text"),
            pages.where(F.pmod(F.xxhash64("url"), F.lit(10)) != 0).select(
                "url",
                F.when(
                    F.pmod(F.xxhash64("url"), F.lit(10)) == 1,
                    F.concat(F.col("text"), F.lit(" v2")),
                ).otherwise(F.col("text")).alias("text"),
            ),
            key_col="url",
        )
        .groupBy("status")
        .count()
        .collect(),
        # hashed TF-IDF vectorization (text -> embedding bridge): full
        # tf/idf/dense-assembly over the 100k slice at dim=256; the max
        # over per-doc squared norms forces every vector to materialize
        "q26_tfidf_100k": lambda: hashed_tfidf(
            pages_100k_ids, text_col="text", id_col="rid", dim=256, attach=False
        )
        .select(
            F.max(
                F.aggregate(
                    F.transform("tfidf", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, b: a + b,
                )
            )
        )
        .collect(),
        # hashing-cost-only floor (reference Hasher baseline, measure.cpp:30-52)
        "b0_hashonly_20m": lambda: synth.select(
            F.max(F.xxhash64("v"))
        ).collect(),
        # built-in baselines (the reference compares against Apache
        # DataSketches / ZetaSketch; Spark's approx_count_distinct is HLL++)
        "b1_spark_approx_cd": lambda: lineitem.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey"))
        .collect(),
        "b2_spark_exact_cd": lambda: lineitem.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey"))
        .collect(),
    }

    results = {name: round(timed(fn), 4) for name, fn in queries.items()}

    # composed curation pipeline (staged shape — the production
    # recommendation; see bench_pipeline.run_pipeline): one run, per-
    # stage wall + rows + shuffle bytes; stage seconds join the queries
    # dict as p_* keys so round-over-round BENCH diffs cover the
    # composition, not just isolated operators
    import bench_pipeline

    pipe_pages = bench_pipeline.materialize_pages(
        spark, bench_pipeline.PIPELINE_ROWS, CPUS
    )
    pipeline = bench_pipeline.run_pipeline(spark, pipe_pages, chained=False)
    for sname, s in pipeline["stages"].items():
        results[f"p_{sname}"] = s["sec"]

    total = round(sum(results.values()), 4)
    # floor-normalized timings: each query divided by the hash-only floor
    # b0 (a constant workload), so round-over-round comparisons factor out
    # host drift — the r2->r3 comparison was unreadable until normalized
    # by b0 by hand (VERDICT r3)
    floor = results["b0_hashonly_20m"]
    normalized = {
        name: round(sec / floor, 3) for name, sec in results.items()
    }
    extra = {
        "cpus": CPUS,
        "reps": REPS,
        "rows_lineitem": n_lineitem,
        "rows_events": n_events,
        "synth_rows": SYNTH_ROWS,
        "synth_build_rows_per_sec": round(SYNTH_ROWS / results["q5_synth_20m_build"]),
        "lineitem_grouped_rows_per_sec": round(
            n_lineitem / results["q1_hll_lineitem_grouped"]
        ),
        "ours_vs_builtin_hllpp": round(
            results["q1_hll_lineitem_grouped"] / results["b1_spark_approx_cd"], 3
        ),
        # the robust form of the same ratio: both sides are sub-second, so
        # taking each from its own median minutes apart lets host drift
        # (documented ~3x single-thread swing, PLANS §21) move the ratio
        # 1.66-2.60 across clean runs of IDENTICAL code.  Back-to-back
        # pairs cancel the drift; median of per-pair ratios reported.
        "ours_vs_builtin_hllpp_interleaved": ratio_interleaved(
            queries["q1_hll_lineitem_grouped"], queries["b1_spark_approx_cd"]
        ),
        "hashonly_floor_rows_per_sec": round(
            SYNTH_ROWS / results["b0_hashonly_20m"]
        ),
        "pages_rows_per_sec": round(2_000_000 / results["q0_pages_2m_urls_by_lang"]),
        "curation_docs_per_sec": round(
            n_pages_500k / results["q17_curation_pages_500k"]
        ),
        "pack_docs_per_sec": round(2_000_000 / results["q18_pack_pages_2m"]),
        "winnow_docs_per_sec": round(
            n_pages_100k / results["q20_winnow_fps_100k"]
        ),
        "exact_substr_docs_per_sec": round(
            n_pages_100k / results["q21_exact_substr_100k"]
        ),
        "semantic_dedup_vecs_per_sec": round(
            100_000 / results["q22_semantic_dedup_100k"]
        ),
        "warc_records_per_sec": round(
            n_warc_records / results["q23_warc_parse_64k"]
        ),
        "langid_docs_per_sec": round(
            n_pages_100k / results["q24_nb_langid_100k"]
        ),
        "html_extract_docs_per_sec": round(
            n_pages_q25 / results["q25_html_extract_500k"]
        ),
        "tfidf_docs_per_sec": round(
            n_pages_100k / results["q26_tfidf_100k"]
        ),
        "pagerank_edges_per_iter_per_sec": round(
            2_000_000 / results["q27_pagerank_2m_edges"]
        ),
        "priority_sample_rows_per_sec": round(
            2_000_000 / results["q28_priority_sample_2m"]
        ),
        "y4m_sampled_frames_per_sec": round(
            n_y4m_sampled_frames / results["q29_y4m_frame_sample"]
        ),
        "zonemap_prune_speedup": round(
            results["q30b_fullscan_needle"] / results["q30_zonemap_needle"], 2
        ),
        "snapshot_delta_rows_per_sec": round(
            2_000_000 / results["q31_snapshot_delta_2m"]
        ),
        "grouped_100k_strkeys_rows_per_sec": round(
            SYNTH_ROWS / results["q10_synth_100k_strkeys"]
        ),
        "build_vs_hashonly_floor": round(
            results["q5_synth_20m_build"] / results["b0_hashonly_20m"], 3
        ),
        "pipeline": pipeline,
    }
    print(
        json.dumps(
            {
                "metric": "hllspark sketch-build+estimate wall time (median of reps)",
                "value": total,
                "unit": "sec",
                "queries": results,
                "queries_normalized": normalized,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
