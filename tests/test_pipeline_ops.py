"""Sessionization, deterministic sampling, CM join-size estimation, and
train/eval decontamination (round-3 pipeline operators)."""

import datetime as dt
import math

import pyspark.sql.functions as F
import pytest

from hllspark import decontam, joins, sampling, sessions
from tests.conftest import SF_TEST


def _events(spark):
    return spark.read.parquet(f"{SF_TEST}/events.parquet")


def _docs(spark):
    return spark.read.parquet(f"{SF_TEST}/documents.parquet")


# ---------------------------------------------------------------- sessions


def test_sessionize_splits_on_gap(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: 3 events 10s apart, then a 2h hole, then 2 more
        (1, base, 1),
        (1, base + dt.timedelta(seconds=10), 2),
        (1, base + dt.timedelta(seconds=20), 3),
        (1, base + dt.timedelta(hours=2), 4),
        (1, base + dt.timedelta(hours=2, seconds=5), 5),
        # user 2: single event
        (2, base, 6),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, eid long")
    out = sessions.sessionize(df, "user", "ts", 1800.0, order_cols=["eid"])
    got = {r["eid"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1}


def test_session_stats_counts_and_duration(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1),
        (1, base + dt.timedelta(seconds=90), 2),
        (1, base + dt.timedelta(hours=3), 3),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, eid long")
    st = {
        (r["user"], r["session_seq"]): (r["n_events"], r["duration_us"])
        for r in sessions.session_stats(df, "user", "ts", 1800.0).collect()
    }
    assert st == {(1, 1): (2, 90_000_000), (1, 2): (1, 0)}


def test_session_count_matches_max_seq(spark):
    ev = _events(spark)
    sc = sessions.session_count(ev, "user_id", "ts", 14400.0, ["event_id"])
    st = sessions.session_stats(ev, "user_id", "ts", 14400.0, ["event_id"])
    a = {r["user_id"]: r["n_sessions"] for r in sc.collect()}
    b = (
        st.groupBy("user_id")
        .agg(F.max("session_seq").alias("m"), F.sum("n_events").alias("n"))
        .collect()
    )
    total = ev.count()
    assert sum(r["n"] for r in b) == total  # every event in exactly 1 session
    assert a == {r["user_id"]: r["m"] for r in b}


def test_sessionize_rejects_bad_gap(spark):
    with pytest.raises(ValueError):
        sessions.sessionize(_events(spark), "user_id", "ts", 0)


# ---------------------------------------------------------------- sampling


def test_hash_sample_deterministic_and_partition_invariant(spark):
    docs = _docs(spark)
    a = sorted(
        r["doc_id"]
        for r in sampling.hash_sample(docs, "doc_id", 0.3, seed=1)
        .select("doc_id")
        .collect()
    )
    b = sorted(
        r["doc_id"]
        for r in sampling.hash_sample(docs.repartition(13), "doc_id", 0.3, seed=1)
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) > 0
    n = docs.count()
    # Bernoulli(0.3): loose 5-sigma band
    sd = math.sqrt(n * 0.3 * 0.7)
    assert abs(len(a) - 0.3 * n) < 5 * sd


def test_hash_sample_methods_rate_edges(spark):
    docs = _docs(spark)
    n = docs.count()
    assert sampling.hash_sample(docs, "doc_id", 1.0).count() == n
    assert sampling.hash_sample(docs, "doc_id", 0.0).count() == 0
    m = sampling.hash_sample(docs, "doc_id", 0.5, seed=2, method="md5").count()
    assert 0 < m < n
    with pytest.raises(ValueError):
        sampling.hash_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError):
        sampling.hash_sample(docs, "doc_id", 0.5, method="sha9000")


def test_split_is_disjoint_partition(spark):
    docs = _docs(spark)
    parts = sampling.split(docs, "doc_id", [0.8, 0.1, 0.1], seed=4)
    ids = [set(r["doc_id"] for r in p.select("doc_id").collect()) for p in parts]
    assert sum(len(s) for s in ids) == docs.count()
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) and not (ids[1] & ids[2])
    # stable across recomputation
    again = sampling.split(docs, "doc_id", [0.8, 0.1, 0.1], seed=4)
    assert set(r["doc_id"] for r in again[1].select("doc_id").collect()) == ids[1]


def test_stratified_sample_exact_per_stratum(spark):
    docs = _docs(spark)
    rate = 0.2
    got = (
        sampling.stratified_sample(docs, "lang", "doc_id", rate, seed=5)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = {
        r["lang"]: math.ceil(r["n"] * rate)
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["lang"]: r["n"] for r in got} == want


def test_weighted_sample_deterministic_topk(spark):
    docs = _docs(spark)
    a = sorted(
        r["doc_id"]
        for r in sampling.weighted_sample(docs, "doc_id", "n_chars", 50, seed=9)
        .select("doc_id")
        .collect()
    )
    b = sorted(
        r["doc_id"]
        for r in sampling.weighted_sample(
            docs.repartition(7), "doc_id", "n_chars", 50, seed=9
        )
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) == 50


def test_weighted_sample_proportional_to_weight(spark):
    # one row with 1000x the weight of 200 others: across 30 seeds of a
    # 1-draw sample it must win most of the time
    rows = [(0, 1000.0)] + [(i, 1.0) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "id long, w double")
    wins = sum(
        sampling.weighted_sample(df, "id", "w", 1, seed=s).first()["id"] == 0
        for s in range(30)
    )
    # P(win) = 1000/1200 ~ 0.83; 30 trials, P(wins < 15) < 1e-4
    assert wins >= 15


def test_weighted_sample_per_stratum_and_weight_guard(spark):
    docs = _docs(spark)
    out = sampling.weighted_sample(
        docs, "doc_id", "n_chars", 3, seed=2, strata_cols="lang"
    )
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(v <= 3 for v in per.values()) and len(per) > 1
    # non-positive weights never sampled
    bad = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)], "id long, w double"
    )
    got = [r["id"] for r in sampling.weighted_sample(bad, "id", "w", 10).collect()]
    assert got == [4]


# ------------------------------------------------------------- join size


def test_approx_join_size_bounds(spark):
    ev = _events(spark)
    width, depth = 8209, 7
    est = joins.approx_join_size(ev, "user_id", ev, "user_id", width, depth)
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    exact = per.agg(F.sum(F.col("c") * F.col("c"))).first()[0]
    n = ev.count()
    assert exact <= est <= exact + math.e / width * n * n


def test_approx_join_size_empty_side(spark):
    ev = _events(spark)
    assert joins.approx_join_size(ev.limit(0), "user_id", ev, "user_id") == 0.0


def test_inner_product_exact_when_wide(spark):
    # width >> distinct keys: no collisions, estimate is exact
    a = spark.createDataFrame([(i % 5,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i % 3,) for i in range(60)], "k long")
    est = joins.approx_join_size(a, "k", b, "k", width=50021, depth=5)
    exact = a.join(b, "k").count()
    assert est == float(exact)


# -------------------------------------------------------------- as-of join


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_as_of_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "c"), (1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(7), "d")],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "X"), (1, _ts(15), "Y"), (2, _ts(99), "Z")],
        "k long, ts timestamp, rv string",
    )
    out = joins.as_of_join(left, right, "k", "ts")
    got = {r["lv"]: r["rv"] for r in out.collect()}
    # ts=10 matches the right row AT 10 (inclusive); ts=5 and key 2 unmatched
    assert got == {"c": None, "a": "X", "b": "Y", "d": None}
    # colliding right column name got the suffix
    assert "ts_right" in out.columns


def test_as_of_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), 10), (1, _ts(12), 11)], "k long, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), "r5"), (1, _ts(30), "r30")], "k long, ts timestamp, rv string"
    )
    fwd = {
        r["lid"]: r["rv"]
        for r in joins.as_of_join(left, right, "k", "ts", direction="forward").collect()
    }
    assert fwd == {10: "r5", 11: "r30"}
    tol = {
        r["lid"]: r["rv"]
        for r in joins.as_of_join(
            left, right, "k", "ts", direction="forward", tolerance_sec=10.0
        ).collect()
    }
    assert tol == {10: "r5", 11: None}  # 30-12=18s > 10s tolerance


def test_as_of_join_null_keys_and_ts(spark):
    left = spark.createDataFrame(
        [(None, _ts(10), 1), (1, None, 2), (1, _ts(10), 3)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(None, _ts(5), "nk"), (1, _ts(5), "ok"), (1, None, "nt")],
        "k long, ts timestamp, rv string",
    )
    got = {r["lid"]: r["rv"] for r in joins.as_of_join(left, right, "k", "ts").collect()}
    # null key and null ts rows survive but never match
    assert got == {1: None, 2: None, 3: "ok"}


def test_as_of_join_matches_duckdb(spark):
    import duckdb

    ev = _events(spark)
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("err_ts"),
        F.col("event_id").alias("err_event_id"),
    )
    got = sorted(
        (r["event_id"], r["err_event_id"])
        for r in joins.as_of_join(clicks, errors, "user_id", "ts", "err_ts")
        .select("event_id", "err_event_id")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_TEST}/events.parquet'"
    )
    want = con.execute(
        "WITH c AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type='click'), "
        "e AS (SELECT user_id, ts AS err_ts, event_id AS err_event_id "
        "FROM events WHERE event_type='error') "
        "SELECT c.event_id, e.err_event_id FROM c ASOF LEFT JOIN e "
        "ON c.user_id = e.user_id AND c.ts >= e.err_ts ORDER BY c.event_id"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_range_join_bucketed_equals_exact(spark):
    pts = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(100)],
        "pid long, k string, t double",
    )
    iv = spark.createDataFrame(
        [
            ("a", 0.0, 35.0, 1),    # spans many buckets
            ("a", 40.0, 41.0, 2),   # sub-bucket
            ("b", 10.0, 20.0, 3),   # bucket-aligned end (exclusive)
            ("b", 50.0, 50.0, 4),   # empty interval
            ("a", 90.0, 80.0, 5),   # inverted
        ],
        "k string, lo double, hi double, iid long",
    )
    exact = joins.range_join(pts, "t", iv, "lo", "hi", on="k")
    bucketed = joins.range_join(pts, "t", iv, "lo", "hi", on="k", bucket=10.0)
    key = lambda df: sorted((r["pid"], r["iid"]) for r in df.collect())
    assert key(bucketed) == key(exact)
    got = key(bucketed)
    # aligned end exclusive: t=20 (even -> k='b') not in [10,20); t=18 is
    assert (20, 3) not in got and (18, 3) in got
    # multi-bucket interval matched ONCE per point
    assert len(got) == len(set(got))
    # empty + inverted intervals match nothing
    assert all(i not in (4, 5) for _, i in got)


def test_salted_join_equals_plain(spark):
    import pyspark.sql.functions as SF

    # planted skew: one key holds 5k of 6k fact rows
    fact = spark.createDataFrame(
        [(0 if i < 5000 else i % 37, i) for i in range(6000)], "k long, fid long"
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(40)], "k long, dv string")
    for how in ("inner", "left"):
        plain = fact.join(dim, "k", how)
        salted = joins.salted_join(fact, dim, "k", salt=8, how=how)
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )
    # salts actually spread the hot key
    f = fact.withColumn(
        "__salt", SF.pmod(SF.xxhash64(SF.monotonically_increasing_id()), SF.lit(8))
    )
    n_salts = f.where(SF.col("k") == 0).select("__salt").distinct().count()
    assert n_salts >= 6
    with pytest.raises(ValueError):
        joins.salted_join(fact, dim, "k", salt=0)


def test_range_join_no_keys(spark):
    pts = spark.createDataFrame([(1, 5.0), (2, 25.0)], "pid long, t double")
    iv = spark.createDataFrame([(0.0, 10.0, 7)], "lo double, hi double, iid long")
    out = joins.range_join(pts, "t", iv, "lo", "hi", bucket=4.0)
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 7)]


# -------------------------------------------------------------- decontam


def test_ngram_overlap_planted_copies(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, "completely different words entirely here now"),
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    test = spark.createDataFrame([rows[0]], "doc_id long, text string")
    rep = {
        r["doc_id"]: (r["overlap_ratio"], r["contaminated"])
        for r in decontam.ngram_overlap(
            train, test, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    assert rep[0] == (1.0, 1)
    assert rep[1][1] == 0 and rep[2][1] == 0


def test_ngram_overlap_short_doc_zero_ratio(spark):
    train = spark.createDataFrame([(0, "too short")], "doc_id long, text string")
    test = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
    r = decontam.ngram_overlap(train, test, "doc_id", "text", n=3).first()
    assert (r["n_grams"], r["overlap_ratio"], r["contaminated"]) == (0, 0.0, 0)


def test_ngram_overlap_key_modes_agree(spark):
    docs = _docs(spark)
    train = docs.where(F.col("doc_id") < 40)
    test = docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
    kw = dict(n=3, threshold=0.8, bloom_fpp=None)
    h = decontam.ngram_overlap(train, test, "doc_id", "text", key="hash", **kw)
    t = decontam.ngram_overlap(train, test, "doc_id", "text", key="text", **kw)
    assert sorted(map(tuple, h.collect())) == sorted(map(tuple, t.collect()))


def test_ngram_overlap_bloom_prune_exact(spark):
    # the optional Bloom prune must not change the result (no false
    # negatives; false positives removed by the mop-up join)
    docs = _docs(spark)
    train = docs.where(F.col("doc_id") < 40)
    test = docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
    off = decontam.ngram_overlap(train, test, "doc_id", "text", n=3)
    on = decontam.ngram_overlap(train, test, "doc_id", "text", n=3, bloom_fpp=0.01)
    assert sorted(map(tuple, off.collect())) == sorted(map(tuple, on.collect()))


def test_bm25_hand_computed(spark):
    import math

    from hllspark import text as htext

    docs = spark.createDataFrame(
        [(0, "spark spark fast"), (1, "slow join"), (2, "spark join join")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["score"] for r in htext.bm25_scores(docs, ["spark"]).collect()}
    # N=3, df=2, avgdl=8/3, dl=3 for the matching docs
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    denom_tail = 1.2 * (0.25 + 0.75 * 3 / (8 / 3))
    assert got[0] == pytest.approx(idf * (2 * 2.2) / (2 + denom_tail))
    assert got[2] == pytest.approx(idf * (1 * 2.2) / (1 + denom_tail))
    assert got[1] == 0.0
    with pytest.raises(ValueError):
        htext.bm25_scores(docs, [])


def test_top_k_by_per_stratum(spark):
    from hllspark import text as htext

    docs = _docs(spark)
    out = htext.top_k_by(docs, "lang", "n_chars", 3, tie_col="doc_id")
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(v <= 3 for v in per.values())
    # each returned row's n_chars >= the stratum's 3rd-largest
    mins = {
        r["lang"]: r["m"]
        for r in out.groupBy("lang").agg(F.min("n_chars").alias("m")).collect()
    }
    for lang, m in mins.items():
        bigger = docs.where(
            (F.col("lang") == lang) & (F.col("n_chars") > m)
        ).count()
        assert bigger <= 2


def test_decontaminate_removes_contaminated(spark):
    docs = _docs(spark)
    train = docs.where(F.col("doc_id") < 50)
    test = docs.where(F.col("doc_id") < 10)
    kept = decontam.decontaminate(train, test, "doc_id", "text", n=3)
    kept_ids = set(r["doc_id"] for r in kept.select("doc_id").collect())
    assert kept_ids.isdisjoint(set(range(10)))
    assert kept.columns == train.columns


def test_mixture_sample_exact_proportions(spark):
    """mixture_sample follows the target proportions exactly (flooring),
    saturates the binding stratum, excludes unlisted strata, and is
    partition-invariant (hash-order membership)."""
    import math

    from hllspark import sampling

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    counts = {r["lang"]: r["cnt"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    target = {"en": 0.5, "de": 0.3, "fr": 0.2}
    out = sampling.mixture_sample(docs, "lang", "doc_id", target, seed=5)
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    s = min(counts[g] / p for g, p in target.items())
    want = {g: math.floor(p * s) for g, p in target.items()}
    assert got == want
    # the binding stratum is (near-)saturated, none oversampled
    assert all(got[g] <= counts[g] for g in target)
    assert any(counts[g] - got[g] <= 1 / min(target.values()) for g in target)
    # unlisted strata excluded entirely
    assert set(got) == set(target)
    # partition invariance: same membership on a different partitioning
    a = sorted(map(tuple, out.select("lang", "doc_id").collect()))
    b = sorted(map(tuple,
        sampling.mixture_sample(docs.repartition(17), "lang", "doc_id",
                                target, seed=5)
        .select("lang", "doc_id").collect()))
    assert a == b
    # a target stratum with ZERO rows forces s = 0 -> empty result
    # (round-5 ADVICE: inner-join silently renormalised over present
    # strata, returning a 50/50 en/de sample for an en/de/fr target)
    no_fr = docs.where(F.col("lang") != "fr")
    empty = sampling.mixture_sample(no_fr, "lang", "doc_id", target, seed=5)
    assert empty.count() == 0


def test_temperature_sample_semantics(spark):
    """temperature_sample (round 5): T=1 keeps everything (p ∝ n is
    always feasible), larger T flattens the mixture (low-resource share
    strictly rises), takes follow floor(p_g * s) exactly, membership is
    partition-invariant."""
    import math

    from hllspark import sampling

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    counts = {r["lang"]: r["cnt"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    n_total = sum(counts.values())
    # T = 1: natural distribution -> the whole corpus survives
    assert sampling.temperature_sample(docs, "lang", "doc_id", 1.0).count() \
        == n_total
    # T = 2: exact takes per the formula
    out = sampling.temperature_sample(docs, "lang", "doc_id", 2.0, seed=7)
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    w = {g: math.sqrt(n) for g, n in counts.items()}
    tw = sum(w[g] for g in sorted(w))
    p = {g: w[g] / tw for g in w}
    s = min(counts[g] / p[g] for g in counts)
    want = {g: math.floor(p[g] * s) for g in counts}
    assert got == want
    # flattening: the rarest stratum's SHARE rises vs natural
    rare = min(counts, key=counts.get)
    assert got[rare] / sum(got.values()) > counts[rare] / n_total
    # no stratum oversampled; at T>1 the binding stratum is the RAREST
    # (cap ∝ sqrt(n) is smallest there), so it is kept in full
    assert all(got[g] <= counts[g] for g in counts)
    assert got[rare] == counts[rare]
    # partition invariance
    a = sorted(map(tuple, out.select("lang", "doc_id").collect()))
    b = sorted(map(tuple, sampling.temperature_sample(
        docs.repartition(17), "lang", "doc_id", 2.0, seed=7)
        .select("lang", "doc_id").collect()))
    assert a == b
    with pytest.raises(ValueError):
        sampling.temperature_sample(docs, "lang", "doc_id", 0.0)


def test_shuffle_rows_deterministic_partition_invariant(spark):
    """Global deterministic shuffle: identical order across partitionings
    and runs; a different seed gives a different (but valid) permutation;
    xxhash64 and md5 methods both permute completely."""
    from hllspark import sampling

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet").select("doc_id")
    a = [r["doc_id"] for r in sampling.shuffle_rows(docs, "doc_id", seed=3).collect()]
    b = [r["doc_id"] for r in
         sampling.shuffle_rows(docs.repartition(13), "doc_id", seed=3).collect()]
    assert a == b
    assert sorted(a) == sorted(r["doc_id"] for r in docs.collect())
    assert a != sorted(a)  # actually permuted
    c = [r["doc_id"] for r in sampling.shuffle_rows(docs, "doc_id", seed=4).collect()]
    assert c != a and sorted(c) == sorted(a)
    m = [r["doc_id"] for r in
         sampling.shuffle_rows(docs, "doc_id", seed=3, method="md5").collect()]
    assert sorted(m) == sorted(a) and m != sorted(m)
    with pytest.raises(ValueError):
        sampling.shuffle_rows(docs, "doc_id", method="sha9000")


def test_gumbel_top_k_equals_aes_weighted_sample(spark):
    """gumbel_top_k(logw) draws exactly the same sample as A-ES
    weighted_sample(exp(logw)) — the log-domain form of the same
    ranking — and excludes null log weights."""
    import math

    rows = [(i, math.sin(i * 1.7) * 3.0) for i in range(300)] + [(300, None)]
    df = spark.createDataFrame(rows, "id long, lw double")
    wdf = df.withColumn("w", F.exp(F.col("lw")))
    for seed in (0, 7):
        a = {
            r["id"]
            for r in sampling.gumbel_top_k(df, "id", "lw", 25, seed=seed).collect()
        }
        b = {
            r["id"]
            for r in sampling.weighted_sample(
                wdf, "id", "w", 25, seed=seed
            ).collect()
        }
        assert a == b and 300 not in a
    out = sampling.gumbel_top_k(df, "id", "lw", 25, seed=0)
    assert set(out.columns) == {"id", "lw"}


# ----------------------------------------------------------- cap_per_group


def test_cap_per_group_salted_equals_unsalted(spark):
    """Two-phase (salted) capping is EXACT: membership identical to the
    plain window on a skewed corpus (one mega-group, several small)."""
    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, f"small{i % 3}") for i in range(21)
    ]
    df = spark.createDataFrame(rows, "id long, host string").repartition(13)
    plain = sampling.cap_per_group(df, "host", "id", 10)
    salted = sampling.cap_per_group(df, "host", "id", 10, salt_buckets=8)
    a = {(r.id, r.host) for r in plain.collect()}
    b = {(r.id, r.host) for r in salted.collect()}
    assert a == b
    per = {}
    for _, h in a:
        per[h] = per.get(h, 0) + 1
    assert per["big"] == 10
    assert all(v <= 10 for v in per.values())
    # groups smaller than k pass through whole: 21 small rows over 3 hosts
    assert sum(v for h, v in per.items() if h != "big") == 21


def test_cap_per_group_order_and_validation(spark):
    """order_cols picks the survivors (quality desc); k<1 rejected."""
    rows = [(i, "h", float(i)) for i in range(9)]
    df = spark.createDataFrame(rows, "id long, host string, q double")
    out = sampling.cap_per_group(
        df, "host", "id", 3, order_cols=[F.desc("q")]
    )
    assert {r.id for r in out.collect()} == {6, 7, 8}
    assert out.columns == ["id", "host", "q"]
    with pytest.raises(ValueError, match="k must be"):
        sampling.cap_per_group(df, "host", "id", 0)


def test_cap_per_group_partition_invariant(spark):
    """Default md5-hash order makes the surviving set independent of the
    input partitioning AND of salting."""
    df = _docs(spark).select("doc_id", "lang")
    runs = [
        sampling.cap_per_group(df.repartition(1), "lang", "doc_id", 7),
        sampling.cap_per_group(df.repartition(17), "lang", "doc_id", 7),
        sampling.cap_per_group(
            df.repartition(5, "lang"), "lang", "doc_id", 7, salt_buckets=4
        ),
    ]
    sets = [{(r.doc_id, r.lang) for r in o.collect()} for o in runs]
    assert sets[0] == sets[1] == sets[2] and len(sets[0]) == 35
