"""Web-corpus curation operators: Gopher repetition filters, corpus-level
line dedup, PII redaction, URL analytics (hllspark/curation.py)."""

import pyspark.sql.functions as F
import pytest

from hllspark import curation


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


# ------------------------------------------------------- repetition features


def test_repetition_features_hand_computed(spark):
    # lines: [a b, a b, c d e, a b] -> 2 of 4 instances are repeats;
    # dup char mass = 3*3 of 14 line chars; words a,b,a,b,c,d,e,a,b ->
    # top 2-gram "a b" x3 covers 9 of 17 text chars.
    df = _df(spark, [(1, "a b\na b\nc d e\na b")])
    r = curation.repetition_features(df, ngram_ns=(2,)).collect()[0]
    assert r["dup_line_frac"] == pytest.approx(0.5)
    assert r["dup_line_char_frac"] == pytest.approx(9 / 14)
    assert r["dup_word_frac"] == pytest.approx(1 - 5 / 9)
    assert r["top2gram_char_frac"] == pytest.approx(9 / 17)


def test_repetition_features_no_repeats_and_empty(spark):
    df = _df(spark, [(1, "w x\ny z"), (2, "")])
    rows = {r["doc_id"]: r for r in curation.repetition_features(df).collect()}
    assert rows[1]["dup_line_frac"] == 0.0
    assert rows[1]["dup_line_char_frac"] == 0.0
    assert rows[2]["dup_line_frac"] == 0.0
    assert rows[2]["top2gram_char_frac"] == 0.0


def test_top_ngram_tiebreak_is_lexicographic(spark):
    # "b c" and "a b" both occur once -> smallest gram "a b" wins,
    # matching the SQL oracle's ORDER BY count DESC, gram ASC.
    df = _df(spark, [(1, "a b c")])
    r = df.select(
        curation.top_ngram_char_fraction(F.col("text"), 2).alias("f")
    ).collect()[0]
    assert r["f"] == pytest.approx(3 / 5)  # len("a b") * 1 / 5 chars


def test_gopher_symbol_and_line_shape_features(spark):
    df = _df(spark, [(1, "- item one\n- item two\nkeep going...\n# x # y")])
    r = curation.repetition_features(df).collect()[0]
    assert r["bullet_line_frac"] == pytest.approx(2 / 4)
    assert r["ellipsis_line_frac"] == pytest.approx(1 / 4)
    assert r["symbol_word_ratio"] > 0


def test_quality_filter_drops_repetitive_doc(spark):
    good = " ".join(f"tok{i % 97} word{i % 89}" for i in range(60))
    bad = "spam ham " * 80  # top-2gram coverage ~1
    df = _df(spark, [(1, good), (2, bad)])
    kept = curation.quality_filter(df, min_words=10).select("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert curation.quality_filter(df, min_words=10).columns == df.columns


# ------------------------------------------------------------- line dedup


def test_dedup_lines_drops_cross_doc_boilerplate(spark):
    df = _df(
        spark,
        [
            (1, "COOKIE BANNER\nreal content one"),
            (2, "COOKIE BANNER\nreal content two"),
            (3, "COOKIE BANNER\nreal content three\nCOOKIE BANNER"),
            (4, "only original text"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.dedup_lines(df, max_docs=1).collect()
    }
    assert out[1]["text"] == "real content one"
    assert out[3]["text"] == "real content three"
    assert out[3]["n_lines_dropped"] == 2  # both occurrences removed
    assert out[4]["text"] == "only original text"
    assert out[4]["n_lines_dropped"] == 0


def test_dedup_lines_keeps_within_doc_repeats(spark):
    # repeated within ONE doc only -> count(distinct doc)=1 -> kept
    df = _df(spark, [(1, "la la\nla la\nother")])
    out = curation.dedup_lines(df, max_docs=1).collect()[0]
    assert out["text"] == "la la\nla la\nother"
    assert out["n_lines_dropped"] == 0


def test_dedup_lines_all_boilerplate_doc_survives_empty(spark):
    df = _df(spark, [(1, "x y"), (2, "x y"), (3, "x y")])
    out = {r["doc_id"]: r for r in curation.dedup_lines(df, max_docs=1).collect()}
    assert len(out) == 3
    assert all(out[i]["text"] == "" for i in out)
    assert all(out[i]["n_lines_dropped"] == 1 for i in out)


def test_dedup_lines_preserves_order_and_custom_sep(spark):
    df = _df(spark, [(1, "p1 the p2 the p3"), (2, "zz the p9")])
    out = {
        r["doc_id"]: r["text"]
        for r in curation.dedup_lines(
            df, line_sep=" the ", join_sep=" the ", max_docs=1
        ).collect()
    }
    assert out[1] == "p1 the p2 the p3"
    assert out[2] == "zz the p9"


# -------------------------------------------------------------------- PII


def test_pii_counts_and_redaction_roundtrip(spark):
    df = _df(
        spark,
        [
            (1, "write a.b+c@mail.example.org or 555-010-1234 at 192.168.0.1"),
            (2, "nothing sensitive here"),
        ],
    )
    out = {r["doc_id"]: r for r in curation.pii_features(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ipv4"]) == (1, 1, 1)
    assert out[1]["redacted"] == "write <EMAIL> or <PHONE> at <IPV4>"
    assert out[2]["pii_total"] == 0
    assert out[2]["redacted"] == out[2]["text"]
    # redacted text must contain no residual matches
    resid = curation.pii_features(
        curation.pii_features(df).select(
            "doc_id", F.col("redacted").alias("text")
        )
    )
    assert resid.agg(F.sum("pii_total")).collect()[0][0] == 0


def test_pii_email_with_digit_local_part_redacts_before_phone(spark):
    # digits in the local part must not be clipped by the phone pass
    df = _df(spark, [(1, "ref 555 010 1234@ids.example.com end")])
    r = curation.pii_features(df).collect()[0]
    assert "<EMAIL>" in r["redacted"]
    assert "@" not in r["redacted"]


# -------------------------------------------------------------------- URLs


def test_url_features_host_domain_depth(spark):
    df = spark.createDataFrame(
        [
            (1, "https://user:pw@Sub.Example.CO.UK:8443/a/b/c?x=1"),
            (2, "http://plain.org/"),
            (3, "https://deep.a.b.example.com/x"),
            (4, "https://localhost"),
        ],
        "id int, url string",
    )
    out = {r["id"]: r for r in curation.url_features(df).collect()}
    assert out[1]["host"] == "sub.example.co.uk"
    assert out[1]["registered_domain"] == "example.co.uk"
    assert out[1]["path_depth"] == 3
    assert out[2]["registered_domain"] == "plain.org"
    assert out[2]["path_depth"] == 0
    assert out[3]["registered_domain"] == "example.com"
    assert out[4]["registered_domain"] == "localhost"


def test_url_features_feeds_sketch_by(spark):
    # the crawl-scale composition: distinct pages per registrable domain
    from hllspark import agg

    df = spark.range(200).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 4).cast("string"),
            F.lit(".site.com/p/"), F.col("id").cast("string"),
        ).alias("url")
    )
    feat = curation.url_features(df)
    est = agg.approx_distinct(feat, "url", ["registered_domain"], p=12)
    rows = est.collect()
    assert len(rows) == 1 and rows[0]["registered_domain"] == "site.com"
    assert abs(rows[0]["distinct_estimate"] - 200) <= 0.1 * 200


# --------------------------------------------------------- sequence packing


def test_pack_sequences_hand_computed(spark):
    from hllspark.curation import pack_sequences

    rows = [(1, 5), (2, 3), (3, 4), (4, 10)]
    df = spark.createDataFrame(rows, "doc_id int, n int")
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, "doc_id", "n", 8).collect()
    }
    # stream starts: 0, 5, 8, 12 -> chunks of 8
    assert [out[i]["chunk_id"] for i in (1, 2, 3, 4)] == [0, 0, 1, 1]
    assert [out[i]["chunk_offset"] for i in (1, 2, 3, 4)] == [0, 5, 0, 4]
    assert [out[i]["n_chunks_spanned"] for i in (1, 2, 3, 4)] == [1, 1, 1, 2]


def test_pack_sequences_partition_invariant(spark):
    from hllspark.curation import pack_sequences

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.pmod(F.xxhash64("id"), F.lit(97)) + 1).alias("n")
    )
    a = pack_sequences(df, "doc_id", "n", 128, num_partitions=1)
    b = pack_sequences(df, "doc_id", "n", 128, num_partitions=16)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_sequences_zero_and_null_tokens(spark):
    from hllspark.curation import pack_sequences

    df = spark.createDataFrame(
        [(1, 4), (2, 0), (3, None), (4, 4)], "doc_id int, n int"
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, "doc_id", "n", 4).collect()}
    assert out[2]["n_chunks_spanned"] == 0
    assert out[3]["n_chunks_spanned"] == 0
    assert out[4]["chunk_id"] == 1  # zero-length docs consume no budget


# ------------------------------------------------ expr vs arrow equivalence


def test_repetition_impls_value_identical(spark):
    import pandas as pd

    rows = [
        (1, "a b\na b\nc d e\na b"),
        (2, ""), (3, "   "), (4, None), (5, "a"),
        (6, "- x\n- x\nend..."),
        (7, "# # # spam ham spam ham"),
        (8, "  padded  text  padded  "),
        (9, "z y x w v z y x w the tail the tail"),
        (10, "tab\tinside\na line\t\nx . . . .... end..."),
        # text-EDGE non-space whitespace: trim() strips only spaces, so a
        # split(trim(t)) tokenizer would keep empty edge tokens here and
        # diverge from the arrow path (ADVICE r3) — words_col must not
        (11, "\tfoo foo"),
        (12, "foo foo\n"),
        (13, "\n x... the y...\n"),  # segment ending '\n': Java $ vs RE2 $
        (14, "\t\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for sep in ("\n", " the "):
        e = (
            curation.repetition_features(df, line_sep=sep, ngram_ns=(2, 3), impl="expr")
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        a = (
            curation.repetition_features(df, line_sep=sep, ngram_ns=(2, 3), impl="arrow")
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(e, a, check_exact=False, atol=1e-12)


def test_quality_filter_arrow_impl_same_survivors(spark):
    good = " ".join(f"tok{i % 97} word{i % 89}" for i in range(60))
    bad = "spam ham " * 80
    df = spark.createDataFrame([(1, good), (2, bad)], "doc_id int, text string")
    ke = curation.quality_filter(df, min_words=10).select("doc_id").collect()
    ka = curation.quality_filter(df, min_words=10, impl="arrow").select("doc_id").collect()
    assert ke == ka == [(1,)]


def test_pack_sequences_empty_input(spark):
    from hllspark.curation import pack_sequences

    empty = spark.createDataFrame([], "doc_id long, n long")
    out = pack_sequences(empty, "doc_id", "n", 128)
    assert out.count() == 0
    assert {"chunk_id", "chunk_offset", "n_chunks_spanned"} <= set(out.columns)


def test_lm_perplexity_scores(spark):
    """Bigram-LM cross-entropy: common/repeated text scores lower than
    one-off gibberish under the corpus-trained model; zero-token and
    null-text docs score 0."""
    from hllspark.curation import lm_perplexity_scores

    common = "the cat sat on the mat " * 20
    rows = [(i, common) for i in range(10)] + [
        (100, "zq xv qk jw vv zz yq wq pk kz"),  # unseen-ish unigrams/bigrams
        (101, ""),
        (102, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_perplexity_scores(df).collect()}
    assert len(out) == 13
    assert out[101]["cross_entropy"] == 0.0 and out[101]["n_tokens"] == 0
    assert out[102]["cross_entropy"] == 0.0 and out[102]["n_tokens"] == 0
    assert out[0]["cross_entropy"] < out[100]["cross_entropy"]
    # identical docs score identically
    assert out[0]["cross_entropy"] == out[9]["cross_entropy"]
    # self-trained model: every probability <= 1 -> cross-entropy >= 0
    assert all(r["cross_entropy"] >= 0 for r in out.values())


def test_lm_perplexity_capped_vocab(spark):
    """max_vocab path (round 5): exact top-K vocab (count desc, word asc),
    everything else -> one <unk> bucket, V = |vocab| + 1; hand-computed
    values, partition invariance, and the plan contract — every model
    table reaches the scoring join as a BROADCAST (sort-merge only ever
    on the per-doc id grain)."""
    import math

    from hllspark.curation import lm_perplexity_scores

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b rare1 rare2"), (3, "a a a a a a"),
         (4, "")],
        "doc_id long, text string",
    )
    out = lm_perplexity_scores(df, max_vocab=3)
    got = {r["doc_id"]: r["cross_entropy"] for r in out.collect()}
    # tokens: a=9 b=3 c=1 rare1=1 rare2=1 -> vocab {a,b,c} (ties: c wins
    # lexicographically over rare1/rare2 at count 1... count desc first,
    # then word asc: c < rare1 < rare2), V=4, doc2 maps to a b <unk> <unk>
    N, V = 15, 4
    c1 = {"a": 9, "b": 3, "c": 1, "<unk>": 2}
    from collections import Counter

    bi = Counter(
        [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"),
         ("a", "b"), ("b", "<unk>"), ("<unk>", "<unk>")]
        + [("a", "a")] * 5
    )

    def score(toks):
        lp = math.log((c1.get(toks[0], 0) + 1) / (N + V))
        for x, y in zip(toks, toks[1:]):
            lp += math.log((bi.get((x, y), 0) + 1) / (c1.get(x, 0) + V))
        return -lp / len(toks)

    assert got[1] == pytest.approx(score(["a", "b", "a", "b", "c"]))
    assert got[2] == pytest.approx(score(["a", "b", "<unk>", "<unk>"]))
    assert got[3] == pytest.approx(score(["a"] * 6))
    assert got[4] == 0.0
    # partition invariance (MG candidate sets may differ per split; the
    # exact recount + deterministic tie-break must not)
    got17 = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_perplexity_scores(df.repartition(17), max_vocab=3).collect()
    }
    assert all(got17[k] == pytest.approx(v) for k, v in got.items())
    # plan contract: model tables broadcast; SortMergeJoin only on doc_id
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "doc_id" in line, line


def test_pack_sequences_no_plan_literal_at_high_partition_count(spark):
    """The per-partition prefix offsets must enter the plan as a broadcast
    (pid, offset) JOIN, never a create_map literal — at 2048 partitions a
    map literal would put 4096 expression-tree entries in the plan and
    grow linearly with the partition count (VERDICT r3 #2)."""
    from hllspark.curation import pack_sequences

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n")
    )
    out = pack_sequences(df, "doc_id", "n", 64, num_partitions=2048)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "map_from" not in plan and "create_map" not in plan.lower(), (
        plan[:500]
    )
    assert "BroadcastHashJoin" in plan, plan[:500]
    # and the result is still exact at this partition count
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["chunk_id"] == 0 and rows[0]["chunk_offset"] == 0
    # global cumsum consistency across all 2048 partitions: the last doc
    # (in order_col order) must END exactly at the total token count
    total = sum(i % 7 + 1 for i in range(5000))
    last = rows[4999]
    end = last["chunk_id"] * 64 + last["chunk_offset"] + (4999 % 7 + 1)
    assert end == total, (end, total)


def test_select_within_budget(spark):
    """Budget selection keeps the maximal doc_id-order prefix whose total
    tokens fit; whole-doc semantics (no partial fit); partition-invariant;
    pack_sequences still exact through the shared global_cumsum."""
    from hllspark.curation import select_within_budget

    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id int, nt int")
    out = sorted(
        r["doc_id"]
        for r in select_within_budget(df, "doc_id", "nt", 1000).collect()
    )
    # python oracle
    cum, want = 0, []
    for i, n in rows:
        cum += n
        if cum <= 1000:
            want.append(i)
    assert out == want and 0 < len(want) < 500
    # partition invariance
    out17 = sorted(
        r["doc_id"]
        for r in select_within_budget(
            df.repartition(17), "doc_id", "nt", 1000, num_partitions=16
        ).collect()
    )
    assert out17 == want
    # edges: zero budget keeps nothing but zero-cost rows; huge keeps all
    assert select_within_budget(df, "doc_id", "nt", 0).count() == 0
    assert select_within_budget(df, "doc_id", "nt", 10**9).count() == 500


def test_canonical_url(spark):
    cases = [
        # (input, expected canonical)
        ("HTTPS://WWW.Example.COM:443/a/b?z=2&a=1#frag",
         "https://www.example.com/a/b?a=1&z=2"),
        ("http://Example.org:80", "http://example.org/"),
        ("http://example.org:8080/x", "http://example.org:8080/x"),
        ("https://u:p@Host.COM/p?b&", "https://u:p@host.com/p?b"),
        ("https://example.com/?", "https://example.com/"),
        ("ftp://Files.example.com:21/f", "ftp://files.example.com:21/f"),
        ("not a url", "not a url"),
        ("https://example.com/trail/", "https://example.com/trail/"),
        # '?' INSIDE the fragment is fragment content, not a query
        # (round-5 ADVICE: must NOT become https://example.com/p?x=1)
        ("https://example.com/p#sec?x=1", "https://example.com/p"),
        ("https://example.com/p?a=2#sec?x=1", "https://example.com/p?a=2"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", curation.canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)
    # idempotent: canonical(canonical(x)) == canonical(x)
    twice = df.select(
        curation.canonical_url(
            curation.canonical_url(F.col("url"))
        ).alias("c")
    ).collect()
    assert [r["c"] for r in twice] == [got[i] for i in range(len(cases))]


def test_nb_quality_classifier_learns_planted_signal(spark):
    """Positives carry 'shiny', negatives carry 'sludge'; the NB
    log-odds weights must rank them at the two extremes and the scores
    must separate held-out docs containing each marker."""
    rows = []
    for i in range(40):
        filler = f"common words everywhere {i % 3}"
        if i % 2 == 0:
            rows.append((1, f"{filler} shiny prose shiny"))
        else:
            rows.append((0, f"{filler} sludge spam sludge"))
    train = spark.createDataFrame(rows, "label int, text string")
    w = {r["token"]: r["weight"] for r in
         curation.nb_quality_weights(train).collect()}
    assert w["shiny"] > 0 > w["sludge"]
    assert w["shiny"] == max(w.values()) and w["sludge"] == min(w.values())
    # filler tokens appear equally in both classes -> ~0 weight
    assert abs(w["common"]) < 1e-9
    held = spark.createDataFrame(
        [(0, "common shiny shiny words"), (1, "common sludge spam words"),
         (2, ""), (3, None)],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r for r in curation.nb_quality_scores(
        held, curation.nb_quality_weights(train)).collect()}
    assert s[0]["score"] > 0.5 > s[1]["score"]
    assert s[2]["score"] == 0.5 and s[2]["n_tokens"] == 0  # sigmoid(0)
    assert s[3]["score"] == 0.5 and s[3]["n_tokens"] == 0


def test_nb_quality_weights_brute_force_oracle(spark):
    """Weights and scores match a literal python replica of the
    formulas on fixture text with a deterministic label."""
    import math
    from collections import Counter

    from tests.conftest import SF_TEST

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet").where(
        F.col("doc_id") < 60
    )
    train = docs.select(
        (F.col("lang") == "en").cast("int").alias("label"), "text"
    )
    got_w = {r["token"]: r["weight"] for r in
             curation.nb_quality_weights(train, smoothing=0.5).collect()}
    rows = docs.select("doc_id", "lang", "text").collect()
    cp, cn = Counter(), Counter()
    for r in rows:
        c = cp if r["lang"] == "en" else cn
        c.update((r["text"] or "").split())
    v = len(set(cp) | set(cn))
    npos, nneg = sum(cp.values()), sum(cn.values())
    a = 0.5
    for t in set(cp) | set(cn):
        want = math.log((cp[t] + a) / (npos + a * v)) - math.log(
            (cn[t] + a) / (nneg + a * v)
        )
        assert abs(got_w[t] - want) < 1e-12, t
    got_s = {r["doc_id"]: (r["n_tokens"], r["score"]) for r in
             curation.nb_quality_scores(
                 docs, curation.nb_quality_weights(train, smoothing=0.5)
             ).collect()}
    for r in rows:
        toks = (r["text"] or "").split()
        mean = (sum(got_w.get(t, 0.0) for t in toks) / len(toks)
                if toks else 0.0)
        want = 1.0 / (1.0 + math.exp(-mean))
        assert got_s[r["doc_id"]][0] == len(toks)
        assert abs(got_s[r["doc_id"]][1] - want) < 1e-9


def test_nb_quality_max_features_cap(spark):
    train = spark.createDataFrame(
        [(1, "aa bb cc dd"), (0, "aa bb xx yy")], "label int, text string"
    )
    full = curation.nb_quality_weights(train)
    capped = curation.nb_quality_weights(train, max_features=2)
    assert capped.count() == 2
    # the cap keeps the largest |weight| rows of the full table
    fw = sorted(full.collect(), key=lambda r: (-abs(r["weight"]), r["token"]))
    kept = {r["token"] for r in capped.collect()}
    assert kept == {fw[0]["token"], fw[1]["token"]}


def test_nb_quality_weights_ignores_null_labels(spark):
    """Null-label rows contribute to neither class nor the vocabulary."""
    clean = spark.createDataFrame(
        [(1, "aa bb"), (0, "aa cc")], "label int, text string"
    )
    noisy = spark.createDataFrame(
        [(1, "aa bb"), (0, "aa cc"), (None, "zz zz phantom")],
        "label int, text string",
    )
    cw = sorted(curation.nb_quality_weights(clean).collect())
    nw = sorted(curation.nb_quality_weights(noisy).collect())
    assert cw == nw
    assert all(r["weight"] is not None for r in nw)


# ---------------------------------------------------------------------------
# DSIR importance resampling (round 5)
# ---------------------------------------------------------------------------

def _dsir_py_bucket(gram: str, num_buckets: int, seed: int) -> int:
    import hashlib

    h = int(
        hashlib.md5((gram + "\x1f" + str(seed)).encode()).hexdigest()[:8], 16
    )
    return h % num_buckets


def _dsir_py_grams(text: str, n_max: int) -> list[str]:
    import re

    ws = [x for x in re.split(r"\s+", text or "") if x != ""]
    out: list[str] = []
    for n in range(1, n_max + 1):
        out += [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
    return out


def test_dsir_weights_and_scores_brute_force(spark):
    """Weight table and per-doc log weights match a literal python
    replica (md5 feature hash, Laplace-smoothed log-ratio, occurrence
    sums) on fixture documents."""
    import math
    from collections import Counter

    from tests.conftest import SF_TEST

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    target = docs.where((F.col("lang") == "en") & (F.col("doc_id") < 40))
    raw = docs.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 120))
    B, NMAX, SEED, A = 32, 2, 3, 1.0
    got_w = {
        r["bucket"]: r["weight"]
        for r in curation.dsir_weights(
            raw, target, num_buckets=B, n_max=NMAX, smoothing=A, seed=SEED
        ).collect()
    }
    assert len(got_w) == B  # complete spine, empty buckets included
    ct: Counter = Counter()
    cr: Counter = Counter()
    for r in target.select("text").collect():
        ct.update(_dsir_py_bucket(g, B, SEED) for g in _dsir_py_grams(r[0], NMAX))
    raw_rows = raw.select("doc_id", "text").collect()
    for r in raw_rows:
        cr.update(_dsir_py_bucket(g, B, SEED) for g in _dsir_py_grams(r[1], NMAX))
    nt, nr = sum(ct.values()), sum(cr.values())
    for b in range(B):
        want = math.log((ct[b] + A) / (nt + A * B)) - math.log(
            (cr[b] + A) / (nr + A * B)
        )
        assert abs(got_w[b] - want) < 1e-12, b
    got_s = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in curation.dsir_scores(
            raw,
            curation.dsir_weights(
                raw, target, num_buckets=B, n_max=NMAX, smoothing=A, seed=SEED
            ),
            num_buckets=B,
            n_max=NMAX,
            seed=SEED,
        ).collect()
    }
    for r in raw_rows:
        gs = _dsir_py_grams(r[1], NMAX)
        want = sum(got_w[_dsir_py_bucket(g, B, SEED)] for g in gs)
        assert got_s[r[0]][0] == len(gs)
        assert abs(got_s[r[0]][1] - want) < 1e-9


def test_dsir_resample_prefers_target_like_docs(spark):
    """Docs sharing the target's planted vocabulary are overrepresented
    in the importance resample relative to their base rate."""
    rows = [
        (
            i,
            ("quality reference prose " * 4)
            if i % 4 == 0
            else ("spam filler junk noise " * 4),
        )
        for i in range(200)
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(i, "quality reference prose again") for i in range(8)],
        "doc_id long, text string",
    )
    out = curation.dsir_resample(
        raw, target, 40, num_buckets=256, seed=11
    )
    assert out.count() == 40
    assert set(out.columns) == {"doc_id", "text", "log_weight"}
    picked = [r["doc_id"] for r in out.collect()]
    frac = sum(1 for i in picked if i % 4 == 0) / len(picked)
    assert frac > 0.5  # base rate 0.25


def test_dsir_scores_empty_and_null_text(spark):
    target = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], "doc_id long, text string"
    )
    w = curation.dsir_weights(raw, target, num_buckets=16, seed=1)
    got = {
        r["doc_id"]: r
        for r in curation.dsir_scores(
            raw, w, num_buckets=16, seed=1
        ).collect()
    }
    assert got[2]["n_features"] == 0 and got[2]["log_weight"] == 0.0
    assert got[3]["n_features"] == 0 and got[3]["log_weight"] == 0.0
    assert got[1]["n_features"] == 5  # 3 unigrams + 2 bigrams


def test_dsir_scores_partition_invariant(spark):
    from tests.conftest import SF_TEST

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet").where(
        F.col("doc_id") < 80
    )
    target = docs.where(F.col("lang") == "en")
    w = curation.dsir_weights(docs, target, num_buckets=64, seed=5)

    def run(df):
        return sorted(
            (r["doc_id"], r["n_features"], round(r["log_weight"], 9))
            for r in curation.dsir_scores(
                df, w, num_buckets=64, seed=5
            ).collect()
        )

    assert run(docs.repartition(1)) == run(docs.repartition(17, "lang"))


# --------------------------------------------------------------- C4 filters


def test_c4_filters_each_rule(spark):
    """One document per C4 rule (Raffel et al. 2020 §2.2): terminal
    punctuation, min words/line, 'javascript' line drop, 'lorem ipsum' /
    '{' page drop, min-sentence page drop, null text."""
    rows = [
        # survives: drops the short line and the unpunctuated line
        (1, "This is a good first line.\nshort.\n"
            "Another proper sentence here!\nno terminal punct line at all\n"
            "And a third good one? Plus a fourth. And fifth sentence."),
        # survives: drops only the javascript line
        (2, "Enable javascript to view this page.\n"
            "A fine line with plenty of words.\n"
            "More good sentences follow here. Really. Truly. Surely."),
        (3, "Lorem Ipsum dolor sit amet consectetur.\n"
            "This would otherwise pass easily. Yes. It. Would. Indeed."),
        (4, "function f() { return 1; }\n"
            "Good line otherwise present here. A. B. C. D."),
        (5, "Only two sentences in this document.\nJust these two lines exist!"),
        (6, None),
    ]
    out = curation.c4_filters(_df(spark, rows), min_sentences=5)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1.n_lines, r1.n_lines_kept, r1.n_sentences) == (5, 3, 5)
    assert "short." not in r1.text and "no terminal punct" not in r1.text
    assert r1.text.count("\n") == 2  # 3 kept lines re-joined
    r2 = got[2]
    assert (r2.n_lines, r2.n_lines_kept, r2.n_sentences) == (3, 2, 5)
    assert "javascript" not in r2.text


def test_c4_filters_schema_preserved_and_shuffle_free(spark):
    """Original columns survive with text replaced; the whole filter is
    row-local — the executed plan must contain no Exchange."""
    rows = [(1, "Alpha beta gamma delta. One. Two. Three. Four. Five.", "en")]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = curation.c4_filters(df, min_sentences=5, min_line_words=1)
    assert out.columns == [
        "doc_id", "text", "lang", "n_lines", "n_lines_kept", "n_sentences"
    ]
    row = out.collect()[0]
    assert row.lang == "en" and row.n_sentences == 6
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_c4_filters_column_clash_guard(spark):
    df = _df(spark, [(1, "x")]).withColumn("__c4_t", F.lit(1))
    with pytest.raises(ValueError, match="__c4_t"):
        curation.c4_filters(df)


# ------------------------------------------------------ host blocklist


_BL_ROWS = [
    (1, "https://ads.example.com/x"),       # subdomain of blocked
    (2, "https://example.com/y"),           # exact blocked
    (3, "https://notexample.com/z"),        # suffix STRING but not label suffix
    (4, "https://good.org/a"),              # clean
    (5, "https://tracker.co.uk:8080/b"),    # blocked with port
    (6, None),                              # no host -> kept
]
_BL = ["example.com", "tracker.co.uk"]


def test_filter_blocked_hosts_literal(spark):
    df = spark.createDataFrame(_BL_ROWS, "doc_id int, url string")
    for force_set in (False, True):
        kw = {"max_regex_entries": 0} if force_set else {}
        kept = curation.filter_blocked_hosts(df, _BL, **kw)
        assert {r.doc_id for r in kept.collect()} == {3, 4, 6}
        audit = curation.filter_blocked_hosts(df, _BL, invert=True, **kw)
        assert {r.doc_id for r in audit.collect()} == {1, 2, 5}
        # zero shuffle: both literal strategies are one scan-stage filter
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    # regex metachars in a domain entry must be treated literally
    noisy = curation.filter_blocked_hosts(df, ["examp.e.com"])
    assert {r.doc_id for r in noisy.collect()} == {1, 2, 3, 4, 5, 6}
    # empty blocklist: everything kept / nothing blocked
    assert curation.filter_blocked_hosts(df, []).count() == 6
    assert curation.filter_blocked_hosts(df, [], invert=True).count() == 0


def test_filter_blocked_hosts_dataframe_mode_matches_literal(spark):
    df = spark.createDataFrame(_BL_ROWS, "doc_id int, url string")
    bl = spark.createDataFrame(
        [(d,) for d in _BL] + [(None,), ("",)], "domain string"
    )
    kept = curation.filter_blocked_hosts(df, bl, id_col="doc_id")
    assert {r.doc_id for r in kept.collect()} == {3, 4, 6}
    audit = curation.filter_blocked_hosts(df, bl, id_col="doc_id", invert=True)
    assert {r.doc_id for r in audit.collect()} == {1, 2, 5}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError, match="id_col"):
        curation.filter_blocked_hosts(df, bl)


def test_host_suffixes(spark):
    df = spark.createDataFrame([("a.b.co.uk",), ("uk",)], "h string")
    got = df.select(curation.host_suffixes(F.col("h")).alias("s")).collect()
    assert got[0].s == ["a.b.co.uk", "b.co.uk", "co.uk", "uk"]
    assert got[1].s == ["uk"]


# ----------------------------------------------------------- ccnet buckets


def test_ccnet_buckets_match_ntile_window(spark):
    """The distributed rank path (range repartition + per-partition
    row_number + broadcast offsets + closed-form NTILE) must equal the
    textbook ntile() window on (lang, round(ce,4), id) exactly — the
    window is the semantics, the distributed path is the plan that
    doesn't put a whole language in one task."""
    from pyspark.sql import Window

    from hllspark.curation import ccnet_buckets, lm_perplexity_scores

    rows = []
    for i in range(120):
        lang = ["en", "de", "fr"][i % 3]
        body = " ".join(
            ["the cat sat on the mat"] * (1 + i % 4)
            + [f"tok{(i * 7) % 23} tok{(i * 11) % 19}"]
        )
        rows.append((i, body, lang))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    got = ccnet_buckets(df, n_buckets=3, num_partitions=7)
    got_rows = {r["doc_id"]: r for r in got.collect()}

    scores = lm_perplexity_scores(df).join(
        df.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(
        F.round("cross_entropy", 4), "doc_id"
    )
    exp = {
        r["doc_id"]: r["b"]
        for r in scores.withColumn("b", F.ntile(3).over(w)).collect()
    }
    assert len(got_rows) == 120
    for did, r in got_rows.items():
        assert r["bucket"] == exp[did], did
        assert r["bucket_label"] == {1: "head", 2: "middle", 3: "tail"}[
            exp[did]
        ]


def test_ccnet_buckets_sizes_and_edges(spark):
    """Equal-count tiers (sizes differ by <=1 within a language), n < b
    languages get one row per bucket, and n_buckets=1 labels all head."""
    from hllspark.curation import ccnet_buckets

    rows = [(i, f"w{i} x y z common words here", "en") for i in range(10)]
    rows += [(100, "een twee drie", "nl"), (101, "vier vijf zes", "nl")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(df, n_buckets=4).collect()
    en_sizes = {}
    for r in out:
        if r["lang"] == "en":
            en_sizes[r["bucket"]] = en_sizes.get(r["bucket"], 0) + 1
    # 10 rows into 4 buckets -> sizes 3,3,2,2
    assert sorted(en_sizes.values(), reverse=True) == [3, 3, 2, 2]
    nl = sorted(r["bucket"] for r in out if r["lang"] == "nl")
    assert nl == [1, 2]  # n < b: one row per leading bucket (NTILE)
    one = ccnet_buckets(df, n_buckets=1).collect()
    assert {r["bucket_label"] for r in one} == {"head"}
