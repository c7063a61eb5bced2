"""BPE tokenizer training/encoding (hllspark/bpe.py): hand-computed
merge sequence on the classic Sennrich corpus, greedy-rank encoding,
decode round-trip, partition invariance, and the distributed pair-count
grain."""

import pyspark.sql.functions as F

from hllspark import bpe


def _corpus(spark, n_parts=1):
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    # spread the words over several docs so the aggregate actually runs
    docs = [(i, " ".join(words[i::4])) for i in range(4)]
    return spark.createDataFrame(docs, "doc_id int, text string").repartition(
        n_parts
    )


def test_train_bpe_hand_computed_merges(spark):
    # freqs: low:5 lower:2 newest:6 widest:3.  Pair counts round 1:
    # (e,s)=(s,t)=(t,</w>)=9 -> lexicographic tie-break picks (e,s);
    # then (es,t)=( t,</w>)=9 -> (es,t); then (est,</w>)=9; then
    # (l,o)=(o,w)=7 -> (l,o); then (lo,w)=7.
    merges = bpe.train_bpe(_corpus(spark), num_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_train_bpe_partition_invariant(spark):
    m1 = bpe.train_bpe(_corpus(spark, 1), num_merges=8)
    m8 = bpe.train_bpe(_corpus(spark, 8), num_merges=8)
    assert m1 == m8


def test_bpe_encode_greedy_rank_and_memo(spark):
    merges = bpe.train_bpe(_corpus(spark), num_merges=8)
    df = spark.createDataFrame(
        [(1, "newest lowland"), (2, ""), (3, None)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe.bpe_encode(df, merges).collect()}
    # trained words collapse fully; unseen word segments by learned parts
    assert out[1][0] == "newest</w>"
    assert out[1][1:] == ["low", "l", "a", "n", "d", "</w>"]
    assert out[2] == [] and out[3] == []


def test_bpe_decode_round_trip(spark):
    merges = bpe.train_bpe(_corpus(spark), num_merges=8)
    text = "the newest widest lowlands are lower"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    toks = bpe.bpe_encode(df, merges).first()["bpe_tokens"]
    assert bpe.bpe_decode_tokens(toks) == text


def test_symbol_pair_counts_grain(spark):
    wc = bpe.word_counts(_corpus(spark))
    counts = {
        (r["s1"], r["s2"]): r["count"]
        for r in bpe.symbol_pair_counts(wc).collect()
    }
    assert counts[("e", "s")] == 9
    assert counts[("s", "t")] == 9
    assert counts[("t", "</w>")] == 9
    assert counts[("w", "e")] == 8
    assert counts[("l", "o")] == 7
    assert counts[("w", "i")] == 3
    # after one merge the merged symbol appears in the pair grain
    after = {
        (r["s1"], r["s2"]): r["count"]
        for r in bpe.symbol_pair_counts(wc, merges=[("e", "s")]).collect()
    }
    assert after[("es", "t")] == 9
    assert ("e", "s") not in after


def test_training_segmentation_matches_encode(spark):
    """The final training-side segmentation of every training word must
    equal what bpe_encode produces for that word — one shared greedy
    rule, no train/serve skew."""
    merges = bpe.train_bpe(_corpus(spark), num_merges=6)
    df = spark.createDataFrame(
        [(1, "low lower newest widest")], "doc_id int, text string"
    )
    toks = bpe.bpe_encode(df, merges).first()["bpe_tokens"]
    expect = []
    for w in ["low", "lower", "newest", "widest"]:
        expect.extend(bpe._word_symbols(w, merges))
    assert toks == expect


def test_bpe_vocab_and_ids(spark):
    merges = bpe.train_bpe(_corpus(spark), num_merges=6)
    vocab = bpe.bpe_vocab(_corpus(spark), merges)
    assert vocab["<unk>"] == 0
    # base chars sorted and contiguous after <unk>
    chars = sorted(set("lowernewstid"))
    assert [vocab[c] for c in chars] == list(range(1, len(chars) + 1))
    assert vocab[bpe.EOW] == len(chars) + 1
    # merge outputs in merge order after the base symbols
    assert vocab["es"] == len(chars) + 2
    df = spark.createDataFrame(
        [(1, "newest zebra")], "doc_id int, text string"
    )
    row = bpe.bpe_encode(df, merges, vocab=vocab).first()
    assert len(row["bpe_ids"]) == len(row["bpe_tokens"])
    for tok, tid in zip(row["bpe_tokens"], row["bpe_ids"]):
        if all(c in vocab for c in tok) and tok in vocab:
            assert vocab[tok] == tid
    # 'z', 'b', 'a' are unseen in the training corpus -> <unk> id 0
    assert 0 in row["bpe_ids"]


def test_bpe_encode_matches_training_tokenizer_on_nbsp(spark):
    """Unicode whitespace (NBSP) must NOT split words at encode time:
    training counts words with words_col (Java \\s = ASCII whitespace
    only), so 'foo\\u00a0bar' is ONE word type in the model and encode
    must segment it as one word too."""
    text = "foo bar foo bar"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    merges = bpe.train_bpe(df, num_merges=20)
    toks = bpe.bpe_encode(df, merges).first()["bpe_tokens"]
    # the fully-merged single type appears twice
    assert toks == ["foo bar</w>", "foo bar</w>"]
    assert bpe.bpe_decode_tokens(toks) == text.lower()
