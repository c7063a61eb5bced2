"""Trained char-n-gram NB language ID (hllspark/text.py nb_lang_weights
/ nb_lang_id): classification on a hand corpus, complete weight matrix,
prior-only docs, vocabulary cap."""

import math

import pyspark.sql.functions as F

from hllspark.text import char_ngrams, nb_lang_id, nb_lang_weights

_TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "and then there were none said the judge in the end", "en"),
    (3, "she sells sea shells by the sea shore", "en"),
    (4, "der schnelle braune fuchs springt ueber den faulen hund", "de"),
    (5, "und dann war da keiner sagte der richter am ende", "de"),
    (6, "sie verkauft muscheln an der schoenen kueste", "de"),
    (7, "le renard brun rapide saute par dessus le chien paresseux", "fr"),
    (8, "et puis il ne resta personne dit le juge a la fin", "fr"),
]


def _train(spark):
    return spark.createDataFrame(
        _TRAIN, "doc_id long, text string, lang string"
    )


def test_char_ngrams_padding(spark):
    row = spark.range(1).select(
        char_ngrams(F.lit("Ab c"), 2).alias("g")
    ).first()
    assert row["g"] == [" a", "ab", "b ", " c", "c "]


def test_nb_lang_id_classifies_held_out(spark):
    w, stats = nb_lang_weights(_train(spark), n=2)
    test = spark.createDataFrame(
        [
            (10, "the dog jumps over the fox"),
            (11, "der hund springt ueber den fuchs"),
            (12, "le chien saute par dessus le renard"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang"] for r in nb_lang_id(test, w, stats).collect()}
    assert got == {10: "en", 11: "de", 12: "fr"}


def test_nb_lang_weights_complete_matrix(spark):
    w, stats = nb_lang_weights(_train(spark), n=2)
    n_langs = stats.count()
    n_grams = w.select("gram").distinct().count()
    assert n_langs == 3
    assert w.count() == n_grams * n_langs  # every gram has every lang
    # priors sum to 1 in probability space
    pr = [math.exp(r["prior"]) for r in stats.collect()]
    assert abs(sum(pr) - 1.0) < 1e-9


def test_nb_lang_id_prior_only_and_null(spark):
    w, stats = nb_lang_weights(_train(spark), n=2)
    test = spark.createDataFrame(
        [(20, ""), (21, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in nb_lang_id(test, w, stats).collect()}
    assert len(out) == 2
    # "" still yields grams ("  " from padding); None yields prior-only.
    # en has 3 of 8 training docs -> highest prior wins for prior-only
    assert out[21]["lang"] == "en"
    assert out[21]["score"] == max(
        r["prior"] for r in stats.collect()
    )


def test_nb_lang_weights_cap_keeps_model_consistent(spark):
    w, stats = nb_lang_weights(_train(spark), n=2, max_features=30)
    assert w.select("gram").distinct().count() == 30
    assert w.count() == 90
    test = spark.createDataFrame(
        [(10, "the dog and the fox in the end")], "doc_id long, text string"
    )
    got = nb_lang_id(test, w, stats).first()
    assert got["lang"] == "en"


def test_nb_lang_id_arrow_matches_expr(spark):
    """The vectorized numpy kernel must agree with the expr path on
    language for every doc and on score to 1e-9 (both paths sum floats
    in nondeterministic order) — including empty, null, whitespace-only
    and non-ascii text."""
    w, stats = nb_lang_weights(_train(spark), n=2)
    test = spark.createDataFrame(
        [
            (10, "the dog jumps over the fox"),
            (11, "der hund springt ueber den fuchs"),
            (12, "le chien saute par dessus le renard"),
            (13, ""),
            (14, None),
            (15, "   "),
            (16, "zzz café über naïve"),
            (17, "the the the the"),
            # TRAILING nulls in the batch: regression for the reduceat
            # clamp bug that stole the preceding doc's final gram
            (18, None),
            (19, None),
        ],
        "doc_id long, text string",
    ).coalesce(1)  # one batch, nulls guaranteed at the end
    e = {r["doc_id"]: r for r in nb_lang_id(test, w, stats).collect()}
    a = {
        r["doc_id"]: r
        for r in nb_lang_id(test, w, stats, impl="arrow").collect()
    }
    assert set(e) == set(a) == set(range(10, 20))
    for k in e:
        assert e[k]["lang"] == a[k]["lang"], k
        assert abs(e[k]["score"] - a[k]["score"]) < 1e-9, k
