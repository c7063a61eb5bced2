"""Train/eval decontamination: word n-gram overlap between two corpora.

The standard LLM-pipeline check (GPT-3 appendix C, PaLM §8, Dolma):
an eval document "contaminates" a training document when a large
fraction of the training doc's word n-grams also occur anywhere in the
eval set.  This module computes, for every train doc, the fraction of
its distinct n-grams that appear in the eval corpus, entirely with JVM
built-ins (split / transform / slice / explode — no Python on the data
path).

Plan shape, designed for train >> eval (the usual case at 100 TB):

  train scan -> ngrams (codegen) -> explode -> distinct per doc
     -> semi-join on the 64-bit ngram hash vs distinct eval grams
        (broadcast when the eval grams fit — the usual case — so the
        train gram stream never shuffles at all)
     -> per-doc matched count / total count

The join keys are xxhash64(ngram) (8 bytes instead of the gram text —
5-10x less shuffle; collision probability ~G^2/2^65, negligible at any
real gram cardinality; pass ``key='text'`` for the collision-free
variant).  An optional Bloom prune before the join exists for the
narrow regime where the eval grams exceed broadcast size AND network
shuffle dominates — measured OFF-by-default because the probe costs
more than the local shuffle it avoids (PLANS.md §15).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from . import joins
from .text import words_col


def ngram_col(text: Column, n: int) -> Column:
    """Array of word ``n``-grams (space-joined) of a text column; empty
    array when the text has fewer than n whitespace tokens.

    Formulated as chained ``zip_with`` over the word array and its
    k-shifted slices — every array is an HOF *argument*, evaluated once
    per row.  The obvious ``transform(sequence, i -> slice(words, i, n))``
    is a performance trap: a lambda that captures an outer expression
    re-evaluates that whole expression (including the regex split) per
    element, measured 7x slower at 400k docs and quadratic in doc length
    (PLANS.md §21).  Trailing positions pair with null, null-propagate
    through concat, and are filtered off."""
    if n < 1:
        raise ValueError("n must be >= 1")
    words = words_col(text)
    if n == 1:
        return F.coalesce(words, F.array().cast("array<string>"))
    size = F.size(words)
    grams = words
    for k in range(1, n):
        shifted = F.slice(words, k + 1, F.greatest(size - k, F.lit(1)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.coalesce(
        F.filter(grams, lambda x: x.isNotNull()),
        F.array().cast("array<string>"),
    )


def doc_ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram) — DISTINCT word n-grams per document, exploded."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(ngram_col(F.col(text_col), n))).alias("gram"),
        )
    )


def ngram_overlap(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    threshold: float = 0.8,
    key: str = "hash",
    bloom_fpp: float | None = None,
) -> DataFrame:
    """Per-train-document eval-set overlap:
    (id, n_grams, n_matched, overlap_ratio, contaminated).

    ``overlap_ratio`` = |distinct train-doc n-grams found anywhere in the
    eval corpus| / |distinct train-doc n-grams| (0.0 for docs shorter
    than n words); ``contaminated`` = ratio >= threshold.

    ``bloom_fpp``: build a Bloom filter over the eval grams and prune the
    train gram stream before its shuffle — exact result regardless (the
    real join still runs).  Default OFF: measured on local[32] the
    Arrow-batched probe costs MORE than the shuffle it avoids at every
    feasible scale (gram rows are only 16 bytes — 0.6s off vs 1.6s on at
    a 200k-doc train / 20k-doc eval A/B; see PLANS.md §15), and when the
    eval-gram table fits the broadcast threshold Spark already does a
    map-side join with no train shuffle at all.  Enable only on
    network-bound clusters where the eval grams exceed broadcast size AND
    shuffle bytes dominate.  ``key='hash'`` joins on xxhash64(gram)
    (small shuffle, astronomically unlikely collisions); ``key='text'``
    joins on the gram itself."""
    if key not in ("hash", "text"):
        raise ValueError("key must be 'hash' or 'text'")
    tr = doc_ngrams(train, id_col, text_col, n)
    te = doc_ngrams(test, id_col, text_col, n).select("gram")
    if key == "hash":
        tr = tr.select("id", F.xxhash64("gram").alias("g"))
        te = te.select(F.xxhash64("gram").alias("g"))
    else:
        tr = tr.select("id", F.col("gram").alias("g"))
        te = te.select(F.col("gram").alias("g"))
    te = te.distinct()

    totals = tr.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    probe = tr
    if bloom_fpp is not None:
        # the eval-gram table is read 3x in this mode (filter sizing, Bloom
        # build, mop-up join) — persist it once; it is small by assumption
        # (the eval corpus), and its count sizes the filter for free
        te = te.persist()
        bloom_bytes = joins.build_bloom(te, "g", fpp=bloom_fpp, n_expected=te.count())
        probe = joins.bloom_prune(tr, "g", prebuilt=bloom_bytes)
    matched = (
        probe.join(te, "g", "leftsemi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    base = train.select(F.col(id_col).alias("id")).distinct()
    ratio = F.when(
        F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
        F.coalesce(F.col("n_matched"), F.lit(0))
        / F.col("n_grams").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        base.join(totals, "id", "left")
        .join(matched, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_matched"), F.lit(0)).alias("n_matched"),
            ratio.alias("overlap_ratio"),
            (ratio >= F.lit(threshold)).cast("int").alias("contaminated"),
        )
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    threshold: float = 0.8,
    **kw,
) -> DataFrame:
    """Training rows whose eval overlap is below ``threshold`` — the
    filtered corpus, original schema preserved.  Contaminated ids are
    removed via a broadcast-friendly left-anti join on the id."""
    rep = ngram_overlap(train, test, id_col, text_col, n, threshold, **kw)
    bad = rep.where(F.col("contaminated") == 1).select(F.col(id_col))
    return train.join(bad, id_col, "left_anti")
