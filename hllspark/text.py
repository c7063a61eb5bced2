"""Text operators for the web-pages pipeline: extraction, shingling, and
training-data text analysis (language-ID, quality scoring, token counting,
document fingerprinting).

Everything here is either a native Spark SQL expression (preferred — stays
in whole-stage codegen) or a vectorized Arrow-batch function used inside
mapInPandas (never per-row Python).

The html->text extraction satisfies the input_hint per-row invariant:
extract_text(html) is byte-identical to the pages fixture's text column
(hllspark.io.generate_pages wraps text as <html><body>...</body></html>).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .hashing import farmhash64

# ---------------------------------------------------------------------------
# extraction
# ---------------------------------------------------------------------------

def extract_text(html: Column) -> Column:
    """Deterministic text extraction from the html binary column (JVM-side):
    strip the <html><body> wrapper; a stand-in for a real boilerplate
    stripper with an exactly-testable contract (byte-identical to the
    generator's text)."""
    s = html.cast("string")
    return F.regexp_replace(s, r"^<html><body>|</body></html>$", "")


# Block-level elements whose open AND close tags become a newline (so
# paragraphs/headings/cells stay separated after tag stripping).  Inline
# tags (<b>, <span>, <a>, ...) are zero-width, matching how browsers
# flow inline content.
_BLOCK_TAGS = (
    "p|div|br|hr|li|ul|ol|dl|dt|dd|h[1-6]|tr|td|th|table|thead|tbody|"
    "blockquote|pre|section|article|aside|nav|header|footer|main|"
    "figure|figcaption|form|fieldset|address|html|body"
)

# Entity decode set (decoded AFTER tag stripping so escaped markup like
# &lt;tag&gt; survives as literal text; &amp; is decoded LAST so the
# single-pass semantics are correct: '&amp;lt;' -> '&lt;', not '<').
_ENTITIES = [
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def extract_text_html(html: Column) -> Column:
    """REAL HTML -> text boilerplate extraction as a chain of pure JVM
    ``regexp_replace``/``replace`` expressions — the ingest step between
    a WARC payload (:mod:`hllspark.warc`) and the curation pipeline.
    Zero Python workers; the whole chain stays in whole-stage codegen,
    so at 100 TB this is a map-only scan with no shuffle.

    Rules, in order (order is load-bearing):

    1. drop ``<script>``/``<style>``/``<noscript>``/``<title>`` elements
       WITH their content (non-greedy to the matching close tag, i.e.
       the HTML5 rule that raw-text elements end at the FIRST close
       tag; an unterminated block survives verbatim — documented,
       matches lenient parsers).  These run BEFORE comment stripping so
       a lone ``<!--`` inside a JS string cannot eat visible content
       through some later ``-->``; ``<title>`` is dropped explicitly so
       SEO boilerplate cannot leak even when ``</head>`` is omitted;
    2. strip HTML comments ``<!-- ... -->`` (DOTALL);
    3. drop the entire ``<head>`` element (remaining meta boilerplate);
    4. open/close tags of block-level elements -> ``\\n``;
    5. every remaining tag -> '' (inline tags are zero-width);
    6. decode the common entity set, ``&amp;`` last;
    7. normalize whitespace: horizontal runs -> one space, spaces
       hugging newlines dropped, newline runs collapsed, edges trimmed.

    Known trade-off of any regex-grade stripper (documented, accepted):
    an UNESCAPED ``<`` in visible text (``n < 10 and x > 2``) is parsed
    as a tag open and eats through the next ``>``; likewise a literal
    ``>`` inside a quoted attribute value truncates that tag match.
    Spec-valid HTML escapes these; on crawl data the damage is bounded
    to the single ``<...>`` span.

    Every pattern is restricted to the regex subset where Java regex
    (Spark) and RE2 (DuckDB) agree — no backreferences, no lookaround —
    so the contract oracle can state the expected output independently.
    Null html -> null.  Cited scope: the reference
    (HyperLogLog*.hpp) has no text surface; this is engine scope from
    BASELINE.json's Common-Crawl-style input_hint."""
    s = html.cast("string")
    for tag in ("script", "style", "noscript", "title"):
        s = F.regexp_replace(s, rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", "")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    s = F.regexp_replace(s, r"(?is)<head\b[^>]*>.*?</head\s*>", "")
    s = F.regexp_replace(s, rf"(?is)</?({_BLOCK_TAGS})\b[^>]*>", "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", "")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, "[ \t\x0b\f\r]+", " ")
    s = F.regexp_replace(s, " ?\n ?", "\n")
    s = F.regexp_replace(s, r"\n+", "\n")
    return F.regexp_replace(s, r"^\s+|\s+$", "")


# ---------------------------------------------------------------------------
# shingling (for distinct-shingle cardinality + minhash dedup)
# ---------------------------------------------------------------------------

def words_col(text: Column) -> Column:
    """THE whitespace tokenizer for the whole engine: ``split(text, \\s+)``
    with empty tokens removed.  Splitting the raw text and filtering (rather
    than ``split(trim(text))``) is deliberate: ``trim`` strips only the
    space character, so text with leading/trailing tabs or newlines would
    keep empty edge tokens and diverge from the Arrow fast path (which
    filters empties) and from any sane word count.  Null text yields null
    (callers coalesce where an empty array is wanted).  Every module
    (curation, decontam, dedup, text) and every DuckDB contract oracle
    uses this exact definition:
    ``list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')``.

    Implemented as ``array_remove(split(..), '')``: empty tokens can only
    occur at the array edges (``\\s+`` merges interior runs), so
    remove-all == filter.  NOTE the element-wise removal costs ~4x the
    bare split on long texts (PLANS.md §25) — when only the COUNT is
    needed, use :func:`token_count` (regex edge corrections, no array
    mutation, ~4x faster at corpus scale)."""
    return F.array_remove(F.split(text, r"\s+"), "")


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as an array<string> column — pure SQL, positional
    order preserved, duplicates kept.  Deterministic per text value.

    Formulated as chained ``zip_with`` over the word array and its
    shifted slices (cf. decontam.ngram_col): every array is an HOF
    ARGUMENT, evaluated once per row.  The previous
    ``transform(sequence, i -> array_join(slice(words, i, k)))`` was the
    lambda-capture trap this repo already documents (PLANS.md §21): a
    lambda capturing ``words`` re-evaluates the whole captured
    expression — regex split included — PER ELEMENT, making shingling
    quadratic in document length.  Round-5 measurement on 200k
    ~100-token pages: the full 64-permutation MinHash signature dropped
    22.7s -> 2.9s (7.8x) from this change alone, with byte-identical
    gram values (equality pytest-gated)."""
    words = words_col(text)
    size = F.size(words)
    n = size - F.lit(k - 1)
    if k == 1:
        grams = words
    else:
        grams = words
        for j in range(1, k):
            shifted = F.slice(words, j + 1, F.greatest(size - j, F.lit(1)))
            grams = F.zip_with(
                grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
            )
        # zip_with pads the shorter side with nulls; concat null-
        # propagates, so exactly the k-1 trailing positions are null
        grams = F.filter(grams, lambda x: x.isNotNull())
    # n < 1 (fewer than k tokens) -> empty; null text stays null
    return F.when(n < 1, F.array().cast("array<string>")).otherwise(grams)


def explode_shingles(df: DataFrame, text_col: str = "text", k: int = 3,
                     out_col: str = "shingle") -> DataFrame:
    return df.withColumn(out_col, F.explode(shingles(F.col(text_col), k)))


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def token_count(text: Column) -> Column:
    """Whitespace token count (JVM) == size(words_col(text)), computed
    WITHOUT materializing the filtered array: ``\\s+``-split empties can
    only appear at the text edges, so count = size(split) minus one per
    whitespace edge, 0 for blank/whitespace-only text.  ~4x faster than
    the array form on corpus-scale scans (PLANS.md §25).  Blank /
    whitespace-only text counts 0; null text counts null."""
    lead = F.when(text.rlike(r"\A\s"), F.lit(1)).otherwise(F.lit(0))
    trail = F.when(text.rlike(r"\s\z"), F.lit(1)).otherwise(F.lit(0))
    n = F.size(F.split(text, r"\s+")) - lead - trail
    return F.when(text.rlike(r"\A\s*\z"), F.lit(0)).otherwise(n)


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavored upper-bound token count: words + digit runs +
    punctuation marks each count separately (regexp, JVM-side)."""
    pieces = F.split(text, r"(?=[^\w\s])|(?<=[^\w\s])|\s+")
    return F.size(F.filter(pieces, lambda x: x != ""))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "this", "that", "be", "are",
]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio features, all JVM expressions.
    Adds: n_chars, n_tokens, punct_ratio, stopword_ratio, mean_word_len,
    quality_score (a simple monotone combination in [0, 1])."""
    t = F.col(text_col)
    words = words_col(t)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin(_STOPWORDS))
    )
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(0.0)
    mean_wl = F.when(n_tokens > 0, (n_chars - n_tokens + 1) / n_tokens).otherwise(0.0)
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 3, F.lit(1.0)) * 0.3
    )
    return (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("stopword_ratio", stop_ratio.cast("double"))
        .withColumn("mean_word_len", mean_wl.cast("double"))
        .withColumn("quality_score", score.cast("double"))
    )


# ---------------------------------------------------------------------------
# language identification (n-gram heuristic)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, list[str]] = {
    # distinctive frequent words / character patterns per language
    "en": [" the ", " and ", " of ", " is ", " to "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "fr": [" le ", " la ", " et ", " les ", " des "],
    "es": [" el ", " los ", " que ", " y ", " las "],
    "fi": ["ä", "ö", " ja ", " on ", " ei "],
    "ja": ["の", "は", "を", "に", "た"],
}


def lang_id(text: Column) -> Column:
    """Marker-vote language ID, pure SQL: count marker occurrences per
    language, return the argmax (ties -> lexicographically first marker
    set order; 'und' when no marker hits).  Whitespace runs (incl. the
    newline block separators `extract_text_html` emits) normalize to a
    single space first — markers are space-delimited words, so without
    this every marker touching a line boundary would silently not
    count."""
    padded = F.concat(
        F.lit(" "),
        F.lower(F.regexp_replace(text, r"\s+", " ")),
        F.lit(" "),
    )
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        s = None
        for mk in markers:
            # occurrences of mk = (len(text) - len(replace(text, mk))) / len(mk)
            occ = (F.length(padded) - F.length(F.replace(padded, F.lit(mk), F.lit("")))) / F.lit(
                len(mk)
            )
            s = occ if s is None else s + occ
        scores.append(F.struct(s.cast("double").alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# document fingerprinting (rolling / content hashes)
# ---------------------------------------------------------------------------

def content_fingerprint(text: Column) -> Column:
    """64-bit content fingerprint (JVM xxhash64 of the normalized text)."""
    normalized = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.xxhash64(normalized)


def farmhash_fingerprint_udf():
    """Reference-parity fingerprint: farmhash::Hash64 of the raw text
    (vectorized Arrow batches; use when byte-parity with the reference hash
    chain matters)."""

    def _fp(s: pd.Series) -> pd.Series:
        return pd.Series(farmhash64(s.fillna("").to_numpy(dtype=object)).view(np.int64))

    return F.pandas_udf(_fp, "long")


def sliding_min(hashes: Column, window: int) -> Column:
    """Distinct per-window minima of an array<bigint> — the winnowing
    selection step, separated so callers can materialize the hash array
    in its own projection (cf. dedup.winnow_fingerprint_rows).

    Chained ``zip_with``/``least`` over shifted slices — the same
    lambda-capture-trap fix as :func:`shingles` (PLANS.md §21/§31): the
    previous ``transform(sequence, i -> array_min(slice(hashes, i, w)))``
    re-evaluated the captured ``hashes`` expression — the whole
    shingle+hash chain — once PER WINDOW, i.e. O(k·w^2) per document.
    After j zips, position i holds min(hashes[i..i+j]); ``least`` skips
    the nulls zip_with pads the shorter side with, so the trailing
    window-1 positions hold partial-window minima — sliced off (only
    positions 1..n_win are full windows)."""
    size = F.size(hashes)
    n_win = size - F.lit(window - 1)
    mins = hashes
    for j in range(1, window):
        shifted = F.slice(hashes, j + 1, F.greatest(size - j, F.lit(1)))
        mins = F.zip_with(mins, shifted, lambda a, b: F.least(a, b))
    full = F.when(n_win < 1, F.array().cast("array<bigint>")).otherwise(
        F.slice(mins, 1, n_win)
    )
    return F.array_distinct(full)


def winnow_fingerprints(text: Column, k: int = 5, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer et al. 2003): hash every
    k-gram (word level), then keep the minimum hash of each sliding window —
    returns array<bigint> of selected fingerprints.  Pure SQL."""
    grams = shingles(text, k)
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    return sliding_min(hashes, window)


def explode_tokens(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, token) — lowercased whitespace tokens, one row each (codegen
    split + explode; empty/whitespace-only texts yield no rows)."""
    toks = words_col(F.lower(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("token")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document to ``query_terms``
    (Robertson-Sparck Jones; the standard retrieval scorer):

      score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*|d|/avgdl))
      idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))

    Plan: tokens are filtered to the query terms BEFORE any aggregation
    (the explode stream collapses to |terms| x docs-containing-them —
    scan-dominant, tiny shuffles), doc lengths are a map-side
    ``size(split(...))`` — NO full-token shuffle anywhere — and the
    corpus stats (N, avgdl, per-term df) are a broadcast-joined handful
    of rows.  Returns (id, score) with score 0 for docs containing no
    query term."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = explode_tokens(df, text_col, id_col)
    # token count per doc WITHOUT exploding: token_count equals the
    # explode-based count exactly (empty tokens filtered on both paths;
    # lowercasing does not change whitespace, so count the raw text)
    dl = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("long").alias("dl"),
    ).where(F.col("dl") > 0)
    hits = toks.where(F.col("token").isin(terms))
    # tf feeds BOTH the df-per-term aggregate and the scoring join; persist
    # the (docs-with-hits x |terms|)-bounded table so the corpus explode
    # runs once, not twice (same shared-grain rule as agg.rolling_distinct)
    tf = hits.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf")).persist()
    n_docs = df.select(F.count(F.lit(1)).alias("n")).withColumn("__x", F.lit(1))
    avgdl = dl.agg(F.avg("dl").alias("avgdl")).withColumn("__x", F.lit(1))
    stats = F.broadcast(n_docs.join(avgdl, "__x").drop("__x"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "id")
        .crossJoin(stats)
        .select(
            "id",
            (
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    scored = per_term.groupBy("id").agg(F.sum("term_score").alias("score"))
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(scored, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def top_k_by(
    df: DataFrame,
    strata_cols: list[str] | str,
    order_col: str,
    k: int,
    tie_col: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Top k rows per stratum by ``order_col`` (deterministic: ties broken
    by ``tie_col``).  One exchange on the strata + per-stratum sort — the
    grouped analogue of TakeOrdered."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    from pyspark.sql import Window

    o = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [o] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# trained language ID (char-n-gram Naive Bayes, fastText/CLD-style)
# ---------------------------------------------------------------------------

def char_ngrams(text: Column, n: int = 2) -> Column:
    """Char n-grams of the lowercased text, space-padded at both ends
    (the fastText convention, so word-initial/final shapes are their
    own features).  Pure expressions; null text -> null."""
    t = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    count = F.greatest(F.length(t) - F.lit(n - 1), F.lit(0))
    # sequence(1, 0) DESCENDS to [1, 0] in Spark — and a null text makes
    # count null, which greatest() folds to 0 — so both cases must be
    # guarded to an empty index array, and null text must stay null
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: t.substr(i, F.lit(n)))
    return F.when(text.isNull(), F.lit(None).cast("array<string>")).otherwise(
        grams
    )


def nb_lang_weights(
    labeled: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 2,
    smoothing: float = 1.0,
    max_features: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Trains a multiclass char-n-gram Naive-Bayes language classifier
    IN-PLAN (two aggregates, no gradient loop) — the trained upgrade of
    the marker-vote :func:`lang_id` heuristic, the same model family as
    CLD/fastText lang-id.

    Returns (weights, lang_stats):
      weights:    (gram, lang, weight) with weight = ln P(gram|lang)
                  under Laplace ``smoothing`` — a COMPLETE gram x lang
                  matrix (grams the lang never saw get the smoothed
                  floor), which is what keeps broadcast-join scoring
                  exact: every in-vocab gram contributes a defined
                  weight for EVERY language.
      lang_stats: (lang, prior, oov_weight) — ln class prior by doc
                  count and the per-lang OOV/floor weight
                  ln(a / (N_lang + a * V)).

    ``max_features`` caps the vocabulary to the top-K grams by total
    corpus frequency (ties lexicographic; exact TakeOrdered, no global
    sort) BEFORE totals are computed, so the model is self-consistent
    over its own capped vocabulary and both tables stay
    broadcast-bounded (K x languages) for open-vocab web scale.

    Plan: gram explode -> ONE map-side-combined groupBy(gram, lang) ->
    optional top-K cap -> complete the matrix with a (grams x langs)
    join against coalesce-0 counts -> tiny per-lang totals broadcast.
    """
    base = labeled.where(
        F.col(lang_col).isNotNull() & F.col(text_col).isNotNull()
    )
    grams = base.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
    )
    counts = grams.groupBy("gram", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    if max_features is not None:
        top = (
            counts.groupBy("gram")
            .agg(F.sum("c").alias("tot"))
            .orderBy(F.desc("tot"), "gram")
            .limit(int(max_features))
            .select("gram")
        )
        counts = counts.join(F.broadcast(top), "gram")
        vocab = top
    else:
        vocab = counts.select("gram").distinct()
    langs = base.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # complete matrix: every vocab gram x every lang, count-coalesced
    full = (
        vocab.crossJoin(F.broadcast(langs.select("lang")))
        .join(counts, ["gram", "lang"], "left")
        .select("gram", "lang", F.coalesce("c", F.lit(0)).alias("c"))
    )
    totals = full.groupBy("lang").agg(F.sum("c").alias("n_lang"))
    v = vocab.agg(F.count(F.lit(1)).cast("double").alias("v"))
    a = F.lit(float(smoothing))
    weights = (
        full.join(F.broadcast(totals), "lang")
        .crossJoin(F.broadcast(v))
        .select(
            "gram",
            "lang",
            F.log(
                (F.col("c") + a) / (F.col("n_lang") + a * F.col("v"))
            ).alias("weight"),
        )
    )
    total_docs = langs.agg(F.sum("n_docs").alias("t"))
    lang_stats = (
        langs.crossJoin(F.broadcast(total_docs))
        .join(F.broadcast(totals), "lang")
        .crossJoin(F.broadcast(v))
        .select(
            "lang",
            F.log(F.col("n_docs") / F.col("t")).alias("prior"),
            F.log(a / (F.col("n_lang") + a * F.col("v"))).alias(
                "oov_weight"
            ),
        )
    )
    return weights, lang_stats


def nb_lang_id(
    df: DataFrame,
    weights: DataFrame,
    lang_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    impl: str = "expr",
) -> DataFrame:
    """(id_col, lang, score): the argmax-language classification of each
    document under the :func:`nb_lang_weights` model, with the exact NB
    log-posterior as score.

    ``impl='arrow'`` routes through the vectorized numpy kernel
    (:func:`_nb_lang_id_arrow`) — ~40x the expr path's corpus-scan
    throughput because it never materializes the per-gram string array
    the explode path pays for (the PLANS §32 allocation trap); same
    model, scores agree to ~1e-9 (pytest-gated).  Requires a LONG
    id column.

    score(d, l) = prior_l + sum_{g in d, g in vocab} weight(g, l)
                + |{g in d, g not in vocab}| * oov_weight_l

    Because the weight matrix is complete, the in-vocab gram count per
    doc is language-independent, so the OOV term is (G - C) with one
    G (total grams) and one C (in-vocab grams) per doc.

    Plan — deliberately NOT a (gram, lang) join, which would multiply
    the corpus gram stream by the language count before any reduction:
    the weight matrix is pivoted WIDE to one row per gram carrying L
    weight COLUMNS (a tiny driver-free agg over the vocab-bounded
    table), the doc gram stream joins it ONCE (broadcast), and a single
    doc-keyed aggregate computes all L partial sums as columns.  Priors
    and OOV floors arrive as literals (lang_stats is L rows), the
    argmax is one array_max over (score, lang) structs.  Two map-side-
    combined doc-keyed aggregates total, gram stream never multiplied,
    no Python.  Ties break toward the lexicographically LAST language
    deterministically; zero-gram docs score prior-only."""
    if impl == "arrow":
        return _nb_lang_id_arrow(df, weights, lang_stats, id_col, text_col, n)
    if impl != "expr":
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")
    stats = sorted(lang_stats.collect(), key=lambda r: r["lang"])
    langs = [r["lang"] for r in stats]
    wide = weights.groupBy("gram").agg(
        *[
            F.max(F.when(F.col("lang") == l, F.col("weight"))).alias(
                f"__w{i}"
            )
            for i, l in enumerate(langs)
        ]
    )
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.coalesce(
                char_ngrams(F.col(text_col), n),
                F.array().cast("array<string>"),
            )
        ).alias("gram"),
    )
    totals = grams.groupBy("__id").agg(F.count(F.lit(1)).alias("g_total"))
    sums = (
        grams.join(F.broadcast(wide), "gram")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("c_invocab"),
            *[F.sum(f"__w{i}").alias(f"__s{i}") for i in range(len(langs))],
        )
    )
    base = df.select(F.col(id_col).alias("__id")).distinct()
    oov_count = F.coalesce(F.col("g_total"), F.lit(0)) - F.coalesce(
        F.col("c_invocab"), F.lit(0)
    )
    score_structs = [
        F.struct(
            (
                F.lit(float(r["prior"]))
                + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
                + oov_count * F.lit(float(r["oov_weight"]))
            ).alias("score"),
            F.lit(r["lang"]).alias("lang"),
        )
        for i, r in enumerate(stats)
    ]
    best = F.array_max(F.array(*score_structs))
    return (
        base.join(sums, "__id", "left")
        .join(totals, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            best["lang"].alias("lang"),
            best["score"].alias("score"),
        )
    )


def _nb_lang_id_arrow(
    df: DataFrame,
    weights: DataFrame,
    lang_stats: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
) -> DataFrame:
    """Arrow/numpy scoring kernel for :func:`nb_lang_id` — semantics
    identical to impl='expr' (same model, same OOV algebra, same
    tie-break), execution fully vectorized: per Arrow batch the padded
    texts concatenate into ONE utf-32 code array, n-gram keys pack into
    uint64 (21 bits/char, n <= 3), vocabulary lookup is a single
    searchsorted against the sorted packed vocab, and per-doc sums are
    np.add.reduceat segments — no 350M-row explode, no per-gram string
    allocation (the PLANS §32 trap), no per-row Python.  Float sums
    accumulate in a different order than the hash-aggregate, so scores
    agree to ~1e-9 (both paths are order-nondeterministic in the last
    ulp); the equality pytest uses that tolerance."""
    import numpy as np

    if n > 3:
        raise ValueError("arrow path packs 21 bits/char: n <= 3")
    stats = sorted(lang_stats.collect(), key=lambda r: r["lang"])
    langs = [r["lang"] for r in stats]
    priors = np.array([r["prior"] for r in stats])
    oovs = np.array([r["oov_weight"] for r in stats])

    wrows = weights.collect()  # vocab-bounded by construction
    def pack(g: str) -> int:
        k = 0
        for ch in g:
            k = (k << 21) | ord(ch)
        return k

    vocab_map: dict[int, int] = {}
    for r in wrows:
        key = pack(r["gram"])
        if key not in vocab_map:
            vocab_map[key] = len(vocab_map)
    V = len(vocab_map)
    W = np.zeros((max(V, 1), len(langs)), dtype=np.float64)
    lang_idx = {l: i for i, l in enumerate(langs)}
    for r in wrows:
        W[vocab_map[pack(r["gram"])], lang_idx[r["lang"]]] = r["weight"]
    vkeys = np.fromiter(vocab_map.keys(), dtype=np.uint64, count=V)
    order = np.argsort(vkeys)
    vkeys_sorted = vkeys[order]
    W_sorted = W[order] if V else W

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((vkeys_sorted, W_sorted, priors, oovs, langs, n))

    out_schema = f"{id_col} long, lang string, score double"

    def run(batches):
        vk, Wm, pri, oov, lg, nn = bc.value
        L = len(lg)
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            if len(ids) == 0:
                continue
            s = pdf[text_col].fillna("")
            # only NULL maps to no grams; "" still pads to "  " like expr
            isnull = pdf[text_col].isna().to_numpy()
            padded = np.where(isnull, "", (" " + s.str.lower() + " "))
            lens = np.fromiter((len(x) for x in padded), dtype=np.int64,
                               count=len(padded))
            total = "".join(padded)
            codes = np.frombuffer(
                total.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            G = np.maximum(lens - (nn - 1), 0)
            n_grams_total = max(len(codes) - (nn - 1), 0)
            if n_grams_total:
                keys = codes[: len(codes) - nn + 1].copy()
                for j in range(1, nn):
                    keys = (keys << np.uint64(21)) | codes[j : len(codes) - nn + 1 + j]
                # positions whose window crosses a doc boundary are void
                valid = np.ones(len(keys), dtype=bool)
                for b in starts[1:]:
                    valid[max(b - nn + 1, 0) : b] = False
                idx = np.searchsorted(vk, keys)
                idx_c = np.minimum(idx, max(len(vk) - 1, 0))
                hit = valid & (len(vk) > 0) & (vk[idx_c] == keys)
                # misses gather a dedicated all-zero row instead of a
                # where-masked copy: one (n_grams, L) gather, not two
                Wz = np.vstack([Wm, np.zeros((1, L))])
                eff = np.where(hit, idx_c, len(vk))
                contrib = Wz[eff]
                # reduceat ONLY over docs that have grams: clamping
                # trailing zero-gram docs' starts into range would steal
                # the final gram of the last real doc (and reduceat
                # returns the ELEMENT, not 0, for empty segments).  For
                # gram-bearing docs starts are strictly increasing and
                # in range; zero-length docs between them contribute no
                # codes, so segments stay exact.
                sums = np.zeros((len(ids), L))
                cnts = np.zeros(len(ids), dtype=np.int64)
                nz = np.flatnonzero(G > 0)
                if len(nz):
                    gs = starts[nz]
                    sums[nz] = np.add.reduceat(contrib, gs, axis=0)
                    cnts[nz] = np.add.reduceat(hit.astype(np.int64), gs)
            else:
                sums = np.zeros((len(ids), L))
                cnts = np.zeros(len(ids), dtype=np.int64)
            scores = pri[None, :] + sums + (G - cnts)[:, None] * oov[None, :]
            # argmax, ties -> lexicographically LAST lang (langs sorted
            # ascending: reversed argmax picks the last on exact ties)
            rev = scores[:, ::-1]
            j = rev.shape[1] - 1 - np.argmax(rev, axis=1)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "lang": [lg[x] for x in j],
                    "score": scores[np.arange(len(ids)), j],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# hashed TF-IDF vectorization (feature hashing, Weinberger et al. 2009;
# TF-IDF weighting per the standard smooth-idf form).  Bridges raw text
# into the embedding-space operators: hashed_tfidf -> similarity.{kmeans,
# semantic_dedup, fd_sketch, pq_encode} is an all-text semantic pipeline
# with no external embedding model.
# ---------------------------------------------------------------------------

_FEAT_SEP = "\x1f"


def feature_bucket(token: Column, dim: int, seed: int = 0) -> Column:
    """Engine-portable hashed-feature bucket in [0, dim): first 8 md5 hex
    digits (32 bits, exact in a long) of ``token || sep || seed``, mod
    dim — the same construction as curation.dsir_bucket (kept separate so
    vectorizer and DSIR hash streams stay independent and the two modules
    stay acyclic), bit-reproducible in any engine with md5."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(_FEAT_SEP, token, F.lit(str(seed)))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(int(dim)))


def hashed_tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    seed: int = 0,
    out_col: str = "tfidf",
    normalize: bool = True,
    attach: bool = True,
    impl: str = "arrow",
) -> DataFrame:
    """Adds ``out_col`` (array<double>, length ``dim``): feature-hashed
    TF-IDF document vectors, entirely in JVM expressions.

      bucket(t) = md5-hash(t) mod dim            (feature hashing)
      idf(b)    = ln((1 + N) / (1 + df(b))) + 1  (smooth idf)
      v[b]      = tf(doc, b) * idf(b), then optional L2 normalization.

    Plan shape (the 100 TB story):
      1. the (id, bucket) tf aggregate shuffles PARTIALLY-COMBINED
         (id, bucket, count) rows — bounded by dim per doc — never raw
         token strings; the follow-up per-doc assembly exchange carries
         the same bounded rows keyed by id alone.  (Collapsing the two
         into one exchange via repartition(id) before the tf agg would
         ship the RAW token stream instead — strictly worse; two
         dim-bounded exchanges beat one corpus-sized one.)
      2. document frequencies reduce to AT MOST ``dim`` rows, joined back
         as a broadcast; N comes from one 1-row aggregate crossJoined
         broadcast (the tiny-agg pattern used by mixture_sample);
      3. per-doc dense assembly: impl='arrow' (default) collects the
         <= dim (bucket, weight) pairs per doc and scatters ALL docs of
         each Arrow batch into one numpy (batch, dim) block — O(total
         nnz), the GroupedState shape; impl='expr' is the zero-Python
         codegen reference (map_from_entries + transform(sequence) fill)
         but element_at on MapType is a linear scan, O(dim * nnz) per
         doc — 10x slower at dim=256 (PLANS §46).  A pytest gates the
         two value-identical;
      4. ``attach=True`` (convenience) joins the vectors back to ``df``
         on ``id_col`` (docs with no tokens get the zero vector) — that
         join shuffles the INPUT table on id, fine at notebook scale.
         At corpus scale pass ``attach=False`` to get the bare
         (id_col, out_col) frame — join it on bucketed storage
         (io.bucketed_join) or carry it forward alone; zero-token docs
         are then simply absent.

    Output is deterministic and engine-portable (md5 buckets), so the
    whole vectorization replicates in a SQL oracle term for term."""
    if dim < 1:
        raise ValueError("hashed_tfidf: dim must be >= 1")
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.coalesce(words_col(F.col(text_col)), F.array())).alias(
            "__tok"
        ),
    )
    tf = (
        toks.select("__id", feature_bucket(F.col("__tok"), dim, seed).alias("__b"))
        .groupBy("__id", "__b")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    dfreq = (
        tf.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__b",
            (
                F.log((F.lit(1.0) + F.col("__n")) / (F.lit(1.0) + F.col("__df")))
                + F.lit(1.0)
            ).alias("__idf"),
        )
    )
    weighted = tf.join(F.broadcast(dfreq), "__b").select(
        "__id", "__b", (F.col("__tf") * F.col("__idf")).alias("__w")
    )
    if impl == "expr":
        # pure-codegen assembly: element_at on MapType is a LINEAR scan,
        # so this is O(dim * nnz) per doc — measured 10x slower than the
        # arrow scatter at dim=256 on the bench corpus (PLANS §46); kept
        # as the zero-Python reference path the value-identity pytest
        # gates the fast path against.
        dense = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("int")), F.lit(0.0)
            ),
        )
        vecs = (
            weighted.groupBy("__id")
            .agg(
                F.map_from_entries(
                    F.collect_list(
                        F.struct(F.col("__b").cast("int"), F.col("__w"))
                    )
                ).alias("__m")
            )
            .select("__id", dense.alias("__v"))
        )
    elif impl == "arrow":
        # vectorized scatter assembly: one np zeros[(batch, dim)] fill per
        # Arrow batch across ALL docs of the batch — O(total nnz), the
        # same grouped-scatter shape as sketches/generic.GroupedState.
        @F.pandas_udf("array<double>")
        def _scatter(bs: pd.Series, ws: pd.Series) -> pd.Series:
            if len(bs) == 0:
                return pd.Series([], dtype=object)
            lens = np.fromiter((len(x) for x in bs), dtype=np.int64, count=len(bs))
            rows = np.repeat(np.arange(len(bs)), lens)
            cols = (
                np.concatenate([np.asarray(x, dtype=np.int64) for x in bs])
                if lens.sum()
                else np.empty(0, dtype=np.int64)
            )
            vals = (
                np.concatenate([np.asarray(x, dtype=np.float64) for x in ws])
                if lens.sum()
                else np.empty(0, dtype=np.float64)
            )
            M = np.zeros((len(bs), dim))
            M[rows, cols] = vals
            return pd.Series(list(M))

        vecs = (
            weighted.groupBy("__id")
            .agg(
                F.collect_list(F.col("__b").cast("int")).alias("__bs"),
                F.collect_list(F.col("__w")).alias("__ws"),
            )
            .select("__id", _scatter(F.col("__bs"), F.col("__ws")).alias("__v"))
        )
    else:
        raise ValueError(f"hashed_tfidf: unknown impl {impl!r}")
    if normalize:
        # TWO projections, not one: referencing the norm FOLD directly
        # inside the division transform re-evaluates the whole
        # O(dim) aggregate once PER ELEMENT — O(dim^2) per doc, measured
        # 3x the cost of the entire rest of the operator at dim=256
        # (PLANS §46).  Materializing it as a column first makes it one
        # fold per row (CollapseProject keeps non-cheap aliases with
        # multiple uses in their own project).
        nrm = F.sqrt(
            F.aggregate(
                F.transform(F.col("__v"), lambda x: x * x),
                F.lit(0.0),
                lambda a, b: a + b,
            )
        )
        vecs = vecs.withColumn("__nrm", nrm).select(
            "__id",
            F.when(
                F.col("__nrm") > 0,
                F.transform(F.col("__v"), lambda x: x / F.col("__nrm")),
            )
            .otherwise(F.col("__v"))
            .alias("__v"),
        )
    if not attach:
        return vecs.select(F.col("__id").alias(id_col), F.col("__v").alias(out_col))
    zero_vec = F.array_repeat(F.lit(0.0), dim)
    return (
        df.join(vecs, df[id_col] == vecs["__id"], "left")
        .drop("__id")
        .withColumn(out_col, F.coalesce(F.col("__v"), zero_vec))
        .drop("__v")
    )
