"""Web-corpus curation operators: repetition-based quality filters,
corpus-level line deduplication, PII redaction, and URL analytics.

These are the standard pre-training curation passes (Gopher table A1
repetition rules, RefinedWeb/CCNet line dedup, C4-style PII scrubbing)
re-expressed as Spark plans:

* Per-document statistics (``repetition_features``, ``pii_features``,
  ``url_features``) are pure JVM expressions — higher-order array
  functions and regexes evaluated row-at-a-time inside the scan stage,
  ZERO shuffles and zero Python.  At 100 TB this is the only shape that
  works: the filter decision for a document never needs to leave the
  map task that read it.
* The one genuinely corpus-global operator (``dedup_lines``: drop lines
  that occur across more than ``max_docs`` documents) shuffles at the
  line grain exactly twice — once to count, once to rebuild — and the
  removal join is a left-anti against only the *over-threshold* lines
  (the heavy hitters, a tiny broadcast-eligible set), never against the
  full line inventory.

All regex patterns are restricted to the Java-regex ∩ RE2 common subset
so the DuckDB contract oracles run the byte-identical pattern.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .decontam import ngram_col

# ---------------------------------------------------------------------------
# segmentation helpers
# ---------------------------------------------------------------------------


def segments(text: Column, line_sep: str = "\n") -> Column:
    """Non-blank trimmed segments of ``text`` split on the regex
    ``line_sep`` (default: newline — real web pages; the word-soup test
    fixture passes a word delimiter instead)."""
    return F.filter(
        F.transform(F.split(text, line_sep), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def _safe_div(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
        F.lit(0.0)
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition features (shuffle-free)
# ---------------------------------------------------------------------------


def duplicate_segment_fraction(lines: Column) -> Column:
    """Fraction of segment *instances* that are repeats of an earlier
    identical segment: 1 - |distinct| / |all|."""
    n = F.size(lines)
    return _safe_div(n - F.size(F.array_distinct(lines)), n)


def duplicate_segment_char_fraction(lines: Column) -> Column:
    """Fraction of segment characters inside segments that occur more
    than once (ALL occurrences count, per the Gopher rule).  One fold
    over the sorted segment array — adjacent equality marks a duplicate
    run; the first element of a run is back-credited when its twin
    appears."""
    s = F.array_sort(lines)
    total = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(False).alias("counted"),
        F.lit(0).cast("long").alias("tot"),
    )

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        add = F.when(
            same,
            F.length(x).cast("long")
            + F.when(acc["counted"], F.lit(0)).otherwise(F.length(acc["prev"])),
        ).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            same.alias("counted"),
            (acc["tot"] + add).cast("long").alias("tot"),
        )

    dup_chars = F.aggregate(s, init, merge, lambda acc: acc["tot"])
    return _safe_div(dup_chars, total)


def top_ngram_char_fraction(text: Column, n: int) -> Column:
    """Characters covered by the most frequent word ``n``-gram divided by
    the document's character count (Gopher "fraction of characters in
    the most common n-gram"; overlapping occurrences all count, so the
    value may exceed 1 on degenerate text).  Ties break to the
    lexicographically smallest gram — the sorted-array fold keeps the
    first gram of equal-length runs, which is exactly that gram."""
    grams = F.array_sort(ngram_col(text, n))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best_run"),
        F.lit(0).cast("int").alias("best_len"),
    )

    def merge(acc, x):
        run = F.when(
            acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
        ).otherwise(F.lit(1))
        better = run > acc["best_run"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best_run"]).alias("best_run"),
            F.when(better, F.length(x).cast("int"))
            .otherwise(acc["best_len"])
            .alias("best_len"),
        )

    covered = F.aggregate(
        grams, init, merge, lambda acc: (acc["best_run"] * acc["best_len"]).cast("long")
    )
    return _safe_div(covered, F.length(text))


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    line_sep: str = "\n",
    ngram_ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Adds the Gopher repetition statistics, all computed inside the
    scan stage (no shuffle, no Python):

    - ``dup_line_frac`` / ``dup_line_char_frac`` — duplicate segments
      (split on ``line_sep``) by instance count and by character mass,
    - ``dup_word_frac`` — fraction of word instances that are repeats,
    - ``top{n}gram_char_frac`` for each n in ``ngram_ns``,
    - ``bullet_line_frac`` / ``ellipsis_line_frac`` — segments starting
      with a bullet glyph / ending with an ellipsis,
    - ``symbol_word_ratio`` — '#'/'...' occurrences per word.
    """
    t = F.col(text_col)
    lines = segments(t, line_sep)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda x: x.rlike(r"^(\-|\*|•)"))
    )
    ellipsis = F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)$")))
    hashes = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    dots = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), F.lit(0)))
    out = (
        df.withColumn("dup_line_frac", duplicate_segment_fraction(lines))
        .withColumn("dup_line_char_frac", duplicate_segment_char_fraction(lines))
        .withColumn(
            "dup_word_frac",
            _safe_div(n_words - F.size(F.array_distinct(words)), n_words),
        )
        .withColumn("bullet_line_frac", _safe_div(bullet, n_lines))
        .withColumn("ellipsis_line_frac", _safe_div(ellipsis, n_lines))
        .withColumn("symbol_word_ratio", _safe_div(hashes + dots, n_words))
    )
    for n in ngram_ns:
        out = out.withColumn(
            f"top{n}gram_char_frac", top_ngram_char_fraction(t, n)
        )
    return out


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    line_sep: str = "\n",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2gram_char_frac: float = 0.20,
    max_top3gram_char_frac: float = 0.18,
) -> DataFrame:
    """Gopher-rule document filter: keeps rows passing every threshold,
    original schema preserved.  One scan, no shuffle — each predicate is
    a JVM expression over this row only."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    mean_wl = _safe_div(
        F.aggregate(words, F.lit(0).cast("long"), lambda a, x: a + F.length(x)),
        n_words,
    )
    feat = repetition_features(df, text_col, line_sep, ngram_ns=(2, 3))
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("top2gram_char_frac") <= max_top2gram_char_frac)
        & (F.col("top3gram_char_frac") <= max_top3gram_char_frac)
    )
    return feat.where(keep).select(*df.columns)


# ---------------------------------------------------------------------------
# corpus-level line dedup (RefinedWeb / CCNet style)
# ---------------------------------------------------------------------------


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    join_sep: str = "\n",
    max_docs: int = 1,
) -> DataFrame:
    """Removes every occurrence of any segment that appears in MORE than
    ``max_docs`` distinct documents (boilerplate: nav bars, cookie
    banners, license footers), preserving segment order within each doc.

    Returns (id_col, text, n_lines, n_lines_dropped) — ``text`` is the
    rebuilt document (empty string when everything was boilerplate).

    Plan: posexplode segments (line grain) -> count distinct docs per
    line hash (map-side partial agg) -> the over-threshold hashes only
    (heavy hitters — a small set, AQE will broadcast it) -> left-anti
    join -> rebuild per doc from (pos, line) pairs.  Shuffles: the count
    agg and the rebuild agg, both keyed to avoid skew (hash / doc id);
    the full line inventory is never joined against itself.
    """
    raw = F.split(F.col(text_col), line_sep)
    ex = (
        df.select(F.col(id_col).alias("__id"), F.posexplode(raw))
        .withColumn("col", F.trim("col"))
        .where(F.col("col") != "")
        .select("__id", "pos", F.col("col").alias("line"), F.xxhash64("col").alias("h"))
    )
    bad = (
        ex.groupBy("h")
        .agg(F.countDistinct("__id").alias("nd"))
        .where(F.col("nd") > max_docs)
        .select("h")
    )
    kept = ex.join(bad, "h", "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            join_sep,
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = ex.groupBy("__id").agg(F.count(F.lit(1)).alias("n_lines"))
    base = df.select(F.col(id_col).alias("__id")).distinct()
    return (
        base.join(totals, "__id", "left")
        .join(rebuilt, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
            (
                F.coalesce(F.col("n_lines"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_lines_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (Java-regex ∩ RE2 patterns)
# ---------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[- ]\d{3}[- ]\d{4}\b"

_PII_PATTERNS = [("email", EMAIL_RE), ("phone", PHONE_RE), ("ipv4", IPV4_RE)]


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII kind ({'email','phone','ipv4'} -> int col)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")
        for kind, pat in _PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """All PII matches replaced with ``<KIND>`` tokens.  Email runs first
    (its local part may contain digits that would otherwise be clipped by
    the phone/ip passes); the three patterns are mutually exclusive after
    that."""
    out = text
    for kind, pat in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_emails / n_phones / n_ipv4 / pii_total and ``redacted``
    (the scrubbed text).  Row-local regex work inside the scan stage."""
    t = F.col(text_col)
    c = pii_counts(t)
    return (
        df.withColumn("n_emails", c["email"])
        .withColumn("n_phones", c["phone"])
        .withColumn("n_ipv4", c["ipv4"])
        .withColumn("pii_total", c["email"] + c["phone"] + c["ipv4"])
        .withColumn("redacted", redact_pii(t))
    )


# ---------------------------------------------------------------------------
# URL analytics
# ---------------------------------------------------------------------------

# public suffixes where the registrable domain is one label deeper
# (heuristic subset of the PSL — co.uk, com.au, ac.jp, ...)
_SECOND_LEVEL = ["co", "com", "net", "org", "gov", "edu", "ac"]

_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def url_host(url: Column) -> Column:
    """Lower-cased host: authority minus userinfo and port."""
    auth = F.regexp_extract(url, _AUTHORITY_RE, 1)
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.lower(F.element_at(F.split(no_user, ":"), 1))


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def url_path_depth(url: Column) -> Column:
    return F.size(F.filter(F.split(url_path(url), "/"), lambda x: x != "")).cast(
        "long"
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain: last two labels, or last three when the
    second-to-last label is a common second-level suffix (co.uk etc.).
    Hosts with fewer than two labels pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    take3 = (n >= 3) & F.element_at(labels, -2).isin(_SECOND_LEVEL)
    tail = F.when(take3, F.slice(labels, -3, 3)).otherwise(F.slice(labels, -2, 2))
    return F.when(n >= 2, F.array_join(tail, ".")).otherwise(host)


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds host / registered_domain / path_depth — row-local JVM
    expressions; feed the result straight into sketch_by('url', keys=
    ['registered_domain']) for per-site distinct-page estimates, or salt
    on host for skewed crawls (the north-star layout)."""
    u = F.col(url_col)
    h = url_host(u)
    return (
        df.withColumn("host", h)
        .withColumn("registered_domain", registered_domain(h))
        .withColumn("path_depth", url_path_depth(u))
    )
