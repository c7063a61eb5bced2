"""Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
2016, arXiv:1508.07909) — the "train a tokenizer on the corpus" stage of
an LLM data pipeline, done the way production tokenizer trainers
actually do it: the CORPUS-sized work is one word-count aggregate; the
merge loop runs over the (word, count) TYPE table, whose size is the
vocabulary, not the corpus.

Scale design (100 TB story):
- ``word_counts`` is a single map-side-combined groupBy over the token
  stream — the only corpus-sized job.  ``max_word_types`` caps the type
  table deterministically (top-K by count desc, word asc, via
  TakeOrdered — no global sort); for Zipf-shaped web text the dropped
  tail is a vanishing mass of the TOKEN stream even when it is most of
  the TYPE inventory, and the cap is what bounds driver memory.
- ``symbol_pair_counts`` exposes the first-iteration pair statistics as
  a distributed DataFrame op (explode to adjacent symbol pairs, weighted
  count) — this is the oracle-gated contract surface, and doubles as a
  corpus-analysis query.
- ``train_bpe`` collects the capped type table once and runs the classic
  greedy merge loop driver-side — O(types) per merge, independent of
  corpus size.  Ties break (count desc, pair lexicographic asc) so the
  learned merge table is deterministic and partition-invariant.
- ``bpe_encode`` applies the learned merges with an Arrow-batched pandas
  UDF and a per-worker word->tokens memo: web text re-uses words, so
  amortized encode cost per token approaches a dict lookup.  The merge
  table ships in the UDF closure (bounded by num_merges, broadcast-sized
  by construction).

The end-of-word marker is a separate ``</w>`` symbol (the Sennrich
formulation): `` "low" -> l o w </w> ``, so merges can distinguish
word-final contexts and decode is ``concat(tokens).rstrip("</w>")``.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .text import words_col

EOW = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, count) over the corpus — ONE map-side-combined aggregate
    of the engine-standard tokenizer stream."""
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(F.explode(words_col(t)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _word_symbols(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Applies ``merges`` IN ORDER to one word — the canonical greedy
    BPE segmentation (training and encoding share this)."""
    syms = list(word) + [EOW]
    if not merges:
        return syms
    ranks = {pair: i for i, pair in enumerate(merges)}
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        merged, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and (syms[i], syms[i + 1]) == best_pair
            ):
                merged.append(syms[i] + syms[i + 1])
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def symbol_pair_counts(
    wc: DataFrame, merges: list[tuple[str, str]] | None = None
) -> DataFrame:
    """(s1, s2, count) — adjacent-symbol pair frequencies over the
    corpus token stream implied by a (word, count) table, at the
    char+EOW grain (or after ``merges`` when given).  Distributed:
    chars explode per word TYPE, counts weight by word frequency; the
    shuffle is keyed by the pair, never the corpus."""
    if merges:
        # segmentation under prior merges is a per-type pure function
        mlist = list(merges)

        def seg(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "word": pdf["word"],
                        "count": pdf["count"],
                        "syms": [
                            _word_symbols(w, mlist) for w in pdf["word"]
                        ],
                    }
                )

        base = wc.mapInPandas(
            seg, "word string, count bigint, syms array<string>"
        )
        syms = F.col("syms")
    else:
        base = wc
        syms = F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        )
    pairs = F.zip_with(
        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("s1"), b.alias("s2")),
    )
    return (
        base.select(F.col("count").alias("__c"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
        .agg(F.sum("__c").alias("count"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    max_word_types: int = 100_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learns ``num_merges`` BPE merge rules from the corpus.  Returns
    the ordered merge list [(s1, s2), ...].  Deterministic: most
    frequent pair wins, ties break lexicographically; the type-table
    cap is top-K (count desc, word asc)."""
    wc = word_counts(df, text_col, lowercase)
    types = wc.rdd.takeOrdered(
        max_word_types, key=lambda r: (-r["count"], r["word"])
    )
    vocab: list[tuple[list[str], int]] = [
        (list(r["word"]) + [EOW], int(r["count"])) for r in types
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt = []
        for syms, c in vocab:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    merged.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            nxt.append((merged, c))
        vocab = nxt
    return merges


def bpe_vocab(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    lowercase: bool = True,
    unk_token: str = "<unk>",
) -> dict[str, int]:
    """Deterministic token -> id table for a trained merge list:
    ``<unk>`` is id 0, then every base character seen in the corpus
    (sorted; a BOUNDED distinct — the charset, not the vocabulary),
    then ``</w>``, then each merge output in merge order (first
    occurrence wins when two merge paths produce the same string)."""
    chars = [
        r["c"]
        for r in word_counts(df, text_col, lowercase)
        .select(F.explode(F.split("word", "")).alias("c"))
        .distinct()
        .orderBy("c")
        .collect()
    ]
    vocab: dict[str, int] = {unk_token: 0}
    for s in chars + [EOW] + [a + b for a, b in merges]:
        if s not in vocab:
            vocab[s] = len(vocab)
    return vocab


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
    vocab: dict[str, int] | None = None,
    ids_col: str = "bpe_ids",
) -> DataFrame:
    """df + ``out_col`` array<string>: the BPE segmentation of every
    word, concatenated in document order.  Arrow-batched; a per-worker
    word->tokens memo makes repeated words (all of web text) a dict
    hit.  Decode invariant: ``concat(tokens)`` with ``</w>`` replaced
    by spaces reconstructs the tokenized text exactly.

    With ``vocab`` (see :func:`bpe_vocab`) an ``ids_col``
    array<int> is added too — out-of-vocabulary symbols map to the
    ``<unk>`` id 0 (only possible for characters unseen at vocab-build
    time; trained merges are in the vocab by construction)."""
    import re

    mlist = [tuple(m) for m in merges]
    memo: dict[str, list[str]] = {}
    # open-vocabulary web text (urls, hex ids, numbers) would grow the
    # memo without bound for the worker's lifetime; flush-at-cap keeps
    # it ~100 MB worst case while Zipfian reuse restores the hit rate
    # within a batch or two after a flush
    memo_cap = 1 << 20
    # EXACTLY words_col's Java \s class — Python str.split()/re \s are
    # Unicode-aware and would segment NBSP-joined words the training
    # word counts treated as one type (train/encode tokenizer skew)
    ws = re.compile("[ \t\n\x0b\f\r]+")

    cols = df.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{schema}, {out_col} array<string>"
    if vocab is not None:
        out_schema += f", {ids_col} array<int>"

    def run(batches):
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                if text is None:
                    toks.append([])
                    continue
                t = text.lower() if lowercase else text
                out: list[str] = []
                for w in ws.split(t):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = _word_symbols(w, mlist)
                        if len(memo) >= memo_cap:
                            memo.clear()
                        memo[w] = got
                    out.extend(got)
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            if vocab is not None:
                pdf[ids_col] = [
                    [vocab.get(s, 0) for s in ts] for ts in toks
                ]
            yield pdf

    keep = [*cols, out_col] + ([ids_col] if vocab is not None else [])
    return df.mapInPandas(run, out_schema).select(*keep)


def bpe_decode_tokens(tokens: list[str]) -> str:
    """Inverse of the encode segmentation for one document's tokens."""
    return "".join(tokens).replace(EOW, " ").strip()
