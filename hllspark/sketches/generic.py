"""Shared two-phase Spark plan for any mergeable sketch.

A sketch kind plugs in three callables and gets the full distributed
aggregation for free — the same treeAggregate shape proven out for HLL in
hllspark.agg (partial per-partition build via mapInPandas, then a
grouped-agg merge of serialized states; the shuffle carries one sketch row
per (partition, key), never raw rows):

    SketchKind(
        zero        = lambda: state,
        update      = lambda state, values(np/pd) -> state,
        merge       = lambda s1, s2 -> state,
        encode      = lambda state -> bytes,
        decode      = lambda bytes -> state,
    )

Cardinality boundary: the generic per-batch fold loops Python once per
DISTINCT KEY PER BATCH (never per row — each kind's update is vectorized
over the group's values).  Kinds whose state is a FIXED-SHAPE numpy array
(CPC coupon rows, count-min tables, Bloom bit arrays) provide a
``GroupedState`` adapter (round 3): all groups of a partition live in one
(G, ...) state block and every Arrow batch applies ONE ``np.*.at``
grouped scatter across all its groups — per-key Python work drops to a
dict lookup per distinct key per batch, the same shape as the HLL pandas
build (A/B in PLANS.md §12).  Variable-size kinds (KLL, t-digest, KMV,
Misra-Gries) take the SORTED-SEGMENT fold (round 4): one stable argsort
of the batch's group codes, then each group's values as a contiguous
numpy slice — 17.7x over the old per-key batch masks at 100k keys with
byte-identical states (PLANS.md §23).  The HLL family's dedicated
jvm/sql paths never touch Python at all.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType


@dataclass(frozen=True)
class GroupedState:
    """Vectorized multi-group state block for fixed-shape array kinds.

    zero_block(G) allocates the (G, ...) state block; update(block, codes,
    values) scatters one Arrow batch into it (codes[i] = block row of
    values[i]); to_state(block[g]) converts one row back to the kind's
    single-sketch state for encode().  update must be order-insensitive
    per group (max / or / add scatters are), so results are byte-identical
    to the per-group fold."""

    zero_block: Callable[[int], np.ndarray]
    update: Callable[[np.ndarray, np.ndarray, np.ndarray], None]
    to_state: Callable[[np.ndarray], object]


@dataclass(frozen=True)
class SketchKind:
    name: str
    zero: Callable[[], object]
    update: Callable[[object, pd.Series], object]
    merge: Callable[[object, object], object]
    encode: Callable[[object], bytes]
    decode: Callable[[bytes], object]
    grouped: GroupedState | None = None


def sketch_agg(
    df: DataFrame,
    value_col: str,
    kind: SketchKind,
    keys: Sequence[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """DataFrame[keys..., sketch binary] — one merged sketch per group."""
    keys = list(keys or [])
    projected = df.where(F.col(value_col).isNotNull()).select(*keys, value_col)
    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keys
    )
    out_schema = (key_schema + ", " if key_schema else "") + f"{sketch_col} binary"

    def build_partials_grouped(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        """Fixed-shape-state path: one (G, ...) block per partition, ONE
        grouped scatter per Arrow batch — Python cost per distinct key per
        batch is a dict lookup, not a kind.update call."""
        g = kind.grouped
        key_index: dict[tuple, int] = {}
        key_frames: list[pd.DataFrame] = []
        block = g.zero_block(0)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = pdf.groupby(keys, dropna=False, sort=False).ngroup().to_numpy()
            uniq, first_idx = np.unique(codes, return_index=True)
            key_df = pdf[keys].iloc[first_idx]
            gids = np.empty(len(uniq), dtype=np.int64)
            for row_i, kt in enumerate(key_df.itertuples(index=False, name=None)):
                gid = key_index.get(kt)
                if gid is None:
                    gid = len(key_index)
                    key_index[kt] = gid
                    key_frames.append(key_df.iloc[row_i : row_i + 1])
                gids[row_i] = gid
            if len(key_index) > block.shape[0]:
                grown = g.zero_block(max(2 * block.shape[0], len(key_index), 64))
                grown[: block.shape[0]] = block
                block = grown
            g.update(block, gids[codes], pdf[value_col].to_numpy())
        if not key_index:
            return
        out = pd.concat(key_frames, ignore_index=True)
        out[sketch_col] = [
            kind.encode(g.to_state(block[i])) for i in range(len(key_index))
        ]
        yield out

    def build_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Variable-size-state path (KLL / t-digest / KMV / Misra-Gries):
        per batch, stable-argsort the group codes ONCE and feed each
        group's values as a contiguous numpy slice — segment boundaries
        from one vectorized neighbor-compare.  The old formulation masked
        the whole batch per distinct key (``codes == code``), i.e.
        O(G x B) comparisons per batch, which dominated at high key
        cardinality (A/B at 100k keys in PLANS.md §23).  The stable sort
        preserves within-group encounter order, so order-sensitive
        updates (KLL compaction) stay byte-identical to the masked fold,
        and segments ascend by code exactly like np.unique did."""
        acc: dict[tuple, object] = {}
        key_rows: dict[tuple, pd.DataFrame] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if keys:
                codes = pdf.groupby(keys, dropna=False, sort=False).ngroup().to_numpy()
                order = np.argsort(codes, kind="stable")
                sc = codes[order]
                sv = pdf[value_col].to_numpy()[order]
                seg = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
                ends = np.r_[seg[1:], len(sc)]
                key_df = pdf[keys].iloc[order[seg]]
                for i, kt in enumerate(
                    key_df.itertuples(index=False, name=None)
                ):
                    st = acc.get(kt)
                    if st is None:
                        st = kind.zero()
                        key_rows[kt] = key_df.iloc[i : i + 1]
                    acc[kt] = kind.update(st, sv[seg[i] : ends[i]])
            else:
                if () not in acc:
                    acc[()] = kind.zero()
                acc[()] = kind.update(acc[()], pdf[value_col])
        if not acc:
            return
        blobs = [kind.encode(s) for s in acc.values()]
        if keys:
            out = pd.concat([key_rows[kt] for kt in acc], ignore_index=True)
            out[sketch_col] = blobs
        else:
            out = pd.DataFrame({sketch_col: blobs})
        yield out

    builder = (
        build_partials_grouped if kind.grouped is not None and keys
        else build_partials
    )
    partials = projected.mapInPandas(builder, schema=out_schema)

    def _merge(s: pd.Series) -> bytes:
        states = [kind.decode(b) for b in s if b is not None]
        out = states[0]
        for st in states[1:]:
            out = kind.merge(out, st)
        return kind.encode(out)

    merge_udf = F.pandas_udf(_merge, BinaryType())
    if not keys:
        spark = df.sparkSession
        seed = spark.createDataFrame(
            [(bytearray(kind.encode(kind.zero())),)], f"{sketch_col} binary"
        )
        return partials.unionByName(seed).agg(
            merge_udf(F.col(sketch_col)).alias(sketch_col)
        )
    return partials.groupBy(*keys).agg(merge_udf(F.col(sketch_col)).alias(sketch_col))


def query_udf(fn: Callable[[bytes], object], return_type: str):
    """Wrap a per-sketch query (bytes -> scalar) as a scalar pandas UDF."""

    def _q(s: pd.Series) -> pd.Series:
        return pd.Series([fn(bytes(b)) for b in s])

    return F.pandas_udf(_q, return_type)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: Sequence[float],
    keys: Sequence[str] | None = None,
    k: int = 200,
) -> DataFrame:
    """Grouped approximate quantiles via the KLL sketch (our own mergeable
    summary, same two-phase plan): DataFrame[keys..., prob double,
    quantile double].  Rank error ~ O(1/k); cross-checked against Spark's
    approx_percentile and DuckDB's exact quantiles in tests/queries."""
    from . import kll

    keys = list(keys or [])
    probs = [float(p) for p in probabilities]
    sketches = sketch_agg(df, value_col, kll.kind(k), keys=keys)

    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keys
    )
    out_schema = (key_schema + ", " if key_schema else "") + "prob double, quantile double"

    def expand(pdf: pd.DataFrame) -> pd.DataFrame:
        s = kll.decode(bytes(pdf["sketch"].iloc[0]))
        vals = s.quantile(probs)
        out = pd.DataFrame({"prob": probs, "quantile": np.asarray(vals, dtype=float)})
        passthrough = keys if keys else ["__g"]
        for kcol in passthrough:
            out[kcol] = pdf[kcol].iloc[0]
        return out[passthrough + ["prob", "quantile"]]

    if keys:
        return sketches.groupBy(*keys).applyInPandas(expand, schema=out_schema)
    return (
        sketches.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(expand, schema="__g int, " + out_schema)
        .select("prob", "quantile")
    )
