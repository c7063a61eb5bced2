"""Spark-side sketch aggregation — the engine's core query operators.

Plan shape (the treeAggregate analogue, SURVEY.md §3.4):

    scan (parquet, column-pruned: keys + value only)
      -> [JVM] xxhash64(value)            # whole-stage codegen, default mode
      -> mapInPandas(build_partials)      # per-PARTITION vectorized build:
                                          #   np.maximum.at scatter-max,
                                          #   one sketch row per (partition, key)
      -> groupBy(keys).agg(merge_sketches)  # the ONLY shuffle; rows are tiny
                                          #   (#partitions x #keys sketch rows)
      -> estimate (scalar pandas UDF)

Why not a pandas GROUPED_AGG UDF over raw rows: Spark does not run partial
aggregation for pandas aggregate UDFs, so raw rows would all shuffle.  The
explicit partial/final split keeps the shuffle proportional to the number of
partitions, not the number of input rows — at 100 TB the shuffle carries
sketches (KB), never data.

Hash modes:
    'xxhash64'  — production default: hashing stays in the JVM
                  (F.xxhash64, codegen'd); Python only sees int64 hashes.
    'farmhash'  — reference-parity mode (mkarppa/hyperlogloglog Hash.hpp):
                  farmhash::Fingerprint for integer columns,
                  farmhash::Hash64 for strings — vectorized numpy in the
                  partial builder; estimates byte-identical to the reference.
    'prehashed' — the column already contains 64-bit hashes (the 'jr'-style
                  pre-hashed benchmark path, measure.hpp:49-67).

Skew: a hot group key (e.g. lang='en') is bounded by design — each map
partition emits at most ONE row per key, so the final merge for a key sees
at most #partitions rows.  For extreme fan-in (>= ~10^5 partitions) pass
``salt_buckets`` to insert an intermediate salted merge level (a 3-level
tree), per BASELINE.json north_rule.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, DoubleType, LongType

from . import hll as _hll
from . import sketch as _sketch
from .hashing import farmhash64, fingerprint64, jr_from_hash

_HASH_COL = "__hllspark_hash"
_SKETCH_COL = "sketch"


def _hash_series_farmhash(s: pd.Series) -> np.ndarray:
    if pd.api.types.is_integer_dtype(s.dtype):
        return fingerprint64(s.to_numpy().astype(np.int64).view(np.uint64))
    return farmhash64(s.astype("string").fillna("").to_numpy(dtype=object))


def _grouped_scatter_codes(
    codes: np.ndarray, k: int, hashes: np.ndarray, p: int
) -> np.ndarray:
    """One scatter-max across all groups of a batch: registers[k, m]."""
    regs = np.zeros((k, 1 << p), dtype=np.uint8)
    j, r = jr_from_hash(hashes, p)
    np.maximum.at(regs, (codes, j), r)
    return regs


def _make_build_partials(keys: Sequence[str], p: int, algo: str, m_bits: int,
                         hash_mode: str, value_col: str):
    """Returns the mapInPandas function: Iterator[pdf] -> Iterator[pdf] with
    one (keys..., sketch) row per distinct key in the partition."""

    def build_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, np.ndarray] = {}
        key_rows: dict[tuple, pd.DataFrame] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if hash_mode == "farmhash":
                col = pdf[value_col]
                mask = col.notna().to_numpy()
                if not mask.all():
                    pdf = pdf.loc[mask]
                    col = pdf[value_col]
                if len(pdf) == 0:
                    continue
                hashes = _hash_series_farmhash(col)
            else:  # xxhash64 / prehashed: already an int64 hash column
                hashes = pdf[_HASH_COL].to_numpy().astype(np.int64).view(np.uint64)
            if keys:
                codes = pdf.groupby(list(keys), dropna=False, sort=False).ngroup().to_numpy()
                uniq_codes, first_idx = np.unique(codes, return_index=True)
                regs = _grouped_scatter_codes(codes, len(uniq_codes), hashes, p)
                key_df = pdf[list(keys)].iloc[first_idx]
                for row_i, code in enumerate(uniq_codes):
                    kt = tuple(key_df.iloc[row_i])
                    if kt in acc:
                        np.maximum(acc[kt], regs[row_i], out=acc[kt])
                    else:
                        acc[kt] = regs[row_i]
                        key_rows[kt] = key_df.iloc[row_i : row_i + 1]
            else:
                regs = _grouped_scatter_codes(
                    np.zeros(len(hashes), dtype=np.int64), 1, hashes, p
                )
                if () in acc:
                    np.maximum(acc[()], regs[0], out=acc[()])
                else:
                    acc[()] = regs[0]
        if not acc:
            return
        sketches = [_sketch.encode(regs, algo, m_bits) for regs in acc.values()]
        if keys:
            out = pd.concat([key_rows[kt] for kt in acc], ignore_index=True)
            out[_SKETCH_COL] = sketches
        else:
            out = pd.DataFrame({_SKETCH_COL: sketches})
        yield out

    return build_partials


def _merge_buffers(series: pd.Series, algo: str, m_bits: int) -> bytes:
    stack = np.stack([_sketch.decode(b) for b in series if b is not None])
    return _sketch.encode(np.maximum.reduce(stack), algo, m_bits)


def merge_udaf(algo: str = "hll", m_bits: int = 3):
    """A pandas GROUPED_AGG UDF merging serialized sketches (register-wise
    max, reference HyperLogLog.hpp:124-131 / HyperLogLogLog.hpp:192-283).
    Usable directly in df.groupBy(...).agg(...)."""

    def _merge(s: pd.Series) -> bytes:
        return _merge_buffers(s, algo, m_bits)

    # (pd.Series) -> scalar type hints make Spark infer a GROUPED_AGG UDF
    return F.pandas_udf(_merge, BinaryType())


@F.pandas_udf(DoubleType())
def estimate_udf(s: pd.Series) -> pd.Series:
    """Scalar pandas UDF: serialized sketch -> distinct-count estimate."""
    if len(s) == 0:
        return pd.Series([], dtype="float64")
    regs = np.stack([_sketch.decode(b) for b in s])
    return pd.Series(_hll.estimate(regs))


@F.pandas_udf(LongType())
def bit_size_udf(s: pd.Series) -> pd.Series:
    """Scalar pandas UDF: serialized sketch -> reference bit-size metric."""
    return pd.Series([_sketch.bit_size(b) for b in s], dtype="int64")


def sketch_by(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] | None = None,
    p: int = 14,
    algo: str = "hll",
    m_bits: int = 3,
    hash_mode: str = "xxhash64",
    salt_buckets: int = 0,
) -> DataFrame:
    """Build one sketch of distinct `value_col` per group of `keys`.

    Returns DataFrame[keys..., sketch binary].  See module docstring for the
    physical plan.  Nulls in value_col are ignored (COUNT DISTINCT
    semantics).
    """
    keys = list(keys or [])
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    if algo not in ("hll", "hlll", "hllzstd"):
        raise ValueError(f"unknown sketch algo {algo!r}")
    spark = df.sparkSession
    if hash_mode == "xxhash64":
        projected = df.where(F.col(value_col).isNotNull()).select(
            *keys, F.xxhash64(F.col(value_col)).alias(_HASH_COL)
        )
    elif hash_mode == "prehashed":
        projected = df.where(F.col(value_col).isNotNull()).select(
            *keys, F.col(value_col).cast("long").alias(_HASH_COL)
        )
    elif hash_mode == "farmhash":
        projected = df.select(*keys, value_col)
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")

    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keys
    )
    out_schema = (key_schema + ", " if key_schema else "") + f"{_SKETCH_COL} binary"
    partials = projected.mapInPandas(
        _make_build_partials(keys, p, algo, m_bits, hash_mode, value_col),
        schema=out_schema,
    )
    merge = merge_udaf(algo, m_bits)
    if not keys:
        # seed with an empty sketch so the global aggregate returns exactly
        # one row (estimate 0.0) even on empty/all-null input, matching
        # COUNT(DISTINCT) semantics
        seed = spark.createDataFrame(
            [(bytearray(_sketch.encode(_hll.empty(p), algo, m_bits)),)],
            f"{_SKETCH_COL} binary",
        )
        return partials.unionByName(seed).agg(
            merge(F.col(_SKETCH_COL)).alias(_SKETCH_COL)
        )
    if salt_buckets and salt_buckets > 1:
        # 3-level tree: partial -> salted merge -> final merge (north_rule
        # skew handling: bounds fan-in per reducer to #partitions/buckets)
        salted = partials.withColumn(
            "__salt", F.spark_partition_id() % F.lit(salt_buckets)
        )
        mid = salted.groupBy(*keys, "__salt").agg(
            merge(F.col(_SKETCH_COL)).alias(_SKETCH_COL)
        )
        return mid.groupBy(*keys).agg(merge(F.col(_SKETCH_COL)).alias(_SKETCH_COL))
    return partials.groupBy(*keys).agg(merge(F.col(_SKETCH_COL)).alias(_SKETCH_COL))


def merge_sketches(
    df: DataFrame,
    keys: Sequence[str] | None = None,
    sketch_col: str = _SKETCH_COL,
    algo: str = "hll",
    m_bits: int = 3,
) -> DataFrame:
    """Re-aggregate existing sketch rows to coarser grouping keys (sketch
    GROUP BY re-aggregation, e.g. per-day sketches -> per-month)."""
    keys = list(keys or [])
    merge = merge_udaf(algo, m_bits)
    if not keys:
        return df.agg(merge(F.col(sketch_col)).alias(sketch_col))
    return df.groupBy(*keys).agg(merge(F.col(sketch_col)).alias(sketch_col))


def approx_distinct(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] | None = None,
    p: int = 14,
    algo: str = "hll",
    hash_mode: str = "xxhash64",
    estimate_col: str = "distinct_estimate",
    **kw,
) -> DataFrame:
    """Convenience: build + estimate. DataFrame[keys..., estimate double]."""
    keys = list(keys or [])
    sk = sketch_by(df, value_col, keys, p=p, algo=algo, hash_mode=hash_mode, **kw)
    return sk.select(
        *keys, estimate_udf(F.col(_SKETCH_COL)).alias(estimate_col)
    )


def with_estimate(df: DataFrame, sketch_col: str = _SKETCH_COL,
                  estimate_col: str = "distinct_estimate") -> DataFrame:
    return df.withColumn(estimate_col, estimate_udf(F.col(sketch_col)))
