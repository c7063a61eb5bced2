"""hllspark — a PySpark-native sketch / approximate-aggregation engine.

From-scratch reimplementation of the capabilities of mkarppa/hyperlogloglog
(HyperLogLog, HyperLogLogLog, zstd-compressed HLL cardinality sketches) as
mergeable Spark aggregates, plus the wider sketch family (count-min, Bloom,
KLL, t-digest) and web-scale training-data operators (dedup, similarity,
text analysis) the north_rule calls for.

Layering:
    hashing   — vectorized reference-parity hash chain (farmhash/fibonacci)
    hll       — numpy register cores (build/merge/estimate)
    hlll      — HyperLogLogLog compression (offsets + exceptions + base)
    sketch    — deterministic binary serialization of all sketch formats
    agg       — Spark operators: sketch_by / merge_sketches / approx_distinct
"""

from . import agg, hashing, hll, hlll, sketch

__all__ = ["agg", "hashing", "hll", "hlll", "sketch"]
__version__ = "0.1.0"
