"""Extended mergeable-sketch family (north_rule): count-min, Bloom, KLL
quantiles, t-digest, Misra-Gries heavy hitters, KMV set operations, and the
CPC coupon sketch (Lang'17) — each a core + the shared two-phase Spark plan
(hllspark.sketches.generic).
"""

from . import bloom, countmin, cpc, generic, kll, kmv, misragries, tdigest

__all__ = [
    "bloom",
    "countmin",
    "cpc",
    "generic",
    "kll",
    "kmv",
    "misragries",
    "tdigest",
]
