"""Extended mergeable-sketch family (north_rule): count-min, Bloom, KLL
quantiles, t-digest, Misra-Gries heavy hitters — each a core + the shared two-phase Spark plan
(hllspark.sketches.generic).
"""

from . import bloom, countmin, generic, kll, kmv, misragries, tdigest

__all__ = ["bloom", "countmin", "generic", "kll", "kmv", "misragries", "tdigest"]
