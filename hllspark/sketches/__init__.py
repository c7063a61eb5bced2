"""Extended mergeable-sketch family (north_rule): count-min, Bloom, KLL
quantiles, t-digest — each a numpy core + the shared two-phase Spark plan
(hllspark.sketches.generic).
"""

from . import bloom, countmin, generic, kll, tdigest

__all__ = ["bloom", "countmin", "generic", "kll", "tdigest"]
