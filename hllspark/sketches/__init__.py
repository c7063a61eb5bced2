"""Extended mergeable-sketch family (north_rule): count-min, count-sketch
(+ AMS F2 / unbiased join-size), Bloom, KLL quantiles, t-digest,
Misra-Gries heavy hitters, KMV set operations, the CPC coupon sketch
(Lang'17), Frequent Directions (Liberty'13 — the matrix/covariance
member, one-pass PCA over embedding columns), and priority sampling
(Duffield-Lund-Thorup'07 — the mergeable weighted sample with unbiased
subset-sum estimation) — each a core + the shared two-phase Spark plan
(hllspark.sketches.generic).
"""

from . import (
    bloom,
    countmin,
    countsketch,
    cpc,
    freqdir,
    generic,
    kll,
    kmv,
    misragries,
    priority,
    tdigest,
)

__all__ = [
    "bloom",
    "countmin",
    "countsketch",
    "cpc",
    "freqdir",
    "generic",
    "kll",
    "kmv",
    "misragries",
    "priority",
    "tdigest",
]
