"""Extended mergeable-sketch family (north_rule): count-min, count-sketch
(+ AMS F2 / unbiased join-size), Bloom, KLL quantiles, t-digest,
Misra-Gries heavy hitters, KMV set operations, the CPC coupon sketch
(Lang'17), and Frequent Directions (Liberty'13 — the matrix/covariance
member, one-pass PCA over embedding columns) — each a core + the shared
two-phase Spark plan (hllspark.sketches.generic).
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
    "tdigest",
]
