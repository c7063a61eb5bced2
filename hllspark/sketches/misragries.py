"""Misra-Gries heavy-hitters summary: mergeable top-frequency sketch.

State: at most k (item -> counter) pairs.  Update decrements all counters
when a new item arrives at a full table (classic MG).  Merge (Agarwal et
al. 2012, "Mergeable Summaries"): add counters pointwise, then subtract
the (k+1)-th largest counter from every entry and drop non-positives —
the merged summary keeps the same guarantee.

Guarantee: for every item x, true_count(x) - n/(k+1) <= counter(x) <=
true_count(x); therefore EVERY item with frequency > n/(k+1) survives in
the summary (no false negatives among true heavy hitters).

Vectorized update: per Arrow batch, pre-aggregate with pandas
value_counts, then fold the (distinct-item, weight) pairs into the state —
the per-item Python loop touches at most #distinct-per-batch entries, not
rows.  Spark plan via the shared sketches.generic adapter: partial
summaries per partition, one merge per group.

ITEM NORMALIZATION: every value is normalized to its pandas string form
before counting (``astype('string')``), so summaries built over numeric
columns report STRING items (e.g. int 42 -> '42', and a non-null float NaN
becomes the literal 'nan').  Callers comparing summary items against native
values must apply the same str() normalization on their side; the summary
itself stays exact/mergeable under this mapping because it is applied
consistently at every update.
"""

from __future__ import annotations

import json

import pandas as pd

from .generic import SketchKind


def zero(k: int) -> dict:
    return {"k": k, "counts": {}}


def _fold(state: dict, item: str, weight: int) -> None:
    counts = state["counts"]
    k = state["k"]
    if item in counts:
        counts[item] += weight
        return
    if len(counts) < k:
        counts[item] = weight
        return
    # decrement-all by the min of (weight, current minimum survivors)
    dec = min(weight, min(counts.values()))
    weight -= dec
    for key in list(counts):
        counts[key] -= dec
        if counts[key] <= 0:
            del counts[key]
    if weight > 0:
        _fold(state, item, weight)


def update(state: dict, values) -> dict:
    vc = pd.Series(values).astype("string").value_counts()
    for item, n in vc.items():
        _fold(state, str(item), int(n))
    return state


def merge(a: dict, b: dict) -> dict:
    if a["k"] != b["k"]:
        raise ValueError("misra-gries k mismatch")
    out = {"k": a["k"], "counts": dict(a["counts"])}
    for item, n in b["counts"].items():
        out["counts"][item] = out["counts"].get(item, 0) + n
    counts = out["counts"]
    if len(counts) > out["k"]:
        # subtract the (k+1)-th largest counter, drop non-positives
        kth = sorted(counts.values(), reverse=True)[out["k"]]
        for key in list(counts):
            counts[key] -= kth
            if counts[key] <= 0:
                del counts[key]
    return out


def encode(state: dict) -> bytes:
    return json.dumps(
        {"k": state["k"], "counts": state["counts"]}, sort_keys=True
    ).encode()


def decode(buf: bytes) -> dict:
    d = json.loads(bytes(buf).decode())
    return {"k": int(d["k"]), "counts": {k: int(v) for k, v in d["counts"].items()}}


def heavy_hitters(state: dict, n_total: int, min_support: float) -> list[tuple[str, int]]:
    """Items whose lower-bound frequency clears min_support * n_total.
    counter(x) >= true(x) - n/(k+1), so the candidate filter
    counter(x) > (min_support - 1/(k+1)) * n keeps every true heavy hitter."""
    thresh = (min_support - 1.0 / (state["k"] + 1)) * n_total
    return sorted(
        ((i, c) for i, c in state["counts"].items() if c > thresh),
        key=lambda t: (-t[1], t[0]),
    )


def kind(k: int = 64) -> SketchKind:
    return SketchKind(
        name=f"misragries-{k}",
        zero=lambda: zero(k),
        update=update,
        merge=merge,
        encode=encode,
        decode=decode,
    )
