"""Priority sampling sketch (Duffield-Lund-Thorup 2007): exact-regime
behavior, merge == one-shot partition invariance (byte-identical),
unbiased subset-sum estimation over hash seeds, encode/decode round
trip, and the Spark two-phase plan (sample_agg / sample_table) against
a driver-side reference computation."""

import hashlib

import numpy as np
import pytest

from hllspark.sketches import priority

pyspark = pytest.importorskip("pyspark")
import pyspark.sql.functions as F  # noqa: E402


def _u(item_id: str, seed: int) -> float:
    """Driver-side replica of priority.uniform_col: first 13 md5 hex
    digits of 'id<US>seed' as a 52-bit uniform in (0, 1]."""
    h = hashlib.md5(f"{item_id}\x1f{seed}".encode()).hexdigest()
    return (int(h[:13], 16) + 1) / float(1 << 52)


def _build(ids, weights, k, seed):
    us = np.array([_u(i, seed) for i in ids])
    return priority.update(
        priority.zero(k),
        np.array(ids, dtype=object),
        np.array(weights, dtype=float),
        us,
    )


class TestCore:
    def test_exact_when_n_le_k(self):
        ids = [f"d{i}" for i in range(40)]
        w = np.arange(1.0, 41.0)
        st = _build(ids, w, k=64, seed=3)
        # tau == 0 and the estimator returns EXACT sums for any subset
        assert st[1] == 0.0
        assert priority.estimate_subset_sum(st) == pytest.approx(w.sum())
        sids, sw, est = priority.sample_items(st)
        assert set(sids) == set(ids)
        np.testing.assert_allclose(np.sort(est), np.sort(w))
        mask = np.array([s.endswith("0") for s in sids])
        true = sum(wi for i, wi in zip(ids, w) if i.endswith("0"))
        assert priority.estimate_subset_sum(st, mask) == pytest.approx(true)

    def test_merge_equals_one_shot_any_partitioning(self):
        rng = np.random.default_rng(7)
        ids = [f"item-{i}" for i in range(500)]
        w = rng.lognormal(0.0, 1.5, size=500)
        one = _build(ids, w, k=32, seed=11)
        for trial in range(5):
            perm = rng.permutation(500)
            cuts = np.sort(rng.choice(np.arange(1, 500), size=6, replace=False))
            parts = np.split(perm, cuts)
            sketches = [
                _build([ids[j] for j in p], w[p], k=32, seed=11)
                for p in parts
                if len(p)
            ]
            # merge in a shuffled tree order
            rng.shuffle(sketches)
            acc = sketches[0]
            for s in sketches[1:]:
                acc = priority.merge(acc, s)
            assert priority.encode(acc) == priority.encode(one)

    def test_tau_is_global_k_plus_1_priority(self):
        rng = np.random.default_rng(1)
        ids = [f"x{i}" for i in range(200)]
        w = rng.uniform(0.5, 5.0, size=200)
        seed, k = 5, 16
        st = _build(ids, w, k=k, seed=seed)
        q = np.array([wi / _u(i, seed) for i, wi in zip(ids, w)])
        order = np.argsort(-q)
        assert st[1] == pytest.approx(q[order[k]])
        assert set(st[2]) == {ids[j] for j in order[:k]}

    def test_unbiased_subset_sum_over_seeds(self):
        rng = np.random.default_rng(42)
        n = 400
        ids = [f"doc{i}" for i in range(n)]
        w = rng.lognormal(1.0, 1.0, size=n)
        subset = np.array([i % 3 == 0 for i in range(n)])
        true = w[subset].sum()
        ests = []
        for seed in range(300):
            st = _build(ids, w, k=48, seed=seed)
            sids, _, _ = priority.sample_items(st)
            mask = np.array([int(s[3:]) % 3 == 0 for s in sids])
            ests.append(priority.estimate_subset_sum(st, mask))
        ests = np.asarray(ests)
        # mean over 300 hash seeds within 3 standard errors of the truth
        se = ests.std(ddof=1) / np.sqrt(len(ests))
        assert abs(ests.mean() - true) < 3 * se + 1e-9
        # and the estimator is not degenerate
        assert ests.std() > 0

    def test_encode_decode_round_trip(self):
        st = _build([f"u{i}" for i in range(100)], np.arange(1.0, 101.0), 24, 9)
        rt = priority.decode(priority.encode(st))
        assert priority.encode(rt) == priority.encode(st)
        z = priority.decode(priority.encode(priority.zero(24)))
        assert z[0] == 24 and len(z[2]) == 0 and z[1] == 0.0

    def test_k_mismatch_and_bad_header(self):
        with pytest.raises(ValueError):
            priority.merge(priority.zero(8), priority.zero(16))
        with pytest.raises(ValueError):
            priority.decode(b"nope")


class TestSpark:
    def test_sample_agg_matches_driver_reference(self, spark):
        rows = [(f"doc-{i}", float(1 + (i * 37) % 100), "en" if i % 4 else "de")
                for i in range(3000)]
        df = spark.createDataFrame(rows, "doc_id string, n_chars double, lang string")
        sk = priority.sample_agg(df, "doc_id", "n_chars", k=50, seed=13)
        st = priority.decode(bytes(sk.collect()[0]["sketch"]))
        ref = _build([r[0] for r in rows], np.array([r[1] for r in rows]), 50, 13)
        assert priority.encode(st) == priority.encode(ref)

    def test_partitioning_invariance_spark(self, spark):
        rows = [(f"d{i}", float(1 + i % 17)) for i in range(2000)]
        df = spark.createDataFrame(rows, "id string, w double")
        a = priority.sample_agg(df.repartition(1), "id", "w", k=32, seed=2)
        b = priority.sample_agg(df.repartition(16), "id", "w", k=32, seed=2)
        assert bytes(a.collect()[0]["sketch"]) == bytes(b.collect()[0]["sketch"])

    def test_grouped_and_sample_table(self, spark):
        rows = [(f"d{i}", float(1 + i % 13), f"g{i % 3}") for i in range(900)]
        df = spark.createDataFrame(rows, "id string, w double, g string")
        sk = priority.sample_agg(df, "id", "w", k=20, keys=["g"], seed=4)
        tbl = priority.sample_table(sk, keys=["g"]).collect()
        assert {r["g"] for r in tbl} == {"g0", "g1", "g2"}
        for grp in ("g0", "g1", "g2"):
            got = sorted(r["id"] for r in tbl if r["g"] == grp)
            ref = _build(
                [r[0] for r in rows if r[2] == grp],
                np.array([r[1] for r in rows if r[2] == grp]),
                20,
                4,
            )
            assert got == sorted(ref[2])
            # est_weight column == max(w, tau)
            tau = ref[1]
            for r in tbl:
                if r["g"] == grp:
                    assert r["est_weight"] == pytest.approx(max(r["weight"], tau))

    def test_null_and_nonpositive_weights_excluded(self, spark):
        rows = [("a", 5.0), ("b", 0.0), ("c", -1.0), ("d", None), ("e", 2.0)]
        df = spark.createDataFrame(rows, "id string, w double")
        sk = priority.sample_agg(df, "id", "w", k=10, seed=0)
        st = priority.decode(bytes(sk.collect()[0]["sketch"]))
        assert set(st[2]) == {"a", "e"}

    def test_k_lt_1_raises(self, spark):
        df = spark.range(5).selectExpr("cast(id as string) id", "1.0 w")
        with pytest.raises(ValueError):
            priority.sample_agg(df, "id", "w", k=0)
