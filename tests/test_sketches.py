"""Mergeable approximate-distinct sketches (tsrollup.sketches): KMV
bottom-k and HyperLogLog registers — estimator pinned against a pure
Python replica, merge identities exact, guards, and accuracy envelopes.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from tsrollup.sketches import (HASH_RANGE, hll_estimate, hll_merge,
                               hll_registers, kmv_estimate, kmv_merge,
                               kmv_sketch)


def _h60(s) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def keyed(spark):
    # 3 groups × 2 subgroups, ~333 distinct keys per (g, d) cell, plus a
    # NULL key and a duplicate to pin the guard and the distinct
    rows = [(f"g{i % 3}", f"d{i % 2}", k) for i, k in enumerate(range(2000))]
    rows += [("g0", "d0", None), ("g1", "d1", 5)]
    return spark.createDataFrame(rows, "g string, d string, key long")


def _truth_sets(rows=2000):
    truth = {}
    for i, k in enumerate(range(rows)):
        truth.setdefault((f"g{i % 3}", f"d{i % 2}"), set()).add(_h60(k))
    return truth


class TestKMV:
    def test_estimator_matches_python_replica(self, keyed):
        k = 64
        sk = kmv_sketch(keyed, "key", ["g", "d"], k=k)
        got = {(r.g, r.d): (r.kmv, r.e) for r in
               sk.select("g", "d", "kmv",
                         kmv_estimate(sk, k=k).alias("e")).collect()}
        for cell, hs in _truth_sets().items():
            want_kmv = sorted(hs)[:k]
            want_est = (float(len(hs)) if len(hs) < k
                        else (k - 1) * float(HASH_RANGE)
                        / float(sorted(hs)[k - 1]))
            assert got[cell][0] == want_kmv
            assert got[cell][1] == want_est  # bit-exact: one division

    def test_exact_below_k(self, spark):
        df = spark.createDataFrame([("a", i % 7) for i in range(100)],
                                   "g string, key long")
        sk = kmv_sketch(df, "key", ["g"], k=64)
        row = sk.select(F.size("kmv").alias("n"),
                        kmv_estimate(sk, k=64).alias("e")).collect()[0]
        assert row.n == 7 and row.e == 7.0

    def test_merge_identity(self, keyed):
        # bottom-k of a union of per-part bottom-k == global bottom-k
        merged = kmv_merge(kmv_sketch(keyed, "key", ["g", "d"], k=32),
                           ["g"], k=32)
        direct = kmv_sketch(keyed, "key", ["g"], k=32)
        a = {r.g: r.kmv for r in merged.collect()}
        b = {r.g: r.kmv for r in direct.collect()}
        assert a == b

    def test_null_keys_ignored(self, spark):
        df = spark.createDataFrame([("a", None), ("a", 1), ("a", 2)],
                                   "g string, key long")
        sk = kmv_sketch(df, "key", ["g"], k=64)
        assert sk.select(F.size("kmv")).collect()[0][0] == 2

    def test_accuracy_envelope(self, keyed):
        # k=64 -> relative std error ~ 1/sqrt(62) = 12.7%; assert 3 sigma
        sk = kmv_sketch(keyed.filter("key is not null"), "key", ["g"],
                        k=64)
        for r in sk.select("g", kmv_estimate(sk, k=64).alias("e")).collect():
            assert abs(r.e - 667) / 667 < 0.38

    def test_k_guard(self, keyed):
        with pytest.raises(ValueError):
            kmv_sketch(keyed, "key", ["g"], k=1)


class TestHLL:
    P = 8

    def _replica(self, hs):
        m, qm = 1 << self.P, 61 - self.P
        reg = {}
        for h in hs:
            idx, w = h % m, h // m
            rho = qm if w == 0 else qm - w.bit_length()
            reg[idx] = max(reg.get(idx, 0), rho)
        s = (sum(1 << (qm - r) for r in reg.values())
             + (m - len(reg)) * (1 << qm))
        num = 0.7213 / (1 + 1.079 / m) * m * m * float(1 << qm)
        return num / float(s), len(reg), s

    def test_estimate_matches_python_replica(self, keyed):
        est = hll_estimate(
            hll_registers(keyed, "key", ["g", "d"], p=self.P),
            ["g", "d"], p=self.P)
        got = {(r.g, r.d): (r.hll_est, r.n_hit, r.s_scaled)
               for r in est.collect()}
        for cell, hs in _truth_sets().items():
            assert got[cell] == self._replica(hs)  # bit-exact

    def test_merge_identity(self, keyed):
        merged = hll_merge(
            hll_registers(keyed, "key", ["g", "d"], p=self.P), ["g"])
        direct = hll_registers(keyed, "key", ["g"], p=self.P)
        a = sorted(tuple(r) for r in merged.collect())
        b = sorted(tuple(r) for r in direct.collect())
        assert a == b

    def test_rho_bounds_and_null_guard(self, spark):
        df = spark.createDataFrame(
            [("a", i) for i in range(5000)] + [("a", None)],
            "g string, key long")
        regs = hll_registers(df, "key", ["g"], p=self.P)
        lohi = regs.agg(F.min("r"), F.max("r"),
                        F.count("*")).collect()[0]
        assert 1 <= lohi[0] and lohi[1] <= 61 - self.P
        assert lohi[2] <= 1 << self.P

    def test_accuracy_envelope_large_n(self, spark):
        # n = 5000 >> 2.5m = 640: the raw estimate (no linear-counting
        # correction) should sit within ~3 sigma of 1.04/sqrt(256) = 6.5%
        df = spark.createDataFrame([("a", i) for i in range(5000)],
                                   "g string, key long")
        est = hll_estimate(hll_registers(df, "key", ["g"], p=self.P),
                           ["g"], p=self.P).collect()[0]
        assert abs(est.hll_est - 5000) / 5000 < 0.20

    def test_p_guard(self, keyed):
        with pytest.raises(ValueError):
            hll_registers(keyed, "key", ["g"], p=2)


class TestHllIdxRho:
    def test_key_is_hash_equals_plain_path(self, spark):
        """hash-once contract: sketching a pre-staged _h column must give
        byte-identical registers/sketches to hashing inside the op."""
        from tsrollup.dedup import _h60
        from tsrollup.sketches import hll_registers, kmv_sketch

        df = spark.range(300).selectExpr("id % 5 as g",
                                         "cast(id as string) as k")
        staged = df.select("g", _h60(F.col("k")).alias("h"))
        plain = sorted(map(tuple, hll_registers(df, "k", ["g"], p=6)
                           .collect()))
        pre = sorted(map(tuple, hll_registers(staged, "h", ["g"], p=6,
                                              key_is_hash=True).collect()))
        assert plain == pre
        ks = sorted((r.g, tuple(r.kmv)) for r in
                    kmv_sketch(df, "k", ["g"], k=16).collect())
        kp = sorted((r.g, tuple(r.kmv)) for r in
                    kmv_sketch(staged, "h", ["g"], k=16,
                               key_is_hash=True).collect())
        assert ks == kp

    def test_p_validation(self):
        from tsrollup.sketches import hll_idx_rho

        for bad in (3, 15, 0):
            with pytest.raises(ValueError):
                hll_idx_rho(bad)
