"""PAA / SAX / autocorrelation feature tests (tsrollup/features.py).

Hand-computed goldens pin the semantic corners (frame bounds, short docs,
symbol ordinals, lag alignment); NumPy parity covers random inputs; the plan
tests pin the shuffle-free shape. Fixture-scale value parity vs DuckDB lives
in the __spark_entry__ tail oracles (paa_sax, acf_moments, sax_words).
"""

from __future__ import annotations

import numpy as np
import pytest

from tsrollup.features import acf_moments, paa, paa_sax, sax_words
from tsrollup.planaudit import formatted_plan, n_data_exchanges


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


class TestPaa:
    def test_hand_computed_frames(self, spark):
        df = _docs(spark, [("d1", list(range(1, 11)))])
        out = {r.frame: r for r in paa(df, frames=3).collect()}
        assert set(out) == {0, 1, 2}
        assert (out[0].frame_len, out[0].frame_sum, out[0].paa) == (4, 10, 2.5)
        assert (out[1].frame_len, out[1].frame_sum, out[1].paa) == (3, 18, 6.0)
        assert (out[2].frame_len, out[2].frame_sum, out[2].paa) == (3, 27, 9.0)

    def test_frame_bounds_match_assignment_rule(self):
        # slice bounds [ceil(fn/F), ceil((f+1)n/F)) == {p : p*F // n == f}
        for n in (1, 2, 3, 7, 8, 9, 63, 64, 65, 1000):
            for frames in (1, 2, 3, 8, 16):
                by_rule = {}
                for p in range(n):
                    by_rule.setdefault(p * frames // n, []).append(p)
                for f in range(frames):
                    start = (f * n + frames - 1) // frames
                    stop = ((f + 1) * n + frames - 1) // frames
                    assert list(range(start, stop)) == by_rule.get(f, [])

    def test_short_doc_skips_empty_frames(self, spark):
        df = _docs(spark, [("d1", [5, 9])])
        out = {r.frame: r for r in paa(df, frames=8).collect()}
        assert set(out) == {0, 4}
        assert out[0].frame_sum == 5 and out[4].frame_sum == 9

    def test_empty_tokens_emits_nothing(self, spark):
        df = _docs(spark, [("d1", [])])
        assert paa(df, frames=4).count() == 0

    def test_numpy_parity_random(self, spark):
        rng = np.random.default_rng(7)
        rows = [(f"d{i}", rng.integers(0, 40, size=int(m)).tolist())
                for i, m in enumerate(rng.integers(1, 200, size=20))]
        out = paa(_docs(spark, rows), frames=8).collect()
        got = {(r.doc_id, r.frame): (r.frame_len, r.frame_sum, r.paa)
               for r in out}
        want = {}
        for doc_id, toks in rows:
            x = np.asarray(toks)
            fr = np.arange(len(x)) * 8 // len(x)
            for f in np.unique(fr):
                seg = x[fr == f]
                want[(doc_id, int(f))] = (
                    len(seg), int(seg.sum()), seg.sum() / len(seg))
        assert got == want

    def test_frames_validation(self, spark):
        with pytest.raises(ValueError):
            paa(_docs(spark, []), frames=0)


class TestSax:
    def test_symbol_ordinals(self, spark):
        # means 2.5 / 6 / 9 vs breakpoints (3,5,7) -> symbols 0 / 2 / 3
        df = _docs(spark, [("d1", list(range(1, 11)))])
        out = {r.frame: r.symbol
               for r in paa_sax(df, frames=3, breakpoints=(3, 5, 7)).collect()}
        assert out == {0: 0, 1: 2, 2: 3}

    def test_boundary_is_strict(self, spark):
        # frame mean exactly == breakpoint must NOT count (strict >)
        df = _docs(spark, [("d1", [3, 3, 3])])
        out = paa_sax(df, frames=1, breakpoints=(3,)).collect()
        assert out[0].symbol == 0

    def test_word_concatenates_in_frame_order(self, spark):
        df = _docs(spark, [("d1", list(range(1, 11)))])
        r = sax_words(df, frames=3, breakpoints=(3, 5, 7)).collect()[0]
        assert r.sax_word == "acd" and r.n_frames == 3

    def test_word_skips_empty_frames(self, spark):
        # 2 tokens over 8 frames: only frames 0 and 4 are non-empty
        df = _docs(spark, [("d1", [1, 9])])
        r = sax_words(df, frames=8, breakpoints=(3, 5, 7)).collect()[0]
        assert r.sax_word == "ad" and r.n_frames == 2

    def test_empty_tokens_emits_no_word(self, spark):
        df = _docs(spark, [("d1", [])])
        assert sax_words(df, frames=4).count() == 0

    def test_breakpoint_validation(self, spark):
        with pytest.raises(ValueError):
            paa_sax(_docs(spark, []), breakpoints=(5, 3))
        with pytest.raises(ValueError):
            sax_words(_docs(spark, []), breakpoints=(3, 3))


class TestAcf:
    def test_hand_computed_lags(self, spark):
        df = _docs(spark, [("d1", [1, 2, 3, 4])])
        out = {r.lag: r for r in acf_moments(df, max_lag=2).collect()}
        l1, l2 = out[1], out[2]
        assert (l1.n_pairs, l1.sxy, l1.sx, l1.sy) == (3, 20, 6, 9)
        assert l1.cov_num == 3 * 20 - 6 * 9
        assert l1.mean_prod == 20 / 3
        assert (l2.n_pairs, l2.sxy, l2.sx, l2.sy) == (2, 11, 3, 7)
        assert l2.cov_num == 2 * 11 - 3 * 7

    def test_short_docs_drop_out_of_range_lags(self, spark):
        df = _docs(spark, [("d1", [7]), ("d2", [7, 8])])
        out = acf_moments(df, max_lag=3).collect()
        assert {(r.doc_id, r.lag) for r in out} == {("d2", 1)}

    def test_numpy_parity_random(self, spark):
        rng = np.random.default_rng(11)
        rows = [(f"d{i}", rng.integers(0, 30, size=int(m)).tolist())
                for i, m in enumerate(rng.integers(1, 120, size=15))]
        out = acf_moments(_docs(spark, rows), max_lag=4).collect()
        got = {(r.doc_id, r.lag): (r.n_pairs, r.sxy, r.sx, r.sy, r.cov_num)
               for r in out}
        want = {}
        for doc_id, toks in rows:
            x = np.asarray(toks, dtype=np.int64)
            for lag in range(1, 5):
                if len(x) <= lag:
                    continue
                h, t = x[:-lag], x[lag:]
                want[(doc_id, lag)] = (
                    len(h), int(h @ t), int(h.sum()), int(t.sum()),
                    len(h) * int(h @ t) - int(h.sum()) * int(t.sum()))
        assert got == want

    def test_lag_validation(self, spark):
        with pytest.raises(ValueError):
            acf_moments(_docs(spark, []), max_lag=0)


class TestPlanShape:
    def test_all_operators_are_shuffle_free(self, spark):
        df = _docs(spark, [("d1", [1, 2, 3])])
        for out in (paa_sax(df), sax_words(df), acf_moments(df)):
            assert n_data_exchanges(formatted_plan(out)) == 0


def _lttb_reference(y, n_out):
    """Independent scalar reference: textbook LTTB with exact Fractions
    for the next-bucket average (no denominator clearing, no numpy)."""
    from fractions import Fraction

    n = len(y)
    if n <= n_out:
        return list(range(n))
    nb = n_out - 2
    m = n - 2
    bounds = [1 + -((-(k * m)) // nb) for k in range(nb + 1)]
    sel = [0]
    for k in range(nb):
        lo, hi = bounds[k], bounds[k + 1]
        if k + 1 < nb:
            nlo, nhi = bounds[k + 1], bounds[k + 2]
            ax = Fraction(sum(range(nlo, nhi)), nhi - nlo)
            ay = Fraction(sum(int(v) for v in y[nlo:nhi]), nhi - nlo)
        else:
            ax, ay = Fraction(n - 1), Fraction(int(y[n - 1]))
        xa, ya = sel[-1], int(y[sel[-1]])
        best, best_area = None, Fraction(-1)
        for p in range(lo, hi):
            area = abs((Fraction(xa) - ax) * (int(y[p]) - ya)
                       - (xa - p) * (ay - ya))
            if area > best_area:
                best, best_area = p, area
        sel.append(best)
    sel.append(n - 1)
    return sel


class TestLttb:
    def test_identity_when_short(self, spark):
        from tsrollup.features import lttb
        df = _docs(spark, [("d1", [5, 6, 7])])
        out = sorted(lttb(df, n_out=8).collect(), key=lambda r: r.k)
        assert [(r.pos, r.val) for r in out] == [(0, 5), (1, 6), (2, 7)]

    def test_endpoints_always_kept(self, spark):
        from tsrollup.features import lttb
        rng = np.random.default_rng(3)
        toks = rng.integers(0, 30, size=200).tolist()
        out = sorted(lttb(_docs(spark, [("d1", toks)]), n_out=10).collect(),
                     key=lambda r: r.k)
        assert out[0].pos == 0 and out[-1].pos == 199
        assert len(out) == 10
        poss = [r.pos for r in out]
        assert poss == sorted(poss) and len(set(poss)) == 10

    def test_peak_is_kept(self, spark):
        from tsrollup.features import lttb
        # flat series with one spike: the spike must survive downsampling
        toks = [5] * 100
        toks[37] = 500
        out = lttb(_docs(spark, [("d1", toks)]), n_out=6).collect()
        assert any(r.pos == 37 and r.val == 500 for r in out)

    def test_matches_fraction_reference(self, spark):
        from tsrollup.features import lttb, lttb_indices
        rng = np.random.default_rng(17)
        for trial in range(20):
            n = int(rng.integers(10, 400))
            n_out = int(rng.integers(3, min(n + 5, 50)))
            y = rng.integers(0, 100, size=n)
            got = lttb_indices(y, n_out).tolist()
            assert got == _lttb_reference(y, n_out), (trial, n, n_out)

    def test_empty_and_validation(self, spark):
        from tsrollup.features import lttb
        assert lttb(_docs(spark, [("d1", [])]), n_out=4).count() == 0
        with pytest.raises(ValueError):
            lttb(_docs(spark, []), n_out=2)

    def test_plan_is_pure_map(self, spark):
        from tsrollup.features import lttb
        df = _docs(spark, [("d1", [1, 2, 3, 4])])
        assert n_data_exchanges(formatted_plan(lttb(df))) == 0


class TestSourceDriftTv:
    def _sdf(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id string, source string, tokens array<int>")

    def test_identical_distributions_have_zero_tv(self, spark):
        df = self._sdf(spark, [("d1", "a", [1, 2, 3]),
                               ("d2", "b", [1, 2, 3])])
        from tsrollup.features import source_drift_tv
        out = {r.source: r for r in source_drift_tv(df).collect()}
        assert out["a"].tv == 0.0 and out["b"].tv == 0.0
        assert out["a"].n_tokens == 3

    def test_disjoint_distributions(self, spark):
        # a={1,1}, b={9,9}: each source's dist is TV=0.5 from the 50/50 mix
        from tsrollup.features import source_drift_tv
        df = self._sdf(spark, [("d1", "a", [1, 1]), ("d2", "b", [9, 9])])
        out = {r.source: r.tv for r in source_drift_tv(df).collect()}
        assert out == {"a": 0.5, "b": 0.5}

    def test_numpy_parity_random(self, spark):
        from tsrollup.features import source_drift_tv
        rng = np.random.default_rng(23)
        rows = []
        for i in range(30):
            src = f"s{i % 4}"
            rows.append((f"d{i}", src,
                         rng.integers(0, 12, size=int(
                             rng.integers(1, 60))).tolist()))
        out = {r.source: r for r in
               source_drift_tv(self._sdf(spark, rows)).collect()}
        # exact integer reference
        from collections import Counter
        per_src, allc = {}, Counter()
        for _, src, toks in rows:
            per_src.setdefault(src, Counter()).update(toks)
            allc.update(toks)
        n = sum(allc.values())
        for src, c in per_src.items():
            rt = sum(c.values())
            # the full source x value grid: unobserved values contribute
            # |0 - rt*ct|
            devs = [abs(c.get(v, 0) * n - rt * allc[v]) for v in allc]
            r = out[src]
            assert r.n_tokens == rt
            assert r.n_values == len(c)
            assert r.tv_num == float(sum(devs))
            assert r.linf_num == float(max(devs))
            assert r.tv == sum(devs) / float(2 * rt * n)


class TestMatrixProfile:
    def test_matches_brute_reference_realistic_params(self, spark):
        from tsrollup.features import matrix_profile, matrix_profile_ref

        rng = np.random.default_rng(7)
        rows = [(f"d{i}", rng.integers(0, 20, size=int(n)).tolist())
                for i, n in enumerate(rng.integers(2, 400, size=12))]
        m, mx = 16, 256
        excl = m // 2
        out = matrix_profile(_docs(spark, rows), m=m, max_positions=mx)
        got = {}
        for r in out.collect():
            got.setdefault(r.doc_id, []).append((r.pos, r.mp_d2, r.mp_j))
        for doc_id, toks in rows:
            want = matrix_profile_ref(np.asarray(toks[:mx]), m, excl)
            assert sorted(got.get(doc_id, [])) == want, doc_id

    def test_planted_motif_and_discord(self, spark):
        from tsrollup.features import matrix_profile

        rng = np.random.default_rng(11)
        y = rng.integers(0, 50, size=200).tolist()
        y[40:56] = y[120:136] = list(range(100, 116))  # exact motif pair
        y[180:196] = [500 + v for v in range(16)]      # discord region
        out = {r.pos: r for r in matrix_profile(
            _docs(spark, [("d", y)]), m=16, max_positions=256).collect()}
        assert out[40].mp_d2 == 0 and out[40].mp_j == 120
        assert out[120].mp_d2 == 0 and out[120].mp_j == 40
        # the discord window is the profile maximum
        discord = max(out.values(), key=lambda r: r.mp_d2)
        assert 165 <= discord.pos <= 195

    def test_trivial_match_exclusion(self, spark):
        from tsrollup.features import matrix_profile

        # constant series: every window identical — the exclusion zone must
        # still force the neighbor OUTSIDE |i-j| < m//2
        out = matrix_profile(_docs(spark, [("d", [3] * 40)]),
                             m=8, max_positions=64).collect()
        assert len(out) == 33
        for r in out:
            assert r.mp_d2 == 0 and abs(r.pos - r.mp_j) >= 4
            # smallest-j tie-break: the nearest valid j below, else above
            assert r.mp_j == (0 if r.pos >= 4 else r.pos + 4)

    def test_short_and_null_docs_emit_no_rows(self, spark):
        from tsrollup.features import matrix_profile

        rows = [("tiny", [1, 2, 3]),        # fewer than m tokens
                ("edge", [1, 2, 3, 4, 5]),  # nw=2 <= excl=2: all excluded
                ("none", None)]
        df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
        assert matrix_profile(df, m=4, max_positions=64).count() == 0

    def test_interior_window_without_neighbor_dropped(self, spark):
        from tsrollup.features import matrix_profile, matrix_profile_ref

        # nw=3, excl=2: i=1 sits inside both neighbors' exclusion zones
        y = [5, 1, 4, 1, 5, 9]
        out = sorted((r.pos, r.mp_d2, r.mp_j) for r in matrix_profile(
            _docs(spark, [("d", y)]), m=4, max_positions=64).collect())
        assert [p for p, _, _ in out] == [0, 2]
        assert out == matrix_profile_ref(np.asarray(y), 4, 2)

    def test_truncation_matches_sliced_input(self, spark):
        from tsrollup.features import matrix_profile

        rng = np.random.default_rng(3)
        y = rng.integers(0, 9, size=150).tolist()
        full = matrix_profile(_docs(spark, [("d", y)]),
                              m=4, max_positions=64).collect()
        sliced = matrix_profile(_docs(spark, [("d", y[:64])]),
                                m=4, max_positions=1000).collect()
        key = lambda r: (r.pos, r.mp_d2, r.mp_j)
        assert sorted(map(key, full)) == sorted(map(key, sliced))

    def test_validation(self, spark):
        from tsrollup.features import matrix_profile

        df = _docs(spark, [("d", [1, 2, 3])])
        with pytest.raises(ValueError):
            matrix_profile(df, m=1)
        with pytest.raises(ValueError):
            matrix_profile(df, m=8, max_positions=4)
        with pytest.raises(ValueError):
            matrix_profile(df, m=8, excl=0)

    def test_zero_exchange_plan(self, spark):
        from tsrollup.features import matrix_profile

        df = _docs(spark, [("d", [1, 2, 3, 4, 5, 6, 7, 8])])
        assert n_data_exchanges(formatted_plan(matrix_profile(df))) == 0


class TestKsDrift:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "source string, tokens array<int>")

    def test_identical_distributions_score_zero(self, spark):
        from tsrollup.features import ks_drift

        rows = [("a", [1, 2, 3] * 4), ("b", [1, 2, 3] * 4)]
        out = {r.source: r for r in ks_drift(self._docs(spark, rows)).collect()}
        assert out["a"].ks_num == 0.0 and out["a"].ks == 0.0
        assert out["b"].ks == 0.0

    def test_disjoint_supports_score_one(self, spark):
        from tsrollup.features import ks_drift

        rows = [("lo", [1, 1, 2, 2]), ("hi", [9, 9, 8, 8])]
        out = {r.source: r for r in ks_drift(self._docs(spark, rows)).collect()}
        # full separation: at v=2 the lo-CDF is 1 and the rest-CDF is 0
        assert out["lo"].ks == 1.0 and out["lo"].ks_at == 2
        assert out["hi"].ks == 1.0

    def test_location_shift_beats_tv_dilution(self, spark):
        import numpy as np

        from tsrollup.features import ks_drift

        rng = np.random.default_rng(5)
        base = rng.integers(1, 50, size=2000).tolist()
        shifted = [int(v) + 3 for v in rng.integers(1, 50, size=2000)]
        rows = [("ref", base), ("shift", shifted)]
        out = {r.source: r for r in ks_drift(self._docs(spark, rows)).collect()}
        # a +3 shift over a 49-value support: KS must see a sizable gap
        assert out["shift"].ks > 0.04
        # exact twin of the engine's cross-multiplication
        cs = cg = 0
        per = {}
        from collections import Counter
        cnt_s, cnt_all = Counter(shifted), Counter(base + shifted)
        ns, N = len(shifted), len(base) + len(shifted)
        best = -1
        for v in sorted(cnt_all):
            cs += cnt_s.get(v, 0); cg += cnt_all[v]
            best = max(best, abs(cs * (N - ns) - (cg - cs) * ns))
        assert out["shift"].ks_num == float(best)

    def test_argmax_tie_takes_smallest_value(self, spark):
        from tsrollup.features import ks_drift

        # lo={1,3}, rest={2,4}: |gap| numerator ties at v=1,2,3 — report 1
        rows = [("lo", [1, 3]), ("hi", [2, 4])]
        out = {r.source: r for r in ks_drift(self._docs(spark, rows)).collect()}
        assert out["lo"].ks_at == 1


class TestHrvPoincare:
    def test_hand_computed_moments(self, spark):
        from tsrollup.features import hrv_poincare

        df = _docs(spark, [("d1", [3, 1, 4, 1, 5, 9, 2, 6]), ("d2", [7]),
                           ("d3", [])])
        rows = {r.doc_id: r for r in hrv_poincare(df).collect()}
        assert set(rows) == {"d1"}  # <2 tokens carry no difference signal
        r = rows["d1"]
        # diffs: -2, 3, -3, 4, 4, -7, 4
        assert (r.n_tok, r.n_d) == (8, 7)
        assert r.sum_d == 6 - 3           # telescope: x_n - x_1
        assert r.sum_d2 == 4 + 9 + 9 + 16 + 16 + 49 + 16
        assert r.sum_abs == 2 + 3 + 3 + 4 + 4 + 7 + 4
        assert r.nn_thr == 6              # |d| > 2 census
        assert r.var_d_num == r.n_d * r.sum_d2 - r.sum_d ** 2
        assert r.pnn == 6 / 7

    def test_numpy_parity_random(self, spark):
        from tsrollup.features import hrv_poincare

        rng = np.random.default_rng(11)
        docs = [(f"d{i}", rng.integers(0, 20, rng.integers(2, 60)).tolist())
                for i in range(40)]
        got = {r.doc_id: r for r in hrv_poincare(_docs(spark, docs)).collect()}
        for doc_id, toks in docs:
            x = np.asarray(toks, dtype=np.int64)
            d = np.diff(x)
            r = got[doc_id]
            assert r.sum_d == d.sum() and r.sum_d2 == (d * d).sum()
            assert r.sum_abs == np.abs(d).sum()
            assert r.nn_thr == int((np.abs(d) > 2).sum())
            assert r.var_x_num == len(x) * (x * x).sum() - x.sum() ** 2
            assert r.mean_abs_d == np.abs(d).sum() / len(d)

    def test_constant_doc_zero_variance(self, spark):
        from tsrollup.features import hrv_poincare

        r = hrv_poincare(_docs(spark, [("c", [5] * 10)])).collect()[0]
        assert (r.sum_d, r.sum_d2, r.var_d_num, r.var_x_num) == (0, 0, 0, 0)

    def test_zero_exchanges(self, spark):
        from tsrollup.features import hrv_poincare

        plan = formatted_plan(hrv_poincare(_docs(spark, [("d", [1, 2])])))
        assert n_data_exchanges(plan) == 0


class TestOrdinalCensus:
    def _replica(self, docs):
        import collections
        cnt = collections.Counter()
        for _, toks, src in docs:
            for a, b, c in zip(toks, toks[1:], toks[2:]):
                pid = ((np.sign(b - a) + 1) * 9 + (np.sign(c - b) + 1) * 3
                       + (np.sign(c - a) + 1))
                cnt[(src, int(pid))] += 1
        return cnt

    def test_tie_classes_and_counts(self, spark):
        from tsrollup.features import ordinal_census

        df = spark.createDataFrame(
            [("d1", [2, 2, 2], "a"), ("d2", [1, 2, 3, 2], "a"),
             ("d3", [5, 4], "b")],
            "doc_id string, tokens array<int>, source string")
        got = {(r.source, r.pattern_id): r.n_triples
               for r in ordinal_census(df).collect()}
        # all-equal triple -> the all-ties class 13; d3 too short -> no rows
        assert got[("a", 13)] == 1
        # (1,2,3): +,+,+ -> 26 ; (2,3,2): +,-,0 -> 2*9+0*3+1 = 19
        assert got[("a", 26)] == 1 and got[("a", 19)] == 1
        assert not any(s == "b" for s, _ in got)

    def test_replica_parity_and_share(self, spark):
        from tsrollup.features import ordinal_census

        rng = np.random.default_rng(3)
        docs = [(f"d{i}", rng.integers(0, 6, rng.integers(3, 40)).tolist(),
                 f"s{i % 3}") for i in range(30)]
        df = spark.createDataFrame(
            docs, "doc_id string, tokens array<int>, source string")
        rows = ordinal_census(df).collect()
        want = self._replica(docs)
        assert {(r.source, r.pattern_id): r.n_triples
                for r in rows} == dict(want)
        for r in rows:
            assert r.share == r.n_triples / r.n_group

    def test_one_exchange_before_window(self, spark):
        from tsrollup.features import ordinal_census

        df = spark.createDataFrame(
            [("d", [1, 2, 3], "s")],
            "doc_id string, tokens array<int>, source string")
        plan = formatted_plan(ordinal_census(df))
        # census agg + group-total window share the same key: 2 exchanges max
        assert n_data_exchanges(plan) <= 2


class TestShapeFeatures:
    def _replica(self, toks):
        x = np.asarray(toks, dtype=np.int64)
        n = len(x)
        d = np.diff(x)
        r = n * x - x.sum()
        n_cross = int((r[:-1] * r[1:] < 0).sum())
        n_peaks = int(((x[:-2] < x[1:-1]) & (x[1:-1] > x[2:])).sum())
        best = cur = 0
        for v in d:
            cur = cur + 1 if v > 0 else 0
            best = max(best, cur)
        return (n_cross, n_peaks, best, int((x * x).sum()),
                np.abs(d).sum() / len(d))

    def test_hand_and_replica(self, spark):
        from tsrollup.features import shape_features

        rng = np.random.default_rng(5)
        docs = [("mono", [1, 2, 3, 4, 5]), ("flat", [4] * 6),
                ("saw", [1, 3, 1, 3, 1, 3])]
        docs += [(f"r{i}", rng.integers(0, 9, rng.integers(2, 50)).tolist())
                 for i in range(25)]
        got = {r.doc_id: r
               for r in shape_features(_docs(spark, docs)).collect()}
        for doc_id, toks in docs:
            nc, npk, run, en, mac = self._replica(toks)
            r = got[doc_id]
            assert (r.n_cross, r.n_peaks, r.longest_incr,
                    r.abs_energy) == (nc, npk, run, en), doc_id
            assert r.mean_abs_change == mac
        assert got["mono"].longest_incr == 4
        assert got["flat"].n_cross == 0 and got["flat"].longest_incr == 0

    def test_zero_exchanges(self, spark):
        from tsrollup.features import shape_features

        plan = formatted_plan(shape_features(_docs(spark, [("d", [1, 2])])))
        assert n_data_exchanges(plan) == 0


class TestEnergyProfile:
    def _replica(self, toks, chunks=4):
        x = np.asarray(toks, dtype=np.int64)
        n = len(x)
        total = x.sum()
        imq = int(np.argmax(2 * np.cumsum(x) >= total)) + 1
        c3 = x[:-2] * x[1:-1] * x[2:] if n >= 3 else np.array([], dtype=np.int64)
        rows = {}
        for c in range(chunks):
            lo = -(-c * n // chunks)          # ceil
            hi = -(-(c + 1) * n // chunks)
            if hi > lo:
                seg = x[lo:hi]
                rows[c] = (hi - lo, int((seg * seg).sum()))
        return (int((x * x).sum()), imq, int(c3.sum()), max(n - 2, 0), rows)

    def test_hand_and_replica(self, spark):
        from tsrollup.features import energy_profile

        rng = np.random.default_rng(7)
        docs = [("one", [9]), ("two", [0, 5]), ("zeros", [0, 0, 0])]
        docs += [(f"r{i}", rng.integers(0, 9, rng.integers(1, 40)).tolist())
                 for i in range(25)]
        out = energy_profile(_docs(spark, docs)).collect()
        got = {}
        for r in out:
            got.setdefault(r.doc_id, {})[r.chunk] = r
        for doc_id, toks in docs:
            te, imq, c3n, c3c, chunks = self._replica(toks)
            rows = got[doc_id]
            assert set(rows) == set(chunks), doc_id
            for c, (clen, cen) in chunks.items():
                r = rows[c]
                assert (r.total_energy, r.imq_num, r.c3_num, r.c3_n,
                        r.chunk_len, r.chunk_energy) == \
                    (te, imq, c3n, c3c, clen, cen), (doc_id, c)
                if te:
                    assert r.energy_ratio == cen / te
        # all-zero doc: ratio NULL, imq hits the first position
        z = got["zeros"][0]
        assert z.energy_ratio is None and z.imq_num == 1

    def test_chunk_energies_sum_to_total(self, spark):
        from tsrollup.features import energy_profile

        rng = np.random.default_rng(13)
        docs = [(f"d{i}", rng.integers(0, 20, rng.integers(1, 80)).tolist())
                for i in range(20)]
        import collections
        acc = collections.Counter()
        tot = {}
        for r in energy_profile(_docs(spark, docs)).collect():
            acc[r.doc_id] += r.chunk_energy
            tot[r.doc_id] = r.total_energy
        assert acc == collections.Counter(tot)

    def test_zero_exchanges_and_validation(self, spark):
        from tsrollup.features import energy_profile

        df = _docs(spark, [("d", [1, 2, 3])])
        assert n_data_exchanges(formatted_plan(energy_profile(df))) == 0
        with pytest.raises(ValueError):
            energy_profile(df, chunks=0)
