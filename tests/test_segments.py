"""FIXTURES.md F3/F4: annotation-run segmentation vs a NumPy oracle of the
reference semantics (data.py:50-84), and windowing-parameter goldens
(timeseries_batch_generator.py:156-173, :238-256)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

LEFT, RIGHT, FIXED = 9, 16, 40


def oracle_segments(values, positions, symbols, left, right, fixed):
    """Reference semantics, data.py:50-84: runs of equal symbols → expand,
    clamp, slice, truncate/right-zero-pad."""
    segs = []
    i = 0
    while i < len(symbols):
        j = i
        while j + 1 < len(symbols) and symbols[j + 1] == symbols[i]:
            j += 1
        first, last = positions[i], positions[j]
        start = max(first - left, 0)
        stop = min(last + right, len(values))
        seg = np.asarray(values[start:stop], dtype=np.float64)[:fixed]
        seg = np.concatenate([seg, np.zeros(fixed - len(seg))])
        segs.append((symbols[i], seg, stop - start))
        i = j + 1
    return segs


@pytest.fixture(scope="module")
def sig_ann(spark):
    rng = np.random.default_rng(21)
    rows_sig, rows_ann = [], []
    for sid in range(6):
        n = int(rng.integers(60, 400))
        vals = rng.standard_normal(n).round(3)
        n_ann = int(rng.integers(3, 12))
        pos = np.sort(rng.choice(n, size=n_ann, replace=False))
        syms = rng.choice(list("NLRAV"), size=n_ann)
        rows_sig.append((sid, vals.tolist()))
        rows_ann += [(sid, int(p), str(s)) for p, s in zip(pos, syms)]
    sig = spark.createDataFrame(
        pd.DataFrame(rows_sig, columns=["series_id", "values"]))
    ann = spark.createDataFrame(
        pd.DataFrame(rows_ann, columns=["series_id", "pos", "symbol"]))
    return sig, ann


def test_segments_match_oracle(spark, sig_ann):
    from tsrollup.segments import extract_segments

    sig, ann = sig_ann
    got = extract_segments(sig, ann, LEFT, RIGHT, FIXED).toPandas()
    sig_pdf = sig.toPandas().set_index("series_id")["values"]
    ann_pdf = ann.toPandas().sort_values(["series_id", "pos"])

    total = 0
    for sid, grp in ann_pdf.groupby("series_id"):
        want = oracle_segments(sig_pdf[sid], grp["pos"].tolist(),
                               grp["symbol"].tolist(), LEFT, RIGHT, FIXED)
        g = got[got["series_id"] == sid].sort_values("seg_id")
        assert len(g) == len(want)
        for (_, row), (sym, seg, n_raw) in zip(g.iterrows(), want):
            assert row["symbol"] == sym
            assert row["n_raw"] == n_raw
            assert len(row["seg"]) == FIXED
            np.testing.assert_array_equal(np.asarray(row["seg"]), seg)
        total += len(want)
    assert total == len(got) > 0


def test_windowing_start_end_and_exclusion(spark):
    """Hand-computed goldens for start/end reservation and filter_indices-style
    exclusion zones."""
    from tsrollup.windowing import sliding_window_aggs

    toks = list(range(100, 130))  # n=30, values 100..129
    df = spark.createDataFrame(
        pd.DataFrame([("d", toks, [7, 20]), ("e", toks, [])],
                     columns=["doc_id", "tokens", "bnd"]))

    # length=4, stride=3, rate=2 → span=6; start_index=2, end_index=28
    # starts: 2,5,8,11,14,17,20 with s+6 < 28 → 2..20 (s=21? 21>20 no)
    # doc d boundaries {7,20}: exclude s with [s,s+6] ∋ 7 → s∈{2,5}; ∋ 20 → s∈{14,17,20}
    # → d keeps {8, 11}; e keeps all 7
    out = sliding_window_aggs(df, length=4, stride=3, sampling_rate=2,
                              start_index=2, end_index=28,
                              boundaries_col="bnd").toPandas()
    d = out[out["doc_id"] == "d"].sort_values("win_start")
    e = out[out["doc_id"] == "e"].sort_values("win_start")
    assert d["win_start"].tolist() == [8, 11]
    assert e["win_start"].tolist() == [2, 5, 8, 11, 14, 17, 20]
    # window at s=8, rate 2 → positions 8,10,12,14 → values 108,110,112,114
    row = d.iloc[0]
    assert row["win_sum"] == 108 + 110 + 112 + 114
    assert row["win_min"] == 108 and row["win_max"] == 114


def test_sessionize_planted(spark):
    """Hand-planted gaps: events within the gap threshold share a session,
    a gap strictly over it opens a new one, an exactly-at-threshold gap
    does NOT (the boundary is `> gap`, not `>=`), and users never share
    sessions."""
    import datetime as dt

    from tsrollup.segments import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    mins = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # user 1: [0, 10] | gap 31 → [41] | exactly 30 min later stays
        (1, 1, mins(0)), (2, 1, mins(10)), (3, 1, mins(41)),
        (4, 1, mins(71)),
        # user 2: single event
        (5, 2, mins(5)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts"]))
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(df, gap_minutes=30).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


class TestFunnelCounts:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_type string, event_id long, "
                  "ts timestamp, value double")

    def _t(self, secs=0, hours=0):
        import datetime as dt
        return dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(
            seconds=secs, hours=hours)

    def test_ordered_chain_per_session(self, spark):
        from tsrollup.segments import funnel_counts
        rows = [
            # session A: full ordered funnel
            (1, "view", 0, self._t(0), 1.0),
            (1, "click", 1, self._t(10), 1.0),
            (1, "purchase", 2, self._t(20), 1.0),
            # session B (same user, new session): stops after click
            (1, "view", 3, self._t(hours=2), 1.0),
            (1, "click", 4, self._t(hours=2, secs=5), 1.0),
            # user 2: click BEFORE view — order matters, reaches view only
            (2, "click", 5, self._t(5), 1.0),
            (2, "view", 6, self._t(10), 1.0),
        ]
        out = funnel_counts(self._ev(spark, rows)).orderBy(
            "step_idx").collect()
        assert [r.n_sessions for r in out] == [3, 2, 1]
        assert out[0].n_total == 3
        assert out[1].conv_from_prev == 2 / 3
        assert out[2].conv_from_first == 1 / 3 and out[2].conv_from_prev == 0.5

    def test_same_microsecond_cannot_chain(self, spark):
        from tsrollup.segments import funnel_counts
        rows = [(3, "view", 0, self._t(0), 1.0),
                (3, "click", 1, self._t(0), 1.0)]
        out = funnel_counts(self._ev(spark, rows)).orderBy(
            "step_idx").collect()
        assert [r.n_sessions for r in out] == [1, 0, 0]

    def test_step_can_retry_within_session(self, spark):
        from tsrollup.segments import funnel_counts
        # purchase before click is ignored; a LATER purchase still counts
        rows = [(4, "view", 0, self._t(0), 1.0),
                (4, "purchase", 1, self._t(5), 1.0),
                (4, "click", 2, self._t(10), 1.0),
                (4, "purchase", 3, self._t(15), 1.0)]
        out = funnel_counts(self._ev(spark, rows)).orderBy(
            "step_idx").collect()
        assert [r.n_sessions for r in out] == [1, 1, 1]

    def test_no_step1_sessions_yield_null_convs(self, spark):
        from tsrollup.segments import funnel_counts
        rows = [(5, "error", 0, self._t(0), 1.0)]
        out = funnel_counts(self._ev(spark, rows)).orderBy(
            "step_idx").collect()
        assert [r.n_sessions for r in out] == [0, 0, 0]
        assert out[0].conv_from_first is None  # n0 = 0 -> NULL, not NaN
        assert out[0].conv_from_prev == 0.0    # vs n_total = 1

    def test_validation(self, spark):
        from tsrollup.segments import funnel_counts
        df = self._ev(spark, [])
        with pytest.raises(ValueError):
            funnel_counts(df, steps=("view",))
        with pytest.raises(ValueError):
            funnel_counts(df, steps=("view", "view"))

    def test_session_windows_reuse_user_exchange(self, spark):
        from tsrollup.planaudit import formatted_plan, n_data_exchanges
        from tsrollup.segments import funnel_counts
        df = self._ev(spark, [(1, "view", 0, self._t(0), 1.0)])
        plan = formatted_plan(funnel_counts(df))
        # per-user sessionize exchange + the single-row global summary;
        # the k chained windows and the per-session regroup add NONE
        assert n_data_exchanges(plan) == 2, plan


class TestIntervalCoverage:
    def _cov(self, spark, rows):
        from tsrollup.segments import interval_coverage

        df = spark.createDataFrame(rows, "user_id long, start_us long, "
                                         "end_us long")
        return {r.user_id: r for r in interval_coverage(df).collect()}

    def test_overlap_touch_and_gap(self, spark):
        out = self._cov(spark, [
            (1, 0, 10), (1, 5, 20),    # overlap -> one island [0,20)
            (1, 20, 30),               # touching merges (half-open)
            (1, 100, 110),             # gap -> second island
            (2, 0, 50), (2, 60, 70),
        ])
        r1 = out[1]
        assert r1.n_intervals == 4 and r1.n_islands == 2
        assert r1.covered == 40 and r1.span == 110
        assert r1.utilization == 40.0 / 110.0
        r2 = out[2]
        assert r2.n_islands == 2 and r2.covered == 60 and r2.span == 70

    def test_contained_and_inverted_and_empty(self, spark):
        out = self._cov(spark, [
            (1, 0, 100), (1, 10, 20),   # contained: no extra coverage
            (1, 200, 150),              # inverted: dropped
            (1, 300, 300),              # empty [s,s): dropped
        ])
        r = out[1]
        assert r.n_intervals == 2 and r.n_islands == 1
        assert r.covered == 100 and r.span == 100 and r.utilization == 1.0

    def test_matches_brute_force_random(self, spark):
        import numpy as np

        rng = np.random.default_rng(31)
        rows = []
        truth = {}
        for uid in range(6):
            ivs = []
            for _ in range(40):
                s = int(rng.integers(0, 1000))
                e = s + int(rng.integers(1, 80))
                rows.append((uid, s, e))
                ivs.append((s, e))
            covered = np.zeros(1200, dtype=bool)
            for s, e in ivs:
                covered[s:e] = True
            truth[uid] = int(covered.sum())
        out = self._cov(spark, rows)
        for uid, want in truth.items():
            assert out[uid].covered == want, (uid, out[uid].covered, want)

    def test_single_exchange_plan(self, spark):
        from tsrollup.planaudit import formatted_plan, n_data_exchanges
        from tsrollup.segments import interval_coverage

        df = spark.createDataFrame([(1, 0, 10)],
                                   "user_id long, start_us long, end_us long")
        plan = formatted_plan(interval_coverage(df))
        assert n_data_exchanges(plan) == 1, plan
