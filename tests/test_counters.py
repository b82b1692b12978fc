"""Counter-semantics and M4 downsampling tests (tsrollup/counters.py).

Small hand-built frames pin the semantic corners (reset detection, bucket
attribution, first/last tie-breaks, exact integer bucketing); the tail
oracles in __spark_entry__ cover the fixture-scale value parity.
"""

from __future__ import annotations

import datetime as dt

import pytest

from tsrollup.counters import (cadence_gaps, counter_increase, cusum_drift,
                               cusum_episodes, lag_coupling, m4_downsample)
from tsrollup.planaudit import formatted_plan, n_data_exchanges

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, "
              "ts timestamp, value double")


def _row(uid, etype, eid, secs, value):
    return (uid, etype, eid, T0 + dt.timedelta(seconds=secs), float(value))


class TestCounterIncrease:
    def test_monotonic_series_sums_deltas(self, spark):
        df = _events(spark, [_row(1, "a", i, i * 60, 10.0 * (i + 1))
                             for i in range(5)])
        out = counter_increase(df).collect()
        assert len(out) == 1
        r = out[0]
        # first sample contributes 0; then 4 deltas of 10 each
        assert r.n_samples == 5 and r.n_resets == 0
        assert r.increase == 40.0 and r.last_value == 50.0

    def test_reset_contributes_full_value(self, spark):
        # 10 -> 30 -> 5 (reset) -> 25: increase = 20 + 5 + 20
        df = _events(spark, [_row(1, "a", 0, 0, 10), _row(1, "a", 1, 60, 30),
                             _row(1, "a", 2, 120, 5), _row(1, "a", 3, 180, 25)])
        r = counter_increase(df).collect()[0]
        assert r.n_resets == 1
        assert r.increase == 45.0

    def test_cross_bucket_delta_goes_to_later_bucket(self, spark):
        # samples at 10:59 and 11:01 — the 11:01 sample's delta lands in
        # the 11:00 bucket (Prometheus attribution)
        df = _events(spark, [_row(1, "a", 0, 59 * 60, 100),
                             _row(1, "a", 1, 61 * 60, 140)])
        out = {r.bucket_ts.hour: r for r in counter_increase(df).collect()}
        assert out[10].increase == 0.0 and out[10].n_samples == 1
        assert out[11].increase == 40.0 and out[11].last_value == 140.0

    def test_series_are_independent(self, spark):
        # same user, two event types: a drop across types must NOT count
        # as a reset because the series key is (user, type)
        df = _events(spark, [_row(1, "a", 0, 0, 100), _row(1, "b", 1, 60, 5),
                             _row(1, "b", 2, 120, 7)])
        out = {r.event_type: r for r in counter_increase(df).collect()}
        assert out["a"].n_resets == 0 and out["a"].increase == 0.0
        assert out["b"].n_resets == 0 and out["b"].increase == 2.0

    def test_single_exchange_plan(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(counter_increase(df))
        assert n_data_exchanges(plan) == 1, plan

    def test_rejects_unknown_bucket(self, spark):
        # date_trunc returns NULL on a bad unit and every row would
        # collapse into one NULL bucket — must raise instead
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        with pytest.raises(ValueError):
            counter_increase(df, bucket="hr")


class TestCadenceGaps:
    def test_counts_missing_slots(self, spark):
        # samples at 0h, 1h, 4h30m: one gap of 3.5h => 3 missing hourly
        # slots minus the one that would have been the next sample => 2
        df = _events(spark, [_row(1, "a", 0, 0, 1), _row(1, "a", 1, 3600, 1),
                             _row(1, "a", 2, 16200, 1)])
        r = cadence_gaps(df, cadence_seconds=3600).collect()[0]
        assert r.n_samples == 3 and r.n_gaps == 1
        assert r.missing_slots == (16200 - 3600) * 1_000_000 \
            // 3_600_000_000 - 1 == 2
        assert r.longest_gap_us == 12600 * 1_000_000
        assert r.span_us == 16200 * 1_000_000

    def test_dense_series_reports_clean(self, spark):
        df = _events(spark, [_row(1, "a", i, i * 60, 1) for i in range(10)])
        r = cadence_gaps(df, cadence_seconds=3600).collect()[0]
        assert r.n_gaps == 0 and r.missing_slots == 0

    def test_single_sample_series(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1)])
        r = cadence_gaps(df).collect()[0]
        assert r.n_samples == 1 and r.n_gaps == 0
        assert r.longest_gap_us is None and r.span_us == 0

    def test_rejects_bad_cadence(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1)])
        with pytest.raises(ValueError):
            cadence_gaps(df, cadence_seconds=0)

    def test_single_exchange(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1)])
        plan = formatted_plan(cadence_gaps(df))
        assert n_data_exchanges(plan) == 1, plan


class TestLagCoupling:
    def test_lag_zero_and_one(self, spark):
        # user 1: clicks 2.0@10h, 3.0@11h; views 5.0@10h, 7.0@11h
        rows = [(1, "click", 0, T0, 2.0),
                (1, "click", 1, T0 + dt.timedelta(hours=1), 3.0),
                (1, "view", 2, T0, 5.0),
                (1, "view", 3, T0 + dt.timedelta(hours=1), 7.0)]
        df = _events(spark, rows)
        out = {r.lag: r for r in
               lag_coupling(df, max_lag=1).collect()}
        # lag 0: 2*5 + 3*7 = 31 ; lag 1: a@11h * b@10h = 3*5 = 15
        assert out[0].n_pairs == 2 and out[0].xmoment == 31.0
        assert out[1].n_pairs == 1 and out[1].xmoment == 15.0

    def test_sparse_grid_time_shift_not_row_shift(self, spark):
        # views at 10h and 13h, click at 14h: row-lag-1 would pair the
        # 14h click with the 13h view AND ALSO with 10h at row-lag 2;
        # time-shift must pair lag1 with 13h only and find nothing at lag2
        rows = [(1, "view", 0, T0, 10.0),
                (1, "view", 1, T0 + dt.timedelta(hours=3), 20.0),
                (1, "click", 2, T0 + dt.timedelta(hours=4), 4.0)]
        df = _events(spark, rows)
        out = {r.lag: r for r in lag_coupling(df, max_lag=2).collect()}
        assert 0 not in out
        assert out[1].xmoment == 80.0  # 4 * 20
        assert 2 not in out

    def test_multiple_events_same_bucket_sum_first(self, spark):
        rows = [(1, "click", 0, T0, 1.5), (1, "click", 1, T0, 2.5),
                (1, "view", 2, T0, 4.0)]
        df = _events(spark, rows)
        out = lag_coupling(df, max_lag=0).collect()
        assert out[0].xmoment == 16.0  # (1.5+2.5) * 4

    def test_rejects_bad_args(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1)])
        with pytest.raises(ValueError):
            lag_coupling(df, max_lag=-1)
        with pytest.raises(ValueError):
            lag_coupling(df, bucket="minute")

    def test_day_bucket_calendar_shift(self, spark):
        # day buckets shift by CALENDAR days (DST-safe), joined exactly
        rows = [(1, "view", 0, T0, 6.0),
                (1, "click", 1, T0 + dt.timedelta(days=1), 3.0)]
        df = _events(spark, rows)
        out = {r.lag: r for r in
               lag_coupling(df, max_lag=1, bucket="day").collect()}
        assert out[1].xmoment == 18.0 and out[1].n_pairs == 1


class TestCusumDrift:
    def _textbook(self, xs, k):
        """Sequential reference recurrences the closed form must equal."""
        hi = lo = 0.0
        out = []
        for x in xs:
            hi = max(0.0, hi + (x - k))
            lo = max(0.0, lo - (x - k))
            out.append((hi, lo))
        return out

    def test_matches_textbook_recurrence(self, spark):
        xs = [55, 40, 70, 30, 90, 10, 45, 65, 20, 80]
        df = _events(spark, [_row(1, "a", i, i * 60, x)
                             for i, x in enumerate(xs)])
        got = sorted(cusum_drift(df, target=50.0, threshold=40.0).collect(),
                     key=lambda r: r.id)
        want = self._textbook(xs, 50.0)
        for r, (hi, lo) in zip(got, want):
            assert (r.cusum_hi, r.cusum_lo) == (hi, lo)
            assert r.alarm == int(hi > 40.0 or lo > 40.0)

    def test_resets_after_drift_reverses(self, spark):
        # big positive spike then equal negative: S+ rises then returns to 0
        xs = [150, -50]  # target 50: deltas +100, -100
        df = _events(spark, [_row(1, "a", i, i * 60, x)
                             for i, x in enumerate(xs)])
        got = sorted(cusum_drift(df, target=50.0).collect(),
                     key=lambda r: r.id)
        assert got[0].cusum_hi == 100.0 and got[1].cusum_hi == 0.0

    def test_series_isolated_and_single_exchange(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 500), _row(1, "b", 1, 60, 50)])
        got = {r.event_type: r for r in cusum_drift(df).collect()}
        assert got["a"].cusum_hi == 450.0 and got["b"].cusum_hi == 0.0
        plan = formatted_plan(cusum_drift(df))
        assert n_data_exchanges(plan) == 1, plan


class TestChangepointCusum:
    def _brute(self, xs_cents):
        """Pure-Python-int reference: argmax |n·P_tau − tau·S|, smallest
        tau at ties."""
        n = len(xs_cents)
        p = 0
        s = sum(xs_cents)
        best = None
        for tau, x in enumerate(xs_cents[:-1], start=1):
            p += x
            stat = abs(n * p - tau * s)
            if best is None or stat > best[0]:
                best = (stat, tau, p)
        return best  # (stat, tau, left_cents)

    def test_planted_mean_shift_found(self, spark):
        from tsrollup.counters import changepoint_cusum
        xs = [10.0] * 10 + [90.0] * 10
        df = _events(spark, [_row(1, "a", i, i * 60, x)
                             for i, x in enumerate(xs)])
        r = changepoint_cusum(df).collect()[0]
        assert r.tau == 10 and r.n == 20
        assert r.split_id == 9  # last left-segment sample (0-indexed ids)
        assert (r.left_mean, r.right_mean) == (10.0, 90.0)
        assert (r.left_cents, r.right_cents) == (10_000, 90_000)

    def test_matches_python_int_reference(self, spark):
        from tsrollup.counters import changepoint_cusum
        import random
        rng = random.Random(17)
        xs = [round(rng.uniform(-80, 120), 2) for _ in range(97)]
        df = _events(spark, [_row(3, "z", i, i * 7, x)
                             for i, x in enumerate(xs)])
        r = changepoint_cusum(df).collect()[0]
        stat, tau, left = self._brute([round(x * 100) for x in xs])
        assert (r.stat, r.tau, r.left_cents) == (float(stat), tau, left)

    def test_thirty_random_series_all_match_reference(self, spark):
        """One job, 30 random series of varying length/scale — every
        (stat, tau, left_cents) must equal the Python-int reference,
        including negative values and constant (all-tie) series."""
        from tsrollup.counters import changepoint_cusum
        import random

        rng = random.Random(99)
        rows, want = [], {}
        eid = 0
        for s in range(30):
            n = rng.randint(2, 60)
            if s % 7 == 0:
                xs = [42.0] * n  # constant: stat 0, tau 1
            else:
                xs = [round(rng.uniform(-500, 500), 2) for _ in range(n)]
            for i, x in enumerate(xs):
                rows.append((s, "a", eid, T0 + dt.timedelta(seconds=i * 9),
                             float(x)))
                eid += 1
            want[s] = self._brute([round(x * 100) for x in xs])
        got = {r.user_id: r for r in
               changepoint_cusum(_events(spark, rows)).collect()}
        assert len(got) == 30
        for s, (stat, tau, left) in want.items():
            r = got[s]
            assert (r.stat, r.tau, r.left_cents) == (float(stat), tau,
                                                     left), s

    def test_constant_series_ties_to_smallest_tau(self, spark):
        from tsrollup.counters import changepoint_cusum
        df = _events(spark, [_row(1, "a", i, i * 60, 42.0)
                             for i in range(8)])
        r = changepoint_cusum(df).collect()[0]
        assert r.stat == 0.0 and r.tau == 1

    def test_null_dropped_and_short_series_absent(self, spark):
        from tsrollup.counters import changepoint_cusum
        rows = [_row(1, "a", 0, 0, 10.0), (1, "a", 1, T0, None),
                _row(1, "a", 2, 120, 90.0),
                _row(2, "b", 3, 0, 5.0)]  # n=1 after policy: no candidate
        out = changepoint_cusum(_events(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.user_id, r.n, r.tau) == (1, 2, 1)

    def test_series_isolated_single_exchange(self, spark):
        from tsrollup.counters import changepoint_cusum
        rows = ([_row(1, "a", i, i * 60, 10.0 + 80.0 * (i >= 3))
                 for i in range(6)]
                + [_row(2, "a", 10 + i, i * 60, 50.0 - 40.0 * (i >= 2))
                   for i in range(5)])
        got = {r.user_id: r for r in
               changepoint_cusum(_events(spark, rows)).collect()}
        assert got[1].tau == 3 and got[2].tau == 2
        plan = formatted_plan(changepoint_cusum(_events(spark, rows)))
        assert n_data_exchanges(plan) == 1, plan


class TestCusumEpisodes:
    def test_runs_split_on_non_alarm_samples(self, spark):
        # target 0, threshold 15: S+ spikes to 18 (alarm), bleeds down
        # through 13/8/5 (quiet — the moderate negatives keep S- <= 13,
        # under threshold; a crash-style drop would fire the S- side
        # instead), then climbs to 23/26 (second episode)
        xs = [18, -5, -5, -3, 18, 3]
        df = _events(spark, [_row(1, "a", i, i * 60, x)
                             for i, x in enumerate(xs)])
        eps = sorted(cusum_episodes(df, target=0.0, threshold=15.0)
                     .collect(), key=lambda r: r.episode)
        assert [e.episode for e in eps] == [1, 2]
        assert [e.n_samples for e in eps] == [1, 2]
        assert eps[0].peak_hi == 18.0
        assert eps[1].peak_hi == 26.0
        assert eps[1].duration_us == 60_000_000

    def test_no_alarms_no_rows(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        assert cusum_episodes(df).collect() == []

    def test_single_exchange_composition(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(cusum_episodes(df))
        assert n_data_exchanges(plan) == 1, plan


class TestM4Downsample:
    def test_bucket_stats_exact(self, spark):
        # 8 samples over 70s, 4 buckets: span_us = 70e6, den = 70e6 + 1
        rows = [_row(1, "a", i, i * 10, v)
                for i, v in enumerate([5, 3, 9, 1, 7, 7, 2, 8])]
        df = _events(spark, rows)
        out = {r.bucket: r for r in m4_downsample(df, n_buckets=4).collect()}
        assert sorted(out) == [0, 1, 2, 3]
        b0 = out[0]  # samples at 0s,10s: values 5,3
        assert (b0.n, b0.v_first, b0.v_last, b0.v_min, b0.v_max) == \
            (2, 5.0, 3.0, 3.0, 5.0)
        b3 = out[3]  # samples at 60s,70s: values 2,8
        assert (b3.n, b3.v_first, b3.v_last, b3.v_min, b3.v_max) == \
            (2, 2.0, 8.0, 2.0, 8.0)

    def test_last_sample_lands_in_last_bucket(self, spark):
        # the max-ts sample must land in bucket n-1, not overflow to n
        # (hence the span+1 denominator)
        rows = [_row(1, "a", i, i, float(i)) for i in range(100)]
        df = _events(spark, rows)
        out = m4_downsample(df, n_buckets=10).collect()
        assert max(r.bucket for r in out) == 9
        assert sum(r.n for r in out) == 100

    def test_tie_break_by_id(self, spark):
        # two samples at the identical timestamp: first/last pinned by id
        df = _events(spark, [_row(1, "a", 2, 0, 20.0), _row(1, "a", 1, 0, 10.0)])
        r = m4_downsample(df, n_buckets=1).collect()[0]
        assert r.v_first == 10.0 and r.v_last == 20.0

    def test_constant_series_single_bucket(self, spark):
        # span 0 => den 1, every sample buckets to 0
        df = _events(spark, [_row(1, "a", i, 0, float(i)) for i in range(3)])
        out = m4_downsample(df, n_buckets=64).collect()
        assert len(out) == 1 and out[0].n == 3

    def test_rejects_non_positive_buckets(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        with pytest.raises(ValueError):
            m4_downsample(df, n_buckets=0)

    def test_single_exchange_plan(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(m4_downsample(df))
        assert n_data_exchanges(plan) == 1, plan


class TestTimeWeightedAvg:
    def test_hand_computed_locf_integral(self, spark):
        from tsrollup.counters import time_weighted_avg
        # v=10 held 60s, v=40 held 180s, last sample holds nothing:
        # twa = (10*60 + 40*180) / 240 = 32.5
        df = _events(spark, [_row(1, "a", 0, 0, 10), _row(1, "a", 1, 60, 40),
                             _row(1, "a", 2, 240, 99)])
        r = time_weighted_avg(df).collect()[0]
        assert r.n_samples == 3
        assert r.held_us == 240_000_000
        assert r.twa == (10 * 60 + 40 * 180) / 240
        assert r.vw_sum == 10.0 * 60 + 40 * 180

    def test_burst_does_not_overweight(self, spark):
        from tsrollup.counters import time_weighted_avg
        # 10 held for 100s, then a burst of 5 samples of 90 held 1s each,
        # then the terminal sample: plain avg would be ~76, twa stays low
        rows = [_row(1, "a", 0, 0, 10)]
        rows += [_row(1, "a", i, 100 + (i - 1), 90) for i in range(1, 6)]
        rows.append(_row(1, "a", 9, 105, 0))
        r = time_weighted_avg(df := _events(spark, rows)).collect()[0]
        assert r.twa == (10 * 100 + 90 * 5) / 105

    def test_last_sample_only_bucket_emits_null(self, spark):
        from tsrollup.counters import time_weighted_avg
        df = _events(spark, [_row(1, "a", 0, 0, 5)])
        r = time_weighted_avg(df).collect()[0]
        assert r.n_samples == 1 and r.held_us == 0
        assert r.twa is None and r.vw_sum is None

    def test_segment_attributed_to_left_endpoint_bucket(self, spark):
        from tsrollup.counters import time_weighted_avg
        # sample at 10:59 holds 120s across the hour edge: the whole
        # segment belongs to hour 10 (the holder's bucket)
        df = _events(spark, [_row(1, "a", 0, 59 * 60, 7.0),
                             _row(1, "a", 1, 61 * 60, 3.0)])
        out = {r.bucket_ts.hour: r for r in time_weighted_avg(df).collect()}
        assert out[10].held_us == 120_000_000 and out[10].twa == 7.0
        assert out[11].held_us == 0 and out[11].twa is None

    def test_bucket_validation(self, spark):
        from tsrollup.counters import time_weighted_avg
        import pytest as _pytest
        with _pytest.raises(ValueError):
            time_weighted_avg(_events(spark, []), bucket="fortnight")


class TestGridGapfill:
    def test_missing_buckets_materialize_with_locf(self, spark):
        from tsrollup.counters import grid_gapfill
        # samples in hours 10 and 13 -> hours 11, 12 materialize as gaps
        df = _events(spark, [_row(1, "a", 0, 0, 7.0),
                             _row(1, "a", 1, 3 * 3600, 9.0)])
        out = {r.bucket_ts.hour: r for r in grid_gapfill(df).collect()}
        assert sorted(out) == [10, 11, 12, 13]
        assert (out[11].is_gap, out[12].is_gap) == (1, 1)
        assert out[11].n_samples == 0 and out[11].sum_value is None
        assert out[11].locf_value == 7.0 and out[12].locf_value == 7.0
        assert out[13].locf_value == 9.0 and out[13].is_gap == 0

    def test_last_in_bucket_pinned_by_ts_then_id(self, spark):
        from tsrollup.counters import grid_gapfill
        # two samples in hour 10, later ts wins; tie on ts -> higher id
        df = _events(spark, [_row(1, "a", 0, 0, 1.0),
                             _row(1, "a", 1, 30 * 60, 2.0),
                             _row(1, "a", 2, 30 * 60, 3.0),
                             _row(1, "a", 3, 3600, 9.0)])
        out = {r.bucket_ts.hour: r for r in grid_gapfill(df).collect()}
        assert out[10].locf_value == 3.0
        assert out[10].sum_value == 6.0
        assert out[10].n_samples == 3

    def test_series_are_independent(self, spark):
        from tsrollup.counters import grid_gapfill
        df = _events(spark, [_row(1, "a", 0, 0, 5.0),
                             _row(2, "a", 1, 2 * 3600, 8.0)])
        rows = grid_gapfill(df).collect()
        assert {(r.user_id, r.bucket_ts.hour) for r in rows} == \
            {(1, 10), (2, 12)}

    def test_linear_interpolation_between_observed_buckets(self, spark):
        from tsrollup.counters import grid_gapfill
        # observed 7.0 @ 10h and 10.0 @ 13h: the two gap hours
        # interpolate to 8.0 and 9.0; observed rows equal themselves
        df = _events(spark, [_row(1, "a", 0, 0, 7.0),
                             _row(1, "a", 1, 3 * 3600, 10.0)])
        out = {r.bucket_ts.hour: r for r in grid_gapfill(df).collect()}
        assert out[10].interp_value == 7.0
        assert out[11].interp_value == 8.0
        assert out[12].interp_value == 9.0
        assert out[13].interp_value == 10.0
        # LOCF carries flat while interp ramps — the two modes differ
        assert out[11].locf_value == 7.0 and out[12].locf_value == 7.0

    def test_interp_uses_last_sample_of_anchor_bucket(self, spark):
        from tsrollup.counters import grid_gapfill
        # hour 10 holds samples 1.0 then 4.0 (last wins as the anchor);
        # hour 12 holds 8.0 -> the hour-11 gap interpolates to 6.0
        df = _events(spark, [_row(1, "a", 0, 0, 1.0),
                             _row(1, "a", 1, 1800, 4.0),
                             _row(1, "a", 2, 2 * 3600, 8.0)])
        out = {r.bucket_ts.hour: r for r in grid_gapfill(df).collect()}
        assert out[11].interp_value == 6.0

    def test_single_sample_single_bucket(self, spark):
        from tsrollup.counters import grid_gapfill
        r = grid_gapfill(_events(spark, [_row(1, "a", 0, 0, 4.0)])).collect()
        assert len(r) == 1 and r[0].is_gap == 0 and r[0].locf_value == 4.0

    def test_bucket_validation(self, spark):
        from tsrollup.counters import grid_gapfill
        import pytest as _pytest
        with _pytest.raises(ValueError):
            grid_gapfill(_events(spark, []), bucket="fortnight")

    def test_one_raw_exchange(self, spark):
        from tsrollup.counters import grid_gapfill
        from tsrollup.planaudit import formatted_plan, count_op
        df = _events(spark, [_row(1, "a", 0, 0, 4.0)])
        plan = formatted_plan(grid_gapfill(df))
        # no per-group python, no cartesian
        assert count_op(plan, "FlatMapGroupsInPandas") == 0
        assert count_op(plan, "CartesianProduct") == 0


class TestBurnRate:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_type string, event_id long, "
                  "ts timestamp, value double")

    def test_both_windows_must_fire(self, spark):
        from tsrollup.counters import burn_rate
        # hour 10: 5 errors / 5 events (burn 10); rest of the day clean
        # enough that the day burn stays under threshold -> NO alert
        rows = [_row(1, "error", i, i, 1.0) for i in range(5)]
        rows += [_row(1, "view", 100 + i, 3 * 3600 + i, 1.0)
                 for i in range(95)]
        out = {r.hour_ts.hour: r for r in
               burn_rate(self._ev(spark, rows), budget=0.1,
                         threshold=2.0).collect()}
        h10 = out[10]
        assert h10.burn_short == 10.0
        assert h10.day_err == 5 and h10.day_n == 100
        assert h10.burn_long == 0.5  # 5% / 10%
        assert h10.alert == 0  # long window vetoes

    def test_sustained_burn_alerts(self, spark):
        from tsrollup.counters import burn_rate
        # every hour 50% errors all day: both windows burn at 5x
        rows = []
        for h in range(4):
            rows += [_row(1, "error", h * 100 + i, h * 3600 + i, 1.0)
                     for i in range(2)]
            rows += [_row(1, "view", h * 100 + 50 + i, h * 3600 + 60 + i,
                          1.0) for i in range(2)]
        out = burn_rate(self._ev(spark, rows), budget=0.1,
                        threshold=2.0).collect()
        assert all(r.burn_short == 5.0 and r.burn_long == 5.0
                   and r.alert == 1 for r in out)

    def test_budget_validation(self, spark):
        from tsrollup.counters import burn_rate
        import pytest as _pytest
        with _pytest.raises(ValueError):
            burn_rate(self._ev(spark, []), budget=0.0)

    def test_day_totals_reaggregate_from_hourly(self, spark):
        from tsrollup.counters import burn_rate
        from tsrollup.planaudit import formatted_plan
        plan = formatted_plan(burn_rate(self._ev(spark, [])))
        # exactly ONE scan of the raw events relation in the plan
        import re
        scans = re.findall(r"^\(\d+\) Scan ExistingRDD", plan, re.M)
        assert len(scans) == 1, plan


class TestTrendSlope:
    def test_linear_ramp_recovers_slope(self, spark):
        from tsrollup.counters import trend_slope
        # y = 10·(x+1) value units per hour => 1000 cents/bucket slope,
        # intercept 1000 cents
        df = _events(spark, [_row(1, "a", i, i * 3600, 10.0 * (i + 1))
                             for i in range(5)])
        r = trend_slope(df).collect()[0]
        assert r.n_buckets == 5 and r.x_last == 4
        assert r.slope_cents_per_bucket == 1000.0
        assert r.intercept_cents == 1000.0

    def test_missing_buckets_keep_time_aware_x(self, spark):
        from tsrollup.counters import trend_slope
        # samples at hours 0 and 4 (3 missing buckets): the x values must
        # be 0 and 4, not 0 and 1 — slope = (4000-1000)/4 = 750 cents/bucket
        df = _events(spark, [_row(1, "a", 0, 0, 10.0),
                             _row(1, "a", 1, 4 * 3600, 40.0)])
        r = trend_slope(df).collect()[0]
        assert r.x_last == 4
        assert r.slope_cents_per_bucket == 750.0

    def test_same_bucket_samples_sum_first(self, spark):
        from tsrollup.counters import trend_slope
        # two samples inside hour 0 aggregate to one grid point
        df = _events(spark, [_row(1, "a", 0, 0, 1.0),
                             _row(1, "a", 1, 60, 2.0),
                             _row(1, "a", 2, 3600, 6.0)])
        r = trend_slope(df).collect()[0]
        assert r.n_buckets == 2
        # y: 300, 600 cents at x 0, 1
        assert r.slope_cents_per_bucket == 300.0 and r.intercept_cents == 300.0

    def test_single_bucket_series_yields_null(self, spark):
        from tsrollup.counters import trend_slope
        df = _events(spark, [_row(1, "a", 0, 0, 7.0)])
        r = trend_slope(df).collect()[0]
        assert r.slope_den == 0.0
        assert r.slope_cents_per_bucket is None
        assert r.intercept_cents is None

    def test_flat_series_zero_slope(self, spark):
        from tsrollup.counters import trend_slope
        df = _events(spark, [_row(1, "a", i, i * 3600, 5.0)
                             for i in range(4)])
        r = trend_slope(df).collect()[0]
        assert r.slope_cents_per_bucket == 0.0
        assert r.intercept_cents == 500.0

    def test_rejects_bad_bucket(self, spark):
        from tsrollup.counters import trend_slope
        with pytest.raises(ValueError):
            trend_slope(_events(spark, []), bucket="week")

    def test_two_exchanges_raw_then_grid(self, spark):
        from tsrollup.counters import trend_slope
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(trend_slope(df))
        # raw→grid aggregation plus the grid-grain series exchange shared
        # by the min-bucket window and the final regroup
        assert n_data_exchanges(plan) == 2, plan


class TestSeasonalBaseline:
    def test_profile_and_anomaly_flags(self, spark):
        from tsrollup.counters import seasonal_baseline
        # hod 10 cell: values 10, 10, 40 => mean 20; tol 1/2 flags
        # |v-20| > 10: the 40 only
        rows = [_row(1, "a", 0, 0, 10.0), _row(1, "a", 1, 60, 10.0),
                _row(1, "a", 2, 120, 40.0)]
        r = seasonal_baseline(_events(spark, rows),
                              series_cols=("user_id",)).collect()[0]
        assert r.hod == 10 and r.n_samples == 3
        assert r.mean_value == 20.0
        assert r.n_anom == 1 and r.anom_rate == 1.0 / 3.0

    def test_threshold_is_strict(self, spark):
        from tsrollup.counters import seasonal_baseline
        # values 10, 30: mean 20, band is ±10 — both sit EXACTLY on the
        # edge, and the strictly-greater test must not flag either
        rows = [_row(1, "a", 0, 0, 10.0), _row(1, "a", 1, 60, 30.0)]
        r = seasonal_baseline(_events(spark, rows),
                              series_cols=("user_id",)).collect()[0]
        assert r.n_anom == 0

    def test_cells_are_independent(self, spark):
        from tsrollup.counters import seasonal_baseline
        # a value normal at hod 11 but twice the hod-10 mean is only
        # judged against its own hour's cell
        rows = [_row(1, "a", 0, 0, 10.0), _row(1, "a", 1, 60, 10.0),
                _row(1, "a", 2, 3600, 20.0), _row(1, "a", 3, 3660, 20.0)]
        out = {r.hod: r for r in
               seasonal_baseline(_events(spark, rows),
                                 series_cols=("user_id",)).collect()}
        assert out[10].n_anom == 0 and out[11].n_anom == 0

    def test_rejects_bad_tolerance(self, spark):
        from tsrollup.counters import seasonal_baseline
        with pytest.raises(ValueError):
            seasonal_baseline(_events(spark, []), tol_den=0)
        with pytest.raises(ValueError):
            seasonal_baseline(_events(spark, []), tol_num=-1)

    def test_single_exchange(self, spark):
        from tsrollup.counters import seasonal_baseline
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(seasonal_baseline(df))
        assert n_data_exchanges(plan) == 1, plan


class TestHistogramQuantile:
    def _hq(self, spark, values, num, den, **kw):
        from tsrollup.counters import histogram_quantile
        rows = [_row(1, "a", i, i, v) for i, v in enumerate(values)]
        return histogram_quantile(_events(spark, rows), num, den,
                                  series_cols=("event_type",), **kw)

    def test_interpolates_inside_crossing_bucket(self, spark):
        # values 10..100: ladder buckets hold 2 / 3 / 5 samples; rank
        # 0.9·10 = 9 crosses in the (50, 100] bucket at
        # 50 + 50·(9−5)/5 = 90 value units
        out = self._hq(spark, [10.0 * (i + 1) for i in range(10)],
                       9, 10).collect()[0]
        assert out.bucket_idx == 2 and out.total_n == 10
        assert out.qvalue == 90.0 and out.bucket_le == 100.0

    def test_boundary_rank_picks_lower_bucket(self, spark):
        # rank exactly equal to a cumulative edge: cum·den >= num·total
        # must accept the bucket whose cum EQUALS the rank (float rank
        # would tip either way) — 4 samples, q=1/2, first bucket holds
        # exactly 2
        out = self._hq(spark, [10.0, 20.0, 60.0, 70.0], 1, 2).collect()[0]
        assert out.bucket_idx == 0
        assert out.qvalue == 25.0  # 0 + 25·(2-0)/2

    def test_inf_bucket_returns_highest_finite_bound(self, spark):
        out = self._hq(spark, [5000.0] * 4, 9, 10).collect()[0]
        assert out.bucket_le is None and out.qvalue == 800.0

    def test_first_bucket_interpolates_from_zero(self, spark):
        out = self._hq(spark, [10.0, 20.0], 1, 2).collect()[0]
        assert out.qvalue == 12.5

    def test_empty_ladder_buckets_shift_nothing(self, spark):
        # same distribution twice, once with a value forcing an extra
        # sparse bucket below the crossing — crossing math is identical
        a = self._hq(spark, [60.0] * 9 + [10.0], 9, 10).collect()[0]
        b = self._hq(spark, [60.0] * 9 + [30.0], 9, 10).collect()[0]
        assert a.qvalue == b.qvalue and a.bucket_idx == b.bucket_idx

    def test_q1_lands_in_last_nonempty_bucket(self, spark):
        out = self._hq(spark, [10.0, 60.0], 1, 1).collect()[0]
        assert out.bucket_idx == 2 and out.qvalue == 100.0

    def test_validation(self, spark):
        from tsrollup.counters import histogram_quantile
        df = _events(spark, [])
        with pytest.raises(ValueError):
            histogram_quantile(df, 0, 10)
        with pytest.raises(ValueError):
            histogram_quantile(df, 11, 10)
        with pytest.raises(ValueError):
            histogram_quantile(df, 1, 2, le_cents=(100, 100))
        with pytest.raises(ValueError):
            histogram_quantile(df, 1, 2, le_cents=())

    def test_one_raw_exchange(self, spark):
        from tsrollup.counters import histogram_quantile
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(histogram_quantile(df))
        # raw→(series, bucket) count, plus the ladder-grain series window
        assert n_data_exchanges(plan) == 2, plan


class TestHampelFilter:
    def _hf(self, spark, values, **kw):
        from tsrollup.counters import hampel_filter
        rows = [_row(1, "a", i, i, v) for i, v in enumerate(values)]
        return sorted(hampel_filter(_events(spark, rows), **kw).collect(),
                      key=lambda r: r.id)

    def test_flags_and_replaces_single_spike(self, spark):
        out = self._hf(spark, [10.0, 10.0, 10.0, 500.0, 10.0, 10.0, 10.0])
        assert [r.is_spike for r in out] == [0, 0, 0, 1, 0, 0, 0]
        spike = out[3]
        assert spike.med == 10.0 and spike.filtered == 10.0
        assert out[0].filtered == 10.0  # edge row untouched

    def test_matches_numpy_rolling_median_mad(self, spark):
        import random

        import numpy as np
        random.seed(5)
        vals = [round(random.uniform(0, 100), 2) for _ in range(60)]
        got = self._hf(spark, vals, half_window=3)
        c = np.round(np.array(vals) * 100).astype(np.int64)
        for i, r in enumerate(got):
            w = c[max(0, i - 3):i + 4]
            med = np.median(w)
            mad = np.median(np.abs(w - med))
            assert r.med == med / 100 and r.mad == mad / 100
            assert r.is_spike == int(abs(c[i] - med) > 3 * mad)

    def test_even_window_median_is_exact(self, spark):
        # edge row 0 with half_window=1 sees [v0, v1]: median must be the
        # exact midpoint 15.005, not a float-accumulated approximation
        out = self._hf(spark, [10.0, 20.01, 10.0], half_window=1)
        assert out[0].med == (1000 + 2001) / 200

    def test_level_shift_not_rewritten(self, spark):
        # a genuine regime change: after the shift the window median
        # follows, so later samples must NOT be flagged
        out = self._hf(spark, [10.0, 10.0, 10.0, 50.0, 50.0, 50.0, 50.0])
        assert sum(r.is_spike for r in out) <= 2
        assert all(r.is_spike == 0 for r in out[4:])

    def test_validation(self, spark):
        from tsrollup.counters import hampel_filter
        df = _events(spark, [])
        with pytest.raises(ValueError):
            hampel_filter(df, half_window=0)
        with pytest.raises(ValueError):
            hampel_filter(df, k_den=0)

    def test_single_exchange_no_python(self, spark):
        from tsrollup.counters import hampel_filter
        from tsrollup.planaudit import count_op
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(hampel_filter(df))
        assert n_data_exchanges(plan) == 1, plan
        assert count_op(plan, "FlatMapGroupsInPandas") == 0
        assert count_op(plan, "MapInPandas") == 0


class TestPeriodOverPeriod:
    def test_same_hour_yesterday(self, spark):
        from tsrollup.counters import period_over_period
        # day 1 hour 10: 10.00 ; day 2 hour 10: 25.00 -> ratio 2.5
        import datetime as dt
        rows = [_row(1, "a", 0, 0, 10.0),
                (1, "a", 1, T0 + dt.timedelta(days=1), 25.0)]
        out = sorted(period_over_period(self_ev(spark, rows),
                                        series_cols=("user_id",)).collect(),
                     key=lambda r: r.bucket_ts)
        assert out[0].prev_cents is None and out[0].ratio is None
        assert out[1].prev_cents == 1000 and out[1].delta_cents == 1500
        assert out[1].ratio == 2.5

    def test_missing_prior_bucket_is_null_not_rowlag(self, spark):
        from tsrollup.counters import period_over_period
        import datetime as dt
        # buckets at day 1 h10 and day 3 h10: a row-lag would pair them;
        # the calendar shift must leave day 3 without a prior
        rows = [_row(1, "a", 0, 0, 10.0),
                (1, "a", 1, T0 + dt.timedelta(days=2), 30.0)]
        out = sorted(period_over_period(self_ev(spark, rows),
                                        series_cols=("user_id",)).collect(),
                     key=lambda r: r.bucket_ts)
        assert out[1].prev_cents is None and out[1].ratio is None

    def test_zero_prior_guards_ratio(self, spark):
        from tsrollup.counters import period_over_period
        import datetime as dt
        rows = [_row(1, "a", 0, 0, 0.0),
                (1, "a", 1, T0 + dt.timedelta(days=1), 5.0)]
        out = sorted(period_over_period(self_ev(spark, rows),
                                        series_cols=("user_id",)).collect(),
                     key=lambda r: r.bucket_ts)
        assert out[1].prev_cents == 0 and out[1].delta_cents == 500
        assert out[1].ratio is None

    def test_week_period(self, spark):
        from tsrollup.counters import period_over_period
        import datetime as dt
        rows = [_row(1, "a", 0, 0, 10.0),
                (1, "a", 1, T0 + dt.timedelta(days=7), 15.0)]
        out = sorted(period_over_period(self_ev(spark, rows),
                                        series_cols=("user_id",),
                                        period_days=7).collect(),
                     key=lambda r: r.bucket_ts)
        assert out[1].ratio == 1.5

    def test_validation(self, spark):
        from tsrollup.counters import period_over_period
        with pytest.raises(ValueError):
            period_over_period(self_ev(spark, []), bucket="week")
        with pytest.raises(ValueError):
            period_over_period(self_ev(spark, []), period_days=0)

    def test_one_raw_exchange(self, spark):
        from tsrollup.counters import period_over_period
        from tsrollup.planaudit import count_op
        plan = formatted_plan(period_over_period(
            self_ev(spark, [_row(1, "a", 0, 0, 1.0)])))
        assert count_op(plan, "CartesianProduct") == 0
        assert count_op(plan, "FlatMapGroupsInPandas") == 0


def self_ev(spark, rows):
    return _events(spark, rows)


class TestNullValueHandling:
    def test_hampel_drops_null_samples(self, spark):
        from tsrollup.counters import hampel_filter
        rows = [_row(1, "a", 0, 0, 10.0), (1, "a", 1,
                T0 + __import__("datetime").timedelta(seconds=1), None),
                _row(1, "a", 2, 2, 10.0)]
        out = hampel_filter(_events(spark, rows)).collect()
        # the NULL sample is no observation: dropped, not imputed, and it
        # must not poison its neighbors' windows
        assert len(out) == 2 and all(r.med == 10.0 for r in out)

    def test_histogram_quantile_ignores_null_samples(self, spark):
        from tsrollup.counters import histogram_quantile
        import datetime as dt
        rows = [_row(1, "a", 0, 0, 10.0),
                (1, "a", 1, T0 + dt.timedelta(seconds=1), None)]
        r = histogram_quantile(_events(spark, rows), 1, 1,
                               series_cols=("event_type",)).collect()[0]
        # without the filter the NULL would land in the +Inf bucket and
        # shift the rank
        assert r.total_n == 1


class TestReviewNullFindings:
    """Round-5 review findings: NULL samples corrupted four operators."""

    def test_seasonal_baseline_null_does_not_flag_real_sample(self, spark):
        from tsrollup.counters import seasonal_baseline
        rows = [_row(1, "a", 0, 0, 30.0),
                (1, "a", 1, T0, None)]
        r = seasonal_baseline(_events(spark, rows),
                              series_cols=("user_id",)).collect()[0]
        # the cell's only real sample IS its mean — never anomalous
        assert r.n_samples == 1 and r.mean_value == 30.0 and r.n_anom == 0

    def test_trend_slope_all_null_bucket_fabricates_nothing(self, spark):
        from tsrollup.counters import trend_slope
        import datetime as dt
        rows = [_row(1, "a", 0, 0, 10.0),
                (1, "a", 1, T0 + dt.timedelta(hours=1), None)]
        r = trend_slope(_events(spark, rows)).collect()[0]
        # one real bucket: NULL slope, not a fabricated -1000 downtrend
        assert r.n_buckets == 1 and r.slope_cents_per_bucket is None

    def test_period_over_period_skips_all_null_buckets(self, spark):
        from tsrollup.counters import period_over_period
        import datetime as dt
        rows = [(1, "a", 0, T0, None),
                _row(1, "a", 1, 24 * 3600, 5.0)]
        out = period_over_period(self_ev(spark, rows),
                                 series_cols=("user_id",)).collect()
        assert len(out) == 1 and out[0].prev_cents is None

    def test_cusum_drift_drops_null_samples(self, spark):
        from tsrollup.counters import cusum_drift
        rows = [_row(1, "a", 0, 0, 60.0), (1, "a", 1, T0, None),
                _row(1, "a", 2, 2, 60.0)]
        out = cusum_drift(_events(spark, rows), target=50.0).collect()
        assert len(out) == 2
        assert sorted(r.cusum_hi for r in out) == [10.0, 20.0]


class TestTrendSlopeDayBucket:
    def test_day_bucket_uses_calendar_index(self, spark):
        from tsrollup.counters import trend_slope
        import datetime as dt
        # days 0, 1, 3 (day 2 missing): x must be 0, 1, 3
        rows = [(1, "a", i, T0 + dt.timedelta(days=d), 10.0 * (d + 1))
                for i, d in enumerate((0, 1, 3))]
        df = _events(spark, rows)
        r = trend_slope(df, bucket="day").collect()[0]
        assert r.n_buckets == 3 and r.x_last == 3
        # y = 1000·(x+1) on the calendar index -> slope exactly 1000
        assert r.slope_cents_per_bucket == 1000.0


class TestLastPoint:
    def test_hand_built_series(self, spark):
        from tsrollup.counters import last_point

        rows = [_row(1, "a", 0, 0, 10.0), _row(1, "a", 1, 60, 30.0),
                _row(1, "a", 2, 120, 25.5)]
        r = last_point(_events(spark, rows)).collect()[0]
        assert (r.n, r.first_value, r.last_value) == (3, 10.0, 25.5)
        assert r.delta_cents == 1550
        assert r.first_ts == T0 and r.last_ts == T0 + dt.timedelta(seconds=120)

    def test_same_ts_tie_breaks_by_id(self, spark):
        from tsrollup.counters import last_point

        rows = [_row(1, "a", 5, 0, 10.0), _row(1, "a", 7, 0, 99.0),
                _row(1, "a", 6, 0, 50.0)]  # all the same timestamp
        r = last_point(_events(spark, rows)).collect()[0]
        assert r.first_value == 10.0 and r.last_value == 99.0

    def test_null_values_skipped(self, spark):
        from tsrollup.counters import last_point

        rows = [_row(1, "a", 0, 0, 10.0), (1, "a", 1, T0 +
                dt.timedelta(seconds=60), None)]
        r = last_point(_events(spark, rows)).collect()[0]
        assert r.n == 1 and r.last_value == 10.0

    def test_single_exchange_partial_agg(self, spark):
        from tsrollup.counters import last_point

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(last_point(df))
        assert n_data_exchanges(plan) == 1, plan
        # struct extremes plan as SortAggregate (no hash-agg buffer for
        # structs) — the scalable property is partial + final around ONE
        # exchange, i.e. map-side combine before any shuffle
        # tree section lists "SortAggregate (<id>)" once per node:
        # exactly two nodes = partial + final
        assert plan.count("SortAggregate (") == 2, plan


class TestTimeBucketAgg:
    def test_five_minute_buckets_epoch_aligned(self, spark):
        from tsrollup.counters import time_bucket_agg

        # T0 = 10:00:00 -> samples at 10:02, 10:04 share one bucket;
        # 10:06 lands in the next (epoch-aligned 300 s grid)
        df = _events(spark, [_row(1, "a", 0, 120, 10.0),
                             _row(1, "a", 1, 240, 20.0),
                             _row(1, "a", 2, 360, 40.0)])
        out = {r.bucket_ts.minute: r for r in
               time_bucket_agg(df, width_seconds=300).collect()}
        assert sorted(out) == [0, 5]
        r = out[0]
        assert (r.n, r.sum_value, r.min_value, r.max_value) \
            == (2, 30.0, 10.0, 20.0)
        assert r.mean_value == 15.0
        assert out[5].n == 1 and out[5].sum_value == 40.0

    def test_odd_width_not_expressible_by_date_trunc(self, spark):
        from tsrollup.counters import time_bucket_agg

        # 90-second buckets: 10:00:00 epoch has seconds 36000*... just
        # verify two samples 89 s apart share a bucket iff aligned
        df = _events(spark, [_row(1, "a", 0, 0, 1.0),
                             _row(1, "a", 1, 89, 2.0),
                             _row(1, "a", 2, 91, 3.0)])
        out = time_bucket_agg(df, width_seconds=90).collect()
        by_n = sorted(r.n for r in out)
        assert len(out) == 2 and by_n == [1, 2]

    def test_validation_and_null_policy(self, spark):
        from tsrollup.counters import time_bucket_agg
        import pytest as _pytest

        with _pytest.raises(ValueError):
            time_bucket_agg(_events(spark, []), width_seconds=0)
        rows = [_row(1, "a", 0, 0, 5.0), (1, "a", 1, T0, None)]
        out = time_bucket_agg(_events(spark, rows)).collect()
        assert len(out) == 1 and out[0].n == 1

    def test_single_exchange(self, spark):
        from tsrollup.counters import time_bucket_agg

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(time_bucket_agg(df))
        assert n_data_exchanges(plan) == 1, plan


class TestFeatureTable:
    def test_wide_alignment_and_absence_semantics(self, spark):
        from tsrollup.counters import feature_table

        rows = [(1, "click", 0, T0, 2.0), (1, "click", 1, T0, 3.0),
                (1, "view", 2, T0, 7.0),
                (1, "signup", 3, T0, 1.0)]  # unlisted type: n_total only
        df = _events(spark, rows)
        r = feature_table(df, types=("click", "view", "purchase")) \
            .collect()[0]
        assert r.n_total == 4
        assert (r.n_click, r.sum_click) == (2, 5.0)
        assert (r.n_view, r.sum_view) == (1, 7.0)
        assert r.n_purchase == 0 and r.sum_purchase is None  # absence

    def test_validation(self, spark):
        from tsrollup.counters import feature_table
        import pytest as _pytest

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        with _pytest.raises(ValueError):
            feature_table(df, types=())
        with _pytest.raises(ValueError):
            feature_table(df, types=("a", "a"))
        with _pytest.raises(ValueError):
            feature_table(df, bucket="week")

    def test_single_exchange(self, spark):
        from tsrollup.counters import feature_table

        df = _events(spark, [_row(1, "click", 0, 0, 1.0)])
        plan = formatted_plan(feature_table(df))
        assert n_data_exchanges(plan) == 1, plan


class TestBucketedTwa:
    def test_segment_splits_across_buckets(self, spark):
        from tsrollup.counters import bucketed_twa

        # value 10 held from t=30s for 60s with 60s buckets: 30s in
        # bucket 0, 30s in bucket 1; then 20 held 30s in bucket 1
        df = _events(spark, [_row(1, "a", 0, 30, 10.0),
                             _row(1, "a", 1, 90, 20.0),
                             _row(1, "a", 2, 120, 5.0)])
        out = {r.bucket_ts.minute: r
               for r in bucketed_twa(df, bucket_seconds=60).collect()}
        assert out[0].held_us == 30_000_000 and out[0].twa == 10.0
        b1 = out[1]
        assert b1.held_us == 60_000_000 and b1.n_slices == 2
        # 30s@10 + 30s@20 -> twa 15
        assert b1.twa == 15.0
        assert b1.vw_cents_us == 1000 * 30_000_000 + 2000 * 30_000_000

    def test_long_gap_fills_intermediate_buckets(self, spark):
        from tsrollup.counters import bucketed_twa

        # one value held 5 full minutes: every intermediate bucket gets a
        # full-width slice (the interpolated-boundary semantics)
        df = _events(spark, [_row(1, "a", 0, 0, 7.0),
                             _row(1, "a", 1, 300, 9.0)])
        rows = bucketed_twa(df, bucket_seconds=60).collect()
        assert len(rows) == 5
        assert all(r.held_us == 60_000_000 and r.twa == 7.0 for r in rows)

    def test_final_sample_holds_nothing(self, spark):
        from tsrollup.counters import bucketed_twa

        df = _events(spark, [_row(1, "a", 0, 0, 7.0)])
        assert bucketed_twa(df, bucket_seconds=60).count() == 0

    def test_one_exchange(self, spark):
        from tsrollup.counters import bucketed_twa

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(bucketed_twa(df, bucket_seconds=60))
        assert n_data_exchanges(plan) == 1


class TestTopnOthers:
    def test_collapses_tail_into_other(self, spark):
        from tsrollup.counters import topn_others

        rows = []
        # five labels with distinct volumes in one hour
        for i, (lbl, v) in enumerate([("a", 50), ("b", 40), ("c", 30),
                                      ("d", 20), ("e", 10)]):
            rows.append((1, lbl, i, T0, float(v)))
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, event_id long, "
                  "ts timestamp, value double")
        got = {r.label: r for r in topn_others(df, n=3).collect()}
        assert set(got) == {"a", "b", "c", "__other__"}
        other = got["__other__"]
        assert other.n_series == 2 and other.volume_cents == 3000
        assert got["a"].n_series == 1 and got["a"].volume_cents == 5000

    def test_tie_breaks_by_label(self, spark):
        from tsrollup.counters import topn_others

        # b and c tie on volume with n=1: b (label-asc) wins the slot
        df = _events(spark, [_row(1, "c", 0, 0, 5.0),
                             _row(1, "b", 1, 0, 5.0),
                             _row(1, "a", 2, 0, 9.0)])
        got = {r.label for r in topn_others(df, n=2).collect()}
        assert got == {"a", "b", "__other__"}

    def test_two_exchanges(self, spark):
        from tsrollup.counters import topn_others

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        plan = formatted_plan(topn_others(df))
        assert n_data_exchanges(plan) == 2


class TestReviewRegressionsR5b:
    def test_bucketed_twa_drops_pre_epoch_samples(self, spark):
        from tsrollup.counters import bucketed_twa

        pre = dt.datetime(1969, 12, 31, 23, 0, 0)
        df = spark.createDataFrame(
            [(1, "a", 0, pre, 5.0),
             (1, "a", 1, pre + dt.timedelta(minutes=30), 7.0),
             (1, "a", 2, dt.datetime(1970, 1, 1, 0, 30), 9.0),
             (1, "a", 3, dt.datetime(1970, 1, 1, 1, 30), 9.0)],
            "user_id long, event_type string, event_id long, "
            "ts timestamp, value double")
        rows = bucketed_twa(df, bucket_seconds=3600).collect()
        # pre-epoch samples are out of axis; the surviving segment is
        # [00:30, 01:30) at 9.0 split over two hourly buckets
        assert all(r.held_us >= 0 for r in rows)
        assert sum(r.held_us for r in rows) == 3600_000_000
        assert {r.twa for r in rows} == {9.0}

    def test_topn_others_rejects_bad_bucket(self, spark):
        import pytest as _pytest

        from tsrollup.counters import topn_others

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        with _pytest.raises(ValueError):
            topn_others(df, bucket="hourly")

    def test_topn_others_ignores_null_labels(self, spark):
        from tsrollup.counters import topn_others

        df = _events(spark, [_row(1, None, 0, 0, 99.0),
                             _row(1, "a", 1, 0, 1.0)])
        got = {r.label for r in topn_others(df, n=1).collect()}
        assert got == {"a"}


class TestSeasonalNaiveBacktest:
    def test_exact_seasonal_match_scores_zero_error(self, spark):
        from tsrollup.counters import seasonal_naive_backtest

        # identical volumes 24h apart -> mae 0, bias 0 on scored buckets
        rows = [_row(1, "a", i, h * 3600, 10.0)
                for i, h in enumerate([0, 1, 24, 25])]
        r = seasonal_naive_backtest(spark.createDataFrame(
            rows, "user_id long, event_type string, event_id long, "
                  "ts timestamp, value double")).collect()[0]
        assert r.n_buckets == 4 and r.n_scored == 2
        assert r.mae_cents == 0.0 and r.bias_cents == 0.0

    def test_gap_does_not_misalign_prediction(self, spark):
        from tsrollup.counters import seasonal_naive_backtest

        # bucket at h=30 has NO bucket at h=6 -> unscored (a LAG-based
        # impl would wrongly pair it with the previous row h=1)
        rows = [_row(1, "a", 0, 0, 10.0), _row(1, "a", 1, 3600, 20.0),
                _row(1, "a", 2, 30 * 3600, 99.0),
                _row(1, "a", 3, 25 * 3600, 35.0)]
        r = seasonal_naive_backtest(spark.createDataFrame(
            rows, "user_id long, event_type string, event_id long, "
                  "ts timestamp, value double")).collect()[0]
        assert r.n_buckets == 4 and r.n_scored == 1
        # only h=25 scored against h=1: |3500-2000| = 1500
        assert r.sae_cents == 1500 and r.mae_cents == 1500.0

    def test_unscored_series_null_mae(self, spark):
        from tsrollup.counters import seasonal_naive_backtest

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        r = seasonal_naive_backtest(df).collect()[0]
        assert r.n_scored == 0 and r.mae_cents is None
        assert r.sae_cents == 0


class TestThresholdEpisodes:
    def test_for_gate_and_islands(self, spark):
        from tsrollup.counters import threshold_episodes

        # two exceedance runs: [0,10min] (fires at 10min gate) and a
        # single spike (duration 0 -> pending only)
        rows = [_row(1, "a", 0, 0, 120.0), _row(1, "a", 1, 300, 130.0),
                _row(1, "a", 2, 600, 125.0), _row(1, "a", 3, 900, 50.0),
                _row(1, "a", 4, 1200, 140.0), _row(1, "a", 5, 1500, 60.0)]
        eps = threshold_episodes(_events(spark, rows), threshold=100.0,
                                 min_duration_seconds=600).collect()
        eps = sorted(eps, key=lambda r: r.episode)
        assert len(eps) == 2
        first, second = eps
        assert first.n_samples == 3 and first.fired == 1
        assert first.duration_us == 600_000_000
        assert first.peak_value == 130.0
        assert second.n_samples == 1 and second.fired == 0

    def test_boundary_value_not_firing(self, spark):
        from tsrollup.counters import threshold_episodes

        # exactly-at-threshold is NOT an exceedance (strict >)
        df = _events(spark, [_row(1, "a", 0, 0, 100.0)])
        assert threshold_episodes(df, threshold=100.0).count() == 0

    def test_one_exchange(self, spark):
        from tsrollup.counters import threshold_episodes

        df = _events(spark, [_row(1, "a", 0, 0, 150.0)])
        plan = formatted_plan(threshold_episodes(df))
        assert n_data_exchanges(plan) == 1


class TestValueHeatmap:
    def test_bins_and_edges(self, spark):
        from tsrollup.counters import value_heatmap

        df = _events(spark, [_row(1, "a", 0, 0, 1.0),
                             _row(1, "a", 1, 10, 4.99),
                             _row(1, "a", 2, 20, 5.0),
                             _row(1, "a", 3, 30, 12.34)])
        got = {r.bin: r for r in value_heatmap(df, bin_cents=500).collect()}
        assert got[0].n == 2 and got[0].bin_low_cents == 0.0
        assert got[1].n == 1 and got[1].bin_low_cents == 500.0
        assert got[2].n == 1

    def test_rejects_bad_bucket(self, spark):
        import pytest as _pytest

        from tsrollup.counters import value_heatmap

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        with _pytest.raises(ValueError):
            value_heatmap(df, bucket="hourly")

    def test_one_exchange(self, spark):
        from tsrollup.counters import value_heatmap

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        assert n_data_exchanges(formatted_plan(value_heatmap(df))) == 1


class TestPairCorrelation:
    def test_matches_numpy_on_union_grid(self, spark):
        import numpy as np

        from tsrollup.counters import pair_correlation

        rng = np.random.default_rng(23)
        rows, series = [], {}
        eid = 0
        for k in ("a", "b", "c"):
            hours = sorted(rng.choice(48, size=30, replace=False))
            vals = {}
            for h in hours:
                for _ in range(int(rng.integers(1, 4))):
                    v = round(float(rng.uniform(0.01, 400)), 2)
                    rows.append((1, k, eid, int(h) * 3600, v))
                    vals[h] = vals.get(h, 0) + round(v * 100)
                    eid += 1
            series[k] = vals
        df = _events(spark, [_row(*r) for r in rows])
        got = {(r.key1, r.key2): r
               for r in pair_correlation(df).collect()}
        assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
        for (k1, k2), r in got.items():
            union = sorted(set(series[k1]) | set(series[k2]))
            x = np.array([series[k1].get(h, 0) for h in union], dtype=float)
            y = np.array([series[k2].get(h, 0) for h in union], dtype=float)
            assert r.n_buckets == len(union)
            assert r.n_co == len(set(series[k1]) & set(series[k2]))
            want = np.corrcoef(x, y)[0, 1]
            assert abs(r.corr - want) < 1e-12, (k1, k2, r.corr, want)

    def test_perfect_and_anti_correlation(self, spark):
        from tsrollup.counters import pair_correlation

        rows = []
        for i, h in enumerate(range(6)):
            rows.append(_row(1, "up", 10 + i, h * 3600, 10.0 * (i + 1)))
            rows.append(_row(1, "dbl", 20 + i, h * 3600, 20.0 * (i + 1)))
            rows.append(_row(1, "dn", 30 + i, h * 3600, 10.0 * (6 - i)))
        out = {(r.key1, r.key2): r.corr
               for r in pair_correlation(_events(spark, rows)).collect()}
        assert out[("dbl", "up")] == 1.0
        assert out[("dn", "up")] == -1.0

    def test_zero_variance_yields_null_not_nan(self, spark):
        from tsrollup.counters import pair_correlation

        rows = [_row(1, "flat", i, i * 3600, 5.0) for i in range(4)]
        rows += [_row(1, "move", 10 + i, i * 3600, float(i + 1))
                 for i in range(4)]
        out = pair_correlation(_events(spark, rows)).collect()
        assert len(out) == 1
        assert out[0].corr is None
        assert out[0].corr_denx == 0.0 or out[0].corr_deny == 0.0

    def test_disjoint_buckets_still_pair(self, spark):
        from tsrollup.counters import pair_correlation

        # a active hours 0-2, b active hours 5-7: n_co = 0, union = 6,
        # zeros on the inactive side drive a negative correlation
        rows = [_row(1, "a", i, i * 3600, 10.0) for i in range(3)]
        rows += [_row(1, "b", 10 + i, (5 + i) * 3600, 10.0)
                 for i in range(3)]
        out = pair_correlation(_events(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_buckets == 6 and r.n_co == 0
        assert r.corr == -1.0  # exact complementary indicator series


class TestLttbDownsample:
    def _ref(self, xs, ys_cents, n_buckets):
        """Python-int reference of the fixed-anchor LTTB selection."""
        lo, hi = min(xs), max(xs)
        span = hi - lo
        buckets = {}
        for i, (x, y) in enumerate(zip(xs, ys_cents)):
            b = ((x - lo) * n_buckets) // (span + 1)
            buckets.setdefault(b, []).append((x - lo, y, i))
        order = sorted(buckets)
        sel = {}
        for pos, b in enumerate(order):
            pts = buckets[b]
            if pos == 0:
                sel[b] = min(pts, key=lambda p: (p[0], p[2]))[2]
                continue
            if pos == len(order) - 1:
                sel[b] = max(pts, key=lambda p: (p[0], p[2]))[2]
                continue
            pb, nb = buckets[order[pos - 1]], buckets[order[pos + 1]]
            np_, nn = len(pb), len(nb)
            sxp, syp = sum(p[0] for p in pb), sum(p[1] for p in pb)
            sxn, syn = sum(p[0] for p in nb), sum(p[1] for p in nb)
            best = None
            for x, y, i in pts:
                f1 = sxp * nn - sxn * np_
                g1 = y * np_ - syp
                f2 = sxp - x * np_
                g2 = syn * np_ - syp * nn
                score = abs(f1 * g1 - f2 * g2)
                key = (-score, x, i)
                if best is None or key < best[0]:
                    best = (key, i)
            sel[b] = best[1]
        return sel  # bucket -> original index

    def test_matches_python_int_reference(self, spark):
        import numpy as np

        from tsrollup.counters import lttb_downsample

        rng = np.random.default_rng(41)
        n = 500
        xs = sorted(int(v) for v in
                    rng.choice(10**9, size=n, replace=False))
        vals = [round(float(rng.uniform(0.01, 400)), 2) for _ in range(n)]
        cents = [round(v * 100) for v in vals]
        rows = [(1, "a", i, T0 + dt.timedelta(microseconds=xs[i]), vals[i])
                for i in range(n)]
        out = lttb_downsample(_events(spark, rows), n_buckets=32).collect()
        want = self._ref(xs, cents, 32)
        assert len(out) == len(want)
        got = {r.bucket: r for r in out}
        for b, idx in want.items():
            assert got[b].v == vals[idx], (b, got[b].v, vals[idx])

    def test_endpoints_and_bucket_cardinality(self, spark):
        import numpy as np

        from tsrollup.counters import lttb_downsample

        rng = np.random.default_rng(43)
        rows = [(1, "a", i, T0 + dt.timedelta(seconds=int(s)),
                 float(rng.uniform(1, 100)))
                for i, s in enumerate(sorted(
                    rng.choice(86400, size=300, replace=False)))]
        df = _events(spark, rows)
        out = sorted(lttb_downsample(df, n_buckets=16).collect(),
                     key=lambda r: r.bucket)
        assert len({r.bucket for r in out}) == len(out)  # one per bucket
        assert out[0].t == rows[0][3] and out[0].v == rows[0][4]
        assert out[-1].t == rows[-1][3] and out[-1].v == rows[-1][4]
        assert sum(r.n for r in out) == len(rows)

    def test_interior_spike_is_kept(self, spark):
        from tsrollup.counters import lttb_downsample

        rows = [(1, "a", i, T0 + dt.timedelta(seconds=i * 10), 50.0)
                for i in range(100)]
        rows[47] = (1, "a", 47, T0 + dt.timedelta(seconds=470), 400.0)
        out = lttb_downsample(_events(spark, rows), n_buckets=10).collect()
        assert any(r.v == 400.0 for r in out)

    def test_too_few_buckets_rejected(self, spark):
        from tsrollup.counters import lttb_downsample

        with pytest.raises(ValueError):
            lttb_downsample(_events(spark, [_row(1, "a", 0, 0, 1.0)]),
                            n_buckets=2)


class TestDisorderStats:
    def test_hand_built_lateness(self, spark):
        from tsrollup.counters import disorder_stats

        rows = [_row(1, "a", i, s, 1.0)
                for i, s in enumerate([10, 20, 15, 30, 5])]
        out = disorder_stats(_events(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        # arrival (id) order: ts 15 lags max 20 by 5s; ts 5 lags 30 by 25s
        assert r.n == 5 and r.n_late == 2
        assert r.max_lateness_us == 25_000_000
        assert r.sum_lateness_us == 30_000_000
        assert r.late_frac == 2.0 / 5.0
        assert r.avg_lateness_us == 15_000_000.0

    def test_in_order_series_null_avg(self, spark):
        from tsrollup.counters import disorder_stats

        rows = [_row(2, "a", i, i * 10, 1.0) for i in range(4)]
        r = disorder_stats(_events(spark, rows)).collect()[0]
        assert r.n_late == 0 and r.max_lateness_us == 0
        assert r.late_frac == 0.0 and r.avg_lateness_us is None

    def test_single_exchange(self, spark):
        from tsrollup.counters import disorder_stats
        from tsrollup.planaudit import formatted_plan, n_data_exchanges

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        assert n_data_exchanges(formatted_plan(disorder_stats(df))) == 1


class TestRollingActives:
    def test_hand_built_census(self, spark):
        from tsrollup.counters import rolling_actives

        # W=3 hourly buckets. user 1 active hours {0, 5}; user 2 at {1};
        # user 3 at {0, 1, 2} (one merged run)
        rows = ([_row(1, "a", 0, 0, 1.0), _row(1, "a", 1, 5 * 3600, 1.0),
                 _row(2, "a", 2, 3600, 1.0)]
                + [_row(3, "a", 3 + h, h * 3600 + 60, 1.0)
                   for h in range(3)])
        out = {r.bucket_ts: r.active_users
               for r in rolling_actives(_events(spark, rows),
                                        window_buckets=3,
                                        bucket_seconds=3600).collect()}
        got = [out[T0 + dt.timedelta(hours=h)] for h in range(6)]
        # hour:        0  1  2  3  4  5
        # user1:       x  .  .        x    (reach [0,3) and [5,8))
        # user2:          x  .  .          (reach [1,4))
        # user3:       x  x  x  .  .       (reach [0,5) merged)
        assert got == [2, 3, 3, 2, 1, 1]

    def test_gap_buckets_emitted_as_zero(self, spark):
        from tsrollup.counters import rolling_actives

        rows = [_row(1, "a", 0, 0, 1.0),
                _row(1, "a", 1, 9 * 3600, 1.0)]
        out = {r.bucket_ts: r.active_users
               for r in rolling_actives(_events(spark, rows),
                                        window_buckets=2,
                                        bucket_seconds=3600).collect()}
        got = [out[T0 + dt.timedelta(hours=h)] for h in range(10)]
        assert got == [1, 1, 0, 0, 0, 0, 0, 0, 0, 1]
        assert len(out) == 10  # dense grid over the observed range

    def test_matches_brute_force_distinct(self, spark):
        """240 random events vs per-bucket brute-force distinct count."""
        import numpy as np

        from tsrollup.counters import rolling_actives

        rng = np.random.default_rng(7)
        secs = rng.integers(0, 48 * 3600, size=240)
        uids = rng.integers(1, 13, size=240)
        rows = [_row(int(u), "a", i, int(s), 1.0)
                for i, (u, s) in enumerate(zip(uids, secs))]
        W = 6
        out = rolling_actives(_events(spark, rows), window_buckets=W,
                              bucket_seconds=3600).collect()
        hb = {(int(u), int(s) // 3600) for u, s in zip(uids, secs)}
        lo, hi = (min(b for _, b in hb), max(b for _, b in hb))
        for r in out:
            g = int((r.bucket_ts - T0).total_seconds()) // 3600
            want = len({u for (u, b) in hb if g - W + 1 <= b <= g})
            assert r.active_users == want, g
        assert {int((r.bucket_ts - T0).total_seconds()) // 3600
                for r in out} == set(range(lo, hi + 1))

    def test_rejects_bad_params(self, spark):
        from tsrollup.counters import rolling_actives

        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        with pytest.raises(ValueError):
            rolling_actives(df, window_buckets=0)
        with pytest.raises(ValueError):
            rolling_actives(df, bucket_seconds=0)


class TestSpearmanMatrix:
    def test_perfect_monotone_not_linear(self, spark):
        from tsrollup.counters import spearman_matrix

        # y = x^3-ish via values 1, 8, 27, 64: Pearson < 1, Spearman == 1
        rows = []
        for h, (va, vb) in enumerate(zip([1, 2, 3, 4], [1, 8, 27, 64])):
            rows.append(_row(1, "a", 2 * h, h * 3600, va))
            rows.append(_row(1, "b", 2 * h + 1, h * 3600, vb))
        r = spearman_matrix(_events(spark, rows)).collect()[0]
        assert (r.key1, r.key2, r.n_co) == ("a", "b", 4)
        # num == denx == deny exactly; rho is num/(sqrt*sqrt), one ulp shy
        assert r.rho_num == r.rho_denx == r.rho_deny > 0
        assert abs(r.rho - 1.0) < 1e-12

    def test_reversed_order_is_minus_one(self, spark):
        from tsrollup.counters import spearman_matrix

        rows = []
        for h, (va, vb) in enumerate(zip([1, 2, 3, 4], [9, 7, 5, 3])):
            rows.append(_row(1, "a", 2 * h, h * 3600, va))
            rows.append(_row(1, "b", 2 * h + 1, h * 3600, vb))
        r = spearman_matrix(_events(spark, rows)).collect()[0]
        assert abs(r.rho + 1.0) < 1e-12

    def test_ties_average_rank_matches_pandas(self, spark):
        import numpy as np
        import pandas as pd

        from tsrollup.counters import spearman_matrix

        rng = np.random.default_rng(3)
        rows = []
        eid = 0
        for h in range(50):
            # coarse values force plenty of ties
            rows.append(_row(1, "a", eid, h * 3600,
                             float(rng.integers(0, 4)))); eid += 1
            rows.append(_row(1, "b", eid, h * 3600,
                             float(rng.integers(0, 4)))); eid += 1
        r = spearman_matrix(_events(spark, rows)).collect()[0]
        got_rho = r.rho
        pdf = pd.DataFrame({
            "a": [rr[4] for rr in rows if rr[1] == "a"],
            "b": [rr[4] for rr in rows if rr[1] == "b"]})
        want = pdf["a"].rank(method="average").corr(
            pdf["b"].rank(method="average"))
        np.testing.assert_allclose(got_rho, want, rtol=1e-12)

    def test_constant_side_is_null(self, spark):
        from tsrollup.counters import spearman_matrix

        rows = []
        for h in range(4):
            rows.append(_row(1, "a", 2 * h, h * 3600, 5.0))   # constant
            rows.append(_row(1, "b", 2 * h + 1, h * 3600, float(h)))
        r = spearman_matrix(_events(spark, rows)).collect()[0]
        assert r.rho is None and r.rho_denx == 0.0

    def test_coactive_buckets_only(self, spark):
        from tsrollup.counters import spearman_matrix

        rows = [_row(1, "a", 0, 0, 1.0), _row(1, "a", 1, 3600, 2.0),
                _row(1, "a", 2, 7200, 3.0),
                _row(1, "b", 3, 3600, 9.0), _row(1, "b", 4, 7200, 1.0),
                _row(1, "b", 5, 10800, 4.0)]
        r = spearman_matrix(_events(spark, rows)).collect()[0]
        assert r.n_co == 2          # hours 1 and 2 only
        assert abs(r.rho + 1.0) < 1e-12


class TestBinarySegments:
    def _series(self, spark, cases):
        rows, eid = [], 0
        for name, vals in cases.items():
            for i, v in enumerate(vals):
                rows.append(_row(1, name, eid, i * 60, float(v)))
                eid += 1
        return _events(spark, rows)

    @staticmethod
    def _twin(vals):
        import numpy as np

        c = [int(round(v * 100)) for v in vals]
        n = len(c)
        P = np.cumsum(c)
        tot = int(P[-1])

        def argmax(lo, hi):
            ln = hi - lo + 1
            if ln < 2:
                return None, None
            base = int(P[lo - 2]) if lo >= 2 else 0
            ls = int(P[hi - 1]) - base
            best = (-1, None)
            for r in range(lo, hi):
                st = abs(ln * (int(P[r - 1]) - base) - (r - lo + 1) * ls)
                if st > best[0]:
                    best = (st, r)
            return best[1], best[0]

        t1, st1 = argmax(1, n)
        tl, stl = argmax(1, t1)
        tr, str_ = argmax(t1 + 1, n)
        pl = int(P[tl - 1]) if tl else 0
        p1 = int(P[t1 - 1])
        pr = int(P[tr - 1]) if tr else p1
        return dict(n=n, tau1=t1, stat1=float(st1),
                    tau_left=tl,
                    stat_left=float(stl) if stl is not None else None,
                    tau_right=tr,
                    stat_right=float(str_) if str_ is not None else None,
                    s1=pl, s2=p1 - pl, s3=pr - p1, s4=tot - pr)

    def test_three_level_staircase_names_both_steps(self, spark):
        from tsrollup.counters import binary_segments

        cases = {"steps": [1.0] * 10 + [5.0] * 10 + [9.0] * 10}
        r = binary_segments(self._series(spark, cases)).collect()[0]
        assert r.tau1 == 10 and r.tau_right == 20
        assert (r.s1 + r.s2, r.s3 + r.s4) == (1000, 500 * 10 + 900 * 10)

    def test_exact_twin_parity_incl_edges(self, spark):
        import numpy as np

        from tsrollup.counters import binary_segments

        cases = {
            "flat": [2.0] * 8,
            "two": [1.0, 9.0],
            "short3": [1.0, 1.0, 9.0],
            "noisy": list(np.round(
                np.random.default_rng(2).normal(5, 1, 40), 2)),
        }
        got = {r.event_type: r.asDict()
               for r in binary_segments(self._series(spark, cases)).collect()}
        for name, vals in cases.items():
            want = self._twin(vals)
            for k, v in want.items():
                assert got[name][k] == v, (name, k, got[name][k], v)

    def test_single_sample_series_absent(self, spark):
        from tsrollup.counters import binary_segments

        df = _events(spark, [_row(1, "solo", 0, 0, 5.0),
                             _row(1, "pair", 1, 0, 1.0),
                             _row(1, "pair", 2, 60, 2.0)])
        out = {r.event_type for r in binary_segments(df).collect()}
        assert out == {"pair"}

    def test_single_exchange(self, spark):
        from tsrollup.counters import binary_segments
        from tsrollup.planaudit import formatted_plan, n_data_exchanges

        df = _events(spark, [_row(1, "a", i, i * 60, float(i))
                             for i in range(6)])
        plan = formatted_plan(binary_segments(df))
        assert n_data_exchanges(plan) == 1, plan


class TestRetentionCohorts:
    def test_hand_built_triangle(self, spark):
        from tsrollup.counters import retention_cohorts

        D = 86_400
        # cohort day 0: users 1,2,3 (u1 returns d1,d2; u2 returns d2)
        # cohort day 1: user 4 (returns d2)
        rows = [_row(1, "a", 0, 0, 1.0), _row(2, "a", 1, 10, 1.0),
                _row(3, "a", 2, 20, 1.0),
                _row(1, "a", 3, D + 5, 1.0),
                _row(1, "a", 4, 2 * D + 5, 1.0),
                _row(2, "a", 5, 2 * D + 9, 1.0),
                _row(4, "a", 6, D + 1, 1.0),
                _row(4, "a", 7, 2 * D + 1, 1.0),
                # a same-day duplicate must not double-count
                _row(3, "a", 8, 30, 1.0)]
        out = {(r.cohort_ts, r.day_offset): r for r in
               retention_cohorts(_events(spark, rows)).collect()}
        # buckets are epoch-aligned days: cohort_ts is the day FLOOR of
        # T0 (10:00), not T0 itself
        c0 = dt.datetime(2024, 1, 1)
        c1 = dt.datetime(2024, 1, 2)
        assert out[(c0, 0)].n_active == 3 and out[(c0, 0)].retention == 1.0
        assert out[(c0, 1)].n_active == 1
        assert out[(c0, 2)].n_active == 2
        assert out[(c0, 2)].cohort_size == 3
        assert out[(c0, 2)].retention == 2.0 / 3.0
        assert out[(c1, 0)].n_active == 1
        assert out[(c1, 1)].n_active == 1 and out[(c1, 1)].retention == 1.0
        assert len(out) == 5  # sparse: no empty cells

    def test_every_offset_zero_is_full(self, spark):
        import numpy as np

        from tsrollup.counters import retention_cohorts

        rng = np.random.default_rng(9)
        rows = [_row(int(u), "a", i, int(s), 1.0)
                for i, (u, s) in enumerate(zip(
                    rng.integers(1, 30, 300),
                    rng.integers(0, 10 * 86_400, 300)))]
        out = retention_cohorts(_events(spark, rows)).collect()
        zero = [r for r in out if r.day_offset == 0]
        assert all(r.retention == 1.0 and r.n_active == r.cohort_size
                   for r in zero)
        assert all(r.n_active <= r.cohort_size for r in out)

    def test_rejects_bad_bucket(self, spark):
        from tsrollup.counters import retention_cohorts

        with pytest.raises(ValueError):
            retention_cohorts(_events(spark, [_row(1, "a", 0, 0, 1.0)]),
                              bucket_seconds=0)


class TestBenfordCensus:
    def test_hand_census_zero_negative_null(self, spark):
        """Digit classes: leading digit of |cents|; 0.00 -> digit 0 (a
        zero-spike must be visible, not dropped); negatives fold to their
        magnitude; NULLs drop."""
        from tsrollup.counters import benford_census

        rows = [("a", 123.45), ("a", 1.02), ("a", 0.0), ("a", -9.5),
                ("a", None), ("b", 0.31)]
        df = spark.createDataFrame(rows, "event_type string, value double")
        got = {(r.event_type, r.digit): (r.n, r.n_group, r.share)
               for r in benford_census(df).collect()}
        assert got == {
            ("a", 1): (2, 4, 0.5),   # 12345 and 102 cents
            ("a", 0): (1, 4, 0.25),  # exact zero
            ("a", 9): (1, 4, 0.25),  # |-950|
            ("b", 3): (1, 1, 1.0),   # 31 cents
        }

    def test_replica_parity_random(self, spark):
        import numpy as np

        from tsrollup.counters import benford_census

        rng = np.random.default_rng(29)
        vals = np.round(rng.lognormal(3, 2, 400), 2)
        rows = [(f"t{i % 3}", float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "event_type string, value double")
        got = {(r.event_type, r.digit): r.n
               for r in benford_census(df).collect()}
        import collections
        from decimal import Decimal
        want = collections.Counter()
        for t, v in rows:
            cents = abs(int(Decimal(str(v)).quantize(Decimal("0.01")) * 100))
            want[(t, int(str(cents)[0]))] += 1
        assert got == dict(want)
