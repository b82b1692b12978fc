"""State/liveness aggregate tests (tsrollup/states.py).

Small hand-built frames pin the semantic corners (tie-breaks, LOCF
durations, gap capping, single-sample series); the driver's DuckDB oracles
cover fixture-scale value parity.
"""

from __future__ import annotations

import datetime as dt

from tsrollup.planaudit import formatted_plan, n_data_exchanges
from tsrollup.states import heartbeat_agg, ohlc, state_agg

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, "
              "ts timestamp, value double")


def _row(uid, etype, eid, secs, value):
    return (uid, etype, eid, T0 + dt.timedelta(seconds=secs),
            None if value is None else float(value))


class TestOhlc:
    def test_open_close_high_low_volume(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 10.0),
                             _row(1, "a", 1, 60, 30.5),
                             _row(1, "a", 2, 120, 2.25),
                             _row(1, "a", 3, 180, 20.0)])
        r = ohlc(df).collect()
        assert len(r) == 1
        row = r[0]
        assert row.bucket_ts == T0
        assert row.n == 4
        assert row.open_value == 10.0 and row.close_value == 20.0
        assert row.high_value == 30.5 and row.low_value == 2.25
        assert row.volume_cents == 1000 + 3050 + 225 + 2000

    def test_same_ts_tie_breaks_by_id(self, spark):
        # two samples at the identical timestamp: open is the lower id,
        # close the higher — the (ts, id) struct-extreme contract
        df = _events(spark, [_row(1, "a", 7, 0, 5.0), _row(1, "a", 3, 0, 9.0)])
        row = ohlc(df).collect()[0]
        assert row.open_value == 9.0 and row.close_value == 5.0

    def test_null_values_are_no_observations(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, None), _row(1, "a", 1, 60, 4.0)])
        row = ohlc(df).collect()[0]
        assert row.n == 1 and row.open_value == 4.0 == row.close_value

    def test_buckets_split_on_hour(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1.0),
                             _row(1, "a", 1, 3600, 2.0)])
        got = {r.bucket_ts.hour: r.open_value for r in ohlc(df).collect()}
        assert got == {10: 1.0, 11: 2.0}

    def test_one_exchange(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
        assert n_data_exchanges(formatted_plan(ohlc(df))) == 1


class TestStateAgg:
    def test_locf_durations_and_entries(self, spark):
        # a(0s) -> a(10s) -> b(30s) -> a(60s, final: holds 0)
        df = _events(spark, [_row(1, "a", 0, 0, 1), _row(1, "a", 1, 10, 1),
                             _row(1, "b", 2, 30, 1), _row(1, "a", 3, 60, 1)])
        got = {r.state: r for r in state_agg(df).collect()}
        assert got["a"].total_us == 30_000_000  # [0,30) held by a
        assert got["b"].total_us == 30_000_000  # [30,60)
        assert got["a"].n_samples == 3 and got["a"].n_entries == 2
        assert got["b"].n_entries == 1
        assert got["a"].frac_time == 0.5 == got["b"].frac_time

    def test_single_sample_series_has_null_frac(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1)])
        r = state_agg(df).collect()[0]
        assert r.total_us == 0 and r.frac_time is None

    def test_series_are_independent(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1), _row(1, "a", 1, 10, 1),
                             _row(2, "a", 2, 0, 1), _row(2, "a", 3, 40, 1)])
        got = {r.user_id: r.total_us for r in state_agg(df).collect()}
        assert got == {1: 10_000_000, 2: 40_000_000}

    def test_one_exchange(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1)])
        # series window + (series, state) groupBy + share window all ride
        # one hash-partitioning on the series key
        assert n_data_exchanges(formatted_plan(state_agg(df))) == 1


class TestHeartbeatAgg:
    def test_gap_capping_and_outages(self, spark):
        # heartbeats at 0, 60, 1000s with interval 600: gaps 60 (live) and
        # 940 (600 live + outage)
        df = _events(spark, [_row(1, "a", 0, 0, 1), _row(1, "a", 1, 60, 1),
                             _row(1, "a", 2, 1000, 1)])
        r = heartbeat_agg(df, interval_seconds=600).collect()[0]
        assert r.n_heartbeats == 3
        assert r.span_us == 1000_000_000
        assert r.live_us == (60 + 600) * 1_000_000
        assert r.dead_us == r.span_us - r.live_us
        assert r.outages == 1
        assert r.longest_gap_us == 940_000_000

    def test_single_sample_series(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1)])
        r = heartbeat_agg(df).collect()[0]
        assert (r.span_us, r.live_us, r.dead_us, r.outages,
                r.longest_gap_us) == (0, 0, 0, 0, 0)

    def test_one_exchange(self, spark):
        df = _events(spark, [_row(1, "a", 0, 0, 1)])
        assert n_data_exchanges(formatted_plan(heartbeat_agg(df))) == 1


def test_ohlc_rejects_bad_bucket(spark):
    import pytest as _pytest

    df = _events(spark, [_row(1, "a", 0, 0, 1.0)])
    with _pytest.raises(ValueError):
        ohlc(df, bucket="hourly")
