"""Exact histogram-selection quantiles (tsrollup.rollup.group_quantiles).

Hand goldens pin the rank definition (⌈p·n⌉, ties, the 0.9·n float trap);
NumPy inverted-CDF parity covers random inputs; the plan test pins the
histogram shape (no per-group raw-row sort). Fixture-scale value parity
lives in the __spark_entry__ tail oracle (quantile_summary).
"""

from __future__ import annotations

import numpy as np
import pytest

from tsrollup.planaudit import formatted_plan, n_data_exchanges
from tsrollup.rollup import group_quantiles


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, n_chars long")


class TestGroupQuantiles:
    def test_hand_computed(self, spark):
        # 10 values 1..10: p25 -> rank ceil(2.5)=3 -> 3; p50 -> 5;
        # p90 -> rank 9 -> 9 (float 0.9*10 ceils to 10 -- the trap)
        df = _df(spark, [("a", v) for v in range(1, 11)])
        r = group_quantiles(df).collect()[0]
        assert (r.p25, r.p50, r.p75, r.p90) == (3, 5, 8, 9)
        assert (r.n_rows, r.n_distinct, r.vmin, r.vmax) == (10, 10, 1, 10)

    def test_ties_collapse_into_histogram(self, spark):
        df = _df(spark, [("a", v) for v in [1, 1, 1, 1, 7, 7, 9]])
        r = group_quantiles(df).collect()[0]
        # sorted: 1 1 1 1 7 7 9; p50 -> rank 4 -> 1; p75 -> rank 6 -> 7
        assert (r.p50, r.p75) == (1, 7)
        assert r.n_distinct == 3

    def test_single_row_group(self, spark):
        r = group_quantiles(_df(spark, [("a", 42)])).collect()[0]
        assert (r.p25, r.p50, r.p75, r.p90) == (42, 42, 42, 42)

    def test_multiple_groups_independent(self, spark):
        df = _df(spark, [("a", v) for v in range(1, 5)]
                 + [("b", v) for v in range(100, 109)])
        out = {r.source: r for r in group_quantiles(df).collect()}
        assert out["a"].p50 == 2 and out["b"].p50 == 104

    def test_numpy_inverted_cdf_parity(self, spark):
        rng = np.random.default_rng(5)
        rows = [(f"s{i % 3}", int(v))
                for i, v in enumerate(rng.integers(0, 50, size=400))]
        out = {r.source: r for r in group_quantiles(_df(spark, rows)).collect()}
        for s in ("s0", "s1", "s2"):
            x = np.sort([v for g, v in rows if g == s])
            n = len(x)
            for label, (num, den) in [("p25", (1, 4)), ("p50", (1, 2)),
                                      ("p75", (3, 4)), ("p90", (9, 10))]:
                rank = (num * n + den - 1) // den
                assert getattr(out[s], label) == x[rank - 1], (s, label)
                # our rank definition IS numpy's inverted_cdf
                assert x[rank - 1] == np.quantile(
                    x, num / den, method="inverted_cdf")

    def test_rational_validation(self, spark):
        with pytest.raises(ValueError):
            group_quantiles(_df(spark, []), quantiles={"bad": (5, 4)})
        with pytest.raises(ValueError):
            group_quantiles(_df(spark, []), quantiles={"bad": (0, 4)})

    def test_plan_aggregates_before_windowing(self, spark):
        # the exchange count: histogram agg + per-group window reuse ==
        # 2 data exchanges, and no Sort over the raw relation (the sort
        # runs over the histogram grain, after the first HashAggregate)
        df = _df(spark, [("a", 1)])
        plan = formatted_plan(group_quantiles(df))
        assert n_data_exchanges(plan) == 2
        assert plan.index("HashAggregate") < plan.index("Sort")


class TestMadOutliers:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "source string, n_chars long")

    def test_hand_computed(self, spark):
        from tsrollup.rollup import mad_outliers
        df = self._df(spark, [("a", v) for v in list(range(1, 10)) + [100]])
        r = mad_outliers(df, k=3).collect()[0]
        # median rank ceil(10/2)=5 -> 5; devs sorted 0,1,1,2,2,3,3,4,4,95
        # -> MAD 2; outliers: dev > 6 -> only the 100
        assert (r.median, r.mad, r.n_outliers) == (5, 2, 1)
        assert r.outlier_frac == 0.1

    def test_outlier_does_not_move_the_threshold(self, spark):
        from tsrollup.rollup import mad_outliers
        # the robust-stats point: make the outlier 100x bigger,
        # median/MAD/threshold unchanged
        a = mad_outliers(self._df(
            spark, [("a", v) for v in list(range(1, 10)) + [100]])).collect()[0]
        b = mad_outliers(self._df(
            spark, [("a", v) for v in list(range(1, 10)) + [10000]])).collect()[0]
        assert (a.median, a.mad) == (b.median, b.mad)
        assert a.n_outliers == b.n_outliers == 1

    def test_constant_series_has_no_outliers(self, spark):
        from tsrollup.rollup import mad_outliers
        r = mad_outliers(self._df(spark, [("a", 7)] * 5)).collect()[0]
        assert (r.median, r.mad, r.n_outliers) == (7, 0, 0)

    def test_groups_independent_and_numpy_parity(self, spark):
        import numpy as np
        from tsrollup.rollup import mad_outliers
        rng = np.random.default_rng(41)
        rows = [(f"s{i % 3}", int(v))
                for i, v in enumerate(rng.integers(0, 60, size=300))]
        out = {r.source: r for r in
               mad_outliers(self._df(spark, rows), k=3).collect()}
        for s in ("s0", "s1", "s2"):
            x = np.sort([v for g, v in rows if g == s])
            n = len(x)
            med = x[(n + 1) // 2 - 1]
            d = np.sort(np.abs(np.array([v for g, v in rows if g == s])
                               - med))
            mad = d[(n + 1) // 2 - 1]
            r = out[s]
            assert (r.median, r.mad) == (med, mad), s
            assert r.n_outliers == int((d > 3 * mad).sum()), s

    def test_validation(self, spark):
        from tsrollup.rollup import mad_outliers
        with pytest.raises(ValueError):
            mad_outliers(self._df(spark, []), k=0)
