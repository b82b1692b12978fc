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
