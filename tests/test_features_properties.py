"""Property tests (hypothesis) for the round-5 pure-math kernels — the
formula layer under the Spark operators, so hundreds of cases run without a
session: PAA frame bounds, quantile ranks, LTTB selection invariants.

Binding note: the bounds/rank tests re-state the formulas (the engine
builds them as SQL expr strings, so they can't be imported) — they prove
the MATH (partition/ceil identities), while engine↔formula binding lives
in the Spark parity tests (test_features numpy parity, test_quantiles
inverted_cdf parity): an engine edit to floor division fails THOSE, a
formula misunderstanding fails these. lttb_indices is imported directly.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tsrollup.features import lttb_indices


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 5000), st.integers(1, 64))
def test_paa_bounds_partition_every_position(n, frames):
    # the ceil-division slice bounds form an exact partition of [0, n)
    # matching the assignment rule p*F div n
    prev_stop = 0
    for f in range(frames):
        start = (f * n + frames - 1) // frames
        stop = ((f + 1) * n + frames - 1) // frames
        assert start == prev_stop
        for p in range(start, stop):
            assert p * frames // n == f
        prev_stop = stop
    assert prev_stop == n


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 100000), st.sampled_from([(1, 4), (1, 2), (3, 4),
                                                (9, 10), (99, 100)]))
def test_quantile_rank_is_exact_ceil(n, q):
    num, den = q
    rank = (num * n + den - 1) // den
    # rank == ceil(p*n) computed exactly, always within [1, n]
    import math
    from fractions import Fraction
    assert rank == math.ceil(Fraction(num * n, den))
    assert 1 <= rank <= n


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=1, max_size=600),
       st.integers(3, 40))
def test_lttb_selection_invariants(values, n_out):
    y = np.asarray(values, dtype=np.int64)
    sel = lttb_indices(y, n_out)
    # strictly increasing positions, endpoints kept, exact output size
    assert sel[0] == 0 and sel[-1] == len(y) - 1
    assert (np.diff(sel) > 0).all()
    assert len(sel) == (len(y) if len(y) <= n_out else n_out)
    # one interior pick per bucket: every pick within [1, n-2] when n>n_out
    if len(y) > n_out:
        assert (sel[1:-1] >= 1).all() and (sel[1:-1] <= len(y) - 2).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=2, max_size=400),
       st.integers(1, 6))
def test_acf_moment_identities(values, lag):
    # the exact-moment formulas used by acf_moments: cov_num sign flips
    # under reversal symmetry and n_pairs*sxy - sx*sy is translation-
    # covariant only through the centered form — check vs direct centering
    x = np.asarray(values, dtype=np.int64)
    if len(x) <= lag:
        return
    h, t = x[:-lag], x[lag:]
    n = len(h)
    cov_num = n * int(h @ t) - int(h.sum()) * int(t.sum())
    centered = float(((h - h.mean()) * (t - t.mean())).sum())
    assert np.isclose(cov_num / n, centered)
