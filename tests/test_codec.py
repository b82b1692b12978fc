"""Codec round-trip tests (FIXTURES.md F5): decode(encode(x)) == x bit-exact,
the analog of the reference's save/reload determinism (test_keras.py:84-91).
Hypothesis property tests cover the long tail of bit patterns.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsrollup.codec import dod_decode, dod_encode, gorilla_decode, gorilla_encode


def rt_f(x):
    x = np.asarray(x, dtype=np.float64)
    out = gorilla_decode(gorilla_encode(x))
    # bit-exact comparison (NaN payloads, ±0.0 preserved)
    np.testing.assert_array_equal(out.view(np.uint64), x.view(np.uint64))
    return gorilla_encode(x)


def rt_i(x):
    x = np.asarray(x, dtype=np.int64)
    out = dod_decode(dod_encode(x))
    np.testing.assert_array_equal(out, x)
    return dod_encode(x)


# ------------------------------------------------------------- gorilla ----

def test_gorilla_empty_and_single():
    assert gorilla_decode(gorilla_encode(np.empty(0))).shape == (0,)
    rt_f([3.14159])


def test_gorilla_constant_series_compresses():
    enc = rt_f(np.full(1000, 123.456))
    # 4 header + 8 first + 999 zero control bytes, no payload
    assert len(enc) == 4 + 8 + 999
    assert len(enc) < 1000 * 8 / 6


def test_gorilla_slowly_varying():
    t = np.arange(2000)
    x = 100.0 + np.sin(t / 50.0)
    enc = rt_f(x)
    assert len(enc) < 2000 * 8  # beats raw


def test_gorilla_special_values():
    rt_f([0.0, -0.0, np.nan, np.inf, -np.inf, 5e-324, -5e-324,
          np.finfo(np.float64).max, np.finfo(np.float64).tiny])


def test_gorilla_nan_payload_preserved():
    a = np.array([np.float64(1.0)])
    weird_nan = np.frombuffer(np.uint64(0x7FF8DEADBEEF0001).tobytes(), np.float64)
    x = np.concatenate([a, weird_nan, a])
    rt_f(x)


def test_gorilla_random_float64_bits():
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2**63, size=5000, dtype=np.int64).astype(np.uint64)
    bits |= rng.integers(0, 2, size=5000).astype(np.uint64) << np.uint64(63)
    rt_f(bits.view(np.float64))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64),
                max_size=300))
def test_gorilla_property(xs):
    rt_f(xs)


# ----------------------------------------------------------------- dod ----

def test_dod_empty_single():
    assert dod_decode(dod_encode(np.empty(0, np.int64))).shape == (0,)
    rt_i([42])
    rt_i([-42])


def test_dod_regular_stride_one_byte_per_point():
    x = np.arange(0, 64000, 64, dtype=np.int64)  # window_start pattern
    enc = rt_i(x)
    # all dods are 0 → 1 byte each; header + first + delta ≤ 8 bytes
    assert len(enc) <= 4 + 10 + 10 + (len(x) - 2)


def test_dod_irregular_monotone():
    rng = np.random.default_rng(9)
    x = np.cumsum(rng.integers(1, 10_000, 3000)).astype(np.int64)
    rt_i(x)


def test_dod_negative_and_extremes():
    rt_i([np.iinfo(np.int64).min, 0, np.iinfo(np.int64).max, -1, 1])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=300))
def test_dod_property(xs):
    rt_i(xs)


def test_batched_codecs_byte_identical_to_scalar():
    """*_many variants must produce byte-identical blobs to per-blob calls
    (readers can't tell which writer ran) and round-trip exactly."""
    import numpy as np

    from tsrollup.codec import (dod_decode_many, dod_encode, dod_encode_many,
                                gorilla_decode_many, gorilla_encode,
                                gorilla_encode_many)

    rng = np.random.default_rng(7)
    ints = [rng.integers(-10**14, 10**14,
                         rng.integers(1, 60)).astype(np.int64)
            for _ in range(150)]
    ints += [np.array([0], dtype=np.int64),
             np.arange(0, 64 * 500, 64, dtype=np.int64),
             np.array([2**62, -2**62, 17], dtype=np.int64)]
    enc = dod_encode_many(ints)
    assert enc == [dod_encode(a) for a in ints]
    for a, r in zip(ints, dod_decode_many(enc)):
        assert (a == r).all()

    floats = [rng.standard_normal(rng.integers(1, 60)) for _ in range(150)]
    floats += [np.array([0.0]), np.repeat(2.5, 40),
               np.array([np.nan, np.inf, -np.inf, -0.0, 2.0**-1040, 1e300])]
    genc = gorilla_encode_many(floats)
    assert genc == [gorilla_encode(a) for a in floats]
    for a, r in zip(floats, gorilla_decode_many(genc)):
        assert a.tobytes() == r.tobytes()


def test_codec_roundtrip_property():
    """Property-based: arbitrary int64/float64 arrays round-trip exactly
    through both codecs and their batched variants."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tsrollup.codec import (dod_decode, dod_decode_many, dod_encode,
                                dod_encode_many, gorilla_decode,
                                gorilla_decode_many, gorilla_encode,
                                gorilla_encode_many)

    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    f64 = st.floats(allow_nan=True, allow_infinity=True, width=64)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(i64, min_size=0, max_size=80))
    def check_dod(xs):
        a = np.array(xs, dtype=np.int64)
        assert (dod_decode(dod_encode(a)) == a).all()
        if len(xs):
            assert (dod_decode_many(dod_encode_many([a]))[0] == a).all()

    @settings(max_examples=150, deadline=None)
    @given(st.lists(f64, min_size=0, max_size=80))
    def check_gorilla(xs):
        a = np.array(xs, dtype=np.float64)
        assert gorilla_decode(gorilla_encode(a)).tobytes() == a.tobytes()
        if len(xs):
            assert gorilla_decode_many(
                gorilla_encode_many([a]))[0].tobytes() == a.tobytes()

    check_dod()
    check_gorilla()
