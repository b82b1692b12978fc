"""Multivariate (V>1) channel support: melted per-channel rollup must equal
the V=1 engine run per channel, and cross-channel stats must match pandas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsrollup.planaudit import formatted_plan


@pytest.fixture(scope="module")
def multi_df(spark):
    rng = np.random.default_rng(31)
    rows = []
    for i in range(40):
        n = int(rng.integers(1, 400))
        rows.append((
            f"d{i:03d}",
            [rng.integers(0, 50, n).astype(int).tolist(),
             rng.integers(0, 50, n).astype(int).tolist(),
             rng.integers(0, 50, n).astype(int).tolist()],
            "s"))
    rows.append(("dempty", [[], [], []], "s"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "channels", "source"]))


def test_melt_shapes(spark, multi_df):
    from tsrollup.channels import melt_channels

    m = melt_channels(multi_df).toPandas()
    assert set(m["channel"]) == {0, 1, 2}
    assert len(m) == 41 * 3


def test_per_channel_rollup_matches_v1_engine(spark, multi_df):
    from tsrollup.channels import melt_channels, rollup_channels
    from tsrollup.rollup import rollup_sequences

    melted = melt_channels(multi_df)
    got = rollup_channels(melted, window=16, tiers={"w": 1, "w4": 4}) \
        .toPandas().sort_values(["doc_id", "channel", "tier", "window_start"]) \
        .reset_index(drop=True)
    # V=1 engine per channel: key = (doc_id, channel) encoded in doc_id
    flat = melted.select(
        F.concat_ws("|", "doc_id", F.col("channel").cast("string"))
        .alias("doc_id"), "tokens", "source")
    ref = rollup_sequences(flat, window=16, tiers={"w": 1, "w4": 4}).toPandas()
    ref[["doc_id", "channel"]] = ref["doc_id"].str.split("|", expand=True)
    ref["channel"] = ref["channel"].astype("int32")
    ref = ref.sort_values(["doc_id", "channel", "tier", "window_start"]) \
        .reset_index(drop=True)
    for c in got.columns:
        av, bv = got[c].values, ref[c].values
        if c == "band_energy":
            av = np.stack([np.asarray(x) for x in av])
            bv = np.stack([np.asarray(x) for x in bv])
        assert (av == bv).all(), c


def test_cross_channel_stats_matches_pandas(spark, multi_df):
    from tsrollup.channels import (cross_channel_stats, melt_channels,
                                   rollup_channels)

    rolled = rollup_channels(melt_channels(multi_df), window=16,
                             tiers={"w": 1})
    got = cross_channel_stats(rolled).toPandas() \
        .sort_values(["doc_id", "tier", "window_start"]).reset_index(drop=True)
    pdf = multi_df.toPandas()
    rows = []
    for _, r in pdf.iterrows():
        chans = [np.asarray(c, dtype=np.int64) for c in r["channels"]]
        n = max((c.shape[0] for c in chans), default=0)
        if n == 0:
            continue
        for ws in range(0, n, 16):
            seg = [c[ws:ws + 16] for c in chans if c.shape[0] > ws]
            rows.append({
                "doc_id": r["doc_id"], "tier": "w", "window_start": ws,
                "n_channels": len(seg),
                "count": sum(s.shape[0] for s in seg),
                "sum": sum(int(s.sum()) for s in seg),
                "min": min(int(s.min()) for s in seg),
                "max": max(int(s.max()) for s in seg),
            })
    want = pd.DataFrame(rows)
    want["xchan_mean"] = want["sum"].astype(np.float64) / \
        want["count"].astype(np.float64)
    want = want.sort_values(["doc_id", "tier", "window_start"]) \
        .reset_index(drop=True)
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c


def test_channel_rollup_plan_is_zero_shuffle(spark, multi_df):
    from tsrollup.channels import melt_channels, rollup_channels

    df = rollup_channels(melt_channels(multi_df))
    plan = formatted_plan(df)
    assert "Exchange" not in plan, plan
    assert "MapInArrow" in plan


def test_melt_with_masks_gap_fills_per_channel(spark):
    from tsrollup.channels import melt_channels, rollup_channels

    rows = [("d", [[10, 999, 10, 10], [5, 5, 5, 5]],
             [[False, True, False, False], None], "s")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "channels", "masks", "source"]))
    out = rollup_channels(
        melt_channels(df, masks_col="masks"), window=8, tiers={"w": 1}) \
        .toPandas().sort_values("channel").reset_index(drop=True)
    # channel 0's 999 sits under a gap mask → interpolated to 10
    assert out.loc[0, "sum"] == 40 and out.loc[0, "max"] == 10
    # channel 1 (null mask = no gaps) untouched
    assert out.loc[1, "sum"] == 20


def test_cross_channel_spectral_matches_numpy(spark, multi_df):
    """Pooled spectral features across V=3 channels == sequential NumPy fold
    over the per-channel window partials, bit for bit (pinned channel-order
    fold; centroid = mass/energy with the derive_stats zero convention)."""
    from tsrollup import N_BANDS
    from tsrollup.channels import (cross_channel_spectral, melt_channels,
                                   rollup_channels)
    from tsrollup.kernels import base_window_partials

    W = 16
    rolled = rollup_channels(melt_channels(multi_df), window=W, tiers={"w": 1})
    got = {(r["doc_id"], r["window_start"]): r
           for r in cross_channel_spectral(rolled).collect()}
    pdf = multi_df.toPandas()
    checked = 0
    for _, row in pdf.iterrows():
        chans = [np.asarray(c, dtype=np.int32) for c in row["channels"]]
        if not chans[0].shape[0]:
            continue
        per = [base_window_partials(c, W) for c in chans]
        nw = per[0]["window_start"].shape[0]
        for wdx in range(nw):
            e = m = 0.0
            b = np.zeros(N_BANDS)
            for p in per:  # channel order 0,1,2 — the pinned fold order
                e = e + float(p["spec_energy"][wdx])
                m = m + float(p["spec_mass"][wdx])
                b = b + p["band_energy"][wdx]
            g = got[(row["doc_id"], int(per[0]["window_start"][wdx]))]
            assert g["n_channels"] == 3
            assert g["spec_energy"] == e and g["spec_mass"] == m
            assert g["spec_centroid"] == (m / e if e > 0.0 else 0.0)
            for k in range(N_BANDS):
                assert g[f"band_{k}"] == b[k]
            checked += 1
    assert checked > 50


def test_cross_channel_spectral_band_mismatch_raises(spark, multi_df):
    """An n_bands that disagrees with the stored band_energy length fails
    loudly instead of silently nulling the pooled band sums (zip_with would
    pad the shorter array with nulls)."""
    from tsrollup.channels import cross_channel_spectral, melt_channels
    from tsrollup.rollup import rollup_sequences

    rolled = rollup_sequences(melt_channels(multi_df), 64, {"t64": 1})
    with pytest.raises(Exception, match="band_energy has"):
        cross_channel_spectral(rolled, n_bands=3).collect()
