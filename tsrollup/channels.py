"""Multivariate (V>1) signal support: per-channel rollup + cross-channel stats.

The reference's universal data model is ``(N, T, V)`` — N sequences of T
timesteps with V channels (``TSFEDL/data.py:40-43``; the CaiWenjuan golden
test feeds 12-lead input ``(2160, 12)``, ``test/test_keras.py:191-198``).
The engine's Spark-native form is MELTED rows ``(doc_id, channel, tokens)``:
channels are independent signals, so per-channel windowing stays
embarrassingly parallel (zero shuffle, same batched kernels as
``rollup.rollup_sequences``), and a 12-channel corpus is simply 12× the rows
of the same scan — the layout that scales to 10^12 sequences.

Cross-channel operators (channels-first pooling, reference
``blocks_keras.py:255-261`` / ``blocks_pytorch.py:430-434``) then become ONE
groupBy over ``(doc_id, tier, window_start)`` of decomposable integer
partials — exact in any aggregation order, so the derived float stats are
deterministic and SQL-oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import BASE_WINDOW, TIER_FACTOR
from .kernels import derive_stats

CHANNEL_ROLLUP_SCHEMA = (
    "doc_id string, channel int, source string, tier string, "
    "window_start long, count long, sum long, sumsq long, min int, max int, "
    "mean double, var double, "
    "spec_energy double, spec_mass double, spec_centroid double, "
    "band_energy array<double>"
)


def melt_channels(df: DataFrame, channels_col: str = "channels") -> DataFrame:
    """(doc_id, channels: array<array<int>>, source) → one row per channel:
    (doc_id, channel, tokens, source). posexplode keeps the channel index —
    the Spark-native unpivot of the reference's (T, V) axis."""
    return df.select(
        "doc_id",
        F.posexplode(channels_col).alias("channel", "tokens"),
        "source")


def rollup_channels(df: DataFrame, window: int = BASE_WINDOW,
                    tiers: dict[str, int] = TIER_FACTOR) -> DataFrame:
    """Per-channel tumbling rollup of a melted multichannel table — the V>1
    twin of ``rollup.rollup_sequences``: zero shuffle, one mapInPandas pass,
    identical batched kernels, with (doc_id, channel) as the series key.

    Input columns: doc_id, channel, tokens, source.
    """
    from .kernels import batch_tier_chain, batch_window_partials

    pruned = df.select("doc_id", "channel", "tokens", "source")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf["tokens"].values
            sigs: list[np.ndarray] = []
            keep = np.zeros(len(pdf), dtype=bool)
            for i in range(len(pdf)):
                t = np.asarray(toks[i], dtype=np.int32)
                if t.shape[0]:
                    sigs.append(t)
                    keep[i] = True
            if not sigs:
                continue
            base, nw = batch_window_partials(sigs, window)
            chain = batch_tier_chain(base, nw, tiers)
            doc_ids = pdf["doc_id"].values[keep]
            chans = pdf["channel"].values[keep].astype(np.int32)
            srcs = pdf["source"].values[keep]
            cols: dict[str, list] = {k: [] for k in (
                "doc_id", "channel", "source", "tier", "window_start",
                "count", "sum", "sumsq", "min", "max", "mean", "var",
                "spec_energy", "spec_mass", "spec_centroid", "band_energy")}
            for tier, (p, tnw) in chain.items():
                d = derive_stats(p)
                total = int(tnw.sum())
                cols["doc_id"].append(np.repeat(doc_ids, tnw))
                cols["channel"].append(np.repeat(chans, tnw))
                cols["source"].append(np.repeat(srcs, tnw))
                cols["tier"].append(np.repeat(tier, total))
                for f in ("window_start", "count", "sum", "sumsq", "min",
                          "max", "spec_energy", "spec_mass"):
                    cols[f].append(p[f])
                for f in ("mean", "var", "spec_centroid"):
                    cols[f].append(d[f])
                cols["band_energy"].append(p["band_energy"])
            data = {k: np.concatenate(v) for k, v in cols.items()
                    if k != "band_energy"}
            data["band_energy"] = list(
                np.concatenate(cols["band_energy"], axis=0))
            yield pd.DataFrame(data)

    return pruned.mapInPandas(run, CHANNEL_ROLLUP_SCHEMA)


def cross_channel_stats(rolled: DataFrame) -> DataFrame:
    """Channels-first pooling (reference blocks_keras.py:255-261): per
    (doc, tier, window_start), aggregate ACROSS channels. All partials are
    integers (order-independent ⇒ exact); the cross-channel mean is derived
    as one final double division, so the result is deterministic and
    hash-checkable against a SQL oracle.
    """
    return (
        rolled
        .groupBy("doc_id", "tier", "window_start")
        .agg(F.count("*").cast("long").alias("n_channels"),
             F.sum("count").cast("long").alias("count"),
             F.sum("sum").cast("long").alias("sum"),
             F.min("min").cast("long").alias("min"),
             F.max("max").cast("long").alias("max"))
        .select("doc_id", "tier", "window_start", "n_channels",
                "count", "sum", "min", "max",
                (F.col("sum").cast("double") / F.col("count").cast("double"))
                .alias("xchan_mean"))
    )
