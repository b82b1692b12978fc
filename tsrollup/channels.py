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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import BASE_WINDOW, TIER_FACTOR

# output schema of rollup_channels (ROLLUP_SCHEMA + channel int)
CHANNEL_ROLLUP_SCHEMA = (
    "doc_id string, channel int, source string, tier string, "
    "window_start long, count long, sum long, sumsq long, min int, max int, "
    "mean double, var double, "
    "spec_energy double, spec_mass double, spec_centroid double, "
    "band_energy array<double>"
)


def melt_channels(df: DataFrame, channels_col: str = "channels",
                  masks_col: str | None = None) -> DataFrame:
    """(doc_id, channels: array<array<int>>, source[, masks]) → one row per
    channel: (doc_id, channel, tokens, source[, gap_mask]). posexplode keeps
    the channel index — the Spark-native unpivot of the reference's (T, V)
    axis. ``masks_col`` (array<array<boolean>>, aligned with channels) melts
    each channel's gap mask alongside its signal; a null per-channel mask
    means that channel has no gaps."""
    if masks_col is None:
        return df.select(
            "doc_id",
            F.posexplode(channels_col).alias("channel", "tokens"),
            "source")
    zipped = F.arrays_zip(F.col(channels_col).alias("t"),
                          F.col(masks_col).alias("m"))
    return (df.select("doc_id", F.posexplode(zipped).alias("channel", "cm"),
                      "source")
            .select("doc_id", "channel",
                    F.col("cm.t").alias("tokens"), "source",
                    F.col("cm.m").alias("gap_mask")))


# composite-key separator: a control char that cannot appear in doc ids
# (contract documented on rollup_channels)
_SEP = "\x1f"


def rollup_channels(df: DataFrame, window: int = BASE_WINDOW,
                    tiers: dict[str, int] = TIER_FACTOR) -> DataFrame:
    """Per-channel tumbling rollup of a melted multichannel table — the V>1
    twin of ``rollup.rollup_sequences``: the channel index is folded into a
    composite series key, the ONE engine rollup path runs unchanged (zero
    shuffle, batched kernels — no forked accumulator code to drift), and the
    key is split back afterwards. doc_id must not contain the 0x1f control
    character (enforced: a violating id raises instead of silently
    corrupting the split-back attribution).

    Input columns: doc_id, channel, tokens, source.
    """
    from .rollup import rollup_sequences

    passthrough = ["tokens", "source"] + \
        (["gap_mask"] if "gap_mask" in df.columns else [])
    safe_id = F.when(
        F.col("doc_id").contains(_SEP),
        F.raise_error(F.lit("doc_id contains the reserved 0x1f "
                            "composite-key separator"))
    ).otherwise(F.col("doc_id"))
    keyed = df.select(
        F.concat_ws(_SEP, safe_id,
                    F.col("channel").cast("string")).alias("doc_id"),
        *passthrough)
    rolled = rollup_sequences(keyed, window, tiers)
    parts = F.split(F.col("doc_id"), _SEP)
    return rolled.select(
        F.element_at(parts, 1).alias("doc_id"),
        F.element_at(parts, -1).cast("int").alias("channel"),
        "source", "tier", "window_start", "count", "sum", "sumsq",
        "min", "max", "mean", "var",
        "spec_energy", "spec_mass", "spec_centroid", "band_energy")


def cross_channel_spectral(rolled: DataFrame, n_bands: int | None = None
                           ) -> DataFrame:
    """Channels-first pooling of the SPECTRAL features (reference
    blocks_pytorch.py:430-434 pools whatever features exist — round 2 pooled
    only the integer partials): per (doc, tier, window_start) the per-channel
    band energies, spectral energy and mass are summed across channels, the
    pooled centroid re-derived as mass/energy (0 when energy is 0, matching
    kernels.derive_stats).

    Float sums are order-sensitive, so channels are collected, sorted by
    channel index, and folded SEQUENTIALLY (F.aggregate) — deterministic for
    any V, where a bare SUM()'s combine order floats with partitioning. One
    groupBy shuffle; V is small (≤ tens of leads), so the collected struct
    list per group is bounded."""
    from . import N_BANDS

    nb = N_BANDS if n_bands is None else n_bands
    # zip_with pads the shorter array with nulls, so an n_bands that
    # disagrees with the stored band_energy length would turn the pooled
    # band sums silently null — fail loudly on the first mismatched row
    # instead
    be = F.when(
        F.size("band_energy") == nb, F.col("band_energy")
    ).otherwise(F.raise_error(F.concat(
        F.lit("cross_channel_spectral: band_energy has "),
        F.size("band_energy").cast("string"),
        F.lit(f" bands but n_bands={nb}"))))
    st = F.struct(F.col("channel"), F.col("spec_energy"),
                  F.col("spec_mass"), be.alias("band_energy"))
    g = (rolled.groupBy("doc_id", "tier", "window_start")
         .agg(F.sort_array(F.collect_list(st)).alias("_cs")))
    zero = F.struct(F.lit(0.0).alias("e"), F.lit(0.0).alias("m"),
                    F.array_repeat(F.lit(0.0), nb).alias("b"))
    folded = F.aggregate(
        "_cs", zero,
        lambda acc, s: F.struct(
            (acc["e"] + s["spec_energy"]).alias("e"),
            (acc["m"] + s["spec_mass"]).alias("m"),
            F.zip_with(acc["b"], s["band_energy"],
                       lambda x, y: x + y).alias("b")))
    out = g.select("doc_id", "tier", "window_start",
                   F.size("_cs").alias("n_channels"),
                   folded.alias("_f"))
    e, m = F.col("_f.e"), F.col("_f.m")
    return out.select(
        "doc_id", "tier", "window_start", "n_channels",
        e.alias("spec_energy"), m.alias("spec_mass"),
        F.when(e > 0.0, m / e).otherwise(F.lit(0.0)).alias("spec_centroid"),
        *[F.element_at("_f.b", b + 1).alias(f"band_{b}") for b in range(nb)])


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
