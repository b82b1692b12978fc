"""Sliding-window materialization and signal ops as declarative DataFrame plans.

Semantics follow the reference's window generator
(``experiments/timeseries_batch_generator.py:289-295``): windows parameterized
by ``length``, ``stride``, ``sampling_rate``; a window starting at s covers
positions s, s+rate, ..., s+(length-1)*rate and requires them all in-bounds
('valid' convention — pinned, cf. SURVEY §2.4). All JVM-side higher-order
functions (sequence/transform/slice/aggregate) — no Python, no explode of the
token space unless the caller asks for flat output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_window_aggs(df: DataFrame, length: int = 8, stride: int = 4,
                        sampling_rate: int = 1,
                        tokens_col: str = "tokens",
                        start_index: int = 0,
                        end_index: int | None = None,
                        boundaries_col: str | None = None) -> DataFrame:
    """Materialize valid sliding windows and their int aggregates:
    (doc_id, win_start, win_count, win_sum, win_min, win_max).

    win_start ∈ {start_index, +stride, …} with win_start + (length-1)·rate <
    min(n_tok, end_index) (reference 'valid' windows,
    timeseries_batch_generator.py:289; start/end reservation per :168-173).
    If ``boundaries_col`` names an array<int> column of discontinuity
    positions, windows whose span [s, s+(length-1)·rate] contains one are
    EXCLUDED — the reference's filter_indices exclusion zones
    (timeseries_batch_generator.py:238-256)."""
    span = (length - 1) * sampling_rate  # last offset inside the window
    n = F.size(F.col(tokens_col))
    limit = F.least(n, F.lit(end_index)) if end_index is not None else n
    starts = F.sequence(F.lit(start_index), limit - 1 - span, F.lit(stride))
    if boundaries_col is not None:
        b = F.col(boundaries_col)
        starts = F.filter(
            starts,
            lambda s: ~F.exists(b, lambda p: (p >= s) & (p <= s + span)))
    if sampling_rate == 1:
        win = lambda s: F.slice(F.col(tokens_col), s + 1, length)  # noqa: E731
    else:
        win = lambda s: F.transform(  # noqa: E731
            F.sequence(F.lit(0), F.lit(length - 1)),
            lambda i: F.element_at(F.col(tokens_col),
                                   s + i * sampling_rate + 1))
    # Materialize each window ONCE: explode (start, window) pairs, then
    # aggregate the staged window column — building win(s) inside each of
    # the three agg expressions would gather the window 3× per position.
    out = (
        df.filter(limit > span + start_index)  # else sequence() is invalid
        .select(
            "doc_id",
            F.explode(F.transform(starts, lambda s: F.struct(
                s.cast("long").alias("ws"), win(s).alias("w")))).alias("p"))
        .select("doc_id", F.col("p.ws").alias("win_start"),
                F.lit(length).cast("long").alias("win_count"),
                F.aggregate("p.w", F.lit(0).cast("long"),
                            lambda a, x: a + x).alias("win_sum"),
                F.array_min("p.w").cast("long").alias("win_min"),
                F.array_max("p.w").cast("long").alias("win_max"))
    )
    return out


def forecast_window_aggs(df: DataFrame, length: int = 8,
                         label_length: int = 4, shift: int = 8,
                         stride: int = 4,
                         tokens_col: str = "tokens") -> DataFrame:
    """Forecast-target window split (reference WindowGenerator.split_window,
    IGN_experiment.py:125-134; length_target/targets,
    timeseries_batch_generator.py:58-63): each window start s yields an INPUT
    window [s, s+length) and a LABEL window [s+shift, s+shift+label_length) —
    the (X, y) pair of a forecasting dataset. Only fully in-bounds pairs are
    produced ('valid'); shift ≥ length gives non-overlapping horizons,
    shift < length overlapping ones — both supported, as in the reference.

    All JVM-side higher-order functions (sequence/slice/aggregate); no Python.
    """
    total = max(length, shift + label_length)  # positions a pair spans
    tok = F.col(tokens_col)
    n = F.size(tok)
    starts = F.sequence(F.lit(0), n - total, F.lit(stride))

    def aggs(col, pre):
        return [
            F.aggregate(col, F.lit(0).cast("long"), lambda a, x: a + x)
             .alias(f"{pre}_sum"),
            F.array_min(col).cast("long").alias(f"{pre}_min"),
            F.array_max(col).cast("long").alias(f"{pre}_max"),
        ]

    # same staging as sliding_window_aggs: slice each window ONCE into the
    # exploded struct, aggregate the staged arrays afterwards
    return (
        df.filter(n >= total)
        .select(
            "doc_id",
            F.explode(F.transform(starts, lambda s: F.struct(
                s.cast("long").alias("ws"),
                F.slice(tok, s + 1, length).alias("iw"),
                F.slice(tok, s + shift + 1, label_length).alias("lw"),
            ))).alias("p"))
        .select("doc_id", F.col("p.ws").alias("win_start"),
                *aggs(F.col("p.iw"), "in"),
                (F.col("p.ws") + shift).cast("long").alias("label_start"),
                *aggs(F.col("p.lw"), "label"))
    )


def pack_offsets(df: DataFrame, capacity: int = 2048, n_buckets: int = 32,
                 id_col: str = "doc_id", len_col: str = "n_tok") -> DataFrame:
    """GPT-style concat-then-chunk sequence-packing placement: where each
    doc's tokens land when the corpus is concatenated and split into
    fixed-``capacity`` training chunks.

    Docs are deterministically sharded into ``n_buckets`` independent pack
    streams (60-bit md5 of the id, mod buckets — the dedup family's
    cross-engine hash), concatenated in id order WITHIN the bucket, and the
    chunk grid overlays each bucket's stream. This is the 100 TB shape: a
    single global concatenation order would demand a one-partition
    cumulative sum (the whole corpus through one reducer), so production
    packing shards first and packs each shard independently — bucket
    streams scale out, and the one exchange here is the bucket/id window
    partitioning. Emits per-doc placement: token offset in the bucket
    stream, first/last chunk index, chunks spanned. Chunk ids use integer
    ``div`` (not float floor), so offsets past 2^53 stay exact.

    Zero-length docs occupy no tokens: chunk_last = chunk_first, one "span"
    by convention.
    """
    from pyspark.sql import Window

    from tsrollup.dedup import _h60

    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.select(F.col(id_col),
                  F.col(len_col).cast("long").alias("n_tok"),
                  (_h60(F.col(id_col).cast("string")) % n_buckets)
                  .alias("bucket"))
        .withColumn("tok_offset", F.sum("n_tok").over(w) - F.col("n_tok"))
        .withColumn("chunk_first", F.expr(f"tok_offset div {capacity}"))
        .withColumn(
            "chunk_last",
            F.expr(f"(tok_offset + greatest(n_tok - 1, 0L)) div {capacity}"))
        .withColumn("n_chunks",
                    F.col("chunk_last") - F.col("chunk_first") + F.lit(1))
    )


def upsample_repeat(df: DataFrame, factor: int = 2,
                    tokens_col: str = "tokens",
                    out_col: str | None = None) -> DataFrame:
    """UpSampling1D analog (reference blocks_keras.py:153): repeat each element
    ``factor`` times — coarse-to-fine broadcast. ``out_col`` writes the
    upsampled array to a new column instead of replacing the input."""
    rep = F.flatten(F.transform(
        F.col(tokens_col),
        lambda t: F.array_repeat(t, factor)))
    return df.withColumn(out_col or tokens_col, rep)


def znorm_outliers(df: DataFrame, z: float = 2.0, eps: float = 1.001e-5,
                   tokens_col: str = "tokens") -> DataFrame:
    """BatchNorm-inference analog (reference models_keras.py:203-206, ε per
    blocks_pytorch.py:246): per-doc z-normalization, returns how many tokens
    sit beyond ``z`` sigmas. Pinned float order: mean=s/n, var=sq/n-mean²."""
    t = F.col(tokens_col)
    s = F.aggregate(t, F.lit(0).cast("long"), lambda a, x: a + x).cast("double")
    sq = F.aggregate(t, F.lit(0).cast("long"),
                     lambda a, x: a + x.cast("long") * x.cast("long")).cast("double")
    # Materialize the O(n) aggregates as columns FIRST — embedding them inside
    # the per-element filter lambda would re-evaluate them per element (O(n²)).
    stats = df.select(
        "doc_id", t.alias("_t"),
        F.size(t).cast("long").alias("n_tok"),
        (s / F.size(t).cast("double")).alias("mean"),
        (sq / F.size(t).cast("double")
         - (s / F.size(t).cast("double")) * (s / F.size(t).cast("double")))
        .alias("var"))
    mean, denom = F.col("mean"), F.sqrt(F.col("var") + F.lit(eps))
    n_out = F.size(F.filter(
        F.col("_t"), lambda x: F.abs((x.cast("double") - mean) / denom) > z))
    return stats.select("doc_id", "n_tok", "mean", "var",
                        n_out.cast("long").alias("n_outliers"))


def robust_norm_stats(df: DataFrame,
                      tokens_col: str = "tokens") -> DataFrame:
    """Robust per-doc scale statistics — the median/IQR twin of
    :func:`znorm_outliers` (mean/σ are one fat-finger token away from
    useless; median and Tukey hinges are not): exact median, Tukey-hinge
    quartiles, IQR, and the 1.5·IQR fence census, all DIVISION-FREE on a
    ×2 integer scale so any SQL engine reproduces every value bit-for-bit.

    Pinned order-statistic rule (documented, cross-engine trivial):
    median×2 = s[(n−1)÷2] + s[n÷2] over the sorted tokens; the hinges are
    the same midpoint rule over the lower/upper HALVES of length
    m = (n+1)÷2 (Tukey's convention: an odd-length doc's median belongs
    to both halves). The fence test |t − med| > 1.5·IQR clears to
    2·|2t − med2| > 3·iqr2 — pure int64.

    Shape: a pure per-row map — one array_sort per doc, zero exchanges,
    zero row amplification; the O(n) sort is doc-local exactly like the
    kernels path. Empty docs emit NULL stats and 0 outliers.

    Output: doc_id, n_tok (long), median2, h1x2, h2x2, iqr2 (long,
    ×2-scaled), n_outliers (long).
    """
    t = F.col(tokens_col)
    n = F.size(t)
    s = F.array_sort(t)

    def _mid2(offset, length):
        # ×2 midpoint of the sorted slice s[offset : offset+length]
        lo = offset + (length - 1) / 2 + 1   # 1-based element_at
        hi = offset + length / 2 + 1
        return (F.element_at(s, lo.cast("int")).cast("long")
                + F.element_at(s, hi.cast("int")).cast("long"))

    m = (n + 1) / 2
    # the index arithmetic divides only by 2 — exact in IEEE doubles for
    # any int32 length, truncating cast == floor on the non-negatives.
    # Mids are guarded per row: element_at(s, 0) on an empty doc throws.
    staged = df.select(
        "doc_id", t.alias("_t"), n.alias("_n"),
        F.when(n > 0, _mid2(F.lit(0), n)).alias("median2"),
        F.when(n > 0, _mid2(F.lit(0), m.cast("int"))).alias("h1x2"),
        F.when(n > 0, _mid2(n - m.cast("int"), m.cast("int")))
        .alias("h2x2"))
    iqr2 = F.col("h2x2") - F.col("h1x2")
    med2 = F.col("median2")
    fence = F.size(F.filter(
        F.col("_t"),
        lambda x: 2 * F.abs(2 * x.cast("long") - med2) > 3 * iqr2))
    return staged.select(
        "doc_id", F.col("_n").cast("long").alias("n_tok"),
        med2.alias("median2"), "h1x2", "h2x2", iqr2.alias("iqr2"),
        F.when(F.col("_n") > 0, fence).otherwise(F.lit(0))
        .cast("long").alias("n_outliers"))
