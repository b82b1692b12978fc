"""Annotation-run segmentation: the reference's raw-signal → segments pipeline
(``TSFEDL/data.py:10-96`` get_mit_bih_segments) as a declarative Spark plan.

Semantics (pinned to the reference, FIXTURES.md F3):

1. runs of consecutive equal annotation symbols (``data.py:50-57``) —
   gaps-and-islands over the annotation stream;
2. each run [first_pos, last_pos] expanded by ``left_offset``/``right_offset``
   and clamped to the signal bounds (``data.py:65-71``);
3. the signal slice is truncated / right-zero-padded to ``fixed_length``
   (``data.py:79-84``);
4. output one row per run: (series_id, seg_id, symbol, seg array, n_raw).

Everything is built-in column functions — islands via lag+cumsum window,
slice/pad via slice/concat/array_repeat. The one shuffle is the per-series
window; segments of one series stay co-partitioned for downstream rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def annotation_runs(ann: DataFrame) -> DataFrame:
    """Runs of consecutive equal symbols per series: (series_id, seg_id,
    symbol, first_pos, last_pos, n_ann). ``ann`` columns: series_id, pos,
    symbol (pos strictly increasing per series).

    Per-run aggregates are WINDOW functions over (series_id, seg_id) with a
    last-row-of-run filter, not a groupBy: HashPartitioning(series_id)
    satisfies the (series_id, seg_id) clustering requirement, so the whole
    run computation rides the ONE per-series exchange — and the output stays
    partitioned by series_id, which is exactly what the downstream
    signal-join clusters on (the former groupBy repartitioned to the 3-col
    key and forced the join to exchange both sides again; round-5 plan
    tightening, VERDICT r4 item 7)."""
    w = Window.partitionBy("series_id").orderBy("pos")
    chg = F.when(
        F.lag("symbol").over(w).isNull()
        | (F.lag("symbol").over(w) != F.col("symbol")), 1).otherwise(0)
    runs = (ann.withColumn("_chg", chg)
            .withColumn("seg_id", F.sum("_chg").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    wr = Window.partitionBy("series_id", "seg_id")
    return (runs
            .withColumn("first_pos", F.min("pos").over(wr))
            .withColumn("last_pos", F.max("pos").over(wr))
            .withColumn("n_ann", F.count("*").over(wr))
            .filter(F.col("pos") == F.col("last_pos"))
            .select("series_id", "seg_id", "symbol",
                    "first_pos", "last_pos", "n_ann"))


def extract_segments(signal: DataFrame, ann: DataFrame,
                     left_offset: int = 99, right_offset: int = 160,
                     fixed_length: int = 1000) -> DataFrame:
    """Cut a long per-series signal into fixed-length annotated segments.

    ``signal`` columns: series_id, values array<double|int> (position index =
    timestamp). Expansion, clamping and truncate/right-zero-pad follow the
    reference exactly (data.py:65-84): start = max(first_pos - left, 0),
    stop = min(last_pos + right, len) exclusive, then seg = values[start:stop]
    truncated or zero-padded to fixed_length.
    """
    runs = annotation_runs(ann)
    j = runs.join(signal, "series_id")
    n = F.size("values")
    start = F.greatest(F.col("first_pos") - left_offset, F.lit(0))
    stop = F.least(F.col("last_pos") + right_offset, n)  # exclusive
    raw_len = F.least(stop - start, F.lit(fixed_length))
    seg = F.slice("values", start + 1, raw_len)
    pad = F.greatest(F.lit(fixed_length) - raw_len, F.lit(0)).cast("int")
    padded = F.concat(seg, F.array_repeat(F.lit(0.0).cast("double"), pad))
    return (j.select(
        "series_id", "seg_id", "symbol",
        F.transform(padded, lambda x: x.cast("double")).alias("seg"),
        (stop - start).cast("int").alias("n_raw"))
        .filter(F.col("n_raw") > 0))


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes`` — the time-domain twin of
    annotation_runs' gaps-and-islands (lag + cumulative-sum over one
    per-user window).

    Appends ``session_id`` (1-based per user). Both window passes share
    the (user, ts, id) partitioning/order, so the plan pays ONE exchange
    and one sort; at 100 TB sessions never cross the per-user partition,
    and the gap compare runs on exact integer microseconds
    (``unix_micros``) — no float time arithmetic, so a SQL engine's
    epoch_us reproduces the boundaries exactly."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # session tz is UTC → NTZ cast matches DuckDB's naive-as-UTC epoch_us
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    boundary = F.when(
        prev.isNull() | ((us - prev) > gap_minutes * 60_000_000),
        F.lit(1)).otherwise(F.lit(0))
    return (events.withColumn("_boundary", boundary)
            .withColumn("session_id",
                        F.sum("_boundary").over(
                            w.rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)))
            .drop("_boundary"))


def funnel_counts(events: DataFrame,
                  steps: tuple[str, ...] = ("view", "click", "purchase"),
                  gap_minutes: int = 30, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  type_col: str = "event_type") -> DataFrame:
    """Session funnel analysis: how many sessions reach each step of an
    ORDERED event chain (step k counts only when it happens strictly
    after the session's step-k−1 arrival) — the product-analytics twin of
    :func:`sessionize`, answering "where do users drop off".

    Semantics: sessions come from the gap rule above; within a session,
    step 1's arrival is the earliest step-1 event, and step k's arrival
    is the earliest step-k event strictly later (exact integer
    microseconds) than step k−1's arrival — the greedy-earliest chain,
    which reaches step k iff any increasing chain exists. Same-microsecond
    events cannot chain (physical simultaneity is unordered; exact and
    engine-agnostic, unlike a row-number tiebreak whose peer order SQL
    engines disagree on).

    Shape: sessionize's per-user exchange is the ONLY data exchange —
    the k chained conditional-min windows and the per-session regroup all
    cluster on (user, session), which the user hash already satisfies.
    The final k-row summary is a single-row global aggregate exploded to
    step grain.

    Output: step_idx (int, 1-based), step, n_sessions (sessions reaching
    the step), n_total (all sessions), conv_from_first, conv_from_prev
    (doubles; step 1's conv_from_prev is vs n_total).
    """
    if len(steps) < 2 or len(set(steps)) != len(steps):
        raise ValueError("steps must be >= 2 distinct event types")
    sess = sessionize(events, gap_minutes=gap_minutes, user_col=user_col,
                      ts_col=ts_col, id_col=id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col, "session_id")
    staged = sess.select(user_col, "session_id",
                         F.col(type_col).alias("_t"), us.alias("_us"))
    for i, step in enumerate(steps):
        cond = F.col("_t") == step
        if i > 0:
            cond = cond & (F.col("_us") > F.col(f"_st{i - 1}"))
        staged = staged.withColumn(f"_st{i}",
                                   F.min(F.when(cond, F.col("_us"))).over(w))
    per_sess = (staged
                .groupBy(user_col, "session_id")
                .agg(*[F.max(F.col(f"_st{i}").isNotNull().cast("long"))
                       .alias(f"_r{i}") for i in range(len(steps))]))
    totals = per_sess.agg(
        F.count("*").cast("long").alias("_n_total"),
        *[F.sum(f"_r{i}").cast("long").alias(f"_n{i}")
          for i in range(len(steps))])
    def ratio(n_col: str, d_col: str):
        # zero denominators yield NULL explicitly: Spark nulls a zero
        # division while DuckDB follows IEEE — don't let engines diverge
        return F.when(F.col(d_col) > 0,
                      F.col(n_col).cast("double")
                      / F.col(d_col).cast("double"))

    rows = F.array(*[
        F.struct(F.lit(i + 1).cast("int").alias("step_idx"),
                 F.lit(s).alias("step"),
                 F.col(f"_n{i}").alias("n_sessions"),
                 F.col("_n_total").alias("n_total"),
                 ratio(f"_n{i}", "_n0").alias("conv_from_first"),
                 ratio(f"_n{i}",
                       f"_n{i - 1}" if i > 0 else "_n_total")
                 .alias("conv_from_prev"))
        for i, s in enumerate(steps)])
    return (totals.select(F.explode(rows).alias("r")).select("r.*")
            .filter(F.col("n_total") > 0))


def interval_coverage(intervals: DataFrame,
                      key_cols: tuple[str, ...] = ("user_id",),
                      start_col: str = "start_us",
                      end_col: str = "end_us") -> DataFrame:
    """Covered-time aggregation over possibly-OVERLAPPING half-open
    intervals ``[start, end)`` — "how much wall-clock was this key
    actually active", the utilization/uptime statistic (SQL
    gaps-and-islands with a running max-end; the overlap-tolerant twin
    of :func:`sessionize`, whose sessions never overlap by
    construction). Overlapping and TOUCHING intervals merge (half-open:
    ``[0,10)`` + ``[10,20)`` is continuous coverage).

    Exactness: starts/ends are exact integers (µs or any integer axis);
    island detection is `start > running max of prior ends` (strict —
    touching merges), island extents are min/max integers, and
    ``utilization`` is the single IEEE division covered/span.

    Shape: ONE exchange on the key — the ordered island window, the
    (key, island) extent aggregation, and the per-key rollup all
    cluster on a superset of the key, so EnsureRequirements reuses the
    window's hash exchange end-to-end (plan-guarded in tests). This is
    the standard distributed interval-union: no self-join, no
    interval explosion, linear in the interval count.

    Output: key_cols…, n_intervals (long), n_islands (long),
    covered (long, Σ island extents), span (long, max end − min start),
    utilization (double, NULL when span is 0).
    """
    kc = list(key_cols)
    # empty [s,s) and inverted intervals cover nothing — dropped up
    # front (NULL bounds likewise; an island seeded by one would
    # corrupt the running max)
    iv = (intervals
          .filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
          .select(*kc, F.col(start_col).cast("long").alias("_s"),
                  F.col(end_col).cast("long").alias("_e"))
          .filter(F.col("_e") > F.col("_s")))
    w = Window.partitionBy(*kc).orderBy("_s", "_e")
    prev_max_end = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flag = F.when(prev_max_end.isNull()
                  | (F.col("_s") > prev_max_end), 1).otherwise(0)
    flagged = iv.withColumn("_new", flag)
    island = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ext = (flagged.withColumn("_isl", island)
           .groupBy(*kc, "_isl")
           .agg(F.count("*").cast("long").alias("_n"),
                F.min("_s").alias("_is"),
                F.max("_e").alias("_ie")))
    out = (ext.groupBy(*kc)
           .agg(F.sum("_n").cast("long").alias("n_intervals"),
                F.count("*").cast("long").alias("n_islands"),
                F.sum(F.col("_ie") - F.col("_is")).cast("long")
                .alias("covered"),
                (F.max("_ie") - F.min("_is")).cast("long").alias("span")))
    return out.withColumn(
        "utilization",
        F.when(F.col("span") > 0,
               F.col("covered").cast("double")
               / F.col("span").cast("double")))
