"""Time-series joins: distributed as-of join.

The classic timeseries-engine operator the tier store needs: attach to each
event the latest COMPLETED coarser-tier point at or before its timestamp
(e.g. "what did the last finished 1m rollup window say when this event
arrived"). The reference has no direct analog (its closest motion is the
checkpoint-reload "latest state ≤ now" lookup, models_keras.py:75-77); the
semantics here follow the standard ASOF JOIN (DuckDB/kdb): for each left
row, the right row with the greatest right_ts ≤ left_ts within the key.

Scale shape: the UNION-WINDOW form — both sides are unioned with a side
marker, hash-partitioned by key and sorted by (ts, right-first), and a
last_value(ignore nulls) running window carries the most recent right row
forward onto every left row. ONE shuffle on the join key (no range join, no
per-key loop, no broadcast requirement on either side); skewed keys can be
salted upstream exactly like the rollup path. A naive range join would be
O(|L|·|R|) per key; Spark's own ASOF support doesn't exist, and a windowed
self-merge is the established distributed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              attrs: tuple[str, ...], how: str = "inner",
              direction: str = "backward",
              tolerance: int | None = None) -> DataFrame:
    """For each ``left`` row, attach ``attrs`` from the matching ``right``
    row sharing the ``on`` key — ``direction`` picks the match (the kdb
    ``aj``-family semantics): ``backward`` (default) takes the greatest
    ``right_ts`` ≤ ``left_ts``; ``forward`` the smallest ``right_ts`` ≥
    ``left_ts``; ``nearest`` whichever of the two sits closer, ties to
    backward. All three are the same ONE-shuffle union-window plan —
    ``nearest`` adds a second sort on the SAME partitioning (no extra
    exchange), with the time delta compared on the exact integer-µs axis
    for timestamp columns.

    ``tolerance`` (pandas ``merge_asof`` semantics) bounds how far the
    match may sit from the left timestamp: a match whose |delta| exceeds
    it is treated as NO match (dropped under 'inner', null attrs under
    'left'). Units are microseconds for timestamp axes, otherwise the
    integer axis's own units; the compare is inclusive (delta ≤
    tolerance) and exact-integer. Because the chosen match is always the
    CLOSEST one in the direction, applying the bound after the choice
    equals bounding the search — no second pass needed, same ONE-shuffle
    plan.

    Ties at equal timestamps match (≤ / ≥ inclusive, DuckDB ASOF
    semantics): the sort places right rows BEFORE left rows at the same
    instant. ``right`` must
    be unique per (on, right_ts) — the tier-store contract (one point per
    window). ``how='inner'`` drops left rows with no matching right row
    in the chosen direction (backward: none at-or-before; forward: none
    at-or-after; nearest: none at all); ``'left'`` keeps them with null
    attrs.

    The matched right row is carried as ONE struct (a single
    last(ignorenulls) over the whole attr tuple): carrying attrs in
    separate last() columns would backfill a NULL attr of the true match
    from an OLDER right row — stitching together a row that never existed.
    Right rows with a NULL ``right_ts`` are dropped up front (a null
    timestamp matches nothing under ts ≤, but NULLS-FIRST ordering would
    otherwise carry such a row onto every left row that precedes all real
    right rows); left rows with NULL ``left_ts`` match nothing (dropped by
    'inner', null attrs under 'left'). NULL ``on`` keys follow SQL/DuckDB
    ASOF semantics — they never match: right rows with a NULL key are
    dropped up front (Window.partitionBy would otherwise group them with
    NULL-key left rows and "match" them), so a NULL-key left row is dropped
    under 'inner' and carries null attrs under 'left'.
    """
    if not attrs:
        raise ValueError("asof_join needs at least one right attr")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction {direction!r}")
    if tolerance is not None and int(tolerance) < 0:
        raise ValueError("tolerance must be >= 0")
    if "_rt" in attrs:
        raise ValueError("attr name '_rt' is reserved (carried match ts)")
    lcols = [c for c in left.columns if c not in (on, left_ts)]
    clash = set(attrs) & set(lcols)
    if clash:
        raise ValueError(
            f"asof_join: right attrs {sorted(clash)} collide with left "
            "columns — alias one side first (the output would carry "
            "duplicate column names)")
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(
                F.col(right_ts).alias("_rt"),
                *[F.col(a) for a in attrs]).alias("_r"))
            .schema["_r"].dataType).alias("_r"))
    r = right.filter(F.col(right_ts).isNotNull()
                     & F.col(on).isNotNull()).select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(l.schema["_l"].dataType).alias("_l"),
        F.struct(F.col(right_ts).alias("_rt"),
                 *[F.col(a) for a in attrs]).alias("_r"))
    u = l.unionByName(r)
    # right rows sort FIRST at equal _t so a left row at exactly right_ts
    # sees it (the ≤ / ≥ contract). asc is NULLS FIRST and desc is forced
    # nulls-first too: a NULL left ts must traverse BEFORE any right row
    # in either direction so it matches nothing.
    wb = (Window.partitionBy(on)
          .orderBy(F.col("_t").asc(), F.col("_side").desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(on)
          .orderBy(F.desc_nulls_first("_t"), F.col("_side").desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ts_type = left.schema[left_ts].dataType.typeName()
    if ts_type.startswith("timestamp"):
        def _us(c):
            return F.unix_micros(c.cast("timestamp"))
    else:
        def _us(c):
            return c
    if direction == "backward":
        matched = F.last("_r", ignorenulls=True).over(wb)
    elif direction == "forward":
        matched = F.last("_r", ignorenulls=True).over(wf)
    else:
        b = F.last("_r", ignorenulls=True).over(wb)
        fwd = F.last("_r", ignorenulls=True).over(wf)
        db = _us(F.col("_t")) - _us(b["_rt"])
        df_ = _us(fwd["_rt"]) - _us(F.col("_t"))
        matched = (F.when(b.isNull(), fwd)
                   .when(fwd.isNull(), b)
                   .when(db <= df_, b).otherwise(fwd))
    carried = u.select(
        on, "_t", "_side", "_l", matched.alias("_m"))
    if tolerance is not None:
        # applied AFTER the window materializes _m (one window expr, not
        # two): the match is the closest row in the direction, so
        # bounding it post-choice == bounding the search
        delta = F.abs(_us(F.col("_t")) - _us(F.col("_m")["_rt"]))
        carried = carried.withColumn(
            "_m", F.when(delta <= F.lit(int(tolerance)), F.col("_m")))
    out = carried.filter(F.col("_side") == 0)
    if how == "inner":
        out = out.filter(F.col("_m").isNotNull())
    elif how != "left":
        raise ValueError(how)
    return out.select(on, F.col("_t").alias(left_ts),
                      *[F.col(f"_l.{c}").alias(c) for c in lcols],
                      *[F.col(f"_m.{a}").alias(a) for a in attrs])


def _exact_bucket(c, bw: int):
    """Exact integer floor-bucket: F.floor(col / lit) runs a DOUBLE
    division whose rounding could (for |ts| beyond 2^53) land a point or
    interval edge in the wrong bucket and silently DROP a candidate pair
    before any residual filter sees it. (c - pmod(c, bw)) is an exact
    multiple of bw (pmod is non-negative, so this is the floor multiple
    even for negative c) and `div` is exact long integer division —
    correct for any long input. Shared by range_join and interval_join
    (one copy: the subtlety must not drift)."""
    c = c.cast("long")
    return F.call_function("div", c - F.pmod(c, F.lit(bw)), F.lit(bw))


def range_join(points: DataFrame, intervals: DataFrame, on: str,
               point_ts: str, start_col: str, end_col: str,
               bucket_width: int, attrs: tuple[str, ...]) -> DataFrame:
    """Interval-containment join: attach ``attrs`` from every interval
    [start, end) containing each point's timestamp (same key). Half-open on
    the right, closed on the left — a point AT ``start`` matches, at ``end``
    does not.

    Scale shape — the BUCKETIZED equi-join: a raw ``p.ts >= i.start AND
    p.ts < i.end`` predicate forces Spark into a per-key nested loop
    (O(|P|·|I|) per key). Instead each interval explodes to the time buckets
    of width ``bucket_width`` it overlaps, points map to their single
    bucket, and the join is a plain equi-join on (key, bucket) + a residual
    containment filter — candidate volume per point is only the intervals
    overlapping its bucket. Pick ``bucket_width`` ≈ the typical interval
    length: shorter explodes long intervals into many rows, longer makes
    buckets catch unrelated intervals. An interval emits
    ⌈span/bucket_width⌉+1 rows — bounded and linear in its length.

    ``intervals`` should be unique per (key, start); duplicate matches are
    impossible because each (point, interval) pair meets in exactly one
    bucket (the point's)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    reserved = {"_bk", "_is", "_ie"}
    bad = (reserved & set(points.columns)) | (reserved & set(intervals.columns))
    if bad:
        raise ValueError(f"range_join: input columns {sorted(bad)} collide "
                         "with internal names — rename them first")
    pclash = ({start_col, end_col} | set(attrs)) & set(points.columns)
    if pclash:
        raise ValueError(
            f"range_join: interval columns {sorted(pclash)} collide with "
            "point columns — alias one side first")
    bw = int(bucket_width)

    def _bucket(c):
        return _exact_bucket(c, bw)

    # empty/inverted intervals (end ≤ start) match nothing by the [s, e)
    # contract — filtered up front, since sequence(floor(s/b), floor((e-1)/b))
    # on an inverted interval would otherwise count DOWN and explode one bad
    # row into up to |span| bucket rows
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.select(
        F.col(on),
        F.col(start_col).alias("_is"), F.col(end_col).alias("_ie"),
        *[F.col(a) for a in attrs],
        F.explode(F.sequence(_bucket(F.col(start_col)),
                             _bucket(F.col(end_col) - 1)))
        .alias("_bk"))
    pt = points.withColumn("_bk", _bucket(F.col(point_ts)))
    return (pt.join(iv, [on, "_bk"])
            .filter((F.col(point_ts) >= F.col("_is"))
                    & (F.col(point_ts) < F.col("_ie")))
            .drop("_bk", "_is", "_ie"))


def interval_join(left: DataFrame, right: DataFrame, bucket_width: int,
                  left_id: str = "left_id", right_id: str = "right_id",
                  start_col: str = "start_us",
                  end_col: str = "end_us") -> DataFrame:
    """Interval OVERLAP join: every (left, right) pair whose half-open
    spans ``[start, end)`` intersect — the maintenance-window ×
    incident / session × outage attribution join (``range_join``'s
    two-sided sibling: there one side is points, here both carry
    extent).

    Scale shape — bucketized like :func:`range_join`, but a pair of
    overlapping intervals now meets in EVERY bucket both cover, so the
    naive fix is ``.distinct()`` — a second full shuffle of the pair
    stream. Instead each surviving pair is kept only in the bucket
    containing its overlap's START (``greatest(ls, rs)``): that bucket
    is always among the shared ones (the overlap start lies in both
    intervals), and it is unique — the exactly-once rule costs one
    integer comparison, not a shuffle.

    Exactness: starts/ends are exact integers (µs or any integer axis);
    bucket assignment is the same pmod/div exact floor as range_join
    (never a double division). Empty/inverted intervals match nothing.

    Inputs: each side carries (id, ``start_col``, ``end_col``); ids are
    surfaced as ``left_id``/``right_id``. Pick ``bucket_width`` ≈ the
    typical interval length (an interval emits ⌈span/width⌉+1 bucket
    rows — bounded, linear in its length).

    Output: left_id, right_id, overlap_start_us, overlap_end_us,
    overlap_us (all long; one row per overlapping pair).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    bw = int(bucket_width)

    def _bucket(c):
        return _exact_bucket(c, bw)

    def _side(df, id_col, id_alias, s_alias, e_alias):
        return (df
                .filter(F.col(end_col) > F.col(start_col))
                .select(F.col(id_col).alias(id_alias),
                        F.col(start_col).cast("long").alias(s_alias),
                        F.col(end_col).cast("long").alias(e_alias),
                        F.explode(F.sequence(
                            _bucket(F.col(start_col)),
                            _bucket(F.col(end_col).cast("long") - 1)))
                        .alias("_bk")))

    l = _side(left, left_id, "_lid", "_ls", "_le")
    r = _side(right, right_id, "_rid", "_rs", "_re")
    ov_s = F.greatest(F.col("_ls"), F.col("_rs"))
    ov_e = F.least(F.col("_le"), F.col("_re"))
    return (l.join(r, "_bk")
            .filter((F.col("_ls") < F.col("_re"))
                    & (F.col("_rs") < F.col("_le"))
                    & (F.col("_bk") == _bucket(ov_s)))
            .select(F.col("_lid").alias(left_id),
                    F.col("_rid").alias(right_id),
                    ov_s.alias("overlap_start_us"),
                    ov_e.alias("overlap_end_us"),
                    (ov_e - ov_s).alias("overlap_us")))
