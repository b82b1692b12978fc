"""Mergeable approximate-distinct sketches: KMV (bottom-k) and
HyperLogLog registers — the decomposable twins of COUNT(DISTINCT).

COUNT(DISTINCT key) is the one classic aggregate Spark cannot roll up
across retention tiers (rolling_actives documents the same wall: a
distinct is not mergeable, so every re-grain pays a full re-scan of the
raw events). Both sketches here ARE mergeable continuous aggregates:

- **KMV / bottom-k** (``kmv_sketch``): per group, the k smallest
  DISTINCT 60-bit hashes of the key. Merging = union + re-take-k, and
  "k smallest of a union of per-part k-smallest sets" is EXACTLY the
  global k smallest (same theorem as distributed top-k), so a sketch
  merged minute→hour→day is bit-identical to one built from raw events.
  Estimate: exact count when fewer than k hashes were seen, else the
  classical (k−1)·R / h_(k) with R = 2^60 the hash range and h_(k) the
  k-th minimum (relative error ≈ 1/√(k−2)).
- **HyperLogLog registers** (``hll_registers``): per group, m = 2^p
  registers each holding max(ρ) where ρ = leading-zero-count + 1 of the
  hash remainder. Register merge = element-wise max — associative, so
  tier re-agg is exact by construction. The raw estimate
  α·m²/Σ 2^(−ρ_j) is emitted via a SINGLE double division of two
  exactly-representable operands (integer-scaled denominator, literal
  numerator), so it is bit-reproducible cross-engine. The small-range
  (linear counting) correction needs ln(), which is libm-unsafe for
  hash oracles (same call as softmax entropy, COVERAGE §2.3), so the
  raw estimate plus the zero-register count are emitted and callers
  apply ``m·ln(m/V)`` downstream when n ≲ 2.5m.

Cross-engine determinism: hashes are the repo-standard 60-bit md5 slice
(dedup._h60 — ``conv(substr(md5(x),1,15),16,10)`` in Spark,
``('0x'||substr(md5(x),1,15))::BIGINT`` in DuckDB); ρ uses
``length(bin(w))`` (verified identical in both engines, including
bin(0)='0'); all sums are int64 (with p=8, Σ 2^(53−ρ) ≤ 256·2^53 = 2^61
fits comfortably), and each estimate is one literal-over-integer double
division — no transcendental anywhere.

Scale shape (100 TB): both sketches reduce events-sized input to
sketch-sized state in ONE exchange with map-side partial aggregation
(HLL: groupBy max; KMV: distinct then a spillable per-group sort). The
stored sketch table is tiny (buckets × m rows / buckets × k entries),
and every coarser tier is computed from the stored sketch — never from
raw events — which is the whole point.

Reference analog: the per-window summary statistics the reference
computes per segment (TSFEDL/data.py windowing + feature summaries);
here the summary is a cardinality sketch so the rollup stays mergeable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tsrollup.dedup import _h60

HASH_RANGE = 1 << 60  # _h60 yields 15 hex chars = [0, 2^60)


def kmv_sketch(df: DataFrame, key_col: str, group_cols: list[str],
               k: int = 64, key_is_hash: bool = False) -> DataFrame:
    """Bottom-k sketch: the ``k`` smallest distinct 60-bit key hashes
    per group, as a sorted array column ``kmv`` (ascending; shorter
    than k means the group's exact distinct count is the array size).

    Plan: distinct (group, hash) — one exchange with map-side partial —
    then a per-group spillable sort + row_number prune reusing the same
    partitioning (no second exchange), then a ≤k-row collect per group.

    ``key_is_hash=True`` declares ``key_col`` already holds the 60-bit
    hash — the hash-once-sketch-many path: a pipeline feeding several
    sketches (or several groupings) stages ``dedup._h60`` once and every
    sketch reads the staged column instead of re-running md5 per sketch.
    """
    if k < 2:
        raise ValueError("need k >= 2 (the estimator divides by k-1)")
    h = (F.col(key_col) if key_is_hash
         else _h60(F.col(key_col).cast("string")))
    hashed = (df.select(*group_cols, h.alias("_h"))
              .filter(F.col("_h").isNotNull())  # COUNT(DISTINCT) parity
              .distinct())
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (hashed
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .groupBy(*group_cols)
            .agg(F.array_sort(F.collect_list("_h")).alias("kmv")))


def kmv_merge(sketch: DataFrame, group_cols: list[str],
              k: int = 64) -> DataFrame:
    """Merge sketches to a coarser grouping: union the hash sets and
    re-take the k smallest. Exact: per-part bottom-k sets cover the
    global bottom-k, so the merged sketch equals one built from raw."""
    exploded = sketch.select(*group_cols, F.explode("kmv").alias("_h"))
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (exploded.distinct()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .groupBy(*group_cols)
            .agg(F.array_sort(F.collect_list("_h")).alias("kmv")))


def kmv_estimate(sketch: DataFrame, k: int = 64) -> Column:
    """Distinct-count estimate column for a ``kmv`` sketch row: the
    exact array size when the group saw fewer than k hashes, else
    (k−1)·2^60 / h_(k). The numerator (k−1)·2^60 is an exact double for
    any k ≤ 2^53 (trailing zero bits are free), so the estimate is one
    deterministic division."""
    n = F.size("kmv")
    hk = F.element_at("kmv", k).cast("double")
    num = float((k - 1) * HASH_RANGE)  # exact: (k-1) · 2^60
    return (F.when(n < k, n.cast("double"))
            .otherwise(F.lit(num) / hk))


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str],
                  p: int = 8, key_is_hash: bool = False) -> DataFrame:
    """HyperLogLog register table: one row per (group, register index)
    with the register value r = max over keys of ρ(hash remainder).

    With a 60-bit hash and m = 2^p registers: idx = h mod m, the
    remainder w = h div m has 60−p bits, and ρ = (60−p) − bitlen(w) + 1
    (ρ = 61−p for w = 0). bitlen via length(bin(w)) — engine-portable
    and integer-exact, no log2 anywhere.

    One exchange, map-side partial max; the output is the mergeable
    continuous aggregate (merge = groupBy coarser grain, max(r)).
    ``key_is_hash`` as in :func:`kmv_sketch` — the column already holds
    the 60-bit hash, staged once upstream.
    """
    if not 4 <= p <= 14:
        raise ValueError("need 4 <= p <= 14")
    m = 1 << p
    q = 60 - p  # remainder bits
    h = (F.col(key_col) if key_is_hash
         else _h60(F.col(key_col).cast("string")))
    # stage the hash once so md5 isn't evaluated per derived column
    staged = (df.select(*group_cols, h.alias("_h"))
              .filter(F.col("_h").isNotNull()))  # COUNT(DISTINCT) parity
    w_rem = F.expr(f"_h div {m}")
    rho = (F.when(w_rem == 0, F.lit(q + 1))
           .otherwise(F.lit(q + 1) - F.length(F.bin(w_rem))))
    return (staged
            .select(*group_cols, (F.col("_h") % m).alias("idx"),
                    rho.cast("int").alias("_rho"))
            .groupBy(*group_cols, "idx")
            .agg(F.max("_rho").alias("r")))


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables to a coarser grouping: element-wise max —
    associative and exact, so tier re-agg equals direct-from-raw."""
    return (regs.groupBy(*group_cols, "idx")
            .agg(F.max("r").alias("r")))


def hll_estimate(regs: DataFrame, group_cols: list[str],
                 p: int = 8) -> DataFrame:
    """Raw HLL estimate per group from a register table.

    Integer-scaled harmonic sum: with Q = 61−p the max ρ, a register
    holding r contributes 2^(Q−r) and each of the (m − hit) absent
    registers contributes 2^Q, so S = Σ 2^(Q−ρ_j) · (exactly) and
    est = α_m·m²·2^Q / S — numerator a Python-float literal, S an int64
    (p = 8: S ≤ 256·2^53 = 2^61), one double division: bit-reproducible.

    Output: group_cols…, hll_est (double, raw — apply linear counting
    downstream when est ≲ 2.5m using n_zero), n_hit (long, registers
    set), s_scaled (long, the exact integer denominator — what a store
    would persist next to the registers).
    """
    m = 1 << p
    q_max = 61 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    num = alpha * m * m * float(1 << q_max)
    agg = (regs.groupBy(*group_cols)
           .agg(F.sum(F.expr(f"shiftleft(1L, {q_max} - r)"))
                .alias("_s_hit"),
                F.count("*").cast("long").alias("n_hit")))
    s = (F.col("_s_hit")
         + (F.lit(m) - F.col("n_hit")) * F.lit(1 << q_max).cast("long"))
    return agg.select(*group_cols,
                      (F.lit(num) / s.cast("double")).alias("hll_est"),
                      "n_hit", s.alias("s_scaled"))
