"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

It also measures the engine's native headline number — rollup throughput in
sequences/sec over the seeded F1 sequences fixture (BASELINE.json metric) —
and reports it in the same JSON line under ``rollup_seqs_per_sec``.

Every timing forces FULL materialization with the noop sink
(``df.write.format("noop")``) so lazy plans can't cheat; the noop sink also
keeps the measurement free of driver-collect overhead.

Scaling-efficiency evidence (pinned N vs 4N cores) lives in
``tools/bench_scaling.py`` → ``BENCH/BASELINE.md``; this file is the
single-parallelism per-round benchmark the driver records as BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline queries: the engine paths (rollup/tiers/codec/spectral) plus one of
# each operator family from SURVEY.md §2. The deliberately-quadratic
# exactness baseline (cosine_topk, pinned to <100 vecs) stays out; jaccard
# runs UNPINNED under its document-frequency cap.
HEADLINE = [
    "rollup_base",
    "rollup_tier_reagg",
    "rollup_compressed_roundtrip",
    "rollup_spectral",
    "rollup_multichannel",
    "cross_channel_stats",
    "cross_channel_spectral",
    "rollup_chunked",
    # checkpoint_rollup / stream_rollup / incremental_rollup are
    # end-to-end correctness demonstrations (write input + store/sink,
    # fixed multi-second I/O); the driver's correctness gate value-checks
    # them at sf0.01 — they are deliberately not part of the perf headline.
    "gapfill_ffill",
    "global_agg",
    "sliding_windows",
    "windows_forecast",
    "znorm_outliers",
    "segment_islands",
    "downsample_minute",
    "range_join",
    "topk_events",
    "pricing_summary",
    "revenue_by_nation",
    "rolling_mean_events",
    "sessionize",
    "session_windows",
    "counter_increase",
    "m4_downsample",
    "wfdb_roundtrip",
    "cusum_drift",
    "cusum_episodes",
    "changepoint",
    "last_point",
    "time_bucket",
    "feature_table",
    "cadence_gaps",
    "lag_coupling",
    "asof_join",
    "token_stats",
    "quality_score",
    "bigram_lm",
    "collocations",
    "pii_scan",
    "repetition",
    "pack_offsets",
    "vocab_topk",
    "source_mixture",
    "dedup_exact",
    "novelty",
    "dup_spans",
    "jaccard_pairs",
    "minhash_signatures",
    "lsh_pairs",
    "simhash",
    "decontaminate",
    "cosine_knn",
    "ann_lsh",
    "embed_near_dups",
    "ivf_knn",
    "conv1d_valid",
    "conv1d_same",
    "conv1d_same_strided",
    "conv1d_full",
    "pool_overlap",
    "dense_proj",
    "tier_join",
    "ewma_scan",
    "media_features",
    "one_hot_events",
    "residual_add",
    "attention_gate",
    "activations",
    "dedup_cluster",
    "grouping_sets",
    "hash_split",
    "per_source_stats",
    "segment_extract",
    "windows_excluded",
    "retention",
    "pipeline_zoo",
    "paa_sax",
    "sax_words",
    "acf_moments",
    "tfidf_topk",
    "quantile_summary",
    "source_drift",
    "time_weighted_avg",
    "grid_gapfill",
    "burn_rate",
    "mad_outliers",
    "holt_scan",
    "lttb",
    "trend_slope",
    "seasonal_baseline",
    "heavy_hitters",
    "histogram_quantile",
    "hampel_filter",
    "funnel_counts",
    "oov_rate",
    "table_diff",
    "period_over_period",
    "profile_table",
    "heavy_ngrams",
    "histogram_quantile_hourly",
    "matrix_profile",
    "ohlc",
    "state_agg",
    "heartbeat_agg",
    "bucketed_twa",
    "topn_others",
    "pca_whiten",
    "forecast_backtest",
    "threshold_episodes",
    "value_heatmap",
    "token_budget",
    "asof_nearest",
    "asof_tolerance",
    "pair_corr",
    "interval_coverage",
    "lttb_series",
    "disorder",
    "stratified_split",
    "json_props",
    "rolling_actives",
    "tile_dedup",
    "range_read",
    "interval_join",
    "unigram_surprisal",
    "spearman",
    "ks_drift",
    "robust_norm",
    "binary_segments",
    "group_sample",
    "cohort_retention",
    "sketch_distinct",
    "hrv_poincare",
    "ordinal_patterns",
    "shape_features",
    "energy_profile",
    "benford",
    "length_histogram",
    # honest row: on the word-length fixture LB_Keogh prunes little, so
    # this measures near-brute exact DTW retrieval (see dtw.py docstring)
    "dtw_knn",
]

# F1 sequences fixture size for the native-throughput leg. ~32k docs × ~700
# mean tokens ≈ 22M points — enough to amortize job overhead at local[32],
# small enough to keep the per-round bench under a couple of minutes.
SEQ_DOCS = int(os.environ.get("TSROLLUP_BENCH_DOCS", "32000"))
SEQ_SEED = 42


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cpu_probe() -> float:
    """Seconds for a fixed single-core Python loop — a box-speed reference
    printed alongside the timings. The sandbox's effective core speed varies
    several-fold with invisible co-tenant load (observed 0.8–2.9 s for this
    probe), so cross-round wall-clock comparisons need this context."""
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return round(time.perf_counter() - t0, 3)


def _probe_loop(_) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return time.perf_counter() - t0


def _cpu_probe_mp(n: int) -> float:
    """Wall seconds for ``n`` processes to each run the fixed loop — the
    box's PARALLEL capacity, which is what a local[n] Spark job actually
    competes for. The single-core probe overstates co-tenant impact when
    the intruding load occupies only a few cores (the probe contends 1:1
    while a 32-way job still gets most of the box), so the self-normalizing
    flagship product uses THIS probe."""
    import multiprocessing

    t0 = time.perf_counter()
    with multiprocessing.Pool(n) as pool:
        pool.map(_probe_loop, range(n))
    return round(time.perf_counter() - t0, 3)


def _sequences_fixture() -> str:
    """Seeded F1 fixture parquet, cached across runs (same seed ⇒ same bytes)."""
    from tsrollup.datagen import write_sequences

    cache = os.environ.get("TSROLLUP_BENCH_CACHE", "/tmp/tsrollup-bench")
    os.makedirs(cache, exist_ok=True)
    dpf = max(125, SEQ_DOCS // 64)  # many splittable files, like a real table
    path = os.path.join(cache, f"seqs-{SEQ_SEED}-{SEQ_DOCS}-{dpf}")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        write_sequences(tmp, seed=SEQ_SEED, n_docs=SEQ_DOCS, docs_per_file=dpf)
        os.replace(tmp, path)
    return path


def main() -> int:
    import __spark_entry__ as entrymod
    from tsrollup.rollup import rollup_sequences
    from tsrollup.session import get_spark

    probe_start = _cpu_probe()
    seq_path = _sequences_fixture()
    spark = get_spark("tsrollup-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    # The sf fixtures are single small files; a real 100 TB table has ~800k
    # 128MB splits. Emulate split abundance so scans parallelize here too.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))

    # Warm the JVM + Python workers and touch every input table once so no
    # query pays another table's first-read page-cache/codegen cost (the
    # skew otherwise lands on whichever query reads a table first).
    for t in ("nation", "events", "lineitem", "orders", "customer",
              "documents", "embeddings"):
        _noop(spark.read.parquet(f"{SF_DIR}/{t}.parquet"))

    # Native rollup throughput on the input_hint table (BASELINE.json
    # metric) — measured FIRST, on a fresh session (min of 3 passes after a
    # full warm pass), so 30+ prior queries' GC/state can't pollute it.
    seqs = spark.read.parquet(seq_path)
    roll = rollup_sequences(seqs)
    _noop(roll)  # full warm pass: JIT + every Python worker
    passes = []
    for _ in range(4):
        t0 = time.perf_counter()
        _noop(roll)
        passes.append(time.perf_counter() - t0)
    rollup_s = min(passes)
    seqs_per_sec = SEQ_DOCS / rollup_s
    # probes measured ADJACENT to the rollup leg: throughput scales with
    # parallel capacity while the mp probe's wall time scales inversely, so
    # their product is ~invariant under co-tenant load — the
    # self-normalizing flagship record. The single-core probe is also
    # recorded for continuity with rounds 1-3.
    probe_rollup = _cpu_probe()
    probe_mp = _cpu_probe_mp(CPUS)

    # Maintenance-path leg: parent tier from a STORED child (the continuous-
    # aggregate production motion — no token re-read in the timed window).
    from tsrollup.rollup import reaggregate_tier

    child_path = os.path.join(
        os.environ.get("TSROLLUP_BENCH_CACHE", "/tmp/tsrollup-bench"),
        f"child-{SEQ_SEED}-{SEQ_DOCS}")
    if not os.path.exists(child_path):
        # write-then-rename so a killed run can't leave a partial dir that
        # later runs silently reuse (same discipline as _sequences_fixture)
        tmp = child_path + ".tmp"
        rollup_sequences(seqs, tiers={"1m": 1}) \
            .write.mode("overwrite").parquet(tmp)
        os.replace(tmp, child_path)
    stored_child = spark.read.parquet(child_path)
    _noop(reaggregate_tier(stored_child, "1h", 60))  # warm
    maint_passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        _noop(reaggregate_tier(stored_child, "1h", 60))
        maint_passes.append(time.perf_counter() - t0)
    maint_s = min(maint_passes)

    qs = entrymod.queries()
    # Warm the IVF stored index OUTSIDE any timed region: ivf_knn's contract
    # is a train-once stored quantizer, so the bench row must measure the
    # steady-state query path (assignment + probe join), not one-off index
    # amortization — a regenerated fixture otherwise charges a full Lloyd
    # retrain to whichever run comes first.
    _noop(qs["ivf_knn"](spark, SF_DIR))

    # Per-query: multiple timed full-materialization passes, min recorded.
    # The driver records ONE bench.py run, and this sandbox's co-tenant load
    # swings PARALLEL capacity several-fold on a minutes timescale while the
    # single-core probe stays flat (round 4: four queries "regressed" ≥1.5×
    # with no code change; round-5 instrumentation showed the same query
    # reading 0.75 s and 9.7 s in runs 20 min apart at equal probe
    # readings). Two design points follow:
    #  - passes are INTERLEAVED round-robin over the whole list (pass 1 of
    #    every query, then pass 2), so one query's passes land minutes
    #    apart — back-to-back min-of-2 sits entirely inside one load wave
    #    and protects nothing;
    #  - rows still expensive after two rounds (> RE_RUN_FLOOR s) get a
    #    third pass — they dominate the total, and a load wave spanning
    #    both their rounds is what made past records lie.
    # Every pass remains an honest full materialization; the min estimates
    # the query's COST rather than the box's load at the instant it ran.
    PASSES = 2
    RE_RUN_FLOOR = 2.0
    raw: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(PASSES):
        for name in HEADLINE:
            t0 = time.perf_counter()
            _noop(qs[name](spark, SF_DIR))
            raw[name].append(time.perf_counter() - t0)
    # Up to two extra passes while a row still reads expensive: a load wave
    # can sit on all interleaved rounds of one query (round-5
    # instrumentation: a 1.1 s query read 4.9-7.3 s in three separate
    # runs). Stop once a pass CONFIRMS the current level (within 25%) —
    # then it's the query's real cost, not the wave's. The extras are
    # themselves INTERLEAVED round-robin across every flagged query (not
    # back-to-back per query): a broadly loaded run flags many rows, so one
    # query's extras then land minutes apart — back-to-back extras sit
    # inside the same wave and "confirm" its inflated minimum (observed:
    # a 2 s steady-state query recording 9.2 s from exactly that).
    flagged = [n for n in HEADLINE if min(raw[n]) > RE_RUN_FLOOR]
    for _ in range(2):
        still = []
        for name in flagged:
            prev_min = min(raw[name])
            t0 = time.perf_counter()
            _noop(qs[name](spark, SF_DIR))
            t = time.perf_counter() - t0
            raw[name].append(t)
            if t > 1.25 * prev_min and min(raw[name]) > RE_RUN_FLOOR:
                still.append(name)  # not yet confirmed cheap or stable
        flagged = still
    timings = {name: round(min(ts), 3) for name, ts in raw.items()}
    # provenance: base interleaved passes + the rows that earned extras
    # (min-of-3 / min-of-4), so a record reader knows each number's basis
    extra_passes = {name: len(ts) - PASSES
                    for name, ts in raw.items() if len(ts) > PASSES}

    total = round(sum(timings.values()), 3)
    # frozen round-4 query scope: the 53-query list BENCH_r04.json recorded.
    # The headline list keeps growing (53 → 67 rows across round 5), which
    # inflates `value` round-over-round even when every query got faster —
    # this subtotal is the apples-to-apples cross-round comparison.
    r4_scope = {
        "rollup_base", "rollup_tier_reagg", "rollup_compressed_roundtrip",
        "rollup_spectral", "rollup_multichannel", "cross_channel_stats",
        "cross_channel_spectral", "rollup_chunked", "gapfill_ffill",
        "global_agg", "sliding_windows", "windows_forecast",
        "znorm_outliers", "segment_islands", "downsample_minute",
        "range_join", "topk_events", "pricing_summary", "revenue_by_nation",
        "rolling_mean_events", "asof_join", "token_stats", "quality_score",
        "dedup_exact", "jaccard_pairs", "minhash_signatures", "lsh_pairs",
        "simhash", "cosine_knn", "ann_lsh", "embed_near_dups", "ivf_knn",
        "conv1d_valid", "conv1d_same", "conv1d_same_strided", "conv1d_full",
        "pool_overlap", "dense_proj", "tier_join", "ewma_scan",
        "media_features", "one_hot_events", "residual_add",
        "attention_gate", "activations", "en_loss", "grouping_sets",
        "hash_split", "per_source_stats", "segment_extract",
        "windows_excluded", "retention", "pipeline_zoo"}
    # en_loss merged into residual_add in round 5 (same workload, one row),
    # so the subtotal slightly UNDER-represents the r4 scope's row count
    # while covering the same computation
    total_r4 = round(sum(t for n, t in timings.items() if n in r4_scope), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(json.dumps({
        "metric": "total headline query time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "total_r4_scope": total_r4,
        "passes_per_query": PASSES,
        "extra_passes": extra_passes,
        "sf": sf_val,
        "rollup_seqs_per_sec": round(seqs_per_sec, 1),
        "rollup_sec": round(rollup_s, 3),
        # load-invariant flagship record: throughput × adjacent PARALLEL
        # probe secs (see comment at the rollup leg)
        "rollup_seqs_per_sec_x_mp_probe": round(seqs_per_sec * probe_mp, 1),
        "cpu_probe_mp_sec_rollup": probe_mp,
        "cpu_probe_sec_rollup": probe_rollup,
        "tier_maint_from_stored_sec": round(maint_s, 3),
        "rollup_n_docs": SEQ_DOCS,
        "cpus": CPUS,
        "cpu_probe_sec_start": probe_start,
        "cpu_probe_sec_end": _cpu_probe(),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
