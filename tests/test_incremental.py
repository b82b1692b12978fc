"""Incremental continuous-aggregate refresh
(tsrollup.checkpoint.refresh_incremental).

The invariant everything here drives at: after any sequence of appends +
refreshes (+ crashes + re-runs), the epoch-partitioned store holds exactly
the rows of ONE clean rollup of the full input — bit-for-bit.
"""

from __future__ import annotations

import os
import shutil

import pytest

from tsrollup.checkpoint import (doc_seq, read_incremental, read_watermarks,
                                 refresh_incremental)
from tsrollup.datagen import write_sequences
from tsrollup.rollup import rollup_sequences

TIERS = {"1m": 1, "1h": 4}


def _rows(df):
    cols = ["doc_id", "tier", "window_start", "count", "sum", "sumsq",
            "min", "max", "mean", "var"]
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _write_first_n(spark, full_path: str, out_path: str, n: int) -> None:
    """Deterministic 'corpus at arrival n': the first n docs by seq."""
    df = spark.read.parquet(full_path)
    keep = df.withColumn("_s", doc_seq()).filter(f"_s < {n}").drop("_s")
    keep.coalesce(1).write.mode("overwrite").parquet(out_path)


@pytest.fixture()
def corpus(spark, tmp_path):
    full = str(tmp_path / "full.parquet")
    write_sequences(full, seed=13, n_docs=60, min_len=64, max_len=512)
    return full


class TestRefreshIncremental:
    def test_initial_refresh_matches_clean_rollup(self, spark, tmp_path,
                                                  corpus):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        n = refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        assert n == 40
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        assert _rows(read_incremental(spark, root)) == _rows(want)
        assert read_watermarks(spark, root) != {}

    def test_append_refresh_is_incremental_and_exact(self, spark, tmp_path,
                                                     corpus):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        # 20 more docs arrive
        _write_first_n(spark, corpus, inp, 60)
        n = refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        assert n == 20  # only the delta was rolled up
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        got = read_incremental(spark, root)
        assert _rows(got) == _rows(want)
        # the new epoch holds ONLY the delta's docs
        e1 = got.filter("epoch = 1").select("doc_id").distinct().count()
        assert e1 == 20

    def test_noop_when_no_new_docs(self, spark, tmp_path, corpus):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        before = _rows(read_incremental(spark, root))
        assert refresh_incremental(spark, inp, root, epoch=1,
                                   tiers=TIERS) == 0
        assert _rows(read_incremental(spark, root)) == before

    def test_rerun_of_committed_epoch_is_noop(self, spark, tmp_path, corpus):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        _write_first_n(spark, corpus, inp, 60)
        refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        before = _rows(read_incremental(spark, root))
        assert refresh_incremental(spark, inp, root, epoch=1,
                                   tiers=TIERS) == 0
        assert _rows(read_incremental(spark, root)) == before

    def test_crash_between_data_and_watermark_converges(self, spark,
                                                        tmp_path, corpus):
        # simulate: epoch-1 data committed but the watermark append lost
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        wm_dir = os.path.join(root, "_watermarks")
        snapshot = str(tmp_path / "wm_snapshot")
        shutil.copytree(wm_dir, snapshot)
        _write_first_n(spark, corpus, inp, 60)
        refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        want = _rows(read_incremental(spark, root))
        # roll the watermarks back to the pre-epoch-1 state (the "crash")
        shutil.rmtree(wm_dir)
        shutil.copytree(snapshot, wm_dir)
        n = refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        assert n == 20  # the delta recomputes...
        assert _rows(read_incremental(spark, root)) == want  # ...unchanged

    def test_new_source_is_fully_included(self, spark, tmp_path):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        a = spark.createDataFrame(
            [("web-0001-00000000", list(range(64)), 64, "web")],
            "doc_id string, tokens array<int>, n_tok int, source string")
        a.write.mode("overwrite").parquet(inp)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        b = a.union(spark.createDataFrame(
            [("mars-0001-00000000", list(range(64)), 64, "mars")],
            a.schema))
        b.write.mode("overwrite").parquet(inp)
        assert refresh_incremental(spark, inp, root, epoch=1,
                                   tiers=TIERS) == 1
        docs = {r.doc_id for r in
                read_incremental(spark, root).select("doc_id")
                .distinct().collect()}
        assert docs == {"web-0001-00000000", "mars-0001-00000000"}

    def test_epoch_validation(self, spark, tmp_path):
        with pytest.raises(ValueError):
            refresh_incremental(spark, "x", str(tmp_path / "s"), epoch=-1)


class TestRefreshGuards:
    def test_committed_epoch_with_new_data_is_refused_noop(self, spark,
                                                           tmp_path, corpus):
        # review finding: re-running a committed epoch AFTER newer docs
        # arrived must not overwrite that epoch's partitions
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        before = _rows(read_incremental(spark, root))
        _write_first_n(spark, corpus, inp, 60)  # 20 new docs arrive
        n = refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        assert n == 0  # up-front no-op, nothing rewritten
        assert _rows(read_incremental(spark, root)) == before
        # the new docs land in a NEW epoch, store converges to the full set
        assert refresh_incremental(spark, inp, root, epoch=1,
                                   tiers=TIERS) == 20
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        assert _rows(read_incremental(spark, root)) == _rows(want)

    def test_null_seq_docs_raise_loudly(self, spark, tmp_path):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        df = spark.createDataFrame(
            [("web-0001-00000000", list(range(64)), 64, "web"),
             ("web-batch-final", list(range(64)), 64, "web")],
            "doc_id string, tokens array<int>, n_tok int, source string")
        df.write.mode("overwrite").parquet(inp)
        with pytest.raises(Exception, match="NULL ingest sequence"):
            refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)

    def test_n_buckets_is_threaded(self, spark, tmp_path, corpus):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS,
                            n_buckets=4)
        buckets = {r.bucket for r in read_incremental(spark, root)
                   .select("bucket").distinct().collect()}
        assert buckets <= set(range(4)) and len(buckets) > 1


class TestCompactEpochs:
    def test_compaction_preserves_rows_and_future_refreshes(self, spark,
                                                            tmp_path, corpus):
        from tsrollup.checkpoint import compact_epochs
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 30)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        _write_first_n(spark, corpus, inp, 45)
        refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        before = _rows(read_incremental(spark, root))
        n = compact_epochs(spark, root)
        assert n == len(before)
        after = read_incremental(spark, root)
        # layout-only: identical row multiset, single epoch remains
        assert _rows(after) == before
        assert {r.epoch for r in after.select("epoch")
                .distinct().collect()} == {0}
        # a retry of the folded epoch 1 stays a no-op...
        assert refresh_incremental(spark, inp, root, epoch=1,
                                   tiers=TIERS) == 0
        # ...and new arrivals keep flowing into fresh epochs
        _write_first_n(spark, corpus, inp, 60)
        assert refresh_incremental(spark, inp, root, epoch=2,
                                   tiers=TIERS) == 15
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        assert _rows(read_incremental(spark, root)) == _rows(want)


class TestCompressedRefresh:
    def test_compressed_epochs_decode_to_clean_rollup(self, spark, tmp_path,
                                                      corpus):
        from tsrollup.rollup import decompress_rollup
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS,
                            compressed=True)
        _write_first_n(spark, corpus, inp, 60)
        refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS,
                            compressed=True)
        got = decompress_rollup(read_incremental(spark, root))
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        assert _rows(got) == _rows(want)

    def test_mixed_packed_plain_store_is_refused(self, spark, tmp_path,
                                                 corpus):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS,
                            compressed=True)
        _write_first_n(spark, corpus, inp, 60)
        with pytest.raises(ValueError, match="one store, one mode"):
            refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS,
                                compressed=False)


class TestCompactGuards:
    def _store(self, spark, tmp_path, corpus):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=3, tiers=TIERS)
        _write_first_n(spark, corpus, inp, 60)
        refresh_incremental(spark, inp, root, epoch=7, tiers=TIERS)
        return inp, root

    def test_default_target_is_smallest_committed_epoch(self, spark,
                                                        tmp_path, corpus):
        from tsrollup.checkpoint import compact_epochs
        _, root = self._store(spark, tmp_path, corpus)
        before = _rows(read_incremental(spark, root))
        compact_epochs(spark, root)
        after = read_incremental(spark, root)
        assert _rows(after) == before
        assert {r.epoch for r in after.select("epoch")
                .distinct().collect()} == {3}

    def test_uncommitted_target_epoch_is_refused(self, spark, tmp_path,
                                                 corpus):
        from tsrollup.checkpoint import compact_epochs
        _, root = self._store(spark, tmp_path, corpus)
        with pytest.raises(ValueError, match="not a committed epoch"):
            compact_epochs(spark, root, into_epoch=0)

    def test_orphan_epoch_is_refused(self, spark, tmp_path, corpus):
        # crash sim: epoch-7 data committed but its watermark append lost
        import duckdb
        from tsrollup.checkpoint import compact_epochs
        _, root = self._store(spark, tmp_path, corpus)
        wm_dir = os.path.join(root, "_watermarks")
        kept = duckdb.sql(
            f"SELECT * FROM '{wm_dir}/*.parquet' WHERE epoch <> 7").df()
        shutil.rmtree(wm_dir)
        os.makedirs(wm_dir)
        duckdb.sql("COPY kept TO '{}/part.parquet' (FORMAT PARQUET)"
                   .format(wm_dir))
        with pytest.raises(ValueError, match="no watermark row"):
            compact_epochs(spark, root)

    def test_midswap_crash_is_recovered_on_retry(self, spark, tmp_path,
                                                 corpus):
        from tsrollup.checkpoint import compact_epochs
        _, root = self._store(spark, tmp_path, corpus)
        before = _rows(read_incremental(spark, root))
        # simulate the crash window: data renamed away, compact not promoted
        os.rename(os.path.join(root, "data"), os.path.join(root, "data.old"))
        n = compact_epochs(spark, root)
        assert n == len(before)
        assert _rows(read_incremental(spark, root)) == before


class TestRetentionOnIncrementalStore:
    def test_epoch_layout_is_preserved(self, spark, tmp_path, corpus):
        from tsrollup.checkpoint import apply_retention_to_store
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        _write_first_n(spark, corpus, inp, 60)
        refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        aged = apply_retention_to_store(spark, root, {"1m": 2})
        assert aged > 0
        after = read_incremental(spark, root)
        # both epoch partitions still exist; per (doc, 1m) ≤ 2 windows kept
        assert {r.epoch for r in after.select("epoch")
                .distinct().collect()} == {0, 1}
        mx = (after.filter("tier = '1m'")
              .groupBy("doc_id").count()
              .agg({"count": "max"}).collect()[0][0])
        assert mx <= 2
        # the untouched tier is intact
        assert after.filter("tier = '1h'").count() > 0
        # no stray bucket=… dirs beside the epoch=… dirs
        import os as _os
        top = _os.listdir(_os.path.join(root, "data"))
        assert all(d.startswith("epoch=") or d.startswith("_")
                   for d in top), top


class TestTableDiff:
    def test_classifies_all_four_ways(self, spark):
        from tsrollup.checkpoint import table_diff
        a = spark.createDataFrame(
            [("k1", 10), ("k2", 20), ("k3", None), ("k4", 5)],
            "k string, v int")
        b = spark.createDataFrame(
            [("k1", 10), ("k2", 25), ("k3", None), ("k5", 7)],
            "k string, v int")
        out = {r["class"]: r for r in
               table_diff(a, b, ["k"], ["v"]).collect()}
        # k3 is present with a NULL value on BOTH sides: unchanged (the
        # NULL-safe compare), never only_a/only_b
        assert out["unchanged"].n_keys == 2
        assert out["changed"].n_keys == 1 and out["changed"].abs_delta == 5
        assert out["only_a"].n_keys == 1 and out["only_a"].abs_delta is None
        assert out["only_b"].n_keys == 1

    def test_multi_value_columns_any_difference_counts(self, spark):
        from tsrollup.checkpoint import table_diff
        a = spark.createDataFrame([("k", 1, 100)], "k string, x int, y int")
        b = spark.createDataFrame([("k", 1, 101)], "k string, x int, y int")
        out = table_diff(a, b, ["k"], ["x", "y"]).collect()
        assert out[0]["class"] == "changed" and out[0].abs_delta == 1

    def test_identical_tables_all_unchanged(self, spark):
        from tsrollup.checkpoint import table_diff
        a = spark.createDataFrame([("k%d" % i, i) for i in range(20)],
                                  "k string, v int")
        out = table_diff(a, a, ["k"], ["v"]).collect()
        assert len(out) == 1 and out[0]["class"] == "unchanged"
        assert out[0].n_keys == 20 and out[0].abs_delta == 0

    def test_validation(self, spark):
        from tsrollup.checkpoint import table_diff
        a = spark.createDataFrame([("k", 1)], "k string, v int")
        with pytest.raises(ValueError):
            table_diff(a, a, [], ["v"])
        with pytest.raises(ValueError):
            table_diff(a, a, ["k"], [])

    def test_changed_with_one_sided_null_is_counted_not_dropped(self, spark):
        # review finding: |a - NULL| is NULL and vanished from abs_delta
        from tsrollup.checkpoint import table_diff
        a = spark.createDataFrame([("k1", 10), ("k2", 5)], "k string, v int")
        b = spark.createDataFrame([("k1", None), ("k2", 7)],
                                  "k string, v int")
        out = {r["class"]: r for r in
               table_diff(a, b, ["k"], ["v"]).collect()}
        ch = out["changed"]
        assert ch.n_keys == 2 and ch.abs_delta == 2
        assert ch.n_null_deltas == 1


class TestReadRealtime:
    def test_no_store_serves_full_fresh_rollup(self, spark, tmp_path,
                                               corpus):
        from tsrollup.checkpoint import read_realtime

        inp = str(tmp_path / "inp")
        _write_first_n(spark, corpus, inp, 40)
        got = read_realtime(spark, inp, str(tmp_path / "nostore"),
                            tiers=TIERS)
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        assert _rows(got) == _rows(want)

    def test_lagging_store_plus_tail_equals_clean_rollup(self, spark,
                                                         tmp_path, corpus):
        from tsrollup.checkpoint import read_realtime

        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        _write_first_n(spark, corpus, inp, 60)  # 20 docs not yet refreshed
        got = read_realtime(spark, inp, root, tiers=TIERS)
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        assert _rows(got) == _rows(want)
        # the stored 40 docs come from the STORE, not a re-rollup: the
        # plan must scan the store AND filter the raw side on the
        # watermark before the rollup map
        from tsrollup.planaudit import formatted_plan

        plan = formatted_plan(got)
        assert "store/data" in plan  # store subtree present
        assert "39" in plan          # seq > 39 watermark filter pushed

    def test_fully_refreshed_store_has_empty_tail(self, spark, tmp_path,
                                                  corpus):
        from tsrollup.checkpoint import read_realtime

        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 60)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        got = read_realtime(spark, inp, root, tiers=TIERS)
        assert _rows(got) == _rows(read_incremental(spark, root))

    def test_orphan_epoch_served_fresh_not_duplicated(self, spark,
                                                      tmp_path, corpus):
        from tsrollup.checkpoint import read_realtime

        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        wm_dir = os.path.join(root, "_watermarks")
        snapshot = str(tmp_path / "wm_snapshot")
        shutil.copytree(wm_dir, snapshot)
        _write_first_n(spark, corpus, inp, 60)
        refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        # crash: epoch-1 data committed, watermark append lost
        shutil.rmtree(wm_dir)
        shutil.copytree(snapshot, wm_dir)
        got = read_realtime(spark, inp, root, tiers=TIERS)
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        assert _rows(got) == _rows(want)  # no dupes, nothing missing

    def test_compressed_store_is_decoded_on_read(self, spark, tmp_path,
                                                 corpus):
        from tsrollup.checkpoint import read_realtime

        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS,
                            compressed=True)
        _write_first_n(spark, corpus, inp, 60)
        got = read_realtime(spark, inp, root, tiers=TIERS)
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        assert _rows(got) == _rows(want)

    def test_null_seq_docs_always_served_fresh(self, spark, tmp_path):
        from tsrollup.checkpoint import read_realtime

        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        good = spark.createDataFrame(
            [("web-0001-00000000", list(range(64)), 64, "web")],
            "doc_id string, tokens array<int>, n_tok int, source string")
        good.write.mode("overwrite").parquet(inp)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        # a doc whose id carries no sequence number arrives: refresh
        # refuses it, but the realtime view must still serve it
        both = good.union(spark.createDataFrame(
            [("web-badid", list(range(32)), 32, "web")], good.schema))
        both.write.mode("overwrite").parquet(inp)
        with pytest.raises(ValueError, match="NULL ingest sequence"):
            refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        got = read_realtime(spark, inp, root, tiers=TIERS)
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        assert _rows(got) == _rows(want)


class TestRepairEpochs:
    def _store(self, spark, tmp_path, corpus, splits=(40, 60)):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        prev = 0
        for e, n in enumerate(splits):
            _write_first_n(spark, corpus, inp, n)
            refresh_incremental(spark, inp, root, epoch=e, tiers=TIERS)
            prev = n
        del prev
        return inp, root

    def test_epoch_ranges_reconstruct_commit_boundaries(self, spark,
                                                        tmp_path, corpus):
        from tsrollup.checkpoint import epoch_ranges

        _, root = self._store(spark, tmp_path, corpus)
        ranges = epoch_ranges(spark, root)
        assert set(ranges) == {0, 1}
        for src, (lo, hi) in ranges[0].items():
            assert lo == -1 and hi < 60
        for src, (lo, hi) in ranges[1].items():
            # epoch 1 starts exactly where epoch 0's mark for that source
            # ended (sources without epoch-0 docs start at -1)
            assert lo == ranges[0].get(src, (None, -1))[1]

    def test_corrected_doc_repairs_to_clean_rollup(self, spark, tmp_path,
                                                   corpus):
        from pyspark.sql import functions as F

        from tsrollup.checkpoint import repair_epochs

        inp, root = self._store(spark, tmp_path, corpus)
        # corrupt one early doc IN PLACE (same doc_id, new tokens), as if
        # the raw table was corrected after epoch 0 was rolled up
        df = spark.read.parquet(inp)
        victim = df.withColumn("_s", doc_seq()).filter("_s = 5") \
                   .select("doc_id").first()["doc_id"]
        fixed = df.withColumn(
            "tokens",
            F.when(F.col("doc_id") == victim,
                   F.expr("transform(tokens, t -> t + 7)"))
             .otherwise(F.col("tokens")))
        fixed.coalesce(1).write.mode("overwrite").parquet(inp + ".v2")
        # store now disagrees with raw; repair the containing epoch only
        n = repair_epochs(spark, inp + ".v2", root, [0], tiers=TIERS)
        assert n == 40
        want = rollup_sequences(spark.read.parquet(inp + ".v2"), tiers=TIERS)
        assert _rows(read_incremental(spark, root)) == _rows(want)
        # watermarks untouched
        from tsrollup.checkpoint import read_watermarks

        assert read_watermarks(spark, root) == \
            read_watermarks(spark, root)

    def test_late_arrival_below_watermark_lands_via_repair(self, spark,
                                                           tmp_path, corpus):
        from tsrollup.checkpoint import repair_epochs

        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        # arrival order skips doc seq 10: epochs commit without it
        df = spark.read.parquet(corpus)
        df.withColumn("_s", doc_seq()).filter("_s < 40 and _s != 10") \
          .drop("_s").coalesce(1).write.mode("overwrite").parquet(inp)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        _write_first_n(spark, corpus, inp, 60)  # late doc 10 now present
        refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        # the late doc is invisible to refresh (below the watermark) …
        want = rollup_sequences(spark.read.parquet(inp), tiers=TIERS)
        assert _rows(read_incremental(spark, root)) != _rows(want)
        # … and lands after repairing the epoch whose range covers it
        repair_epochs(spark, inp, root, [0], tiers=TIERS)
        assert _rows(read_incremental(spark, root)) == _rows(want)

    def test_deleted_docs_stale_partitions_pruned(self, spark, tmp_path,
                                                  corpus):
        from tsrollup.checkpoint import repair_epochs

        inp, root = self._store(spark, tmp_path, corpus)
        # delete most epoch-0 docs from raw, repair: their rows must VANISH
        df = spark.read.parquet(inp)
        kept = df.withColumn("_s", doc_seq()).filter("_s >= 35").drop("_s")
        kept.coalesce(1).write.mode("overwrite").parquet(inp + ".v2")
        repair_epochs(spark, inp + ".v2", root, [0, 1], tiers=TIERS)
        want = rollup_sequences(spark.read.parquet(inp + ".v2"), tiers=TIERS)
        assert _rows(read_incremental(spark, root)) == _rows(want)

    def test_uncommitted_epoch_refused(self, spark, tmp_path, corpus):
        from tsrollup.checkpoint import repair_epochs

        inp, root = self._store(spark, tmp_path, corpus)
        with pytest.raises(ValueError, match="not committed"):
            repair_epochs(spark, inp, root, [7], tiers=TIERS)

    def test_compacted_store_refused(self, spark, tmp_path, corpus):
        from tsrollup.checkpoint import compact_epochs, repair_epochs

        inp, root = self._store(spark, tmp_path, corpus)
        compact_epochs(spark, root)
        with pytest.raises(ValueError, match="compacted"):
            repair_epochs(spark, inp, root, [0], tiers=TIERS)

    def test_repair_is_idempotent(self, spark, tmp_path, corpus):
        from tsrollup.checkpoint import repair_epochs

        inp, root = self._store(spark, tmp_path, corpus)
        before = _rows(read_incremental(spark, root))
        repair_epochs(spark, inp, root, [0, 1], tiers=TIERS)
        assert _rows(read_incremental(spark, root)) == before


class TestAsOfEpoch:
    def test_time_travel_reproduces_past_state(self, spark, tmp_path,
                                               corpus):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        past = _rows(read_incremental(spark, root))
        _write_first_n(spark, corpus, inp, 60)
        refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        # as-of epoch 0 == the state the post-refresh-0 reader saw,
        # bit-for-bit, even though epoch 1 now exists on disk
        got = read_incremental(spark, root, as_of_epoch=0)
        assert _rows(got) == past
        # and the plain read still sees everything
        assert read_incremental(spark, root).count() > got.count()

    def test_as_of_latest_equals_plain_read(self, spark, tmp_path, corpus):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        _write_first_n(spark, corpus, inp, 60)
        refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        assert _rows(read_incremental(spark, root, as_of_epoch=1)) \
            == _rows(read_incremental(spark, root))

    def test_validation(self, spark, tmp_path, corpus):
        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        with pytest.raises(ValueError):
            read_incremental(spark, root, as_of_epoch=-1)


class TestRefreshLag:
    def test_reports_backlog_then_caught_up(self, spark, tmp_path, corpus):
        from tsrollup.checkpoint import refresh_lag

        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")
        _write_first_n(spark, corpus, inp, 40)
        refresh_incremental(spark, inp, root, epoch=0, tiers=TIERS)
        # 20 more docs arrive but no refresh yet: lag must report them
        _write_first_n(spark, corpus, inp, 60)
        lag = refresh_lag(spark, inp, root).toPandas()
        assert int(lag["pending_docs"].sum()) == 20
        assert (lag["input_max_seq"] >= lag["watermark_seq"]).all()
        behind = lag[lag.pending_docs > 0]
        assert (behind["caught_up"] == 0).all()
        # after the refresh the debt is zero everywhere
        refresh_incremental(spark, inp, root, epoch=1, tiers=TIERS)
        lag2 = refresh_lag(spark, inp, root).toPandas()
        assert int(lag2["pending_docs"].sum()) == 0
        assert (lag2["caught_up"] == 1).all()

    def test_never_refreshed_store_reports_full_backlog(self, spark,
                                                        tmp_path, corpus):
        from tsrollup.checkpoint import refresh_lag

        inp = str(tmp_path / "inp")
        root = str(tmp_path / "store")  # store dir never created
        _write_first_n(spark, corpus, inp, 40)
        lag = refresh_lag(spark, inp, root).toPandas()
        assert (lag["watermark_seq"] == -1).all()
        assert int(lag["pending_docs"].sum()) == 40
