"""Distributed as-of join vs pandas merge_asof (the single-node reference),
including the ≤-tie contract and left-vs-inner handling."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tsrollup.planaudit import formatted_plan


def test_asof_matches_pandas_merge_asof(spark):
    from tsrollup.joins import asof_join

    rng = np.random.default_rng(9)
    n_l, n_r = 400, 80
    left = pd.DataFrame({
        "key": rng.integers(0, 5, n_l).astype(np.int64),
        "lt": rng.integers(0, 1000, n_l).astype(np.int64),
        "payload": np.arange(n_l, dtype=np.int64),
    })
    right = pd.DataFrame({
        "key": rng.integers(0, 5, n_r).astype(np.int64),
        "rt": rng.integers(0, 1000, n_r).astype(np.int64),
        "attr": rng.integers(0, 10_000, n_r).astype(np.int64),
    }).drop_duplicates(["key", "rt"])  # right unique per (key, ts): contract

    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on="key", left_ts="lt", right_ts="rt",
                    attrs=("rt", "attr")).toPandas()

    want = pd.merge_asof(left.sort_values("lt"), right.sort_values("rt"),
                         left_on="lt", right_on="rt", by="key",
                         direction="backward")  # greatest rt <= lt, ties match
    want = want[want["rt"].notna()]
    gk = got.sort_values(["key", "lt", "payload"]).reset_index(drop=True)
    wk = want.sort_values(["key", "lt", "payload"]).reset_index(drop=True)
    assert len(gk) == len(wk) > 0
    assert (gk["payload"].values == wk["payload"].values).all()
    assert (gk["rt"].values == wk["rt"].values.astype(np.int64)).all()
    assert (gk["attr"].values == wk["attr"].values.astype(np.int64)).all()


def test_asof_tie_and_left_mode(spark):
    from tsrollup.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100, "exact-tie"), (1, 50, "before-any"), (1, 170, "after")],
        "key int, lt long, tag string")
    right = spark.createDataFrame(
        [(1, 100, 7), (1, 160, 8)], "key int, rt long, attr int")
    inner = {r["tag"]: r for r in asof_join(
        left, right, "key", "lt", "rt", ("rt", "attr")).collect()}
    assert set(inner) == {"exact-tie", "after"}  # before-any dropped
    assert inner["exact-tie"]["rt"] == 100       # <= includes equality
    assert inner["after"]["rt"] == 160 and inner["after"]["attr"] == 8
    outer = {r["tag"]: r for r in asof_join(
        left, right, "key", "lt", "rt", ("rt", "attr"), how="left").collect()}
    assert outer["before-any"]["rt"] is None


def test_asof_plan_is_single_shuffle(spark):
    """The union-window as-of is ONE exchange on the key (plus the window
    sort) — never a range/cartesian join."""
    import re

    from tsrollup.joins import asof_join

    left = spark.createDataFrame([(1, 10, 1)], "key int, lt long, p int")
    right = spark.createDataFrame([(1, 5, 2)], "key int, rt long, attr int")
    df = asof_join(left, right, "key", "lt", "rt", ("attr",))
    plan = formatted_plan(df)
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_range_join_matches_brute_force(spark):
    from tsrollup.joins import range_join

    rng = np.random.default_rng(17)
    pts = pd.DataFrame({
        "key": rng.integers(0, 4, 300).astype(np.int64),
        "pt": rng.integers(0, 500, 300).astype(np.int64),
        "pid": np.arange(300, dtype=np.int64),
    })
    ivs = []
    for i in range(40):
        s = int(rng.integers(0, 480))
        ivs.append((int(rng.integers(0, 4)), s,
                    s + int(rng.integers(1, 120)), i))
    ivs = pd.DataFrame(ivs, columns=["key", "s", "e", "iid"])
    for bw in (7, 64, 1000):  # narrower / comparable / wider than intervals
        got = range_join(spark.createDataFrame(pts),
                         spark.createDataFrame(ivs),
                         on="key", point_ts="pt", start_col="s",
                         end_col="e", bucket_width=bw,
                         attrs=("iid",)).toPandas()
        want = {(int(p.pid), int(i.iid))
                for p in pts.itertuples()
                for i in ivs.itertuples()
                if p.key == i.key and i.s <= p.pt < i.e}
        assert set(zip(got["pid"], got["iid"])) == want, bw
        assert len(got) == len(want)  # no duplicate matches from bucketing


def test_range_join_boundary_semantics(spark):
    from tsrollup.joins import range_join

    pts = spark.createDataFrame([(1, 10, 0), (1, 20, 1)],
                                "key int, pt long, pid int")
    ivs = spark.createDataFrame([(1, 10, 20, 0)],
                                "key int, s long, e long, iid int")
    got = range_join(pts, ivs, "key", "pt", "s", "e", 5,
                     ("iid",)).toPandas()
    # [start, end): 10 in, 20 out
    assert list(got["pid"]) == [0]


def test_range_join_plan_has_no_nested_loop(spark):
    from tsrollup.joins import range_join

    pts = spark.createDataFrame([(1, 10, 0)], "key int, pt long, pid int")
    ivs = spark.createDataFrame([(1, 5, 15, 0)],
                                "key int, s long, e long, iid int")
    df = range_join(pts, ivs, "key", "pt", "s", "e", 5, ("iid",))
    plan = formatted_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_asof_property_random_instances(spark):
    """Property-style sweep: many seeded random (left, right) instances —
    including duplicate left timestamps, right rows with NULL attrs (the
    atomic-struct carry must NOT backfill them from older rows), and keys
    present on only one side — always match pandas merge_asof row for row.
    (Spark-session tests keep hypothesis out of the hot loop: one session,
    seeded instances instead of example shrinking.)"""
    from tsrollup.joins import asof_join

    for seed in range(6):
        rng = np.random.default_rng(100 + seed)
        nl, nr = int(rng.integers(5, 120)), int(rng.integers(1, 40))
        left = pd.DataFrame({
            "key": rng.integers(0, 4, nl).astype(np.int64),
            "lt": rng.integers(0, 200, nl).astype(np.int64),  # heavy ties
            "pid": np.arange(nl, dtype=np.int64),
        })
        right = pd.DataFrame({
            "key": rng.integers(0, 6, nr).astype(np.int64),  # extra keys
            "rt": rng.integers(0, 200, nr).astype(np.int64),
            "a": rng.integers(0, 100, nr).astype(np.int64),
            # nullable second attr: ~1/3 NULL
            "b": [None if rng.random() < 0.33 else int(v)
                  for v in rng.integers(0, 100, nr)],
        }).drop_duplicates(["key", "rt"])

        got = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right, "key long, rt long, a long, b long"),
            on="key", left_ts="lt", right_ts="rt",
            attrs=("rt", "a", "b")).toPandas()
        want = pd.merge_asof(
            left.sort_values(["lt", "pid"]), right.sort_values("rt"),
            left_on="lt", right_on="rt", by="key", direction="backward")
        want = want[want["rt"].notna()]
        gk = got.sort_values(["key", "lt", "pid"]).reset_index(drop=True)
        wk = want.sort_values(["key", "lt", "pid"]).reset_index(drop=True)
        assert len(gk) == len(wk), seed
        assert (gk["pid"].values == wk["pid"].values).all(), seed
        assert (gk["rt"].values == wk["rt"].values.astype(np.int64)).all(), seed
        assert (gk["a"].values == wk["a"].values.astype(np.int64)).all(), seed
        # NULL b of the true match stays NULL (no backfill from older rows)
        gb = gk["b"].isna().values
        wb = wk["b"].isna().values
        assert (gb == wb).all(), seed
        ok = ~gb
        assert (gk["b"].values[ok].astype(np.int64)
                == wk["b"].values[ok].astype(np.int64)).all(), seed


def test_range_join_property_random_instances(spark):
    """Seeded random interval sets (incl. zero-length and inverted intervals,
    which must match nothing) vs brute force, at several bucket widths."""
    from tsrollup.joins import range_join

    for seed in range(4):
        rng = np.random.default_rng(50 + seed)
        np_, ni = int(rng.integers(5, 100)), int(rng.integers(1, 30))
        pts = pd.DataFrame({
            "key": rng.integers(0, 3, np_).astype(np.int64),
            "pt": rng.integers(0, 300, np_).astype(np.int64),
            "pid": np.arange(np_, dtype=np.int64),
        })
        s = rng.integers(0, 300, ni).astype(np.int64)
        spans = rng.integers(-20, 80, ni).astype(np.int64)  # some inverted
        ivs = pd.DataFrame({
            "key": rng.integers(0, 3, ni).astype(np.int64),
            "s": s, "e": s + spans,
            "iid": np.arange(ni, dtype=np.int64),
        })
        want = {(int(p.pid), int(i.iid))
                for p in pts.itertuples() for i in ivs.itertuples()
                if p.key == i.key and i.s <= p.pt < i.e}
        bw = int(rng.integers(3, 200))
        got = range_join(spark.createDataFrame(pts),
                         spark.createDataFrame(ivs),
                         on="key", point_ts="pt", start_col="s",
                         end_col="e", bucket_width=bw,
                         attrs=("iid",)).toPandas()
        assert set(zip(got["pid"], got["iid"])) == want, (seed, bw)
        assert len(got) == len(want), (seed, bw)


def test_asof_null_keys_never_match(spark):
    """SQL/DuckDB ASOF semantics: NULL join keys match nothing — a NULL-key
    left row is dropped under 'inner' and carries null attrs under 'left',
    even when a NULL-key right row exists."""
    from tsrollup.joins import asof_join

    left = spark.createDataFrame(
        [(None, 10, "ln"), (1, 10, "l1")], "key int, lt long, lbl string")
    right = spark.createDataFrame(
        [(None, 5, 100), (1, 5, 200)], "key int, rt long, a int")
    inner = asof_join(left, right, on="key", left_ts="lt", right_ts="rt",
                      attrs=("a",)).collect()
    assert [(r["key"], r["a"]) for r in inner] == [(1, 200)]
    outer = asof_join(left, right, on="key", left_ts="lt", right_ts="rt",
                      attrs=("a",), how="left").collect()
    got = {r["lbl"]: r["a"] for r in outer}
    assert got == {"ln": None, "l1": 200}


def test_range_join_exact_bucketing_beyond_double_precision(spark):
    """Bucket ids are exact integer floor-division: timestamps beyond 2^53
    (where double-rounded floor(ts/b) can land in the wrong bucket) and
    negative timestamps both bucket correctly."""
    from tsrollup.joins import range_join

    base = (1 << 60) + 1  # not representable in double
    pts = spark.createDataFrame(
        [(0, base + 5, 0), (0, base + 15, 1), (0, -7, 2)],
        "key int, pt long, pid int")
    ivs = spark.createDataFrame(
        [(0, base, base + 10, 0),    # catches pid 0 only
         (0, base + 10, base + 20, 1),  # catches pid 1 only
         (0, -10, 0, 2)],            # catches pid 2 (negative range)
        "key int, s long, e long, iid int")
    got = range_join(pts, ivs, on="key", point_ts="pt", start_col="s",
                     end_col="e", bucket_width=7, attrs=("iid",)).collect()
    assert sorted((r["pid"], r["iid"]) for r in got) == [(0, 0), (1, 1),
                                                         (2, 2)]


class TestAsofDirections:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 10, "e0"), (1, 100, "e1"), (1, 55, "e2"), (2, 5, "e3")],
            "k long, t long, tag string").selectExpr("k", "t", "tag")
        right = spark.createDataFrame(
            [(1, 20, "r20"), (1, 90, "r90"), (2, 50, "r50")],
            "k long, rt long, lab string")
        return left, right

    def test_forward_matches_next(self, spark):
        from tsrollup.joins import asof_join

        left, right = self._frames(spark)
        out = {r.tag: r.lab for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt",
            attrs=("lab",), direction="forward").collect()}
        # e0(t=10) -> r20; e1(t=100) has no following -> dropped (inner)
        assert out == {"e0": "r20", "e2": "r90", "e3": "r50"}

    def test_nearest_picks_closer_and_ties_backward(self, spark):
        from tsrollup.joins import asof_join

        left, right = self._frames(spark)
        out = {r.tag: r.lab for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt",
            attrs=("lab",), direction="nearest").collect()}
        # e2(t=55): |55-20|=35 vs |90-55|=35 -> tie -> backward r20
        assert out["e2"] == "r20"
        # e0(t=10): only forward exists -> r20; e1(t=100): backward r90
        assert out["e0"] == "r20" and out["e1"] == "r90"
        assert out["e3"] == "r50"

    def test_forward_null_left_ts_matches_nothing(self, spark):
        from tsrollup.joins import asof_join

        left = spark.createDataFrame([(1, None, "eN")],
                                     "k long, t long, tag string")
        right = spark.createDataFrame([(1, 20, "r20")],
                                      "k long, rt long, lab string")
        got = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                        attrs=("lab",), how="left",
                        direction="forward").collect()
        assert len(got) == 1 and got[0].lab is None

    def test_bad_direction_rejected(self, spark):
        import pytest as _pytest

        from tsrollup.joins import asof_join

        left, right = self._frames(spark)
        with _pytest.raises(ValueError):
            asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                      attrs=("lab",), direction="sideways")


class TestAsofTolerance:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 10, "e0"), (1, 100, "e1"), (1, 55, "e2"), (2, 5, "e3")],
            "k long, t long, tag string").selectExpr("k", "t", "tag")
        right = spark.createDataFrame(
            [(1, 20, "r20"), (1, 90, "r90"), (2, 50, "r50")],
            "k long, rt long, lab string")
        return left, right

    def test_backward_tolerance_bounds_match(self, spark):
        from tsrollup.joins import asof_join

        left, right = self._frames(spark)
        out = {r.tag: r.lab for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt",
            attrs=("lab",), tolerance=10).collect()}
        # e1(t=100): backward r90, delta 10 <= 10 -> kept (inclusive);
        # e2(t=55): backward r20, delta 35 > 10 -> dropped under inner
        assert out == {"e1": "r90"}

    def test_nearest_tolerance_left_keeps_nulls(self, spark):
        from tsrollup.joins import asof_join

        left, right = self._frames(spark)
        rows = {r.tag: r.lab for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt",
            attrs=("lab",), direction="nearest", how="left",
            tolerance=10).collect()}
        # all four left rows survive; only within-10 matches carry attrs
        assert rows == {"e0": "r20", "e1": "r90", "e2": None, "e3": None}

    def test_tolerance_matches_pandas(self, spark):
        import numpy as np
        import pandas as pd

        from tsrollup.joins import asof_join

        rng = np.random.default_rng(17)
        left = pd.DataFrame({
            "key": rng.integers(0, 4, 300).astype(np.int64),
            "lt": rng.integers(0, 500, 300).astype(np.int64),
            "payload": np.arange(300, dtype=np.int64)})
        right = pd.DataFrame({
            "key": rng.integers(0, 4, 60).astype(np.int64),
            "rt": rng.integers(0, 500, 60).astype(np.int64),
            "attr": rng.integers(0, 10_000, 60).astype(np.int64),
        }).drop_duplicates(["key", "rt"])
        got = asof_join(spark.createDataFrame(left),
                        spark.createDataFrame(right),
                        on="key", left_ts="lt", right_ts="rt",
                        attrs=("rt", "attr"), how="left",
                        tolerance=25).toPandas()
        want = pd.merge_asof(left.sort_values("lt"),
                             right.sort_values("rt"),
                             left_on="lt", right_on="rt", by="key",
                             direction="backward", tolerance=25)
        gk = got.sort_values("payload").reset_index(drop=True)
        wk = want.sort_values("payload").reset_index(drop=True)
        assert len(gk) == len(wk)
        assert (gk["rt"].isna().values == wk["rt"].isna().values).all()
        m = ~wk["rt"].isna().values
        assert (gk["rt"].values[m] == wk["rt"].values[m]).all()
        assert (gk["attr"].values[m] == wk["attr"].values[m]).all()

    def test_negative_tolerance_rejected(self, spark):
        import pytest as _pytest

        from tsrollup.joins import asof_join

        left, right = self._frames(spark)
        with _pytest.raises(ValueError):
            asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                      attrs=("lab",), tolerance=-1)


class TestIntervalJoin:
    def _iv(self, spark, rows, id_name):
        return spark.createDataFrame(
            rows, f"{id_name} long, start_us long, end_us long")

    def test_hand_built_overlaps(self, spark):
        from tsrollup.joins import interval_join

        left = self._iv(spark, [(1, 0, 100), (2, 200, 300)], "left_id")
        right = self._iv(
            spark,
            [(10, 50, 150),     # overlaps 1 on [50, 100)
             (11, 100, 200),    # touches 1 at 100 (half-open: no match)
             (12, 250, 260),    # inside 2
             (13, 400, 500)],   # disjoint
            "right_id")
        got = {(r.left_id, r.right_id):
               (r.overlap_start_us, r.overlap_end_us, r.overlap_us)
               for r in interval_join(left, right, bucket_width=64).collect()}
        assert got == {(1, 10): (50, 100, 50), (2, 12): (250, 260, 10)}

    def test_exactly_once_across_many_shared_buckets(self, spark):
        from tsrollup.joins import interval_join

        # both intervals span 40 tiny buckets; the pair must emit ONCE
        left = self._iv(spark, [(1, 0, 400)], "left_id")
        right = self._iv(spark, [(9, 10, 390)], "right_id")
        out = interval_join(left, right, bucket_width=10).collect()
        assert len(out) == 1
        assert (out[0].overlap_start_us, out[0].overlap_end_us) == (10, 390)

    def test_empty_and_inverted_intervals_match_nothing(self, spark):
        from tsrollup.joins import interval_join

        left = self._iv(spark, [(1, 100, 100), (2, 300, 200)], "left_id")
        right = self._iv(spark, [(9, 0, 1000)], "right_id")
        assert interval_join(left, right, bucket_width=50).count() == 0

    def test_matches_brute_force(self, spark):
        import numpy as np

        from tsrollup.joins import interval_join

        rng = np.random.default_rng(13)
        ls = rng.integers(0, 5000, size=120)
        rs = rng.integers(0, 5000, size=150)
        left = self._iv(spark, [(i, int(s), int(s + rng.integers(1, 400)))
                                for i, s in enumerate(ls)], "left_id")
        lrows = {r.left_id: (r.start_us, r.end_us) for r in left.collect()}
        right = self._iv(spark, [(i, int(s), int(s + rng.integers(1, 400)))
                                 for i, s in enumerate(rs)], "right_id")
        rrows = {r.right_id: (r.start_us, r.end_us) for r in right.collect()}
        got = {(r.left_id, r.right_id): r.overlap_us
               for r in interval_join(left, right, bucket_width=128).collect()}
        want = {}
        for li, (a, b) in lrows.items():
            for ri, (c, d) in rrows.items():
                if a < d and c < b:
                    want[(li, ri)] = min(b, d) - max(a, c)
        assert got == want and len(want) > 100

    def test_equi_join_plan_no_nested_loop(self, spark):
        from tsrollup.joins import interval_join
        from tsrollup.planaudit import formatted_plan

        left = self._iv(spark, [(1, 0, 100)], "left_id")
        right = self._iv(spark, [(9, 50, 150)], "right_id")
        plan = formatted_plan(interval_join(left, right, bucket_width=64))
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    def test_rejects_bad_bucket_width(self, spark):
        import pytest

        from tsrollup.joins import interval_join

        df = self._iv(spark, [(1, 0, 1)], "left_id")
        with pytest.raises(ValueError):
            interval_join(df, df, bucket_width=0)
