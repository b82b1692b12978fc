"""DTW kNN: the LB_Keogh-pruned path must match the brute-force baseline
bit-for-bit, and both must match the plain double-loop DP reference."""
import numpy as np
import pytest

from tsrollup.dtw import (_dtw_batch, dtw_knn, dtw_knn_brute, dtw_ref,
                          envelope, lb_keogh)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(d, [int(x) for x in t]) for d, t in rows],
        "doc_id string, tokens array<int>")


def _corpus_rows(n=40, length=24, seed=3):
    rng = np.random.default_rng(seed)
    return [(f"d{i:03d}", rng.integers(1, 30, size=length).tolist())
            for i in range(n)]


class TestKernel:
    @pytest.mark.parametrize("r", [0, 2, 5, 23])
    def test_batch_matches_double_loop_reference(self, r):
        rng = np.random.default_rng(11 + r)
        q = rng.integers(0, 25, size=(6, 24)).astype(np.int64)
        c = rng.integers(0, 25, size=(6, 24)).astype(np.int64)
        got = _dtw_batch(q, c, r)
        for i in range(6):
            assert got[i] == dtw_ref(q[i], c[i], r)

    def test_identical_series_distance_zero(self):
        y = np.arange(16, dtype=np.int64)
        assert dtw_ref(y, y, 3) == 0
        assert _dtw_batch(y[None, :], y[None, :], 3)[0] == 0

    def test_r0_is_plain_squared_euclidean(self):
        rng = np.random.default_rng(5)
        a = rng.integers(0, 20, 12).astype(np.int64)
        b = rng.integers(0, 20, 12).astype(np.int64)
        assert dtw_ref(a, b, 0) == int(((a - b) ** 2).sum())

    def test_warping_beats_euclidean_on_shifted_series(self):
        a = np.array([0, 0, 9, 0, 0, 0], dtype=np.int64)
        b = np.array([0, 0, 0, 9, 0, 0], dtype=np.int64)
        assert dtw_ref(a, b, 2) < int(((a - b) ** 2).sum())

    def test_lb_keogh_is_true_lower_bound(self):
        rng = np.random.default_rng(7)
        for r in (1, 3, 6):
            for _ in range(50):
                q = rng.integers(0, 30, 20).astype(np.int64)
                c = rng.integers(0, 30, 20).astype(np.int64)
                U, L = envelope(q, r)
                assert lb_keogh(U, L, c) <= dtw_ref(q, c, r)


class TestKnn:
    @pytest.mark.parametrize("r,k", [(2, 3), (6, 5)])
    def test_pruned_matches_brute(self, spark, r, k):
        rows = _corpus_rows()
        df = _docs(spark, rows)
        qdf = _docs(spark, rows[:3])
        a = dtw_knn(df, qdf, k=k, r=r, length=24)
        b = dtw_knn_brute(df, qdf, k=k, r=r, length=24)
        key = ["qid", "rnk"]
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect()))
        assert a.count() == 3 * k
        # and brute matches the double-loop reference end-to-end
        rows_by_id = dict(rows)
        for row in b.filter("qid = 'd000'").collect():
            assert row["dtw_d2"] == dtw_ref(
                np.asarray(rows_by_id["d000"][:24]),
                np.asarray(rows_by_id[row["doc_id"]][:24]), r)
        del key

    def test_self_match_ranks_first_at_zero(self, spark):
        rows = _corpus_rows(n=20)
        df = _docs(spark, rows)
        out = dtw_knn(df, _docs(spark, rows[:2]), k=2, r=3, length=24) \
            .filter("rnk = 1").collect()
        for row in out:
            assert row["qid"] == row["doc_id"] and row["dtw_d2"] == 0

    def test_short_docs_excluded_from_corpus(self, spark):
        rows = _corpus_rows(n=10)
        df = _docs(spark, rows + [("short", [1, 2, 3])])
        out = dtw_knn(df, _docs(spark, rows[:1]), k=10, r=2, length=24)
        assert "short" not in {row["doc_id"] for row in out.collect()}

    def test_short_query_raises(self, spark):
        rows = _corpus_rows(n=5)
        with pytest.raises(ValueError, match="fixed-length DTW needs"):
            dtw_knn(_docs(spark, rows), _docs(spark, [("q", [1, 2])]),
                    k=2, r=2, length=24)

    def test_planted_twin_found_despite_decoys(self, spark):
        # a warped twin of the query must beat same-mean decoys
        rng = np.random.default_rng(13)
        base = rng.integers(1, 20, 24).tolist()
        twin = base[1:] + [base[-1]]  # shift-by-one warp
        rows = ([("q0", base), ("twin", twin)] +
                [(f"noise{i}", rng.permutation(base).tolist())
                 for i in range(20)])
        out = dtw_knn(_docs(spark, rows), _docs(spark, rows[:1]),
                      k=2, r=4, length=24).collect()
        got = {row["rnk"]: row["doc_id"] for row in out}
        assert got[1] == "q0" and got[2] == "twin"
