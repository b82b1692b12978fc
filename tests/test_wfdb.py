"""WFDB binary source tests: bit-level codec vectors, round-trips, and the
distributed read composed end-to-end against a single-node NumPy reference
of the MIT-BIH segmentation pipeline (TSFEDL/data.py:10-154 semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from tsrollup.wfdb import (ANN_CODE, decode_annotations, decode_record,
                           encode_annotations, encode_record, format_header,
                           pack212, parse_header, read_mit_bih,
                           read_wfdb_annotations, read_wfdb_signals,
                           unpack212, wfdb_checksum)


class TestFormat212:
    def test_known_byte_layout(self):
        # s0=1 -> b0=0x01, low nibble of b1 = 0; s1=-1 (0xFFF) -> high
        # nibble of b1 = 0xF, b2=0xFF
        assert pack212(np.array([1, -1])) == bytes([0x01, 0xF0, 0xFF])
        assert unpack212(bytes([0x01, 0xF0, 0xFF]), 2).tolist() == [1, -1]

    def test_extremes_and_roundtrip(self):
        rng = np.random.default_rng(7)
        a = np.concatenate([[2047, -2048, 0, -1, 1],
                            rng.integers(-2048, 2048, 1001)])  # odd length
        assert unpack212(pack212(a), a.size).tolist() == a.tolist()

    def test_out_of_range_rejected(self):
        with pytest.raises(ValueError):
            pack212(np.array([2048]))
        with pytest.raises(ValueError):
            pack212(np.array([-2049]))

    def test_bad_buffer_length(self):
        with pytest.raises(ValueError):
            unpack212(b"\x00\x00", 1)

    def test_checksum_is_signed_16bit(self):
        assert wfdb_checksum(np.array([1, 2, 3])) == 6
        assert wfdb_checksum(np.array([0x7FFF, 1])) == -32768
        assert wfdb_checksum(np.array([0x10000])) == 0


class TestHeader:
    def test_roundtrip(self):
        h = parse_header(format_header(parse_header(
            "100 2 360 650000\n"
            "100.dat 212 200(1024)/mV 11 1024 995 21537 0 MLII\n"
            "100.dat 212 200(1024)/mV 11 1024 1011 20052 0 V5\n")))
        assert h.record == "100" and h.n_sig == 2 and h.fs == 360.0
        assert h.n_samples == 650000
        assert h.signals[0].gain == 200.0 and h.signals[0].baseline == 1024
        assert h.signals[1].description == "V5"
        assert h.signals[0].checksum == 21537

    def test_defaults(self):
        h = parse_header("r 1 250 10\nr.dat 212 0\n")
        assert h.signals[0].gain == 200.0  # spec default when gain is 0
        assert h.signals[0].units == "mV"


class TestRecordCodec:
    def test_two_channel_roundtrip(self):
        rng = np.random.default_rng(42)
        sig = rng.integers(-2048, 2048, (501, 2))  # odd frame count
        files = encode_record("r01", sig, fs=360.0, gain=200.0, baseline=12)
        h, back = decode_record(files["r01.hea"], files["r01.dat"])
        assert back.tolist() == sig.tolist()
        assert h.fs == 360.0 and h.signals[0].baseline == 12

    def test_checksum_mismatch_detected(self):
        files = encode_record("r", np.array([[1], [2], [3]]))
        bad = bytearray(files["r.dat"])
        bad[0] ^= 0x01
        with pytest.raises(ValueError, match="checksum"):
            decode_record(files["r.hea"], bytes(bad))

    def test_missing_sample_count_inferred_from_dat_size(self):
        # a spec-legal header with no n_samples field: length comes from
        # the .dat size instead of silently decoding zero samples
        sig = np.arange(10).reshape(5, 2)
        files = encode_record("r", sig)
        hea = ("r 2 360\n"  # no n_samples; short signal lines = no checksum
               "r.dat 212 200(0)/mV\n"
               "r.dat 212 200(0)/mV\n")
        h, back = decode_record(hea.encode(), files["r.dat"])
        assert h.n_samples == 5
        assert back.tolist() == sig.tolist()

    def test_unsupported_format_named(self):
        files = encode_record("r", np.array([[1]]))
        hea = files["r.hea"].decode().replace(" 212 ", " 16 ")
        with pytest.raises(NotImplementedError, match="format 16"):
            decode_record(hea.encode(), files["r.dat"])


class TestAnnotations:
    def test_roundtrip_with_all_pseudo_codes(self):
        anns = [(10, ANN_CODE["N"], 0, 0, 0, None),
                (900, ANN_CODE["V"], 3, 0, 0, None),      # SUB
                (950, ANN_CODE["N"], 0, 1, 0, None),      # CHN switch
                (2000, ANN_CODE["A"], 0, 1, 2, "odd"),    # NUM + odd AUX
                (500000, ANN_CODE["L"], 0, 1, 2, None)]   # SKIP (>1023)
        assert decode_annotations(encode_annotations(anns)) == anns

    def test_chn_num_stick_sub_does_not(self):
        anns = [(5, ANN_CODE["N"], 7, 2, 3, None),
                (6, ANN_CODE["N"], 0, 2, 3, None)]
        assert decode_annotations(encode_annotations(anns)) == anns

    def test_empty_and_eof_only(self):
        assert decode_annotations(encode_annotations([])) == []

    def test_decreasing_time_rejected(self):
        with pytest.raises(ValueError):
            encode_annotations([(5, 1, 0, 0, 0, None), (4, 1, 0, 0, 0, None)])

    def test_oversized_aux_rejected_not_corrupted(self):
        # a 10-bit length field can't address >1023 bytes; a masked write
        # would desync the reader into parsing payload as annotations
        with pytest.raises(ValueError, match="1023"):
            encode_annotations([(5, 1, 0, 0, 0, "x" * 1100)])

    def test_out_of_range_fields_rejected(self):
        with pytest.raises(ValueError, match="code"):
            encode_annotations([(5, 59, 0, 0, 0, None)])  # pseudo-code
        with pytest.raises(ValueError, match="code"):
            encode_annotations([(5, 50, 0, 0, 0, None)])  # past ACMAX=49
        with pytest.raises(ValueError, match="code"):
            encode_annotations([(5, 0, 0, 0, 0, None)])   # EOF code
        with pytest.raises(ValueError, match="num"):
            encode_annotations([(5, 1, 0, 0, 1024, None)])

    def test_literal_zero_checksum_is_verified(self):
        # 0 is a legal checksum (sum-cancelling signal) and must be
        # CHECKED, not treated as absent
        sig = np.array([[5], [-5]])  # checksum 0
        files = encode_record("r", sig)
        assert decode_record(files["r.hea"], files["r.dat"])[1].tolist() \
            == sig.tolist()
        bad = bytearray(files["r.dat"])
        bad[0] ^= 0x01
        with pytest.raises(ValueError, match="checksum"):
            decode_record(files["r.hea"], bytes(bad))


def _reference_segments(adc, gain, baseline, anns, labels,
                        left=99, right=160, fixed=1000):
    """Single-node mirror of the reference pipeline (data.py:10-96): filter
    labels, group runs of equal symbols, expand/clamp, truncate/right-pad."""
    mv = (adc - baseline) / gain
    kept = [(t, s) for t, s in anns if s in labels]
    out, i = [], 0
    while i < len(kept):
        j = i
        while j + 1 < len(kept) and kept[j + 1][1] == kept[i][1]:
            j += 1
        start = max(kept[i][0] - left, 0)
        stop = min(kept[j][0] + right, len(mv))
        seg = mv[start:stop]
        n_raw = len(seg)
        seg = seg[:fixed]
        if len(seg) < fixed:
            seg = np.pad(seg, (0, fixed - len(seg)))
        out.append((kept[i][1], seg, n_raw))
        i = j + 1
    return out


@pytest.fixture(scope="module")
def record_dir(tmp_path_factory):
    rng = np.random.default_rng(3)
    d = tmp_path_factory.mktemp("wfdb")
    recs = {}
    for name, t in (("100", 4000), ("101", 3000)):
        sig = rng.integers(-2048, 2048, (t, 2))
        for fn, blob in encode_record(name, sig, fs=360.0, gain=200.0,
                                      baseline=1024).items():
            (d / fn).write_bytes(blob)
        pos = np.sort(rng.choice(t, 40, replace=False))
        syms = rng.choice(["N", "N", "N", "V", "A", "x"], 40)
        anns = [(int(p), ANN_CODE[s], 0, 0, 0, None)
                for p, s in zip(pos, syms)]
        (d / f"{name}.atr").write_bytes(encode_annotations(anns))
        recs[name] = (sig, [(int(p), s) for p, s in zip(pos, syms)])
    return str(d), recs


class TestSparkReads:
    def test_signals_match_source(self, spark, record_dir):
        path, recs = record_dir
        rows = {(r.record, r.channel): r
                for r in read_wfdb_signals(spark, path).collect()}
        assert set(rows) == {("100", 0), ("100", 1), ("101", 0), ("101", 1)}
        for (rec, ch), r in rows.items():
            assert r.adc == recs[rec][0][:, ch].tolist()
            assert r.fs == 360.0 and r.baseline == 1024

    def test_annotations_match_source(self, spark, record_dir):
        path, recs = record_dir
        got = read_wfdb_annotations(spark, path).collect()
        for rec, (_, anns) in recs.items():
            mine = sorted((r.pos, r.symbol) for r in got if r.record == rec)
            assert mine == anns

    def test_mit_bih_pipeline_matches_reference(self, spark, record_dir):
        path, recs = record_dir
        labels = ("N", "L", "R", "A", "V")
        got = read_mit_bih(spark, path, labels=labels).collect()
        for rec, (sig, anns) in recs.items():
            want = _reference_segments(sig[:, 0], 200.0, 1024, anns, labels)
            mine = sorted((r for r in got if r.series_id == rec),
                          key=lambda r: r.seg_id)
            assert len(mine) == len(want)
            for r, (sym, seg, n_raw) in zip(mine, want):
                assert r.symbol == sym and r.n_raw == n_raw
                np.testing.assert_array_equal(np.array(r.seg), seg)

    def test_annotation_read_plan_is_shuffle_free(self, spark, record_dir):
        from tsrollup.planaudit import formatted_plan, n_data_exchanges

        path, _ = record_dir
        plan = formatted_plan(read_wfdb_annotations(spark, path))
        assert n_data_exchanges(plan) == 0, plan

    def test_signal_read_broadcasts_headers(self, spark, record_dir):
        from tsrollup.planaudit import (count_op, formatted_plan,
                                        n_data_exchanges)

        path, _ = record_dir
        plan = formatted_plan(read_wfdb_signals(spark, path))
        assert count_op(plan, "BroadcastHashJoin") == 1, plan
        assert n_data_exchanges(plan) == 0, plan


def test_wfdb_ingest_cli(spark, record_dir, tmp_path, monkeypatch):
    """The production ingestion entry point writes record-partitioned
    signals + annotations parquet whose values equal the source binaries
    (the spark-submit path is exercised in README's production evidence;
    here main() runs in-process against the live session)."""
    import tools.wfdb_ingest as cli

    path, recs = record_dir
    out = str(tmp_path / "lake")
    monkeypatch.setattr("sys.argv", [
        "wfdb_ingest.py", "--src", path, "--out", out, "--long"])
    # reuse the session-scoped SparkSession: getOrCreate inside get_spark
    # returns it, and main()'s stop() would kill the shared fixture — guard
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    assert cli.main() == 0
    sig = spark.read.parquet(f"{out}/signals")
    ann = spark.read.parquet(f"{out}/annotations")
    total = sum(s.shape[0] for s, _ in recs.values()) * 2
    assert sig.count() == total
    assert ann.count() == sum(len(a) for _, a in recs.values())
    # spot-check one series end-to-end
    rows = (sig.filter("record = 100 and channel = 1")
            .orderBy("pos").select("adc").toPandas()["adc"].tolist())
    assert rows == recs["100"][0][:, 1].tolist()


class TestProperties:
    """Hypothesis round-trips: any 12-bit sample stream and any legal
    annotation stream must survive pack→unpack bit-exactly."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(-2048, 2047), max_size=300))
    def test_fmt212_roundtrip(self, xs):
        a = np.asarray(xs, dtype=np.int64)
        assert unpack212(pack212(a), a.size).tolist() == xs

    @settings(max_examples=100, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 1 << 30),      # time delta to previous
                  st.integers(1, 49),           # data code
                  st.integers(0, 1023),         # sub
                  st.integers(0, 1023),         # chn
                  st.integers(0, 1023),         # num
                  st.one_of(st.none(),
                            st.text(alphabet=st.characters(
                                min_codepoint=32, max_codepoint=126),
                                max_size=40))),
        max_size=30))
    def test_annotation_roundtrip(self, rows):
        t, anns = 0, []
        for dt_, code, sub, chn, num, aux in rows:
            t += dt_
            anns.append((t, code, sub, chn, num, aux or None))
        assert decode_annotations(encode_annotations(anns)) == anns
