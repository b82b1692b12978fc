"""The persisted-store cache keys in __spark_entry__ must change whenever
any module in the artifact's producer chain changes — the stale-artifact
class two review rounds flagged (a round-N store silently reused after a
round-N+1 code edit under an unchanged input fingerprint)."""

from __future__ import annotations

import sys
import types

sys.path.insert(0, "/root/repo")

from __spark_entry__ import _code_fp  # noqa: E402


def _fake_module(tmp_path, name: str, body: bytes):
    p = tmp_path / f"{name}.py"
    p.write_bytes(body)
    return types.SimpleNamespace(__file__=str(p))


def test_code_fp_stable_for_same_sources(tmp_path):
    m = _fake_module(tmp_path, "m", b"def f(): return 1\n")
    assert _code_fp(m) == _code_fp(m)


def test_code_fp_changes_when_module_source_changes(tmp_path):
    m1 = _fake_module(tmp_path, "m1", b"def f(): return 1\n")
    before = _code_fp(m1)
    m1b = _fake_module(tmp_path, "m1", b"def f(): return 2\n")
    assert _code_fp(m1b) != before


def test_code_fp_sensitive_to_every_module_in_the_chain(tmp_path):
    a = _fake_module(tmp_path, "a", b"A1\n")
    b = _fake_module(tmp_path, "b", b"B1\n")
    base = _code_fp(a, b)
    b2 = _fake_module(tmp_path, "b", b"B2\n")
    assert _code_fp(a, b2) != base  # last module counts too


def test_code_fp_covers_the_entry_file_itself(tmp_path):
    # the entry file hosts the tokenization/query glue; its bytes are
    # always part of the fingerprint, so two fingerprints over identical
    # extra modules still agree (same entry file) — and the helper reads
    # the REAL entry source, not a cached copy
    m = _fake_module(tmp_path, "m", b"X\n")
    import __spark_entry__ as entrymod
    from pathlib import Path

    assert Path(entrymod.__file__).exists()
    assert len(_code_fp(m)) == 10  # md5 prefix, tag-embedding friendly
