from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from tsrollup.session import get_spark

    s = get_spark("tsrollup-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sequences_path(tmp_path_factory) -> str:
    """Seeded sf-tiny sequences fixture (FIXTURES.md F1), 120 docs."""
    from tsrollup.datagen import write_sequences

    p = tmp_path_factory.mktemp("data") / "sequences.parquet"
    write_sequences(str(p), seed=42, n_docs=120, min_len=64, max_len=1024)
    return str(p)
