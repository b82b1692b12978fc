"""Compressed tier storage round-trip: decompress(rollup_compressed(x)) must
equal rollup_sequences(x) exactly, and the packed bytes must actually be
smaller than raw encoding (the point of Gorilla/delta-of-delta at rest)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsrollup.rollup import decompress_rollup, rollup_compressed, rollup_sequences
from tests.test_rollup_spark import assert_exact_match


@pytest.fixture(scope="module")
def seq_df(spark, sequences_path):
    return spark.read.parquet(sequences_path)


def test_compressed_roundtrip_exact(spark, seq_df):
    flat = rollup_sequences(seq_df).toPandas()
    packed = rollup_compressed(seq_df)
    back = decompress_rollup(packed).toPandas()
    assert_exact_match(back, flat)


def test_compression_beats_raw(spark):
    # per-blob headers amortize over window count, so measure at the shape the
    # codecs target: long docs with thousands of base windows
    import pandas as pd

    n = 64 * 2000
    rng = np.random.default_rng(1)
    toks = (10000 + 100 * np.sin(np.arange(n) / 64.0)
            + rng.standard_normal(n) * 5).astype(np.int32)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["long-1"], "tokens": [toks], "source": ["web"]}))
    sizes = (
        rollup_compressed(df)
        .filter("tier = '1m'")
        .select(
            F.sum(F.octet_length("window_start")).alias("ws_bytes"),
            F.sum(F.octet_length("mean")).alias("mean_bytes"),
            F.sum("n_windows").alias("points"),
        )
        .collect()[0]
    )
    assert sizes["points"] == 2000
    # monotone regular offsets: ~1 byte/point (vs 8 raw)
    assert sizes["ws_bytes"] < 1.2 * sizes["points"]
    # gorilla on smooth means: beats raw 8 B/point
    assert sizes["mean_bytes"] < 8 * sizes["points"]
