"""Multimodal plumbing: schema, UDF batch shape, determinism, decode stub."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def media_df(spark):
    from tsrollup.multimodal import MEDIA_SCHEMA, generate_media

    return spark.createDataFrame(generate_media(11, 60), MEDIA_SCHEMA).cache()


def test_feature_schema_and_shapes(spark, media_df):
    from tsrollup.multimodal import THUMB, extract_features

    out = extract_features(media_df).toPandas()
    assert len(out) == 60
    for _, r in out.iterrows():
        c = {"image": 3, "audio": 1, "video": 3}[r["kind"]]
        assert len(r["mean"]) == c and len(r["std"]) == c
        if r["kind"] == "audio":
            assert len(r["thumb"]) == 0
        else:
            assert len(r["thumb"]) == THUMB * THUMB * c
        if r["kind"] == "video":
            assert r["n_frames_sampled"] >= 1


def test_features_deterministic(spark, media_df):
    from tsrollup.multimodal import extract_features

    a = extract_features(media_df).toPandas().sort_values("media_id")
    b = extract_features(media_df.repartition(7)).toPandas() \
        .sort_values("media_id")
    for col in ("mean", "std", "thumb"):
        for x, y in zip(a[col], b[col]):
            assert (np.asarray(x) == np.asarray(y)).all()


def test_fake_decode_matches_meta():
    from tsrollup.multimodal import fake_decode, generate_media

    pdf = generate_media(3, 30)
    for _, r in pdf.iterrows():
        arr = fake_decode(r["payload"], r["meta"])
        m = r["meta"]
        if m["fmt"] == "image":
            assert arr.shape == (m["height"], m["width"], m["channels"])
        elif m["fmt"] == "audio":
            assert arr.shape == (m["sample_rate"],)
        else:
            assert arr.shape == (m["n_frames"], m["height"], m["width"],
                                 m["channels"])


def test_real_decoder_is_gated():
    from tsrollup.multimodal import decode_media, generate_media

    r = generate_media(5, 1).iloc[0]
    with pytest.raises(NotImplementedError):
        decode_media(r["payload"], r["meta"])
