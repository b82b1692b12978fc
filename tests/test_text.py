"""Text operators on planted inputs: lang-ID picks the planted language,
quality/quantity metrics are exact, fingerprints collide only on equality."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (1, "the cat sat on the mat and it was happy for the rest of the day"),
        (2, "der hund und die katze sind nicht mit dem ball von den kindern"),
        (3, "le chat et le chien sont dans la maison avec les enfants"),
        (4, "el perro y el gato con los juguetes para una siesta del verano"),
        (5, "zzz qqq xxx www"),  # no stopwords anywhere
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_lang_id_planted(spark, docs_df):
    from tsrollup.text import lang_id

    got = dict(lang_id(docs_df).select("doc_id", "pred_lang").toPandas().values)
    assert got[1] == "en" and got[2] == "de"
    assert got[3] == "fr" and got[4] == "es"


def test_token_stats_exact(spark, docs_df):
    from tsrollup.text import token_stats

    r = token_stats(docs_df).filter("doc_id = 1").collect()[0]
    text = "the cat sat on the mat and it was happy for the rest of the day"
    assert r["n_words"] == len(text.split(" "))
    assert r["n_chars_meas"] == len(text)
    assert r["max_word_len"] == max(len(w) for w in text.split(" "))


def test_quality_score_exact(spark, docs_df):
    from tsrollup.text import quality_score

    r = quality_score(docs_df).filter("doc_id = 1").collect()[0]
    words = "the cat sat on the mat and it was happy for the rest of the day" \
        .split(" ")
    en = {"the", "of", "and", "to", "in", "is", "that", "it", "was", "for"}
    n_stop = sum(w in en for w in words)
    assert r["n_stopwords"] == n_stop
    assert r["stop_ratio"] == n_stop / len(words)
    z = quality_score(docs_df).filter("doc_id = 5").collect()[0]
    assert z["n_stopwords"] == 0


def test_fingerprint_unique_unless_equal(spark, docs_df):
    from tsrollup.text import fingerprint

    two = docs_df.union(docs_df.filter("doc_id = 1"))
    fp = fingerprint(two).toPandas()
    assert fp["md5"].nunique() == 5  # 6 rows, one duplicated text
    assert fp.groupby("md5")["fp60"].nunique().max() == 1


def test_merged_single_pass_ops_match_standalone(spark, docs_df):
    """text_profile == token_stats ⨝ fingerprint and quality_lang ==
    quality_score ⨝ lang_id, column for column (the merged ops are the same
    expressions in one select — zero drift allowed)."""
    from tsrollup.text import (fingerprint, lang_id, quality_lang,
                               quality_score, text_profile, token_stats)

    prof = {r["doc_id"]: r for r in text_profile(docs_df).collect()}
    for r in token_stats(docs_df).collect():
        for c in ("n_words", "bpe_tokens", "n_chars_meas", "bpe_est",
                  "max_word_len"):
            assert prof[r["doc_id"]][c] == r[c]
    for r in fingerprint(docs_df).collect():
        assert prof[r["doc_id"]]["md5"] == r["md5"]
        assert prof[r["doc_id"]]["fp60"] == r["fp60"]

    ql = {r["doc_id"]: r for r in quality_lang(docs_df).collect()}
    for r in quality_score(docs_df).collect():
        for c in ("n_words", "n_stopwords", "stop_ratio", "mean_word_len",
                  "quality"):
            assert ql[r["doc_id"]][c] == r[c]
    for r in lang_id(docs_df).collect():
        assert ql[r["doc_id"]]["pred_lang"] == r["pred_lang"]
        assert ql[r["doc_id"]]["stop_hits"] == r["stop_hits"]
