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
