"""Bounded-memory frequency sketching — the two-pass EXACT heavy-hitters
operator (Misra-Gries candidates, then an exact recount of only the
candidates).

Why not just groupBy the stream?  ``text.vocab_topk`` hash-aggregates every
distinct key; for words that's fine, but a 100 TB stream keyed by URLs,
user-ids or raw n-grams shuffles |distinct keys| rows — the aggregation
state itself becomes the bottleneck.  The classic fix (Misra & Gries 1982;
merge rule per Agarwal et al., "Mergeable Summaries", PODS 2012) keeps a
fixed ``k``-counter summary per partition with the guarantee that every item
of true frequency > N/(k+1) survives, so the candidate set for any support
threshold θ ≥ 1/(k+1) is a PROVABLE superset.  A second pass recounts only
the candidates (broadcast semi-join; map-side partial agg over candidate
hits only) and applies the exact threshold — output identical to the full
groupBy, state bounded by k·partitions instead of |distinct keys|.

Exactness: counts are exact integers end-to-end and the support threshold is
applied by integer cross-multiplication (``cnt·den > N·num`` — no float
fraction), so a SQL engine reproduces every output bit.  The only float is
the reported share, one IEEE division of exactly-converted int64.

Reference ties: the reference's pipelines assume a pre-built vocabulary
(embedding input dims, e.g. TSFEDL/models_keras.py input layers); this is
the corpus-scale operator that produces one.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsrollup.text import words


def _mg_partition(k: int):
    """Per-partition Misra-Gries summarizer for mapInPandas: consumes
    batches of a single ``word`` column, keeps ≤ ``k`` counters, and emits
    the surviving (word, cnt) rows plus one marker row (word NULL,
    cnt = rows processed) so the caller learns N without a second scan.

    Batches merge via the mergeable-summaries rule: add the batch's exact
    counts, then if more than ``k`` counters remain, subtract the
    (k+1)-th largest value from all and drop the non-positive — the total
    decrement stays ≤ N/(k+1), which is the survival guarantee.
    """
    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        summary: dict[str, int] = {}
        total = 0
        for pdf in batches:
            vc = pdf["word"].value_counts()
            total += int(vc.sum())
            for w, c in vc.items():
                summary[w] = summary.get(w, 0) + int(c)
            if len(summary) > k:
                counts = np.fromiter(summary.values(), dtype=np.int64,
                                     count=len(summary))
                m = int(np.partition(counts, -(k + 1))[-(k + 1)])
                summary = {w: c - m for w, c in summary.items() if c > m}
        rows = list(summary.items())
        rows.append((None, total))
        yield pd.DataFrame(rows, columns=["word", "cnt"])

    return run


def _mg_merge(k: int):
    """Weighted Misra-Gries merge for mapInPandas: consumes (word, cnt)
    summary rows (word NULL = a partition's processed-row marker), sums
    counts per word, applies the same (k+1)-th-largest decrement whenever
    more than ``k`` counters accumulate, and re-emits the merged summary
    plus one combined marker. Mergeable-summaries guarantee: the merged
    summary's total decrement stays ≤ N/(k+1), so global heavy items
    still survive."""
    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        summary: dict[str, int] = {}
        total = 0
        for pdf in batches:
            marker = pdf["word"].isna()
            total += int(pdf.loc[marker, "cnt"].sum())
            for w, c in zip(pdf.loc[~marker, "word"],
                            pdf.loc[~marker, "cnt"]):
                summary[w] = summary.get(w, 0) + int(c)
            if len(summary) > k:
                counts = np.fromiter(summary.values(), dtype=np.int64,
                                     count=len(summary))
                m = int(np.partition(counts, -(k + 1))[-(k + 1)])
                summary = {w: c - m for w, c in summary.items() if c > m}
        rows = list(summary.items())
        rows.append((None, total))
        yield pd.DataFrame(rows, columns=["word", "cnt"])

    return run


def heavy_hitters(df: DataFrame, threshold_num: int = 1,
                  threshold_den: int = 200, text_col: str = "text",
                  sketch_k: int | None = None,
                  token_arr=None) -> DataFrame:
    """All words whose corpus occurrence count strictly exceeds
    ``(threshold_num/threshold_den) · N`` (N = total word count), with the
    EXACT count — computed via the two-pass sketch-then-recount algorithm
    (module docstring), never a full-vocabulary aggregation.

    ``sketch_k`` defaults to ``2·⌈den/num⌉`` — twice the minimum that
    makes the MG survival bound (freq > N/(k+1)) cover the threshold, so
    candidates are a provable superset with slack.

    The per-partition summaries REDUCE through a second, single-partition
    MG merge (weighted — the mergeable-summaries theorem keeps the
    survival guarantee through the merge), so the driver collect that
    seeds pass 2 is bounded by ``k + 1`` rows regardless of partition
    count — not ``k·partitions`` (40M rows at 10⁵ partitions). Collecting
    once is the price of running pass 2 as exactly one more scan instead
    of re-executing pass 1 per downstream branch (Spark re-runs a
    DataFrame's lineage for every branch — the bigram_lm finding).

    Output: word, n_occ (long, exact), n_corpus (long), share (double,
    one exact-int64 division). Empty-string words count like any other
    (the split keeps empties — oracle parity).

    ``token_arr`` overrides the item stream with any array<string>
    Column (e.g. word n-grams) — the regime the sketch exists for: n-gram
    key cardinality dwarfs a word vocabulary, so the full-groupBy
    alternative's aggregation state grows combinatorially while the
    sketch stays at k counters.
    """
    num, den = int(threshold_num), int(threshold_den)
    if num < 1 or den < 1 or num >= den:
        raise ValueError("need 1 <= threshold_num < threshold_den")
    k = int(sketch_k) if sketch_k is not None else 2 * math.ceil(den / num)
    if k + 1 < den / num:
        raise ValueError(
            f"sketch_k={k} cannot guarantee the threshold {num}/{den}: "
            f"MG only preserves items with freq > N/(k+1)")
    arr = token_arr if token_arr is not None else words(text_col)
    exploded = df.select(F.explode(arr).alias("word"))
    summary = exploded.mapInPandas(_mg_partition(k), "word string, cnt long")
    merged = summary.repartition(1).mapInPandas(
        _mg_merge(k), "word string, cnt long")
    rows = merged.collect()  # bounded: <= k + 1 rows
    n_corpus = sum(r.cnt for r in rows if r.word is None)
    cand = sorted({r.word for r in rows if r.word is not None})
    spark = df.sparkSession
    if not cand or n_corpus == 0:
        return spark.createDataFrame(
            [], "word string, n_occ long, n_corpus long, share double")
    cand_df = spark.createDataFrame([(w,) for w in cand], "word string")
    return (exploded
            .join(F.broadcast(cand_df), "word")
            .groupBy("word")
            .agg(F.count("*").cast("long").alias("n_occ"))
            .filter(F.col("n_occ") * den > F.lit(n_corpus) * num)
            .select("word", "n_occ",
                    F.lit(n_corpus).cast("long").alias("n_corpus"),
                    (F.col("n_occ").cast("double")
                     / F.lit(n_corpus).cast("double")).alias("share")))
