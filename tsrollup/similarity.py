"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an LSH-bucketed
(sign-random-projection) variant as the scale path. All math is JVM-side
higher-order functions over double-cast arrays — the sequential ``aggregate``
fold makes the floating-point accumulation order pinned and cross-engine
reproducible (bit-equal to DuckDB's list_cosine_similarity; verified).

Scale notes: brute force is O(n·q) — fine when one side is broadcastable
(queries) and required for exactness baselines; the LSH variant buckets by
hyperplane sign pattern so candidate generation is a bucket-equi-join, and the
hyperplanes are md5-derived (deterministic, no stored model).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_pairs(df: DataFrame, k: int = 10,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Exact global top-k most-similar pairs (brute force baseline).
    The self-join is the quadratic step — use only on bounded subsets or as
    the verification oracle for the ANN path."""
    e = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"))
    )
    return pairs.orderBy(F.desc("cos_sim"), "id_a", "id_b").limit(k)


def cosine_topk_for_queries(df: DataFrame, queries: DataFrame, k: int = 5,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Top-k neighbours for each query vector: broadcast the (small) query
    side, window-rank per query — the scan side never shuffles its vectors."""
    from pyspark.sql import Window

    e = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    q = queries.select(F.col(id_col).alias("qid"),
                       _as_double(F.col(vec_col)).alias("qv"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id", cosine(F.col("qv"), F.col("v")).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "id", "cos_sim", "rank"))


def srp_signature(df: DataFrame, n_planes: int = 8, dim: int = 32,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-random-projection signature: plane p's direction for component c is
    ±1 from an md5-derived bit — deterministic, model-free, no stored model.
    sig bit p = 1 iff Σ_c v[c]·dir(p,c) > 0.

    Implemented as ONE matmul per Arrow batch in a vectorized pandas UDF: the
    declarative alternative (n_planes folds over dim-literal arrays) builds an
    expression tree that takes longer to codegen-compile than the job runs.
    ``dim`` must equal the embedding dimension; vectors are truncated to
    ``dim`` so a mismatch can't silently fold all rows into one bucket."""
    from pyspark.sql.functions import pandas_udf

    planes = np.array([[1.0 if _plane_dir(p, c) else -1.0
                        for p in range(n_planes)]
                       for c in range(dim)])  # (dim, n_planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("int")
    def bucket(v: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(a[:dim], dtype=np.float64) for a in v])
        return pd.Series(((x @ planes) > 0) @ weights)

    return df.select(F.col(id_col).alias("id"),
                     bucket(F.col(vec_col)).alias("srp_bucket"))


def _plane_dir(p: int, c: int) -> bool:
    """Deterministic ±1 via md5 — stable across engines and runs."""
    import hashlib

    return int(hashlib.md5(f"{p}|{c}".encode()).hexdigest()[0], 16) % 2 == 0


def ann_lsh_topk(df: DataFrame, k: int = 10, n_planes: int = 8, dim: int = 32,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN via SRP-LSH: candidates = pairs sharing a bucket (equi-join on the
    signature), then exact cosine re-rank within candidates. Recall trades off
    with n_planes; the bucket join replaces the O(n²) scan.

    Plan shape: signature + L2-normalized vector are computed ONCE per row in
    a pre-join projection, so the per-pair work is a single dot product and
    the big SRP expression tree never sits on a join side."""
    sig = srp_signature(df, n_planes, dim, id_col, vec_col)
    v = _as_double(F.col(vec_col))
    norm = _norm(v)
    e = (df.select(F.col(id_col).alias("id"),
                   F.transform(v, lambda x: x / norm).alias("vn"))
         .join(sig, "id"))
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(b, (F.col("a.srp_bucket") == F.col("b.srp_bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                _dot(F.col("a.vn"), F.col("b.vn")).alias("cos_sim"))
    )
    return cand.orderBy(F.desc("cos_sim"), "id_a", "id_b").limit(k)
