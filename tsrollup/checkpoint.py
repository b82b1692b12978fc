"""Checkpointed, resumable rollup runs with per-partition lineage + metrics.

The engine's analog of the reference's ModelCheckpoint/early-resume discipline
(``experiments/keras_experiment.py:69``, weight reload at
``models_keras.py:75-77``): work is divided into hash BUCKETS of documents
(``pmod(xxhash64(doc_id), n_buckets)``), each bucket is one atomic unit —
rollup → overwrite its output dir → append its lineage row. A killed run
resumes by skipping every bucket whose lineage row says ``done``; re-running a
finished run is a no-op; outputs are bit-identical to a single clean run
(tested in tests/test_checkpoint.py).

Layout under ``output_root``:
    data/bucket=<b>/tier=<t>/*.parquet   rolled-up points (or packed rows)
    _lineage/*.parquet                   one row per completed bucket
At 10^12-sequence scale the same loop runs with n_buckets in the thousands —
each bucket is a bounded, restartable unit with a commit point, and the
driver-side loop is trivially shardable across concurrent spark-submit jobs
(buckets are disjoint by construction).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import BASE_WINDOW, TIER_FACTOR
from .rollup import rollup_compressed, rollup_sequences

LINEAGE_SCHEMA = (
    "bucket int, status string, n_docs long, n_points long, "
    "run_id string, wall_time_sec double, completed_at string"
)


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")


def read_lineage(spark: SparkSession, output_root: str) -> DataFrame:
    path = f"{output_root}/_lineage"
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def completed_buckets(spark: SparkSession, output_root: str) -> set[int]:
    rows = (read_lineage(spark, output_root)
            .filter("status = 'done'").select("bucket").distinct().collect())
    return {r["bucket"] for r in rows}


def run_checkpointed(spark: SparkSession, input_path: str, output_root: str,
                     n_buckets: int = 8, run_id: str = "run-0",
                     window: int = BASE_WINDOW,
                     tiers: dict[str, int] = TIER_FACTOR,
                     compressed: bool = False,
                     max_buckets: int | None = None) -> list[int]:
    """Process all pending buckets; returns the buckets completed this call.

    ``max_buckets`` limits work per call (used by tests to simulate a kill
    mid-run; in production it bounds a single spark-submit invocation).
    """
    from .io import read_table

    done = completed_buckets(spark, output_root)
    pending = [b for b in range(n_buckets) if b not in done]
    if max_buckets is not None:
        pending = pending[:max_buckets]
    src = read_table(spark, input_path).withColumn("_bucket", _bucket_col(n_buckets))
    finished: list[int] = []
    for b in pending:
        t0 = time.time()
        part = src.filter(F.col("_bucket") == b).drop("_bucket")
        out = (rollup_compressed(part, window, tiers) if compressed
               else rollup_sequences(part, window, tiers))
        dest = f"{output_root}/data/bucket={b}"
        out.write.mode("overwrite").partitionBy("tier").parquet(dest)
        # metrics from the committed files (also validates the write)
        written = spark.read.parquet(dest)
        n_points = written.count() if not compressed else \
            written.agg(F.sum("n_windows")).collect()[0][0]
        n_docs = written.select("doc_id").distinct().count()
        row = [(b, "done", n_docs, int(n_points or 0), run_id,
                time.time() - t0, time.strftime("%Y-%m-%dT%H:%M:%S"))]
        spark.createDataFrame(row, LINEAGE_SCHEMA) \
            .write.mode("append").parquet(f"{output_root}/_lineage")
        finished.append(b)
    return finished


def read_rollup(spark: SparkSession, output_root: str) -> DataFrame:
    """Read back the full rolled-up dataset (all buckets, partition-pruned on
    bucket/tier predicates for free)."""
    return spark.read.option("basePath", f"{output_root}/data") \
        .parquet(f"{output_root}/data").drop("bucket")
