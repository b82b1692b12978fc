"""Structured Streaming surface of the rollup engine.

The reference is batch-only; its closest streaming concepts are incremental
batch generation (``experiments/timeseries_batch_generator.py:49-68``) and
run-boundary detection (``:125-141``). This module re-expresses the engine's
two core motions for unbounded input (SURVEY §2.11):

* ``stream_rollup_sequences`` — continuous ingestion of new sequence files
  (each row one complete doc, so base-tier rollup is a STATELESS streaming
  map): ``readStream`` → the same ``mapInPandas`` kernels as batch → an
  exactly-once parquet sink. Spark's own streaming checkpoint gives the
  resume-from-kill property (the streaming twin of ``tsrollup.checkpoint``).
  Because every doc is self-contained there is no watermark and no state
  store — at 100 TB/day this runs embarrassingly parallel, bounded only by
  source listing.

* ``stream_minute_rollup`` — event-time tier maintenance for the events
  stream: watermarked tumbling windows (``window(ts, '1 minute')``) with
  decomposable partials (count/sum/min/max), the streaming analog of the 1m
  retention tier. Late rows beyond the watermark are dropped — the engine's
  explicit replacement for the reference's ``filter_indices`` exclusion zone
  around discontinuities.

Both run with ``Trigger.AvailableNow`` in tests (process-everything-then-stop)
and unmodified with a continuous trigger in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, IntegerType,
                               StringType, StructField, StructType)

from . import BASE_WINDOW, TIER_FACTOR
from .rollup import rollup_sequences

SEQUENCES_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("tokens", ArrayType(IntegerType())),
    StructField("n_tok", IntegerType()),
    StructField("source", StringType()),
    StructField("gap_mask", ArrayType(BooleanType())),
])


def read_sequences_stream(spark: SparkSession, src_dir: str,
                          max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a directory of sequence parquet files (the
    sandbox stand-in for an Iceberg streaming scan; one reader module isolates
    the format boundary, SURVEY §7.1)."""
    r = spark.readStream.schema(SEQUENCES_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(src_dir)


def stream_rollup_sequences(spark: SparkSession, src_dir: str, sink_dir: str,
                            checkpoint_dir: str,
                            window: int = BASE_WINDOW,
                            tiers: dict[str, int] = TIER_FACTOR,
                            available_now: bool = True):
    """Continuously roll up newly-arrived sequence files into the tier store.

    Exactly-once: the parquet sink + streaming checkpoint commit file offsets
    atomically, so a killed-and-restarted query never double-rolls a file —
    the streaming twin of checkpoint.run_checkpointed's bucket lineage.
    Returns the started StreamingQuery (caller awaits termination).
    """
    stream = read_sequences_stream(spark, src_dir)
    rolled = rollup_sequences(stream, window=window, tiers=tiers)
    w = (rolled.writeStream
         .format("parquet")
         .option("path", sink_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append"))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_minute_rollup(events: DataFrame, watermark: str = "10 minutes",
                         tier: str = "1 minute") -> DataFrame:
    """Watermarked tumbling-window partial aggregates over an event stream —
    the streaming 1m tier. Partials are decomposable (count/sum/min/max), so
    stored stream output re-aggregates to coarser tiers with the SAME batch
    maintenance path (rollup.reaggregate_tier semantics).
    """
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", tier).alias("w"), "user_id")
            .agg(F.count("*").cast("long").alias("count"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("sum"),
                 F.min("value").alias("min"),
                 F.max("value").alias("max"))
            .select("user_id",
                    F.col("w.start").alias("window_start"),
                    "count", "sum", "min", "max"))
