"""Table-format boundary: every scan/write of engine tables goes through this
module so parquet ⇄ Iceberg is a config flag, not a code change (SURVEY §7.1).

The sandbox has no Iceberg runtime jar, so the default is parquet; on a real
cluster set ``TSROLLUP_TABLE_FORMAT=iceberg`` (and the usual Spark catalog
confs) and identifiers are treated as catalog table names instead of paths.
Iceberg buys the engine: atomic snapshot commits for checkpoint buckets,
snapshot-id lineage instead of path fingerprints, partition pruning on
(source, tier) metadata, and streaming scans of appended files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_format() -> str:
    return os.environ.get("TSROLLUP_TABLE_FORMAT", "parquet")


def read_table(spark: SparkSession, ident: str) -> DataFrame:
    """``ident`` is a path (parquet) or a catalog table name (iceberg)."""
    if table_format() == "iceberg":
        return spark.read.format("iceberg").load(ident)
    return spark.read.parquet(ident)


def write_table(df: DataFrame, ident: str, mode: str = "overwrite",
                partition_by: tuple[str, ...] = ()) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if table_format() == "iceberg":
        w.format("iceberg").saveAsTable(ident)
    else:
        w.parquet(ident)
