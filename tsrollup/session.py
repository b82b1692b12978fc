"""SparkSession factory with the engine's tuned defaults.

AQE on (runtime coalesce + skew handling), Arrow exchange on for the pandas
UDF paths, shuffle partitions sized for the local harness. On a real cluster
the same builder is used from spark-submit; only master/partitions change.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip the tsrollup package for shipping to executors — the same artifact
    spark-submit --py-files would carry on a real cluster (north_rule)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zpath = tempfile.mkstemp(prefix="tsrollup-", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for fn in sorted(os.listdir(pkg_dir)):
            if fn.endswith(".py"):
                z.write(os.path.join(pkg_dir, fn), arcname=f"tsrollup/{fn}")
    return zpath


def get_spark(app: str = "tsrollup", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    master = master or os.environ.get("TSROLLUP_MASTER", "local[*]")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master == "local[*]":
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        n = master.split("[")[-1].rstrip("]") if "[" in master else cores
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    b = (
        SparkSession.builder.appName(app).master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # one whole doc's windows stay well under 2 GiB; parquet splits at 128 MiB
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("TSROLLUP_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = b.getOrCreate()
    # Ship the package to executor Python workers (≙ spark-submit --py-files).
    spark.sparkContext.addPyFile(_package_zip())
    return spark
