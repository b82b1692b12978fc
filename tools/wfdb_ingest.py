"""Production entry point: distributed WFDB → parquet ingestion.

    spark-submit --py-files tsrollup.zip tools/wfdb_ingest.py \
        --src /data/mit-bih --out /lake/wfdb [--long] [--annotations-ext atr]

Converts a directory of WFDB records (``.hea`` + format-212 ``.dat``, plus
MIT-format annotation files) into two parquet tables via the native parsers
in ``tsrollup.wfdb`` — no wfdb library on the cluster:

- ``<out>/signals``      one row per (record, channel) with the ADC array,
                         calibration metadata and mV-calibrated values; with
                         ``--long`` instead one row per sample
                         (record, channel, pos, adc, mv) — the analytics
                         shape, partitioned by record for pruned reads
- ``<out>/annotations``  (record, pos, code, symbol, sub, chn, num, aux)

The binary scan streams through executors once (headers broadcast, zero
data shuffles — see ``tsrollup/wfdb.py``); output goes through
``io.write_table`` so the parquet⇄Iceberg switch applies here too.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True,
                    help="directory of WFDB records (.hea/.dat/.atr)")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--long", action="store_true",
                    help="explode signals to one row per sample "
                         "(record, channel, pos, adc, mv)")
    ap.add_argument("--annotations-ext", default="atr",
                    help="annotation file extension (default: atr)")
    ap.add_argument("--app-name", default="wfdb-ingest")
    args = ap.parse_args()

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from tsrollup.io import write_table
    from tsrollup.session import get_spark
    from tsrollup.wfdb import read_wfdb_annotations, read_wfdb_signals

    spark = get_spark(args.app_name)
    try:
        sig = read_wfdb_signals(spark, args.src)
        if args.long:
            sig = (sig.select(
                "record", "channel", "gain", "baseline",
                F.posexplode("adc").alias("pos", "adc"))
                .select("record", "channel", "pos", "adc",
                        ((F.col("adc") - F.col("baseline")) / F.col("gain"))
                        .alias("mv")))
        else:
            sig = sig.withColumn(
                "mv", F.transform(
                    "adc",
                    lambda a: (a - F.col("baseline")) / F.col("gain")))
        # row counts ride the write via Observation metrics — re-reading a
        # just-written --long table would scan the whole archive twice
        obs_sig, obs_ann = Observation("signals"), Observation("annotations")
        sig = sig.observe(obs_sig, F.count(F.lit(1)).alias("n"))
        write_table(sig, os.path.join(args.out, "signals"),
                    partition_by=["record"])
        ann = read_wfdb_annotations(spark, args.src,
                                    ext=args.annotations_ext)
        ann = ann.observe(obs_ann, F.count(F.lit(1)).alias("n"))
        write_table(ann, os.path.join(args.out, "annotations"),
                    partition_by=["record"])
        print(f"wfdb_ingest: wrote {obs_sig.get['n']} signal rows, "
              f"{obs_ann.get['n']} annotation rows to {args.out}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
