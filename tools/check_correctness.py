"""Local stand-in for the driver's correctness gate: run each queries() entry
on Spark at sf0.01 and its oracle_sql() in DuckDB over the same parquet,
compare row count + column names + order-insensitive values (exact for
ints/strings, bitwise for floats unless --approx).

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"]
    if len(a) != len(b):
        errs.append(f"row count: spark={len(a)} duck={len(b)}")
        return errs
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        try:
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
                    b[c].dtype, np.floating):
                av = a[c].astype(np.float64).values
                bv = b[c].astype(np.float64).values
                bad = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
                if bad.any():
                    i = int(np.flatnonzero(bad)[0])
                    errs.append(
                        f"col {c}: {bad.sum()} float mismatches "
                        f"(first @{i}: {av[i]!r} vs {bv[i]!r}, "
                        f"maxdiff {np.abs(av[bad]-bv[bad]).max():.3e})")
            else:
                eq = av == bv
                if not np.asarray(eq).all():
                    bad = ~np.asarray(eq)
                    i = int(np.flatnonzero(bad)[0])
                    errs.append(f"col {c}: {bad.sum()} mismatches "
                                f"(first @{i}: {av[i]!r} vs {bv[i]!r})")
        except Exception as e:  # noqa: BLE001
            errs.append(f"col {c}: compare error {e}")
    return errs


def main() -> int:
    import __spark_entry__ as entrymod
    from tsrollup.session import get_spark

    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    spark = get_spark("correctness", master="local[8]")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, SF).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows "
                  f"({len(spdf.columns)} cols)")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        errs = compare(name, spdf, dpdf)
        if errs:
            failed.append(name)
            print(f"FAIL {name} ({len(spdf)} rows):")
            for e in errs:
                print(f"   {e}")
        else:
            print(f"OK   {name}: {len(spdf)} rows match exactly")
    spark.stop()
    print(f"\n{'ALL GREEN' if not failed else 'FAILED: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
