"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row-count + column names + order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from centrality_gpu_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf: pd.DataFrame) -> int:
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        tuple(str(x) for x in row) for row in pdf.itertuples(index=False, name=None)
    )
    return hash(tuple(rows))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracles", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spdf = sdf.toPandas()
        if name not in os_:
            print(f"{name:40s} rows={len(spdf):8d}  (rows-only, no oracle)")
            continue
        opdf = con.execute(os_[name]).df()
        ok_rows = len(spdf) == len(opdf)
        ok_cols = sorted(spdf.columns) == sorted(opdf.columns)
        ok_vals = ok_rows and ok_cols and value_hash(spdf) == value_hash(opdf)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        col_msg = "OK" if ok_cols else f"{sorted(spdf.columns)}!={sorted(opdf.columns)}"
        print(
            f"{name:40s} rows={len(spdf):8d}/{len(opdf):<8d} "
            f"cols={col_msg} values={'OK' if ok_vals else 'MISMATCH'}  -> {status}"
        )
        if status == "FAIL":
            failures += 1
            if ok_cols and ok_rows:
                s = spdf[sorted(spdf.columns)].sort_values(sorted(spdf.columns)).reset_index(drop=True)
                o = opdf[sorted(opdf.columns)].sort_values(sorted(opdf.columns)).reset_index(drop=True)
                diff = (s.astype(str) != o.astype(str)).any(axis=1)
                print("  first diffs (spark | oracle):")
                print(pd.concat([s[diff].head(5), o[diff].head(5)], axis=1))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
