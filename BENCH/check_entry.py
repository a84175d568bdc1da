"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given SF next to its oracle_sql() in DuckDB and
compare row-count + sorted-column value frames."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(5)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str) -> int:
    from byzer_retrieval_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        a, b = normalize(sdf), normalize(ddf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = ok_rows and ok_cols and a.equals(b)
        status = "OK  " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"{status} {name}: rows {len(a)}/{len(b)} cols={ok_cols} "
            f"vals={ok_vals}  [{time.time()-t0:.1f}s]"
        )
        if status == "FAIL":
            failures.append((name, "mismatch"))
            if ok_cols and ok_rows:
                neq = ~(a == b).all(axis=1)
                print("  spark:", a[neq].head(3).to_dict("records"))
                print("  duck :", b[neq].head(3).to_dict("records"))
            else:
                print("  spark cols:", list(a.columns), len(a))
                print("  duck  cols:", list(b.columns), len(b))
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
