"""Local stand-in for the driver's correctness gate: run every
queries() entry via Spark and its oracle_sql() twin via DuckDB on the
same sf dir; compare row count, schema (column names), and sorted
values exactly.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        try:
            pdf[c] = pd.to_numeric(pdf[c]).astype("int64")
        except (ValueError, TypeError, OverflowError):
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entry
    from llogtail_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-correctness")
    con = duck_con(sf_dir)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        got = fn(spark, sf_dir).toPandas()
        sql = oracles.get(name)
        if sql is None:
            print(f"  [rows-only] {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        want = con.execute(sql).df()
        g, w = canon(got), canon(want)
        ok_schema = list(g.columns) == list(w.columns)
        ok_rows = len(g) == len(w)
        ok_vals = ok_schema and ok_rows and g.equals(w)
        status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"  [{status}] {name}: rows {len(g)}/{len(w)} schema={ok_schema}")
            if ok_schema and ok_rows:
                diff = (g != w).any(axis=1)
                print("    first diffs:")
                print(pd.concat([g[diff].head(3), w[diff].head(3)],
                                keys=["got", "want"]))
            else:
                print("    got cols:", list(g.columns))
                print("    want cols:", list(w.columns))
        else:
            print(f"  [OK] {name}: {len(g)} rows ({time.time()-t0:.1f}s)")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
