"""Local stand-in for the driver's correctness gate: run every
queries() entry via Spark and its oracle_sql() twin via DuckDB on the
same sf dir; compare row count, schema (column names), and sorted
values exactly.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --json OUT.json [sf_dir] [query ...]

--json writes a driver-format artifact (one object per query with
rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err) so the full query surface (148 as of round 4) has a recorded correctness
artifact every round, not just the ~50 entries the driver's own gate
windows (VERDICT r03 next-round #1). Queries with no SQL oracle are
recorded as rows-only (hash_match null), same as the driver.
"""

from __future__ import annotations

import json
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


def canon_strict(pdf: pd.DataFrame) -> pd.DataFrame:
    """Dtype-sensitive canonicalization (the check_oracles.py
    discipline, VERDICT r04 #6): floats round to 6 places but KEEP
    their float representation, so a Spark DOUBLE next to a DuckDB
    BIGINT ('6.0' vs '6') fails instead of silently coercing — the
    presentation-drift class the lenient canon() cannot see."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        pdf[c] = pdf[c].map(lambda v: str(v))
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entry
    from llogtail_spark.session import get_spark

    argv = sys.argv[1:]
    json_out = None
    strict = False
    if "--strict" in argv:
        strict = True
        argv.remove("--strict")
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    canonize = canon_strict if strict else canon
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("check-correctness")
    con = duck_con(sf_dir)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures += 1
            print(f"  [FAIL] {name}: Spark raised {e}")
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": str(e)[:500],
            }
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"  [rows-only] {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            report[name] = {
                "rows_match": True, "schema_match": True,
                "hash_match": None, "spark_rows": len(got),
                "oracle_rows": None, "err": None,
                "note": "rows-only (no SQL oracle)",
            }
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            failures += 1
            print(f"  [FAIL] {name}: oracle raised {e}")
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(got),
                "oracle_rows": None, "err": f"oracle: {e}"[:500],
            }
            continue
        g, w = canonize(got), canonize(want)
        ok_schema = list(g.columns) == list(w.columns)
        ok_rows = len(g) == len(w)
        ok_vals = ok_schema and ok_rows and g.equals(w)
        report[name] = {
            "rows_match": ok_rows, "schema_match": ok_schema,
            "hash_match": bool(ok_vals), "spark_rows": len(g),
            "oracle_rows": len(w), "err": None,
        }
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
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "strict": strict,
                       "n_queries": len(report),
                       "failures": failures, "results": report}, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
