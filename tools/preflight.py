#!/usr/bin/env python3
"""Pre-flight replica of the driver's t2 correctness gate (SURVEY §5.3.2).

Usage:
    python3 tools/preflight.py <sfDir> <verifyOutDir>

Assumes `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"` has already
run. For every key in oracle_sql.json: run the oracle SQL in DuckDB
(tables registered as views over the same parquet fixtures), load the
Spark parquet dump, sort columns by name, and compare exactly —
shape, column names, and every value (row order preserved: declared
queries end in a total ORDER BY).

Exit code 0 iff every declared query matches.
"""
import duckdb
import glob
import json
import os
import sys

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(name, s, o, failures):
    s = s[sorted(s.columns)]
    o = o[sorted(o.columns)]
    if list(s.columns) != list(o.columns):
        failures.append((name, f"columns: spark={list(s.columns)} oracle={list(o.columns)}"))
        return
    if s.shape != o.shape:
        failures.append((name, f"shape: spark={s.shape} oracle={o.shape}"))
        return
    for c in s.columns:
        a, b = pd.Series(s[c].values), pd.Series(o[c].values)
        try:
            if a.dtype.kind == "M" or b.dtype.kind == "M":
                a = pd.to_datetime(a).astype("datetime64[us]")
                b = pd.to_datetime(b).astype("datetime64[us]")
            eq = (a == b) | (a.isna() & b.isna())
        except Exception as e:
            failures.append((name, f"col {c}: incomparable ({e}); spark dtype={a.dtype} oracle dtype={b.dtype}"))
            return
        if not bool(eq.all()):
            i = int((~eq).idxmax())
            failures.append((name, f"col {c}: {int((~eq).sum())}/{len(a)} rows differ; "
                                   f"first at row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"))
            return


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures, passed = [], []
    for name in sorted(oracle):
        dump_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(dump_glob):
            failures.append((name, "no spark dump written (query failed in Verify?)"))
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{dump_glob}'").df()
        except Exception as e:
            failures.append((name, f"dump unreadable: {e}"))
            continue
        try:
            ora_df = con.sql(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        n_before = len(failures)
        compare(name, spark_df, ora_df, failures)
        if len(failures) == n_before:
            passed.append(name)
    # queries with no oracle still need a dump with >0 rows potential —
    # report them informationally
    declared_dirs = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    no_oracle = sorted(declared_dirs - set(oracle))
    print(f"PASS {len(passed)}/{len(oracle)} oracle-checked queries")
    for n in passed:
        print(f"  ok   {n}")
    if no_oracle:
        print(f"  (no-oracle dumps present: {', '.join(no_oracle)})")
    if failures:
        print(f"FAIL {len(failures)}:")
        for n, msg in failures:
            print(f"  FAIL {n}: {msg}")
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
