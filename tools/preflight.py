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

# DuckDB output types whose pandas coercion is FLOAT/object: the values
# then stringify/hash differently from Spark's integer parquet column
# even when numerically equal (r5 postmortem: sum(BIGINT) -> HUGEINT
# broke agg_entropy and dq_expectations in the driver gate while this
# script's value compare saw 61234 == 61234.0 and stayed green). Width
# drift WITHIN the integer family (INTEGER vs BIGINT, UINTEGER) and
# DATE vs TIMESTAMP normalize identically driver-side — 7 such keys
# passed every driver run — so those only warn, never fail.
# Zero-row guard (r15, VERDICT r14 #1): an oracled key whose Spark AND
# oracle results are both EMPTY "passes" vacuously — empty==empty
# verifies nothing about the operator's arithmetic. Any such key FAILS
# preflight unless (key, sf-dir basename) is exempted here with a
# reason. Keep this list EMPTY unless emptiness is a declared property
# of the key at that scale.
ZERO_ROW_EXEMPT = {
    # e.g. ("some_key", "sf0.001"): "reason",
}

HASH_BREAKING = ("HUGEINT", "UHUGEINT", "DECIMAL")
INTLIKE = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
           "USMALLINT", "UINTEGER", "UBIGINT")


def canon_type(t):
    """Collapse DuckDB type names that hash identically driver-side."""
    s = str(t).upper()
    if s.startswith("TIMESTAMP") or s == "DATE":
        return "DATETIME"
    if s in INTLIKE:
        return "INTEGER"
    return s


def compare_types(name, spark_rel, ora_rel, failures, warnings):
    o_types = dict(zip(ora_rel.columns, [str(t) for t in ora_rel.types]))
    s_types = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
    for c in sorted(o_types):
        ot = o_types[c].upper()
        if any(ot.startswith(u) for u in HASH_BREAKING):
            failures.append((name, f"col {c}: oracle emits {ot}, which "
                                   f"pandas coerces to float/object — the "
                                   f"driver hash WILL mismatch even on "
                                   f"equal values; CAST it in the oracle"))
            return False
        st = s_types.get(c)
        if st is not None and canon_type(st) != canon_type(ot):
            warnings.append((name, f"col {c}: type drift spark={st} "
                                   f"oracle={ot} (normalizes driver-side "
                                   f"today; keep an eye on it)"))
    return True


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
    failures, passed, warnings = [], [], []
    for name in sorted(oracle):
        dump_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(dump_glob):
            failures.append((name, "no spark dump written (query failed in Verify?)"))
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{dump_glob}'")
            spark_df = spark_rel.df()
        except Exception as e:
            failures.append((name, f"dump unreadable: {e}"))
            continue
        try:
            ora_rel = con.sql(oracle[name])
            ora_df = ora_rel.df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        n_before = len(failures)
        if compare_types(name, spark_rel, ora_rel, failures, warnings):
            compare(name, spark_df, ora_df, failures)
        if len(spark_df) == 0 and len(ora_df) == 0:
            sf_tag = os.path.basename(os.path.normpath(sf_dir))
            if (name, sf_tag) not in ZERO_ROW_EXEMPT:
                failures.append((name, f"vacuous: 0 rows in BOTH engines "
                                       f"at {sf_tag} — the hash check "
                                       f"verifies nothing; re-parameterize "
                                       f"or exempt with a reason"))
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
    for n, msg in warnings:
        print(f"  warn {n}: {msg}")
    if failures:
        print(f"FAIL {len(failures)}:")
        for n, msg in failures:
            print(f"  FAIL {n}: {msg}")
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
