#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
         [--skip name=reason,name=reason,...]

Reads each <verifyOutDir>/<name> parquet (Spark output) and runs the
matching SQL from oracle_sql.json in DuckDB over views named after the
tables in <sfDir>. Compares column sets, row counts, and exact values
after sorting columns by name and rows by all columns.

--skip (r19 verdict #4) exists for corpora where a FEW oracle queries
are intractable on the DuckDB side (q88/q95 cost hours at 10x) but "no
oracle evidence at this scale" and "full evidence" are not the only
options: each skip must name its reason, the summary line enumerates
them, and a skip naming a query that is NOT in the oracle set fails
loudly (same stale-entry discipline as the slope gate's exemptions).
"""
import json
import os
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_df, duck_df):
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        return f"COLS spark={sc} duck={dc}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    a, b = canon(spark_df), canon(duck_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return (f"VAL col={col} row={i}: spark={x!r} duck={y!r} "
                            f"diff={abs(x - y)}")
            elif x != y:
                return f"VAL col={col} row={i}: spark={x!r} duck={y!r}"
    return None


def main():
    args = sys.argv[1:]
    skips = {}
    if "--skip" in args:
        i = args.index("--skip")
        for part in args[i + 1].split(","):
            name, _, reason = part.partition("=")
            skips[name.strip()] = reason.strip() or "no reason given"
        del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        # harness testdata tables are single files; Spark-written corpora
        # (ScaleTestData's scaled copies) are DIRECTORIES of part files,
        # which DuckDB's read_parquet only accepts as a glob
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    stale = sorted(set(skips) - set(oracle))
    if stale:
        print(f"FATAL: --skip names queries not in the oracle set: {', '.join(stale)}")
        sys.exit(2)
    n_ok = 0
    n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in skips:
            n_skip += 1
            print(f"SKIP {name}: {skips[name]}")
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}")
        else:
            n_ok += 1
            print(f"OK   {name}: {len(spark_df)} rows")
    if skips:
        # the skipped queries and their reasons are part of the record —
        # a skip-heavy "green" must be readable as exactly what it is
        print(f"== {n_ok}/{len(oracle) - n_skip} queries match "
              f"({n_skip} skipped: "
              + "; ".join(f"{q}={skips[q]}" for q in sorted(skips)) + ") ==")
    else:
        print(f"== {n_ok}/{len(oracle)} queries match ==")
    if n_ok != len(oracle) - n_skip:
        sys.exit(1)  # loud failure so verify_all.sh can gate on it


if __name__ == "__main__":
    main()
