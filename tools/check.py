#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [verify_out_dir] [sf_dir]

Reads each <out>/<name> parquet (Spark-side result) and runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf tables, then
compares canonicalized frames (columns sorted by name, doubles rounded to
4, rows sorted). Queries without oracle SQL get a rows-only check.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            pass  # exact compare — the driver hashes raw values, no rounding
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    with open(os.path.join(OUT, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(
        d for d in os.listdir(OUT) if os.path.isdir(os.path.join(OUT, d))
    )
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(OUT, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracles:
            status = "ok" if len(got) > 0 else "EMPTY"
            print(f"rows {name}: {len(got)} rows ({status}) [no oracle]")
            n_pass += 1 if len(got) > 0 else 0
            n_fail += 0 if len(got) > 0 else 1
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            # The driver stringifies values before hashing, so an int64 27
            # vs float64 27.0 IS a mismatch. Only compare numerically when
            # both sides agree they are floats.
            if a.dtype.kind == "f" and b.dtype.kind == "f":
                af = a.astype(float)
                bf = b.astype(float)
                bad = ~((af == bf) | (af.isna() & bf.isna()))
            elif a.dtype.kind != b.dtype.kind and "f" in (a.dtype.kind, b.dtype.kind):
                a2 = a.map(lambda v: str(v) if v is not None else None)
                b2 = b.map(lambda v: str(v) if v is not None else None)
                bad = ~((a2 == b2) | (a.isna() & b.isna()))
            else:
                a2 = a.astype(str).where(~a.isna(), None)
                b2 = b.astype(str).where(~b.isna(), None)
                bad = ~(
                    (a2 == b2)
                    | (a.isna() & b.isna())
                )
            if bad.any():
                i = bad.idxmax()
                mismatch = f"col {c} row {i}: {a[i]!r} != {b[i]!r}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {len(names)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
