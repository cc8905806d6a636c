#!/usr/bin/env python3
"""Turn a tools/check.py stdout capture into a CORRECTNESS_sf*.json
artifact (the round-10 format: per-query mode/pass/rows + methodology).

Usage: python3 tools/correctness_artifact.py <check_output.txt> <out.json> <sfdir>
"""
import json
import re
import sys


def main():
    src, dst, sf = sys.argv[1], sys.argv[2], sys.argv[3]
    queries = {}
    for line in open(src):
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            queries[m.group(1)] = {"mode": "oracle", "pass": True,
                                   "rows": int(m.group(2))}
            continue
        m = re.match(r"rows (\S+): (\d+) rows \((\w+)\) \[no oracle\]", line)
        if m:
            queries[m.group(1)] = {
                "mode": "rows_only", "pass": m.group(3) == "ok",
                "rows": int(m.group(2)),
                "note": "no DuckDB twin by design (see VERDICT no_oracle floor)",
            }
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            queries[m.group(1)] = {"mode": "oracle", "pass": False, "rows": -1,
                                   "note": m.group(2)[:200]}
    n_pass = sum(1 for v in queries.values() if v["pass"])
    out = {
        "methodology": (
            f"graft.Verify at {sf} -> tools/check.py DuckDB oracle compare "
            "(same canon as the driver: columns sorted, rows sorted, exact "
            "values). Full-scale pass checking for scale-dependent "
            "divergence (float accumulation, overflow, skew/band/AQE "
            "regimes that only open at this SF)."),
        "queries": queries,
        "summary": {"n": len(queries), "pass": n_pass,
                    "fail": len(queries) - n_pass},
    }
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"[artifact] {dst}: {n_pass}/{len(queries)} pass")


if __name__ == "__main__":
    main()
