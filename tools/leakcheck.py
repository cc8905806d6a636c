#!/usr/bin/env python3
"""Leak scan over the repo's tracked text files.

Emits LEAKCHECK.json with the same hit classes as previous rounds PLUS a
run fingerprint (files scanned, tree content hash, scan timestamp), so a
round bump can only come from an actual fresh scan (ADVICE.md round 10:
an artifact whose only delta is the round counter evidences nothing).

Usage: python3 tools/leakcheck.py <round> [repo_root]
"""
import hashlib
import json
import re
import subprocess
import sys
import time

DETECTORS = {
    # imports of clearly non-public namespaces
    "internal-import": re.compile(r"^\s*import\s+\S*\b(internal|proprietary|corp)\b", re.M),
    # URLs that are not public open-source infrastructure
    "internal-url": re.compile(r"https?://(?!(?i:www\.)?(?i:github\.com|apache\.org|spark\.apache\.org|duckdb\.org|scala-lang\.org|docs\.oracle\.com|en\.wikipedia\.org|arxiv\.org|dl\.acm\.org|doi\.org|maven\.apache\.org|mvnrepository\.com|stackoverflow.com|openjdk.org|localhost|example.com))[\w.-]+"),
    # corp-style package roots
    "internal-pkg2": re.compile(r"\b(?:com|net)\.[a-z]+\.(?:internal|corp|infra)\b"),
    # cloud storage buckets
    "internal-bucket": re.compile(r"\b(?:s3|gs|abfss?)://[\w.-]+"),
    # chat permalinks / go-links
    "slack-link": re.compile(r"\b[\w-]+\.slack\.com\b|\bgo/[a-z][a-z0-9-]{2,}\b"),
    # credential shapes
    "api-key": re.compile(r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36})\b"),
    # environment variables pointing at non-public services
    "axon-env": re.compile(r"\b[A-Z_]*(?:AXON|INTERNAL_ENDPOINT)[A-Z_]*="),
}


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    root = sys.argv[2] if len(sys.argv) > 2 else "."
    files = subprocess.run(
        ["git", "-C", root, "ls-files"], capture_output=True, text=True, check=True
    ).stdout.split()
    hits = {k: [] for k in DETECTORS}
    tree = hashlib.sha1()
    scanned = 0
    for f in sorted(files):
        if f == "LEAKCHECK.json":
            continue  # the artifact itself quotes its hits
        try:
            data = open(f"{root}/{f}", "rb").read()
        except OSError:
            continue
        tree.update(f.encode() + b"\0" + hashlib.sha1(data).digest())
        try:
            text = data.decode("utf-8")
        except UnicodeDecodeError:
            continue  # binary fixture
        scanned += 1
        for name, rx in DETECTORS.items():
            for m in rx.finditer(text):
                hits[name].append(f"{f}: {m.group(0)[:80]}")
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "fingerprint": {
            "files_scanned": scanned,
            "tree_sha1": tree.hexdigest(),
            "scanned_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        },
    }
    with open(f"{root}/LEAKCHECK.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"[leakcheck] round={rnd} files={scanned} n_hits={out['n_hits']}")


if __name__ == "__main__":
    main()
