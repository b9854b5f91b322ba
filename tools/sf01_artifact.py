#!/usr/bin/env python3
"""Assemble CORRECTNESS_SF01_r{N}.json from a tools/check.py log.

Usage: sf01_artifact.py <check.log> <out.json> <sf> [note]
Format matches the r10 artifact: {sf, note, n, n_pass,
queries: {name: {status, rows}}}.
"""
import json
import re
import sys


def main():
    log, out, sf = sys.argv[1:4]
    note = sys.argv[4] if len(sys.argv) > 4 else ""
    txt = open(log).read()
    queries = {}
    for name, rows, retag in re.findall(
            r"^PASS (\S+) \((\d+) rows\)( \[pass on re-compare\])?$", txt, re.M):
        queries[name] = {"status": "pass", "rows": int(rows)}
        if retag:
            queries[name]["note"] = "pass on re-compare"
    for m in re.finditer(r"^FAIL (\S+?):? ", txt, re.M):
        queries[m.group(1)] = {"status": "fail", "rows": None}
    n_pass = sum(1 for q in queries.values() if q["status"] == "pass")
    doc = {"sf": float(sf), "note": note, "n": len(queries),
           "n_pass": n_pass, "queries": queries}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{out}: {n_pass}/{len(queries)} pass")


if __name__ == "__main__":
    main()
