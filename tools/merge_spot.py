#!/usr/bin/env python3
"""Merge extra spot rows into an existing SCALE_r{N}.json block.

Extends an assembled artifact (assemble_scale.py output) with more
single-decade probe rows without re-running the full-suite slopes —
used when a later session adds spot coverage (e.g. the near-dup family
at 30x) to a block built earlier in the round.

Usage: merge_spot.py <scale.json> <label> <factor> <small.log> <big.log>
                     [notes.json]
Rows for queries already present under <label> are replaced (the fresh
measurement wins); notes.json ({query: note}) attaches hand notes.
"""
import json
import sys


def bench_line(path):
    with open(path) as f:
        for line in f:
            i = line.find('{"metric"')
            if i >= 0:
                return json.loads(line[i:].strip())
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    scale_path, label, factor, small, big = sys.argv[1:6]
    notes = {}
    if len(sys.argv) > 6:
        with open(sys.argv[6]) as f:
            notes = json.load(f)
    doc = json.load(open(scale_path))
    block = doc.setdefault(label, {"factor": float(factor), "slopes": []})
    if block["factor"] != float(factor):
        raise SystemExit(
            f"{label} factor {block['factor']} != {factor}")
    qs_s = bench_line(small)["queries"]
    qs_b = bench_line(big)["queries"]
    fresh = {}
    for q in sorted(set(qs_s) & set(qs_b)):
        ts, tb = float(qs_s[q]), float(qs_b[q])
        if ts > 0 and tb > 0:
            row = {"query": q, "t_small": round(ts, 3),
                   "t_big": round(tb, 3), "slope": round(tb / ts, 2)}
            if q in notes:
                row["note"] = notes[q]
            fresh[q] = row
    kept = [r for r in block["slopes"] if r["query"] not in fresh]
    block["slopes"] = sorted(kept + list(fresh.values()),
                             key=lambda r: r["query"])
    with open(scale_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"merged {len(fresh)} rows into {label} of {scale_path}")


if __name__ == "__main__":
    main()
