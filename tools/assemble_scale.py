#!/usr/bin/env python3
"""Assemble SCALE_r{N}.json for a round: the full-suite slope table
(tools/slopes.py with measured growth + hand notes), plus spotNx blocks
from subset bench logs.

Usage: assemble_scale.py <small.log> <big.log> <factor> <out.json>
           [--growth growth.json] [--notes notes.json]
           [--spot LABEL FACTOR small.log big.log]...
Each --spot appends {"factor": F, "slopes": [...]} under key LABEL
(e.g. spot30x, spot100) for the queries common to both subset logs.
"""
import json
import subprocess
import sys


def bench_line(path):
    with open(path) as f:
        for line in f:
            i = line.find('{"metric"')
            if i >= 0:
                return json.loads(line[i:].strip())
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    args = sys.argv[1:]
    small, big, factor, out = args[:4]
    rest = args[4:]
    growth = notes = None
    spots = []
    i = 0
    while i < len(rest):
        if rest[i] == "--growth":
            growth = rest[i + 1]; i += 2
        elif rest[i] == "--notes":
            notes = rest[i + 1]; i += 2
        elif rest[i] == "--spot":
            spots.append(tuple(rest[i + 1:i + 5])); i += 5
        else:
            raise SystemExit(f"unknown arg {rest[i]}")
    cmd = [sys.executable, "tools/slopes.py", small, big, factor, out]
    if growth or notes:
        cmd.append(growth or "")
    if notes:
        cmd.append(notes)
    rc = subprocess.call(cmd)
    doc = json.load(open(out))
    for label, f, sp_small, sp_big in spots:
        qs_s = bench_line(sp_small)["queries"]
        qs_b = bench_line(sp_big)["queries"]
        rows = []
        for q in sorted(set(qs_s) & set(qs_b)):
            ts, tb = float(qs_s[q]), float(qs_b[q])
            if ts > 0 and tb > 0:
                rows.append({"query": q, "t_small": round(ts, 3),
                             "t_big": round(tb, 3),
                             "slope": round(tb / ts, 2)})
        doc[label] = {"factor": float(f), "slopes": rows}
    with open(out, "w") as fo:
        json.dump(doc, fo, indent=1)
    print(f"assembled {out} (slopes rc={rc}, spots={[s[0] for s in spots]})")
    sys.exit(rc)


if __name__ == "__main__":
    main()
