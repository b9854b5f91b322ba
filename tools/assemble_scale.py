#!/usr/bin/env python3
"""Assemble SCALE_r{N}.json for a round: the full-suite slope table
(tools/slopes.py with measured growth + hand notes), plus spotNx blocks
from subset bench logs.

Usage: assemble_scale.py <small.log> <big.log> <factor> <out.json>
           [--growth growth.json] [--notes notes.json]
           [--spotnotes spotnotes.json]
           [--spot LABEL FACTOR small.log big.log]...
Each --spot appends {"factor": F, "slopes": [...]} under key LABEL
(e.g. spot30x, spot100) for the queries common to both subset logs.

Spot-block note policy (r15, verdict ask #5): every spot row with
slope > SPOT_FLAG_AT carries a note — from spotnotes.json (either flat
{query: note} or nested {label: {query: note}}) — or it lands in the
block's "unexplained" list and the exit code is non-zero, the same
enforcement the 10x block has had since r11. Bare slopes stop being
committable by accident.
"""
import json
import subprocess
import sys

SPOT_FLAG_AT = 5.0


def bench_line(path):
    with open(path) as f:
        for line in f:
            i = line.find('{"metric"')
            if i >= 0:
                return json.loads(line[i:].strip())
    raise SystemExit(f"no bench JSON line in {path}")


def spot_note(notes, label, q):
    """Look up a hand note for query q in block label: nested wins."""
    v = notes.get(label)
    if isinstance(v, dict) and q in v:
        return v[q]
    v = notes.get(q)
    return v if isinstance(v, str) else None


def build_spot_block(label, factor, small_log, big_log, notes):
    qs_s = bench_line(small_log)["queries"]
    qs_b = bench_line(big_log)["queries"]
    rows, unexplained = [], []
    for q in sorted(set(qs_s) & set(qs_b)):
        ts, tb = float(qs_s[q]), float(qs_b[q])
        if ts <= 0 or tb <= 0:
            continue
        slope = tb / ts
        row = {"query": q, "t_small": round(ts, 3),
               "t_big": round(tb, 3), "slope": round(slope, 2)}
        if slope > SPOT_FLAG_AT:
            note = spot_note(notes, label, q)
            if note:
                row["note"] = note
            else:
                row["note"] = "UNEXPLAINED — audit required"
                unexplained.append(q)
        rows.append(row)
    return {"factor": float(factor),
            "flag_policy": f"slope > {SPOT_FLAG_AT:g} must carry a note",
            "unexplained": unexplained, "slopes": rows}


def main():
    args = sys.argv[1:]
    small, big, factor, out = args[:4]
    rest = args[4:]
    growth = notes = None
    spotnotes = {}
    spots = []
    i = 0
    while i < len(rest):
        if rest[i] == "--growth":
            growth = rest[i + 1]; i += 2
        elif rest[i] == "--notes":
            notes = rest[i + 1]; i += 2
        elif rest[i] == "--spotnotes":
            with open(rest[i + 1]) as f:
                spotnotes = json.load(f)
            i += 2
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
    spot_unexplained = []
    for label, f, sp_small, sp_big in spots:
        doc[label] = build_spot_block(label, f, sp_small, sp_big, spotnotes)
        spot_unexplained += [f"{label}:{q}" for q in doc[label]["unexplained"]]
    with open(out, "w") as fo:
        json.dump(doc, fo, indent=1)
    print(f"assembled {out} (slopes rc={rc}, spots={[s[0] for s in spots]})")
    if spot_unexplained:
        print(f"UNEXPLAINED spot rows (add spotnotes): "
              f"{', '.join(spot_unexplained)}", file=sys.stderr)
        sys.exit(2)
    sys.exit(rc)


if __name__ == "__main__":
    main()
