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

Spot-block note policy (r15): every merged-block row with slope >
SPOT_FLAG_AT must carry a note or it lands in the block's
"unexplained" list and the exit code is non-zero — the same
enforcement assemble_scale.py applies at assembly time.
"""
import json
import subprocess
import sys

SPOT_FLAG_AT = 5.0
# A note written BY a prior failing run must not satisfy the policy on
# a later merge — treat it the same as a missing note (ADVICE r15).
PLACEHOLDER_NOTE = "UNEXPLAINED — audit required"


def code_commit():
    """Short commit hash of the code the fresh rows were measured on."""
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            text=True).strip()
    except Exception:
        return None


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
    commit = code_commit()
    fresh = {}
    for q in sorted(set(qs_s) & set(qs_b)):
        ts, tb = float(qs_s[q]), float(qs_b[q])
        if ts > 0 and tb > 0:
            row = {"query": q, "t_small": round(ts, 3),
                   "t_big": round(tb, 3), "slope": round(tb / ts, 2)}
            if commit:
                row["code"] = commit  # staleness is mechanically visible
            if q in notes:
                row["note"] = notes[q]
            fresh[q] = row
    kept = [r for r in block["slopes"] if r["query"] not in fresh]
    block["slopes"] = sorted(kept + list(fresh.values()),
                             key=lambda r: r["query"])
    # re-check the WHOLE block (kept rows included) against the note
    # policy, so a merge cannot launder a bare slope into the artifact;
    # the placeholder a failing run wrote counts as MISSING, not a note
    unexplained = [r["query"] for r in block["slopes"]
                   if r.get("slope") and r["slope"] > SPOT_FLAG_AT
                   and r.get("note") in (None, "", PLACEHOLDER_NOTE)]
    for r in block["slopes"]:
        if r["query"] in unexplained:
            r["note"] = PLACEHOLDER_NOTE
    block["flag_policy"] = f"slope > {SPOT_FLAG_AT:g} must carry a note"
    block["unexplained"] = unexplained
    with open(scale_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"merged {len(fresh)} rows into {label} of {scale_path}")
    if unexplained:
        print(f"UNEXPLAINED spot rows in {label} (add notes): "
              f"{', '.join(unexplained)}", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
