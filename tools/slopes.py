#!/usr/bin/env python3
"""Scale-rehearsal slope analysis: compare two graft.Bench JSON lines
(e.g. sf0.1 vs a 10x scale-up) and emit SCALE_r{N}.json plus a sorted
slope table. slope = t_big / t_small; with a 10x data factor, slope <= ~12
reads as linear-or-better (fixed overheads amortize), larger is flagged
for a plan audit.

Usage: slopes.py <small.log> <big.log> <factor> <out.json>
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
    small_p, big_p, factor, out = sys.argv[1:5]
    factor = float(factor)
    small, big = bench_line(small_p), bench_line(big_p)
    qs_s = {k: float(v) for k, v in small["queries"].items()}
    qs_b = {k: float(v) for k, v in big["queries"].items()}
    rows = []
    for q in sorted(set(qs_s) & set(qs_b)):
        ts, tb = qs_s[q], qs_b[q]
        if ts <= 0 or tb <= 0:
            rows.append({"query": q, "t_small": ts, "t_big": tb,
                         "slope": None, "note": "errored"})
            continue
        # tiny denominators make slopes meaningless noise
        note = "sub-100ms base" if ts < 0.1 else ""
        rows.append({"query": q, "t_small": round(ts, 3),
                     "t_big": round(tb, 3),
                     "slope": round(tb / ts, 2), "note": note})
    flagged = [r for r in rows
               if r["slope"] and r["slope"] > 1.2 * factor
               and r["t_big"] > 2.0]
    doc = {
        "factor": factor,
        "small": {"sf": small.get("sf"), "total": small.get("value"),
                  "errors": small.get("errors", [])},
        "big": {"sf": big.get("sf"), "total": big.get("value"),
                "errors": big.get("errors", [])},
        "n_common": len(rows),
        "flagged_superlinear": [r["query"] for r in flagged],
        "slopes": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    rows_t = [r for r in rows if r["slope"]]
    rows_t.sort(key=lambda r: -r["slope"])
    print(f"total {small['value']:.0f}s -> {big['value']:.0f}s "
          f"({big['value']/small['value']:.1f}x at {factor:.0f}x data), "
          f"{len(rows)} common queries")
    print(f"{'query':34s} {'t_small':>8s} {'t_big':>8s} {'slope':>6s}")
    for r in rows_t[:25]:
        flag = " <== AUDIT" if r["query"] in doc["flagged_superlinear"] else ""
        print(f"{r['query']:34s} {r['t_small']:8.2f} {r['t_big']:8.2f} "
              f"{r['slope']:6.1f}{flag}")


if __name__ == "__main__":
    main()
