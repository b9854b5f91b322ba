#!/usr/bin/env python3
"""Scale-rehearsal slope analysis: compare two graft.Bench JSON lines
(e.g. sf0.1 vs a 10x scale-up) and emit SCALE_r{N}.json plus a sorted
slope table. slope = t_big / t_small.

Flag policy (r11): every query with slope > factor/2 (i.e. > 5x at a
10x rehearsal) is flagged and MUST carry a non-empty, self-explaining
note in the artifact — measured output growth, measured payload-byte
growth, or a hand note citing a measurement. Unexplained flags exit
non-zero so the artifact cannot be committed by accident with silent
super-linear entries (the r10 verdict's "flagged_superlinear
under-flags" finding).

Note sources, merged in order:
  - growth.json (graft.tools.GrowthDiag output): per-query measured
    output rows at both sfs, and measured payload bytes for the media
    families -> auto note "output rows a->b (Nx)" / "media bytes ...".
  - notes.json: { query: hand note } for explanations a row count
    cannot carry (citing a measurement).

Usage: slopes.py <small.log> <big.log> <factor> <out.json>
                 [growth.json] [notes.json]
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


def load_json(path):
    if not path:
        return {}
    with open(path) as f:
        return json.load(f)


def auto_note(q, growth):
    """Compose the measured-growth note for query q, if measured."""
    parts = []
    g = growth.get("queries", {}).get(q)
    if g and g.get("rows_small") is not None and g.get("rows_big") is not None:
        rs, rb = g["rows_small"], g["rows_big"]
        if rs > 0:
            parts.append(f"output rows {rs}->{rb} ({rb / rs:.1f}x measured)")
        else:
            parts.append(f"output rows {rs}->{rb}")
    fam = growth.get("media_bytes_by_query", {}).get(q)
    if fam:
        bs, bb = fam["bytes_small"], fam["bytes_big"]
        parts.append(
            f"decoded payload bytes {bs}->{bb} ({bb / bs:.1f}x measured)")
    return "; ".join(parts)


def main():
    small_p, big_p, factor, out = sys.argv[1:5]
    growth = load_json(sys.argv[5]) if len(sys.argv) > 5 else {}
    hand = load_json(sys.argv[6]) if len(sys.argv) > 6 else {}
    factor = float(factor)
    flag_at = factor / 2.0
    small, big = bench_line(small_p), bench_line(big_p)
    qs_s = {k: float(v) for k, v in small["queries"].items()}
    qs_b = {k: float(v) for k, v in big["queries"].items()}
    rows, flagged, unexplained = [], [], []
    for q in sorted(set(qs_s) & set(qs_b)):
        ts, tb = qs_s[q], qs_b[q]
        if ts <= 0 or tb <= 0:
            rows.append({"query": q, "t_small": ts, "t_big": tb,
                         "slope": None, "note": "errored"})
            continue
        slope = tb / ts
        notes = []
        # tiny denominators make slopes meaningless noise
        if ts < 0.1:
            notes.append("sub-100ms base")
        if slope > flag_at:
            flagged.append(q)
            a = auto_note(q, growth)
            if a:
                notes.append(a)
            if q in hand:
                notes.append(hand[q])
            if not (a or q in hand):
                notes.append("UNEXPLAINED — audit required")
                unexplained.append(q)
        rows.append({"query": q, "t_small": round(ts, 3),
                     "t_big": round(tb, 3),
                     "slope": round(slope, 2), "note": "; ".join(notes)})
    doc = {
        "factor": factor,
        "flag_policy": f"slope > {flag_at:g} flagged; every flagged entry "
                       "carries a measured-growth or hand note",
        "small": {"sf": small.get("sf"), "total": small.get("value"),
                  "errors": small.get("errors", [])},
        "big": {"sf": big.get("sf"), "total": big.get("value"),
                "errors": big.get("errors", [])},
        "n_common": len(rows),
        "flagged_superlinear": flagged,
        "unexplained": unexplained,
        "slopes": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    rows_t = [r for r in rows if r["slope"]]
    rows_t.sort(key=lambda r: -r["slope"])
    print(f"total {small['value']:.0f}s -> {big['value']:.0f}s "
          f"({big['value']/small['value']:.1f}x at {factor:.0f}x data), "
          f"{len(rows)} common queries, {len(flagged)} flagged, "
          f"{len(unexplained)} unexplained")
    print(f"{'query':34s} {'t_small':>8s} {'t_big':>8s} {'slope':>6s}")
    for r in rows_t[:30]:
        flag = " <== FLAG" if r["query"] in flagged else ""
        print(f"{r['query']:34s} {r['t_small']:8.2f} {r['t_big']:8.2f} "
              f"{r['slope']:6.1f}{flag}")
    if unexplained:
        print(f"UNEXPLAINED flagged queries (add growth/notes): "
              f"{', '.join(unexplained)}", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
