#!/usr/bin/env python3
"""Scale-ratio tooling over bench_full.json artifacts.

Mode 1 — ratio table (BASELINE.md scale triage):
    python3 tools/ratio_table.py <base.json> <scaled.json> [threshold]
  Joins two artifacts (base SF vs scaled SF) into a per-query ratio
  table sorted desc, flags ratios > threshold (default 15 — the
  super-linear smell at one decade per the round-11 verdict), and
  prints a markdown table of the flagged set.

Mode 2 — regression gate (round-12 verdict #8: "carry the decade table
forward as a regression gate"):
    python3 tools/ratio_table.py --gate <base.json> <ref_scaled.json> <new_scaled.json> [drift]
  Recomputes each query's scale ratio from a NEW scaled-SF run and
  diffs it against the RECORDED scaled run (e.g.
  bench_artifacts_r12/bench_full_sf1_multifile.json). Flags any query
  whose ratio moved by more than `drift`× (default 2) in either
  direction — the cheap per-round check that no code change quietly
  bent a query's scaling curve. Exit 1 if anything is flagged.
"""
import json, sys


def load(p):
    return json.load(open(p))


def ratios(base, scaled):
    out = {}
    for name, b in base["queries"].items():
        s = scaled["queries"].get(name)
        if s is None:
            continue
        out[name] = float("inf") if b <= 0 or s <= 0 else s / b
    return out


def mode_table(argv):
    base, scaled = load(argv[0]), load(argv[1])
    thr = float(argv[2]) if len(argv) > 2 else 15.0
    bq, sq = base["queries"], scaled["queries"]
    rows = []
    for name in sorted(bq):
        if name not in sq:
            continue
        b, s = bq[name], sq[name]
        rows.append((float("inf") if b <= 0 or s <= 0 else s / b, name, b, s))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > thr]
    print(f"base total {base['value']}s  scaled total {scaled['value']}s  "
          f"queries {len(rows)}  flagged>{thr}x: {len(flagged)}")
    for ratio, name, b, s in rows:
        mark = "  <-- FLAG" if ratio > thr else ""
        print(f"{ratio:8.1f}x  {name:28s} {b:8.2f} -> {s:8.2f}{mark}")
    if flagged:
        print("\n| query | base (s) | scaled (s) | ratio |")
        print("|---|---|---|---|")
        for ratio, name, b, s in flagged:
            print(f"| {name} | {b:.2f} | {s:.2f} | {ratio:.1f}x |")
    sys.exit(0)


def mode_gate(argv):
    base, ref, new = load(argv[0]), load(argv[1]), load(argv[2])
    drift = float(argv[3]) if len(argv) > 3 else 2.0
    r_ref, r_new = ratios(base, ref), ratios(base, new)
    common = sorted(set(r_ref) & set(r_new))
    flagged = []
    for name in common:
        a, b = r_ref[name], r_new[name]
        if a <= 0 or b <= 0:
            continue
        move = b / a if b >= a else a / b
        if move > drift:
            flagged.append((move, name, a, b))
    flagged.sort(reverse=True)
    print(f"gate: {len(common)} queries compared, drift threshold {drift}x, "
          f"flagged {len(flagged)}")
    if flagged:
        print("\n| query | recorded ratio | new ratio | drift |")
        print("|---|---|---|---|")
        for move, name, a, b in flagged:
            print(f"| {name} | {a:.2f}x | {b:.2f}x | {move:.2f}x |")
        print("\nNOTE: single-run bench noise swings up to ~3x on a busy box "
              "(BASELINE.md); re-measure a flagged query standalone before "
              "concluding a regression.")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    if sys.argv[1] == "--gate":
        mode_gate(sys.argv[2:])
    else:
        mode_table(sys.argv[1:])
