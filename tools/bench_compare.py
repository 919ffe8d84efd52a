#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines (e.g. BENCH_r1.json vs a fresh
run): per-query delta, regressions beyond a threshold flagged.

Usage: python3 tools/bench_compare.py <baseline.json> <candidate.json> [threshold=1.5]
Exit 1 if any shared query regressed by more than `threshold`x.
"""
import json, sys

def load(p):
    with open(p) as f:
        line = next(l for l in f if l.strip().startswith('{'))
    return json.loads(line)

def main(base_p, cand_p, threshold=1.5):
    base, cand = load(base_p), load(cand_p)
    bq, cq = base["queries"], cand["queries"]
    shared = sorted(set(bq) & set(cq), key=lambda k: -cq[k])
    regressions = []
    print(f"{'query':<30} {'base':>8} {'cand':>8} {'ratio':>7}")
    for k in shared:
        ratio = cq[k] / bq[k] if bq[k] > 0 else float("inf")
        mark = ""
        if cq[k] > 0.5 and ratio > threshold:  # ignore sub-500ms noise
            regressions.append(k)
            mark = "  <-- REGRESSION"
        print(f"{k:<30} {bq[k]:>8.2f} {cq[k]:>8.2f} {ratio:>7.2f}{mark}")
    print(f"\ntotal: base {base['value']:.1f}s -> cand {cand['value']:.1f}s")
    for k in sorted(set(cq) - set(bq)):
        print(f"new query: {k} ({cq[k]:.2f}s)")
    if regressions:
        print(f"\n{len(regressions)} regression(s): {regressions}")
        return 1
    return 0

if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
