#!/usr/bin/env python3
"""Compare bench sweeps: reproducibility (two same-SF runs) and the
scale ladder (sf0.5 vs sf0.1 per-query ratio vs the 5x row ratio).

Usage:
  bench_compare.py repro A.json B.json [--min-sec=1.0] [--tol=0.25]
  bench_compare.py ladder SMALL.json BIG.json [--factor=5] [--exp=1.5]
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def repro(a_path, b_path, min_sec=1.0, tol=0.25):
    a, b = load(a_path), load(b_path)
    bad = []
    for q in sorted(set(a) & set(b)):
        ta, tb = a[q], b[q]
        if max(ta, tb) < min_sec:
            continue
        rel = abs(ta - tb) / max(ta, tb)
        flag = "FAIL" if rel > tol else "ok"
        if rel > tol:
            bad.append(q)
        print(f"{flag:4} {q:40} {ta:8.3f} {tb:8.3f} {rel * 100:6.1f}%")
    # totals over the COMMON query set only: comparing a 229-query sweep
    # to a 233-query sweep must not report the new queries as drift
    common = set(a) & set(b)
    ta, tb = sum(a[q] for q in common), sum(b[q] for q in common)
    if common and max(ta, tb) > 0:
        print(f"\ntotals over {len(common)} common queries: "
              f"{ta:.1f}s vs {tb:.1f}s "
              f"({abs(ta - tb) / max(ta, tb) * 100:.1f}% apart)")
    else:
        print("\nno common queries between the two sweeps — no totals line")
    print(f"queries >= {min_sec}s outside +-{tol * 100:.0f}%: {len(bad)}"
          + (f" -> {bad}" if bad else ""))
    return 1 if bad else 0


def ladder(small_path, big_path, factor=5.0, exp=1.5):
    small, big = load(small_path), load(big_path)
    bound = factor ** exp
    bad = []
    print(f"{'query':40} {'small':>8} {'big':>8} {'ratio':>7}  "
          f"(bound {bound:.1f}x)")
    for q in sorted(set(small) & set(big)):
        ts, tb = small[q], big[q]
        if ts < 0.2:  # sub-noise baseline: ratio meaningless
            continue
        r = tb / ts
        flag = "FAIL" if r > bound else ("warn" if r > factor * 1.5 else "ok")
        if r > bound:
            bad.append(q)
        print(f"{flag:4} {q:36} {ts:8.3f} {tb:8.3f} {r:6.2f}x")
    print(f"\nqueries scaling worse than factor^{exp} = {bound:.1f}x: "
          f"{len(bad)}" + (f" -> {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    mode = sys.argv[1]
    args = [a for a in sys.argv[2:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) for a in sys.argv[2:]
                if a.startswith("--"))
    if mode == "repro":
        sys.exit(repro(args[0], args[1],
                       float(opts.get("min-sec", 1.0)),
                       float(opts.get("tol", 0.25))))
    elif mode == "ladder":
        sys.exit(ladder(args[0], args[1],
                        float(opts.get("factor", 5)),
                        float(opts.get("exp", 1.5))))
    else:
        print(__doc__)
        sys.exit(2)
