#!/usr/bin/env python3
"""Per-entry diff of two bench JSON artifacts (r16 A/B + scaling tool).

Usage:
  python3 tools/bench_diff.py A.json B.json [--median] [--min-sec 0.2]

Prints per-entry A, B, B/A for `queries` and `scenarios` (or the
*_median maps with --median), sorted by ratio, plus block sums and the
headline value/whole-function totals. Use it for tmpdir A/Bs, the
8c-vs-32c scaling check (A=8c, B=32c: ratio>2 = anti-scaling), and
before/after pairs of an optimization. Dev tooling only.
"""
import json
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    med = "--median" in sys.argv
    min_sec = 0.0
    if "--min-sec" in sys.argv:
        min_sec = float(sys.argv[sys.argv.index("--min-sec") + 1])
    a = json.load(open(args[0]))
    b = json.load(open(args[1]))
    suf = "_median" if med else ""
    print(f"A={args[0]} run_utc={a.get('run_utc')} cpus={a.get('cpus')} "
          f"tmpdir={a.get('tmpdir')}")
    print(f"B={args[1]} run_utc={b.get('run_utc')} cpus={b.get('cpus')} "
          f"tmpdir={b.get('tmpdir')}")
    print(f"value: {a.get('value'):.3f} -> {b.get('value'):.3f}   "
          f"whole_fn: {a.get('total_whole_function'):.3f} -> "
          f"{b.get('total_whole_function'):.3f}")
    for block in ("queries", "scenarios"):
        am = a.get(block + suf, {})
        bm = b.get(block + suf, {})
        common = [k for k in am if k in bm and am[k] > 0 and bm[k] > 0]
        rows = [(bm[k] / am[k], k, am[k], bm[k]) for k in common
                if max(am[k], bm[k]) >= min_sec]
        rows.sort(reverse=True)
        print(f"\n== {block}{suf} (n={len(common)}, shown={len(rows)}) "
              f"sumA={sum(am[k] for k in common):.2f} "
              f"sumB={sum(bm[k] for k in common):.2f}")
        for r, k, av, bv in rows:
            flag = " <<<" if r > 1.5 else (" >>>" if r < 0.67 else "")
            print(f"  {k:32s} {av:7.3f} {bv:7.3f}  {r:5.2f}x{flag}")
        only_a = sorted(set(am) - set(bm))
        only_b = sorted(set(bm) - set(am))
        if only_a:
            print(f"  only in A: {','.join(only_a)}")
        if only_b:
            print(f"  only in B: {','.join(only_b)}")


if __name__ == "__main__":
    main()
