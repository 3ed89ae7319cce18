#!/usr/bin/env python3
"""Summarize the r8-vs-r10 same-host interleaved bench A/B (VERDICT r10
task 1). Reads /tmp/ab/{r8,r10}_run{1..3}.json + duckdb_same_day.json
and prints the table committed to BASELINE.md.

Dev tooling only.
"""
import json, os, sys

AB = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab"


def load(name):
    p = os.path.join(AB, name)
    return json.load(open(p)) if os.path.exists(p) else None


def main():
    rows = []
    for tree in ("r8", "r10"):
        for i in (1, 2, 3):
            d = load(f"{tree}_run{i}.json")
            if d:
                rows.append((tree, i, d["value"], d["total_whole_function"],
                             d["cdc_events_per_sec"]))
    duck = load("duckdb_same_day.json")
    print(f"{'tree':5s} {'run':3s} {'prepared':>9s} {'whole-fn':>9s} {'cdc/s':>8s}")
    for t, i, v, w, c in rows:
        print(f"{t:5s} {i:<3d} {v:9.3f} {w:9.3f} {c:8d}")
    for t in ("r8", "r10"):
        vs = [v for tt, _, v, _, _ in rows if tt == t]
        if vs:
            print(f"{t}: min={min(vs):.3f} median={sorted(vs)[len(vs)//2]:.3f}")
    if duck:
        print(f"duckdb same-day 24-query total: {duck['_total']:.3f}s")
        r10v = [v for tt, _, v, _, _ in rows if tt == "r10"]
        if r10v:
            print(f"same-day binding ratio (r10 min / duckdb): "
                  f"{min(r10v)/duck['_total']:.2f}x")


if __name__ == "__main__":
    main()
