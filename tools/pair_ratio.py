#!/usr/bin/env python3
"""Same-era binding ratio from era-stamped artifacts (VERDICT r11 item 7).

Usage: python3 tools/pair_ratio.py <bench_full.json> <duckdb_out.json>

Reads the engine suite total (`value`, prepared) and the DuckDB binding
total (`_total`) plus both `run_utc` stamps; prints the ratio and the
per-query table. Exits nonzero if the two runs are more than 6 hours
apart — the host's performance era drifts on a multi-hour timescale
(BASELINE.md §4), so a wider gap is not a valid pairing.
"""
import datetime as dt
import json
import sys

BINDING_ORDER = [
    "q01_filter_project", "q02_hash_agg", "q03_join_agg", "q04_multi_join",
    "q05_semi_anti", "q06_window", "q07_topk", "q08_rollup",
    "q09_set_intersect", "q10_string_math", "q11_date_scalars", "q12_json",
    "q13_range_join", "q14_percentiles", "q15_corr_subquery",
    "s1_tumbling_window", "s2_sliding_window", "s3_session_windows",
    "s5_dedup", "l1_exact_dedup", "l2_jaccard_pairs", "l3_cosine_topk",
    "l4_text_stats", "l5_tfidf_top3",
]


def parse_utc(s):
    return dt.datetime.fromisoformat(s.replace("Z", "+00:00"))


def main(engine_path, duck_path):
    with open(engine_path) as f:
        eng = json.loads(f.read().strip())
    with open(duck_path) as f:
        duck = json.loads(f.read().strip())
    e_utc, d_utc = eng.get("run_utc"), duck.get("_run_utc")
    if not e_utc or not d_utc:
        sys.exit("missing run_utc stamp — re-run with era-stamped tools")
    gap = abs((parse_utc(e_utc) - parse_utc(d_utc)).total_seconds())
    print(f"engine run_utc={e_utc}  duckdb run_utc={d_utc}  gap={gap/3600:.2f}h")
    print(f"{'query':24s} {'engine_ms':>10s} {'duckdb_ms':>10s} {'ratio':>7s}")
    for q in BINDING_ORDER:
        e, d = eng["queries"].get(q), duck.get(q)
        if e is None or d is None:
            continue
        r = e / d if d > 0 else float("inf")
        print(f"{q:24s} {e*1000:10.1f} {d*1000:10.1f} {r:7.2f}")
    total_e, total_d = eng["value"], duck["_total"]
    print(f"{'TOTAL (prepared)':24s} {total_e*1000:10.1f} {total_d*1000:10.1f} "
          f"{total_e/total_d:7.2f}")
    wf = eng.get("total_whole_function")
    if wf:
        print(f"{'TOTAL (whole-fn)':24s} {wf*1000:10.1f} {total_d*1000:10.1f} "
              f"{wf/total_d:7.2f}")
    if gap > 6 * 3600:
        sys.exit("PAIRING INVALID: runs are >6h apart (different host eras)")


if __name__ == "__main__":
    main(*sys.argv[1:])
