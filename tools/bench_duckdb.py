#!/usr/bin/env python3
"""Same-day DuckDB timing of the 24 BASELINE-binding oracle queries.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [out.json]

Replicates BASELINE.md §2's protocol: views over <sfDir>/*.parquet,
default thread count, per query 1 warm-up then min of 3 timed runs
(fetchall included). Emits one JSON line {query: sec, ..., "_total": sec}
so the binding ratio can be computed from a numerator and denominator
measured on the same host in the same hour (VERDICT r10 task 1).
Dev tooling only — the engine itself has no DuckDB dependency.
"""
import sys, os, json, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BINDING = [
    "q01_filter_project", "q02_hash_agg", "q03_join_agg", "q04_multi_join",
    "q05_semi_anti", "q06_window", "q07_topk", "q08_rollup",
    "q09_set_intersect", "q10_string_math", "q11_date_scalars", "q12_json",
    "q13_range_join", "q14_percentiles", "q15_corr_subquery",
    "s1_tumbling_window", "s2_sliding_window", "s3_session_windows",
    "s5_dedup", "l1_exact_dedup", "l2_jaccard_pairs", "l3_cosine_topk",
    "l4_text_stats", "l5_tfidf_top3",
]


def main(sf_dir, oracle_path, out_path=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written dir (the 10x corpus)
            p = os.path.join(p, "*.parquet")
        if os.path.isdir(os.path.join(sf_dir, f"{t}.parquet")) or \
                os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(oracle_path) as f:
        oracle = json.load(f)
    missing = [q for q in BINDING if q not in oracle]
    if missing:
        sys.exit(f"oracle_sql.json lacks binding queries: {missing}")
    times = {}
    for q in BINDING:
        sql = oracle[q]
        con.execute(sql).fetchall()  # warm-up
        best = min(
            _timed(con, sql) for _ in range(3))
        times[q] = best
    times["_total"] = sum(times[q] for q in BINDING)
    # era stamp: ratios are only meaningful same-era (BASELINE.md §4);
    # tools/pair_ratio.py checks this stamp against the engine artifact's
    times["_run_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    line = json.dumps(times)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


def _timed(con, sql):
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main(*sys.argv[1:])
