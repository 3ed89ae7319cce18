#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (Spark result) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB over
views of <sfDir>/*.parquet, canonicalizes both sides (columns sorted
by name, floats rounded-stringified, timestamps ISO), and diffs.
Dev tooling only — the engine itself has no DuckDB dependency.
"""
import sys, os, json, math, datetime, decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order],
            [tuple(canon_cell(r[i]) for i in order) for r in rows])


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written dir (the 10x corpus)
            p = os.path.join(p, "*.parquet")
        if os.path.isdir(os.path.join(sf_dir, f"{t}.parquet")) or \
                os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows={len(got_rows)})")
            continue
        try:
            # HUGEINT guard: DuckDB widens SUM over integers to HUGEINT
            # (and keeps the width through //). The DRIVER's fetch path
            # renders HUGEINT differently than BIGINT even on equal
            # values (the r7/r8 t7 failure), while this harness's
            # str(int) canonicalization hides it — so detect the TYPE
            # and fail loudly: any sum-derived integer output column
            # needs an explicit CAST(... AS BIGINT). DESCRIBE runs
            # BEFORE the oracle on this shared cursor (a second
            # execute() would clobber the pending result set).
            wide = []
            try:
                desc = con.execute(
                    f"DESCRIBE {oracle[name]}").fetchall()
                wide = [c for (c, t, *_) in desc if "HUGEINT" in t.upper()]
            except Exception:
                pass  # DESCRIBE unsupported for this statement shape
            if wide:
                print(f"  ✗ {name}: HUGEINT ORACLE COLUMN(S) {wide} — "
                      "the driver renders these differently than BIGINT; "
                      "add CAST(... AS BIGINT)")
                n_fail += 1
                continue
            exp = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_cols, got_rows)
        ec, er = canon(exp_cols, exp_rows)
        if gc != ec:
            print(f"  ✗ {name}: COLUMN MISMATCH spark={gc} duck={ec}")
            n_fail += 1
            continue
        if gr == er:
            print(f"  ✓ {name}: {len(gr)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  ✗ {name}: ROWS spark={len(gr)} duck={len(er)}")
            sg, se = set(gr), set(er)
            only_g = [r for r in gr if r not in se][:3]
            only_e = [r for r in er if r not in sg][:3]
            if not only_g and not only_e:
                # same multiset, different order
                for i, (a, b) in enumerate(zip(gr, er)):
                    if a != b:
                        print(f"      ORDER diff at row {i}: spark={a} duck={b}")
                        break
            for r in only_g:
                print(f"      spark-only: {r}")
            for r in only_e:
                print(f"      duck-only:  {r}")
    print(f"PASS={n_pass} FAIL={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
