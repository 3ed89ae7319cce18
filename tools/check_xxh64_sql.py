#!/usr/bin/env python3
"""Validate the d2 oracle's SQL-unrolled xxHash64 against a reference
implementation for EVERY supported token length (1..15 bytes).

The corpus only exercises the lengths its words happen to have (<= 9 as
of the 10x rebuild), so the SQL's longer branches would otherwise ship
untested. This tool plants one token of every byte length 1..15
(multibyte UTF-8 included), runs the oracle's token-hash stages in
DuckDB, and compares the resulting hash SET against a standalone
XXH64(seed=0) reference — the same public algorithm Spark's XXH64
implements and the engine's HashOps.hash calls.

Usage: python3 tools/check_xxh64_sql.py <verify_out_dir>
       (<verify_out_dir>/oracle_sql.json must contain d2_simhash_neardup)
Exits nonzero on any mismatch.
"""
import json
import os
import sys

import duckdb

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M = 1 << 64


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) % M


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    assert n < 32, "reference covers the short path only"
    p = 0
    h = (seed + P5 + n) % M
    while p + 8 <= n:
        k = int.from_bytes(data[p:p + 8], "little")
        k = rotl((k * P2) % M, 31)
        h ^= (k * P1) % M
        h = (rotl(h, 27) * P1 + P4) % M
        p += 8
    if p + 4 <= n:
        h ^= (int.from_bytes(data[p:p + 4], "little") * P1) % M
        h = (rotl(h, 23) * P2 + P3) % M
        p += 4
    while p < n:
        h ^= (data[p] * P5) % M
        h = (rotl(h, 11) * P1) % M
        p += 1
    h ^= h >> 33
    h = (h * P2) % M
    h ^= h >> 29
    h = (h * P3) % M
    h ^= h >> 32
    return h


def main(out_dir):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    sql = oracles["d2_simhash_neardup"]
    # one token per byte length 1..15, varied bytes, one multibyte
    toks = ["a", "bc", "dEf", "wxyz", "q1é2", "zz0zz9", "7bytes!",
            "8bytesXY", "ninebytes", "tenbytes10", "elevenbytes",
            "twelve-bytes", "thirteen-byte", "fourteen-bytes",
            "fifteen-bytes-x"]
    assert [len(t.encode()) for t in toks] == list(range(1, 16))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 0 AS doc_id, "
                f"'en' AS lang, 'srcX' AS source, "
                f"'{' '.join(toks)}' AS text")
    # run the oracle's token-hash stages only: everything up to `votes`
    head = sql.split("votes AS")[0].rstrip().rstrip(",")
    got = sorted(r[0] for r in con.execute(
        head + "\nSELECT CAST(h AS HUGEINT) FROM tokh").fetchall())
    want = sorted(xxh64(t.encode()) for t in toks)
    rc = 0
    if got == want:
        print(f"PASS: d2 SQL xxh64 (seed 0) matches reference for "
              f"lengths 1..15 ({len(toks)} tokens)")
    else:
        for g, w in zip(got, want):
            if g != w:
                print(f"d2 MISMATCH: sql={g} ref={w}")
        rc = 1
    # t26's shared builder instance (SqlHash.xxh64StrCtes, seed 42 —
    # Spark's builtin xxhash64): same planted lengths, vocab stage `vh`
    sql26 = oracles.get("t26_dsir_select")
    if sql26 is not None:
        head26 = sql26.split("ih AS")[0].rstrip().rstrip(",")
        got26 = sorted(r[0] for r in con.execute(
            head26 + "\nSELECT CAST(h AS HUGEINT) FROM vh").fetchall())
        want26 = sorted(xxh64(t.encode(), 42) for t in toks)
        if got26 == want26:
            print(f"PASS: t26 SQL xxh64 (seed 42) matches reference for "
                  f"lengths 1..15 ({len(toks)} tokens)")
        else:
            for g, w in zip(got26, want26):
                if g != w:
                    print(f"t26 MISMATCH: sql={g} ref={w}")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
