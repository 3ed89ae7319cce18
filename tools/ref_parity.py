#!/usr/bin/env python3
"""Byte-parity check: run the ACTUAL reference code (/root/reference,
imported with a stubbed pymysql + catalog cursor, as in BASELINE.md §1)
over a binlog fixture, and diff its stdout against the engine's
bug-compatible output dumped by `sbt "runMain graft.RefParityDump"`.

Usage: python3 tools/ref_parity.py <binlog_txt> <engine_dump_txt> [--flashback]

Dev harness only — the engine has no runtime dependency on the
reference; this validates the documented quirk-compatible semantics.
"""
import sys, io, types, contextlib

sys.path.insert(0, "/root/reference")

# stub pymysql before importing the reference
pymysql = types.ModuleType("pymysql")
pymysql.Connect = lambda **kw: None
sys.modules["pymysql"] = pymysql

import log2sql  # noqa: E402  (the reference module)


class StubCursor:
    """information_schema snapshot matching graft.cdc.Catalog.fixture."""

    COLS = {
        ("testdb", "t_pk"): [("id", 1, "PRI"), ("name", 2, ""), ("score", 3, "")],
        ("testdb", "t_uniq"): [("id", 1, ""), ("code", 2, ""), ("val", 3, "")],
        ("testdb", "t_keyless"): [("a", 1, ""), ("b", 2, "")],
        ("otherdb", "t_pk"): [("id", 1, "PRI"), ("name", 2, ""), ("score", 3, "")],
    }
    UNIQ = {("testdb", "t_uniq"): ["code"]}

    def execute(self, q):
        qs = q.replace("\n", " ")
        import re
        m = re.findall(r"table_schema='([^']*)' and table_name='([^']*)'", qs)
        key = m[0] if m else None
        if "ORDINAL_POSITION" in qs or "COLUMN_NAME,ORDINAL_POSITION" in qs:
            self._rows = self.COLS.get(key, [])
        else:  # STATISTICS unique-index lookup
            self._rows = [(c,) for c in self.UNIQ.get(key, [])]

    def fetchall(self):
        return self._rows


class Args:
    def __init__(self, flashback, only_dml=True):
        self.sql_type = ["insert", "update", "delete"]
        self.flashback = flashback
        self.database = ""
        self.tables = ""
        self.only_dml = only_dml


def run_reference(lines, flashback, only_dml=True):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        log2sql.get_binlog(lines, StubCursor(), Args(flashback, only_dml))
    return buf.getvalue().rstrip("\n").split("\n") if buf.getvalue() else []


def main():
    binlog, dump = sys.argv[1], sys.argv[2]
    flashback = "--flashback" in sys.argv
    # --include-ddl: exercise the reference's marker-0 DDL branch
    # (only_dml=False) — c6's parity mode
    only_dml = "--include-ddl" not in sys.argv
    with open(binlog) as f:
        lines = f.readlines()
    ref = run_reference(lines, flashback, only_dml)
    with open(dump) as f:
        eng = f.read().rstrip("\n").split("\n")
    if ref == eng:
        print(f"PARITY OK: {len(ref)} lines identical")
        return 0
    print(f"PARITY MISMATCH: ref={len(ref)} lines, engine={len(eng)} lines")
    for i, (a, b) in enumerate(zip(ref, eng)):
        if a != b:
            print(f"  line {i}:\n    ref: {a!r}\n    eng: {b!r}")
            if i > 5:
                break
    for extra in ref[len(eng):][:3]:
        print(f"  ref-only: {extra!r}")
    for extra in eng[len(ref):][:3]:
        print(f"  eng-only: {extra!r}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
