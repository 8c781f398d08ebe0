#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/verify_local.py <outDir> <sfDir>

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have produced
<outDir>/<query>/ parquet dirs plus <outDir>/oracle_sql.json. Runs each
oracle SQL in DuckDB against the same parquet tables and compares strictly:
columns sorted by name, rows sorted by all columns, values canonicalized
(Decimal kept exact, floats compared bitwise after the query's own
rounding). Stricter than whatever the driver does, so passing here should
imply passing there.
"""
import json
import math
import sys
from decimal import Decimal
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, Decimal):
        return ("num", str(v.normalize()) if v != 0 else "0")
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        if v == int(v) and abs(v) < 2**53:
            return ("num", str(Decimal(int(v))))
        return ("float", repr(v))
    if isinstance(v, int):
        return ("num", str(Decimal(v)))
    if isinstance(v, bool):
        return ("bool", v)
    return (type(v).__name__, str(v))


def table_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        got_rows, got_cols = table_rows(got.fetchall(), [d[0] for d in got.description])
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(got_rows)} rows)")
            n_skip += 1
            continue
        try:
            want = con.execute(oracle[name])
            want_rows, want_cols = table_rows(want.fetchall(), [d[0] for d in want.description])
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL  {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
        elif got_rows != want_rows:
            diff = next(
                (i for i, (a, b) in enumerate(zip(got_rows, want_rows)) if a != b),
                min(len(got_rows), len(want_rows)),
            )
            print(f"FAIL  {name}: {len(got_rows)} vs {len(want_rows)} rows; first diff at sorted row {diff}")
            if diff < len(got_rows):
                print(f"      got : {got_rows[diff]}")
            if diff < len(want_rows):
                print(f"      want: {want_rows[diff]}")
        else:
            print(f"PASS  {name} ({len(got_rows)} rows)")
            n_pass += 1
            continue
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
