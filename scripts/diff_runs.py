#!/usr/bin/env python3
"""Value-wise diff of two graft.Verify output dirs — the double-run
determinism check. The DuckDB oracle can't see nondeterminism in the
rows-only queries (no oracle) or flakiness that happens to match once;
two independent Verify runs must produce identical values for EVERY
query, rows-only included.

Usage: diff_runs.py <outDirA> <outDirB>
"""
import sys
from pathlib import Path

import pandas as pd


def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(str(v) for v in r) for r in df[cols].itertuples(index=False)]
    return sorted(rows)


def main():
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    names_a = {p.name for p in a.iterdir() if p.is_dir()}
    names_b = {p.name for p in b.iterdir() if p.is_dir()}
    if names_a != names_b:
        print(f"DIFF query sets: only-in-A={names_a - names_b} only-in-B={names_b - names_a}")
        sys.exit(1)
    n_diff = 0
    for name in sorted(names_a):
        ra = canon(pd.read_parquet(a / name))
        rb = canon(pd.read_parquet(b / name))
        if ra != rb:
            first = next(
                (i for i, (x, y) in enumerate(zip(ra, rb)) if x != y),
                min(len(ra), len(rb)),
            )
            print(f"DIFF  {name}: {len(ra)} vs {len(rb)} rows; first diff at sorted row {first}")
            n_diff += 1
        else:
            print(f"SAME  {name} ({len(ra)} rows)")
    print(f"\n{len(names_a) - n_diff} identical, {n_diff} differ")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
