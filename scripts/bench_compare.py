#!/usr/bin/env python3
"""Time DuckDB on the engine's own oracle workload for a like-for-like
baseline. Usage: bench_compare.py <verifyOutDir> <sfDir>

<verifyOutDir> must contain oracle_sql.json from a prior graft.Verify run.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = {}
    t0 = time.time()
    for name, sql in sorted(oracle.items()):
        t1 = time.time()
        con.execute(sql).fetchall()
        times[name] = time.time() - t1
    total = time.time() - t0
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:8]
    print(f"duckdb total {total:.1f}s over {len(times)} oracle queries @ {sf_dir}")
    for k, v in slow:
        print(f"  {k}: {v:.2f}s")


if __name__ == "__main__":
    main()
