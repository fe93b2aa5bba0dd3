#!/usr/bin/env python3
"""Dev-only self-check: replicate the driver's DuckDB-oracle comparison.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, register the sfDir parquet tables in
DuckDB, run the oracle SQL, and compare against the Spark parquet output:
column names (sorted), then per-row values with columns sorted by name.
This is a local approximation of the driver's CORRECTNESS gate.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_glob = f"{out_dir}/{name}/*.parquet"
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_glob}')").fetchdf()
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        srows = sorted(tuple(norm(v) for v in row)
                       for row in sdf[scols].itertuples(index=False))
        orows = sorted(tuple(norm(v) for v in row)
                       for row in odf[ocols].itertuples(index=False))
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            n_fail += 1
            continue
        if srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
