#!/usr/bin/env python3
"""Strict differ: exact-value comparison between Spark output and DuckDB
oracle, with NO float normalization — closer to the driver's hash compare
than selfcheck.py. Reports first differing values and python/duckdb types.

Usage: python3 scripts/strictdiff.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def rows_of(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    types = [str(d[1]) for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols = [cols[i] for i in order]
    types = [types[i] for i in order]
    out = sorted(tuple(str(r[i]) for i in order) for r in rows)
    return cols, types, out


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    names = only or sorted(oracles)
    n_pass = n_fail = 0
    for name in names:
        if name not in oracles:
            print(f"SKIP {name}: no oracle")
            continue
        scols, stypes, srows = rows_of(
            con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        ocols, otypes, orows = rows_of(con, oracles[name])
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        if stypes != otypes:
            print(f"TYPEDIFF {name}: {list(zip(scols, stypes, otypes))}")
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            n_fail += 1
            continue
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} differing rows; cols={scols}")
            for a, b in diffs[:4]:
                print(f"  spark  {a}")
                print(f"  oracle {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
