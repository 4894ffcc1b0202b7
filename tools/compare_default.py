#!/usr/bin/env python3
"""Driver-mimic correctness gate: identical to compare.py but with the
DRIVER's resource config — default duckdb.connect() (80%-RAM pool, one
worker per core) and no pyarrow thread caps. Round 1 lost 15 rows to this
config tripping the sandbox's thread/alloc limits; the oracle SQL now
carries a `SET threads/memory_limit` prefix, and this script verifies that
the prefix alone keeps a default-config gate alive end to end.

Usage: python3 tools/compare_default.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd
from pathlib import Path

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    return sorted(out.itertuples(index=False, name=None))

def main(sf_dir, out_dir):
    con = duckdb.connect()  # driver defaults — no config dict
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pq.read_table(res_dir).to_pandas()
        except Exception as e:
            print(f"FAIL {name}: read spark output: {e}"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1
        elif a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL {name}: {len(diffs)}/{len(a)} row diffs; first:\n  s: {diffs[0][0]}\n  d: {diffs[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
