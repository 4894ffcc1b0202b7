#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff per query (row count, schema, values).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd
from pathlib import Path

# the sandbox caps thread creation; pyarrow's default pools plus duckdb's
# workers overrun it mid-run and abort the process
pa.set_cpu_count(2)
pa.set_io_thread_count(2)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints vs floats: compare as strings with float rounding
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    rows = sorted(out.itertuples(index=False, name=None))
    return rows

def fresh_con(sf_dir):
    # configure at connect time: the default pool (32 threads, 80%-RAM
    # memory_limit) trips this container's sandbox limits — pthread_create
    # EAGAIN aborts the process and small allocs spuriously fail
    con = duckdb.connect(config={"threads": 4, "memory_limit": "8GB"})
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def main(sf_dir, out_dir):
    con = fresh_con(sf_dir)
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    # Verify records every thrown query here (absent != red was how r10's
    # 28-query break produced an all-green 102-row artifact)
    fail_path = Path(out_dir) / "_failures.json"
    failures = json.loads(fail_path.read_text()) if fail_path.exists() else {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            why = failures.get(name, "no spark output")
            print(f"FAIL {name}: {why}"); n_fail += 1; continue
        try:
            spark_df = pq.read_table(res_dir).to_pandas()
        except Exception as e:
            print(f"FAIL {name}: read spark output: {e}"); n_fail += 1; continue
        duck_df = None
        err = None
        for attempt in range(3):
            try:
                duck_df = con.execute(sql).fetchdf()
                break
            except Exception as e:
                # transient allocator failures poison the connection:
                # rebuild, give the sandbox a beat to reap threads, retry
                err = e
                try:
                    con.close()
                except Exception:
                    pass
                import gc, time
                gc.collect(); time.sleep(1.0)
                con = fresh_con(sf_dir)
        if duck_df is None:
            print(f"FAIL {name}: oracle sql error: {err}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            for i,(x,y) in enumerate(zip(a[:5], b[:5])): print("  s:",x,"\n  d:",y)
            n_fail += 1
        elif a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL {name}: {len(diffs)}/{len(a)} row diffs; first: \n  s: {diffs[0][0]}\n  d: {diffs[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
