#!/usr/bin/env python3
"""Partial oracle compare: like check_oracle.py but only for the named
queries (comma-separated 3rd arg). The oracle_sql.json in out_dir must be
fresh (a filtered Verify rewrites it)."""
import sys, os, json, glob
import duckdb
from check_oracle import TABLES, table_rows

def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in names:
        pq = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(pq, "*.parquet")):
            print(f"FAIL {name}: no spark output at {pq}"); failures += 1; continue
        if name not in oracle:
            # Only the documented no-SQL-twin queries may degrade to a
            # rows-only check; any other missing name means oracle_sql.json
            # was rewritten by a filtered Verify for DIFFERENT queries and a
            # hash regression could read as green — fail loudly instead.
            ROWS_ONLY = {"q276_compressibility"}
            if name not in ROWS_ONLY:
                print(f"FAIL {name}: absent from oracle_sql.json (stale/filtered "
                      f"oracle file?) — refusing rows-only degrade")
                failures += 1
                continue
            n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{pq}/*.parquet')").fetchone()[0]
            print(("OK  " if n > 0 else "FAIL") + f" {name}: rows-only, {n} rows")
            failures += 0 if n > 0 else 1
            continue
        try:
            got_cols, got_seq = table_rows(con, f"SELECT * FROM read_parquet('{pq}/*.parquet')")
            want_cols, want_seq = table_rows(con, oracle[name], name=name)
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        got, want = sorted(got_seq), sorted(want_seq)
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}"); failures += 1
        elif got != want:
            ws, gs = set(want), set(got)
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}; "
                  f"spark-only={[r for r in got if r not in ws][:3]} "
                  f"oracle-only={[r for r in want if r not in gs][:3]}")
            failures += 1
        elif got_seq != want_seq:
            idx = next(i for i, (a, b) in enumerate(zip(got_seq, want_seq)) if a != b)
            print(f"FAIL {name}: row-order mismatch at {idx}: "
                  f"spark={got_seq[idx]} oracle={want_seq[idx]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print("ALL GREEN" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3].split(",")))
