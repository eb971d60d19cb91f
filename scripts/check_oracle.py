#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: read Verify's parquet
outputs and oracle_sql.json, run each oracle in DuckDB against the sf dir
tables, and diff as column-name-sorted multisets of rows."""
import sys, os, json, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm_cell(v):
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return format(v.normalize(), 'f')
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)

def table_rows(con, query, name=None):
    """(sorted col names, rows in ARRIVAL order with cells in col-name order)."""
    cur = con.sql(query)
    cols = cur.columns
    # The driver's compare renders DuckDB HUGEINT (e.g. SUM(BIGINT)) as a
    # float ("123.0" vs Spark's "123") -> guaranteed hash mismatch even when
    # values agree (bit us in round 5: q119/q120). Flag any oracle whose
    # OUTPUT column is HUGEINT so we add a CAST(... AS BIGINT) in the SQL.
    if name is not None:
        huge = [f"{c}:{t}" for c, t in zip(cols, cur.types) if "HUGEINT" in str(t)]
        if huge:
            raise RuntimeError(f"oracle output has HUGEINT columns {huge}; "
                               "CAST them to BIGINT in the SQL")
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = cur.fetchall()
    return sorted(cols), [tuple(norm_cell(r[i]) for i in order) for r in rows]

def main(sf_dir, out_dir):
    import time
    age = time.time() - os.path.getmtime(os.path.join(out_dir, "oracle_sql.json"))
    print(f"[check] oracle_sql.json written {age:.0f}s ago"
          + (" — STALE? confirm Verify actually reran" if age > 900 else ""))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(pq, "*.parquet")):
            print(f"FAIL {name}: no spark output at {pq}")
            failures += 1
            continue
        try:
            got_cols, got_seq = table_rows(con, f"SELECT * FROM read_parquet('{pq}/*.parquet')")
            want_cols, want_seq = table_rows(con, sql, name=name)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        got, want = sorted(got_seq), sorted(want_seq)
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            failures += 1
        elif got != want:
            ws, gs = set(want), set(got)
            only_got = [r for r in got if r not in ws][:3]
            only_want = [r for r in want if r not in gs][:3]
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}; spark-only={only_got} oracle-only={only_want}")
            failures += 1
        elif got_seq != want_seq:
            # Same multiset, different row ORDER: a driver that hashes rows
            # in arrival order would flag this — surface it as a failure.
            idx = next(i for i, (a, b) in enumerate(zip(got_seq, want_seq)) if a != b)
            print(f"FAIL {name}: row-order mismatch at row {idx}: "
                  f"spark={got_seq[idx]} oracle={want_seq[idx]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
        sys.stdout.flush()
    # rows-only queries
    for pq in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(pq)
        if name in oracle or not os.path.isdir(pq):
            continue
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{pq}/*.parquet')").fetchone()[0]
        status = "OK  " if n > 0 else "FAIL"
        if n == 0: failures += 1
        print(f"{status} {name}: rows-only, {n} rows")
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
