#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/<name>/ (spark parquet) and <verifyOutDir>/oracle_sql.json,
runs each oracle against DuckDB views over <sfDir>/*.parquet, compares
column-name-sorted, row-sorted values.
"""
import sys, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    # sort columns by name, then rows; normalize floats
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = round(v, 6)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        pq = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not pq:
            results[name] = "NO_SPARK_OUTPUT"; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({pq!r})")
            gcols, grows = canon(got.fetchall(), got.columns)
            want = con.sql(sql)
            wcols, wrows = canon(want.fetchall(), want.columns)
        except Exception as e:
            results[name] = f"ERROR: {e}"; continue
        if gcols != wcols:
            results[name] = f"SCHEMA_MISMATCH spark={gcols} oracle={wcols}"
        elif grows != wrows:
            diff = next((i for i, (a, b) in enumerate(zip(grows, wrows)) if a != b), None)
            results[name] = (f"HASH_MISMATCH rows spark={len(grows)} oracle={len(wrows)}"
                             + (f" first_diff@{diff}: spark={grows[diff]} oracle={wrows[diff]}" if diff is not None else ""))
        else:
            results[name] = f"OK ({len(grows)} rows)"
    # queries without oracle => rows-only
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else 'FAIL':4} {name}: {v}")
    print(f"== {ok}/{len(results)} oracle-matched")
    sys.exit(0 if ok == len(results) else 1)

main()
