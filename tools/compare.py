#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle differential check.

Usage: python3 tools/compare.py <sfdir> <verify_out_dir>
Reads each <out>/<name> parquet (Spark result), runs oracle_sql.json[name]
in DuckDB over the raw tables in <sfdir>, and compares row sets
(columns sorted by name, rows sorted by all columns, floats rounded).
"""
import duckdb, json, math, sys

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v

def rows_of(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    return cols, sorted(tuple(norm(v) for v in r)
                        for r in df.itertuples(index=False, name=None))

ok, fails = 0, []
for name, sql in sorted(oracles.items()):
    try:
        wcols, wrows = rows_of(con.sql(sql))
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    try:
        gcols, grows = rows_of(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'"))
    except Exception as e:
        fails.append((name, f"result read error: {e}"))
        continue
    if gcols != wcols:
        fails.append((name, f"schema mismatch: got {gcols} want {wcols}"))
    elif grows != wrows:
        diff = f"rows got={len(grows)} want={len(wrows)}"
        for i, (g, w) in enumerate(zip(grows, wrows)):
            if g != w:
                diff += f"; first diff at {i}: got {g} want {w}"
                break
        fails.append((name, diff))
    else:
        ok += 1

print(f"OK: {ok}/{len(oracles)}")
for name, msg in fails:
    print(f"FAIL {name}: {msg[:400]}")
sys.exit(1 if fails else 0)
