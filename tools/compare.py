#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sfDir parquet tables and compare with the Verify parquet
dumps (schema by sorted column names, values by row-set hash)."""
import sys, json, glob, hashlib
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {q}: oracle SQL error: {e}")
        fails += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{q}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {q}: engine output unreadable: {e}")
        fails += 1
        continue
    wcols, gcols = sorted(want.columns), sorted(got.columns)
    if wcols != gcols:
        print(f"FAIL {q}: schema mismatch oracle={wcols} engine={gcols}")
        fails += 1
        continue
    w = want[wcols].sort_values(wcols).reset_index(drop=True)
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    if len(w) != len(g):
        print(f"FAIL {q}: row count oracle={len(w)} engine={len(g)}")
        fails += 1
        continue
    def h(df):
        return hashlib.md5(
            "\n".join(",".join(str(v) for v in r) for r in df.itertuples(index=False))
            .encode()).hexdigest()
    if h(w) != h(g):
        diff = (w.astype(str) != g.astype(str))
        bad = diff.any(axis=1)
        print(f"FAIL {q}: value mismatch in {bad.sum()}/{len(w)} rows; first:")
        print("  oracle:", w[bad].head(3).to_dict("records"))
        print("  engine:", g[bad].head(3).to_dict("records"))
        fails += 1
    else:
        print(f"OK   {q}: {len(w)} rows")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
