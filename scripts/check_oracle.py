#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle SQL
in DuckDB over /root/testdata/sf*/ tables and compare against the parquet
dumps produced by graft.Verify (column names sorted, values hashed row-wise,
like the driver). Usage: check_oracle.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
# optional 3rd arg: comma-separated query names to skip (e.g. the
# recursive-CTE keeper oracles, which DuckDB can't evaluate at sf0.1
# in reasonable time)
skip_names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
n_pass = n_fail = n_skip = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    if name in skip_names:
        print(f"SKIP  {name}: excluded by arg")
        n_skip += 1
        continue
    got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    if name not in oracle:
        print(f"SKIP  {name}: rows={len(got)} (no oracle, rows-only)")
        n_skip += 1
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL  {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    ok = True
    if list(got.columns) != list(exp.columns):
        print(f"FAIL  {name}: columns {list(got.columns)} != {list(exp.columns)}")
        ok = False
    elif len(got) != len(exp):
        print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
        ok = False
    else:
        ga = got.astype(str).values
        ea = exp.astype(str).values
        diff = (ga != ea)
        if diff.any():
            idx = list(zip(*diff.nonzero()))[:5]
            print(f"FAIL  {name}: {diff.sum()} cell diffs, e.g.:")
            for r, c in idx:
                print(f"      row {r} col {got.columns[c]}: spark={ga[r][c]!r} duck={ea[r][c]!r}")
            ok = False
    if ok:
        print(f"PASS  {name}: {len(got)} rows")
        n_pass += 1
    else:
        n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
sys.exit(1 if n_fail else 0)
