#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Verify parquet output, sort
columns by name + sort rows, and compare value hashes."""
import sys, json, glob, hashlib
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def pandas_rows(rel):
    """Materialize a DuckDB relation the way the driver does: through
    pandas. This preserves the driver's type artifacts (e.g. HUGEINT ->
    float64, so sum(BIGINT) reprs as '3500.0'), which fetchall() hides."""
    df = rel.df()
    cols = [c.lower() for c in df.columns]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(tuple(v.item() if hasattr(v, "item") else v for v in tup))
    return rows, cols

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    h = hashlib.md5()
    for r in out:
        h.update("|".join(r).encode())
    return h.hexdigest(), len(out)

fails = 0
for name in sorted(json.load(open(f"{out_dir}/oracle_sql.json"))):
    sql = oracle[name]
    try:
        orows, ocols = pandas_rows(con.sql(sql))
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    try:
        srows, scols = pandas_rows(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
    except Exception as e:
        print(f"FAIL {name}: spark output missing {e}"); fails += 1; continue
    if sorted(ocols) != sorted(scols):
        print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}"); fails += 1; continue
    oh, on = canon(orows, ocols)
    sh, sn = canon(srows, scols)
    if on != sn:
        print(f"FAIL {name}: rows oracle={on} spark={sn}"); fails += 1
    elif oh != sh:
        print(f"FAIL {name}: hash mismatch ({on} rows)"); fails += 1
        # show first differing rows
        oset = set("|".join(tuple(repr(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))) for r in orows)
        sset = set("|".join(tuple(repr(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))) for r in srows)
        for x in list(oset - sset)[:3]: print(f"   oracle-only: {x}")
        for x in list(sset - oset)[:3]: print(f"   spark-only:  {x}")
    else:
        print(f"OK   {name} ({on} rows)")
# rows-only checks for queries without oracle
import os
for d in sorted(os.listdir(out_dir)):
    full = f"{out_dir}/{d}"
    if os.path.isdir(full) and d not in oracle:
        try:
            n = con.sql(f"SELECT count(*) FROM '{full}/*.parquet'").fetchone()[0]
            print(f"ROWS {d}: {n} {'OK' if n > 0 else 'EMPTY!'}")
        except Exception as e:
            print(f"ROWS {d}: error {e}")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
