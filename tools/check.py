#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query output parquet, runs the oracle SQL in DuckDB over the same
test tables, sorts columns by name and rows by all values, and compares
exactly. Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"NOOUT {name}"); fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name not in oracle:
            print(f"rows-only {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"SCHEMA {name}: got {list(g.columns)} want {list(e.columns)}")
            fail += 1; continue
        if len(g) != len(e):
            print(f"ROWS {name}: got {len(g)} want {len(e)}"); fail += 1; continue
        try:
            same = g.equals(e)
            if not same:
                # dtype-tolerant retry (int32 vs int64 etc.)
                same = all(
                    (g[c].astype(str).values == e[c].astype(str).values).all()
                    for c in g.columns)
        except Exception as ex:
            print(f"CMP-ERR {name}: {ex}"); fail += 1; continue
        if same:
            print(f"OK {name} ({len(g)} rows)"); ok += 1
        else:
            diff = [c for c in g.columns
                    if not (g[c].astype(str).values == e[c].astype(str).values).all()]
            print(f"VALUES {name}: mismatched cols {diff}")
            for c in diff[:2]:
                m = (g[c].astype(str).values != e[c].astype(str).values)
                print("   got:", g[m].head(3).to_dict("records"))
                print("  want:", e[m].head(3).to_dict("records"))
            fail += 1
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
