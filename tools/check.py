#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query output parquet, runs the oracle SQL in DuckDB over the same
test tables, sorts columns by name and rows by all values, and compares
exactly. Usage: python3 tools/check.py <sfDir> <outDir> [onlyPrefixes]

Env knobs (local large-SF gates only; the driver never sets them):
  CHECK_SKIP=q142_,q94_   comma prefixes to skip (counted as skipped)
  CHECK_MATERIALIZE=1     rewrite `<name> AS (` -> `<name> AS MATERIALIZED (`
                          in oracle CTEs — semantically identical, but stops
                          DuckDB's CTE inlining from re-evaluating a chained
                          self-join CTE exponentially at large SF
"""
import sys, json, glob, os, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def materialize_ctes(sql):
    """Insert MATERIALIZED after each top-level CTE's AS in the WITH
    prelude only — a blanket `\\w+ AS (` regex also rewrites WINDOW
    clauses (`WINDOW w AS (...)`), which is a parse error. Walks the
    prelude: `name AS (`, skip the balanced body, `,` continues. The
    body walk skips single-quoted string literals (with '' escapes) and
    `--` line comments — a paren inside either would otherwise
    desynchronize the depth count and silently leave later CTEs
    unmaterialized (still-valid SQL, so the only symptom was the
    exponential re-evaluation this knob exists to prevent)."""
    m = re.match(r"\s*WITH\s+", sql, re.I)
    if not m:
        return sql
    out, i = [sql[:m.end()]], m.end()
    while True:
        h = re.match(r"(\w+\s+AS\s+)\(", sql[i:], re.I)
        if not h:
            break
        out.append(h.group(1) + "MATERIALIZED (")
        i += h.end()
        depth = 1
        while i < len(sql) and depth:
            c = sql[i]
            if c == "'":
                j = i + 1
                while j < len(sql):
                    if sql[j] == "'":
                        if j + 1 < len(sql) and sql[j + 1] == "'":
                            j += 2  # doubled-quote escape stays in-string
                            continue
                        break
                    j += 1
                out.append(sql[i:j + 1])
                i = j + 1
                continue
            if c == "-" and sql[i:i + 2] == "--":
                j = sql.find("\n", i)
                j = len(sql) if j < 0 else j
                out.append(sql[i:j])
                i = j
                continue
            depth += 1 if c == "(" else (-1 if c == ")" else 0)
            out.append(c)
            i += 1
        t = re.match(r"\s*,\s*", sql[i:])
        if not t:
            break
        out.append(sql[i:i + t.end()])
        i += t.end()
    out.append(sql[i:])
    return "".join(out)

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    skips = [s for s in os.environ.get("CHECK_SKIP", "").split(",") if s]
    onlyp = [s for s in (only or "").split(",") if s]
    materialize = os.environ.get("CHECK_MATERIALIZE") == "1"
    for t in TABLES:
        # ScaleUp-built corpora write each table as a DIRECTORY of part
        # files; driver testdata is a single file per table
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    skipped = 0
    filtered = 0
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if onlyp and not any(name.startswith(p) for p in onlyp):
            filtered += 1
            continue
        if any(name.startswith(p) for p in skips):
            print(f"SKIP {name}"); skipped += 1; continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"NOOUT {name}"); fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name not in oracle:
            print(f"rows-only {name}: {len(got)} rows")
            continue
        sql = oracle[name]
        if materialize and sql.lstrip().upper().startswith("WITH"):
            sql = materialize_ctes(sql)
        try:
            exp = con.sql(sql).df()
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
    print(f"\n{ok} ok, {fail} failed"
          + (f", {skipped} skipped" if skipped else "")
          + (f", {filtered} filtered out by prefix" if filtered else ""))
    # a typo'd onlyPrefixes must not read as a passing gate over zero queries
    if onlyp and ok + fail + skipped == 0:
        print(f"ERROR: onlyPrefixes {onlyp} matched no query outputs")
        return 1
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
