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
    body walk skips single-quoted string literals (with '' escapes),
    double-quoted identifiers (with "" escapes), and `--` line
    comments — a paren inside any of them would otherwise
    desynchronize the depth count and silently leave later CTEs
    unmaterialized (still-valid SQL, so the only symptom was the
    exponential re-evaluation this knob exists to prevent). Handles
    `WITH RECURSIVE` preludes and column-aliased heads
    (`name(cols) AS (`) — DuckDB accepts AS MATERIALIZED on both,
    probed incl. a genuinely recursive CTE. If the walk materializes
    fewer heads than a whole-text `name AS (` count (WINDOW clauses
    excluded), a stderr warning flags the query — a future CTE syntax
    the head regex doesn't know would otherwise degrade silently to
    slow-but-correct (exactly how the RECURSIVE gap hid: 6 registry
    oracles, two with 11-14 CTEs each, ran fully inlined at sf1).
    Known benign warning: a NESTED `WITH` prelude inside a CTE body is
    left inlined (only the top-level prelude is walked) and counts as
    unmaterialized."""
    m = re.match(r"\s*WITH\s+(?:RECURSIVE\s+)?", sql, re.I)
    if not m:
        return sql

    def skip_quoted(q, start):
        # returns index just past the closing quote char q (doubled-q
        # escapes stay inside); len(sql) if unterminated
        j = start + 1
        while j < len(sql):
            if sql[j] == q:
                if j + 1 < len(sql) and sql[j + 1] == q:
                    j += 2
                    continue
                break
            j += 1
        return j + 1

    out, i = [sql[:m.end()]], m.end()
    done = 0
    while True:
        h = re.match(r"(\w+\s*(?:\([^()]*\))?\s*AS\s+)\(", sql[i:], re.I)
        if not h:
            break
        out.append(h.group(1) + "MATERIALIZED (")
        done += 1
        i += h.end()
        depth = 1
        while i < len(sql) and depth:
            c = sql[i]
            if c == "'" or c == '"':
                j = skip_quoted(c, i)
                out.append(sql[i:j])
                i = j
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
    # early-termination canary: count CTE-shaped heads in the whole text
    # (minus named-WINDOW heads) and warn when the walk covered fewer.
    # Coarse by design — a false positive is one stderr line pointing a
    # human at the query; a miss here was previously invisible.
    expected = 0
    for hm in re.finditer(r"(\w+)\s+AS\s*\(", sql, re.I):
        if re.search(r"(?i)\bWINDOW\s*$", sql[:hm.start()]):
            continue
        expected += 1
    if done < expected:
        print(f"WARN materialize_ctes: materialized {done} of ~{expected} "
              f"'name AS (' heads — prelude walk may have terminated early; "
              f"oracle stays correct but may re-evaluate inlined CTEs",
              file=sys.stderr)
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
