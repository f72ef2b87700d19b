#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet outputs
against SparkEntry.oracleSql executed in DuckDB over the same sf dir.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Compares per query: row count, column names (sorted), and a value hash over
rows sorted by all columns (floats compared exactly after the engine-side
rounding — any mismatch prints the first differing rows).
"""
import sys, json, glob, os
import duckdb

def norm_rows(rows):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted([tuple(r) for r in rows], key=key)

def canon(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = n_noorc = 0
    for qdir in sorted(glob.glob(f"{out}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        got_rel = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        got_cols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got)}")
            n_noorc += 1
            if len(got) == 0:
                print(f"  !! EMPTY RESULT for rows-only query {name}")
                n_fail += 1
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # sort columns by name on both sides (driver contract)
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        if sorted(got_cols) != sorted(exp_cols):
            print(f"[FAIL] {name}: column mismatch {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1
            continue
        # column TYPES too (driver schema_match): DuckDB silently widens e.g.
        # SUM(BIGINT) to HUGEINT, which string-compared values never reveal.
        # (DBAPI description collapses everything to 'NUMBER' — DESCRIBE
        # gives the real types.)
        def types_of(sql):
            return {r[0]: r[1].upper() for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        got_types = types_of(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        exp_types = types_of(oracle[name])
        tbad = {c: (got_types[c], exp_types[c]) for c in got_cols
                if got_types[c] != exp_types[c]}
        if tbad:
            print(f"[FAIL] {name}: column TYPE mismatch (engine vs oracle): {tbad}")
            n_fail += 1
            continue
        g = norm_rows([[canon(r[i]) for i in gidx] for r in got])
        e = norm_rows([[canon(r[i]) for i in eidx] for r in exp])
        if len(g) != len(e):
            print(f"[FAIL] {name}: row count {len(g)} vs {len(e)}")
            diff = [r for r in g[:2000] if r not in set(map(tuple, e[:2000]))][:3]
            print(f"   sample got-not-expected: {diff}")
            n_fail += 1
        elif g != e:
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"[FAIL] {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: rows={len(g)}")
            n_pass += 1
    print(f"\nSUMMARY: pass={n_pass} fail={n_fail} rows_only={n_noorc}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
