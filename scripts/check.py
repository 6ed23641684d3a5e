#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare row-sets. Usage:
    python3 scripts/check.py <sfDir> <verifyOutDir> [queryName...]
"""
import sys, json, glob, os, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({pq!r})").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: schema {gcols} vs {wcols}"); n_fail += 1; continue
        # dtype families must agree too (the driver's schema_match may check)
        def fam(dt):
            k = str(dt)
            if "int" in k: return "int"
            if "float" in k or "double" in k: return "float"
            if "bool" in k: return "bool"
            if "datetime" in k or "date" in k: return "datetime"
            return "obj"
        mism = [(c, str(got[c].dtype), str(want[c].dtype)) for c in gcols
                if fam(got[c].dtype) != fam(want[c].dtype)]
        if mism:
            print(f"WARN {name}: dtype families differ: {mism}")
        g = sorted(tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False, name=None))
        w = sorted(tuple(norm(v) for v in row) for row in want[wcols].itertuples(index=False, name=None))
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        if g != w:
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}"); n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
