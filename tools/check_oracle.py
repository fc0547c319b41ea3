#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the tables in <sfDir>,
and compares: column names (sorted), row count, and values (rows sorted,
floats rounded to 9 significant-ish digits). Dev tool only — the engine code
never depends on this.
"""
import sys, json, glob, math
import duckdb

def canon(rows, cols):
    # sort columns by name, stringify values, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): vals.append("nan")
                else: vals.append(f"{v:.6f}")
            elif v is None: vals.append("NULL")
            else: vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        sq = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in sq.description]; srows = sq.fetchall()
        try:
            dq = con.execute(oracle[name])
            dcols = [d[0] for d in dq.description]; drows = dq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}"); n_fail += 1; continue
        a, b = canon(srows, scols), canon(drows, dcols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diff}"); n_fail += 1; continue
        print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
    # queries with no oracle entry get a rows-only note
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
