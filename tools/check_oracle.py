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
    type_manifest = {}   # name -> {"spark": {col: t}, "oracle": {col: t}}
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
        stypes = {f.name: str(f.type) for f in sq.arrow().schema}
        sq = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in sq.description]; srows = sq.fetchall()
        try:
            dq = con.execute(oracle[name])
            dtypes = {f.name: str(f.type) for f in dq.arrow().schema}
            dq = con.execute(oracle[name])
            dcols = [d[0] for d in dq.description]; drows = dq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        type_manifest[name] = {"spark": stypes, "oracle": dtypes}
        # --- driver-harness compatibility gates (the r8 failure modes) ---
        # 1. nested Spark columns crash the driver's pandas sort_values
        bad_nested = [c for c, t in stypes.items()
                      if t.startswith(("list", "struct", "map", "large_list"))]
        if bad_nested:
            print(f"FAIL {name}: nested spark columns {bad_nested} "
                  f"(driver pandas cannot sort ndarray cells)"); n_fail += 1; continue
        # 2. decimal/hugeint oracle columns render '3.0' vs Spark int64 '3'
        #    in the driver's pandas layer -> hash mismatch (uncast sum())
        bad_dec = [c for c, t in dtypes.items()
                   if t.startswith("decimal") or t in ("int128", "uint64")]
        if bad_dec:
            print(f"FAIL {name}: oracle columns {bad_dec} typed "
                  f"{[dtypes[c] for c in bad_dec]} — wrap in CAST(... AS BIGINT)")
            n_fail += 1; continue
        # 3. same-name columns must agree on integer-vs-float family
        fam = lambda t: ("int" if t.startswith(("int", "uint")) else
                         "float" if t in ("float", "double", "halffloat") else t)
        mism = [c for c in stypes if c in dtypes and fam(stypes[c]) != fam(dtypes[c])]
        if mism:
            print(f"FAIL {name}: dtype family mismatch "
                  f"{[(c, stypes[c], dtypes[c]) for c in mism]}"); n_fail += 1; continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}"); n_fail += 1; continue
        a, b = canon(srows, scols), canon(drows, dcols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diff}"); n_fail += 1; continue
        print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
    # persist the type manifest; HarnessCompatSpec (ScalaTest) re-validates
    # it so a decimal/hugeint/nested column becomes a test-suite failure,
    # not a driver-artifact surprise (regenerate whenever oracles change,
    # same discipline as OperatorCatalog)
    import os
    manifest_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "oracle_types.json")
    # MERGE into the existing manifest: a SPARK_GRAFT_ONLY subset run must
    # refresh only the queries it actually checked, not clobber the rest
    merged = {}
    if os.path.exists(manifest_path):
        try:
            merged = json.load(open(manifest_path))
        except Exception:
            merged = {}
    merged.update(type_manifest)
    # drop entries for queries that no longer exist
    merged = {k: v for k, v in merged.items() if k in oracle or k in type_manifest}
    with open(manifest_path, "w") as f:
        json.dump({k: merged[k] for k in sorted(merged)}, f,
                  indent=1, sort_keys=True)
    print(f"wrote {manifest_path} ({len(type_manifest)} checked, {len(merged)} total)")
    # queries with no oracle entry get a rows-only note
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
