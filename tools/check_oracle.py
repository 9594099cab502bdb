#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate.

Usage: python tools/check_oracle.py <verify_out_dir> <sf_dir>

For each query dir under <verify_out_dir>: load the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB over the same
testdata, sort columns by name and rows by all columns, and compare
row count, schema width, and cell values (exact for non-floats, 1e-9
relative for floats). Prints one line per query + a summary.
"""
import sys, os, json, glob, math
import duckdb

def norm(rows):
    return [tuple(r) for r in rows]

# The driver's gate HASHES cell values — exact match, no tolerance. Default
# to the same strictness so a .5-rounding-boundary flip fails locally too;
# GRAFT_ORACLE_TOL=1 restores the loose 1e-9 mode for triage.
STRICT = os.environ.get("GRAFT_ORACLE_TOL", "") != "1"

def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if STRICT:
            return repr(fa) == repr(fb)
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*/"))):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark output parquet"); n_fail += 1; continue
        sq = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"SKIP  {name}: no oracle (rows={len(sq)})")
            n_noracle += 1
            continue
        try:
            dq = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        sq = sq[sorted(sq.columns)]
        dq = dq[sorted(dq.columns)]
        if list(sq.columns) != list(dq.columns):
            print(f"FAIL  {name}: cols spark={list(sq.columns)} duck={list(dq.columns)}")
            n_fail += 1; continue
        srows = sorted(norm(sq.itertuples(index=False)), key=lambda r: tuple(str(x) for x in r))
        drows = sorted(norm(dq.itertuples(index=False)), key=lambda r: tuple(str(x) for x in r))
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(drows)}")
            n_fail += 1; continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            if not all(cells_equal(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr); break
        if bad:
            print(f"FAIL  {name}: row {bad[0]} spark={bad[1]} duck={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
