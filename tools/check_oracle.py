#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Reads a graft.Verify output dir (one parquet dir per declared query +
oracle_sql.json), runs each oracle SQL in DuckDB against the same parquet
test tables, and compares: schema (column names, sorted), row count, and a
hash of the values with columns sorted by name (mirroring the driver's
compare as documented in the builder prompt).

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>
"""
import json, math, os, sys

import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — mismatch in last ulp is a FAIL
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = []
    for r in rows:
        lines.append("\x1f".join(canon(r[i]) for i in order))
    return sorted(cols), lines


def main(outdir, sfdir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only check)")
            n_skip += 1
            continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchall()
        got_cols = [c[0] for c in con.description]
        try:
            exp = con.execute(oracles[name]).fetchall()
            exp_cols = [c[0] for c in con.description]
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gl = frame_sig(got_cols, got)
        ec, el = frame_sig(exp_cols, exp)
        if gc != ec:
            print(f"FAIL  {name}: columns {gc} != oracle {ec}")
            n_fail += 1
        elif len(gl) != len(el):
            print(f"FAIL  {name}: rows {len(gl)} != oracle {len(el)}")
            n_fail += 1
        elif gl != el:
            bad = next(i for i, (a, b) in enumerate(zip(gl, el)) if a != b)
            print(f"FAIL  {name}: first diff at row {bad}:")
            print(f"      spark:  {gl[bad][:300]}")
            print(f"      oracle: {el[bad][:300]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(gl)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
