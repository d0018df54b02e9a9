#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Reads a graft.Verify output dir (one parquet dir per declared query +
oracle_sql.json), runs each oracle SQL in DuckDB against the same parquet
test tables, and compares: schema (column names, sorted), row count, and a
hash of the values with columns sorted by name (mirroring the driver's
compare as documented in the builder prompt).

Both sides are materialized through pandas (`duckdb .df()`), because that is
what the driver does — and the conversion is part of the contract:
  * DuckDB HUGEINT (the result type of SUM(BIGINT)) becomes float64, so an
    uncast SUM in oracle SQL hash-mismatches Spark's int64 ("123.0" vs
    "123") even though fetchall()-based comparison would pass.
  * pandas sort_values cannot hash array cells (TypeError: unhashable
    numpy.ndarray), so declared queries must not expose array columns.
Running the same path locally surfaces both failure classes before the
driver does (both bit round 4: q_corpus_report/q_sample_weighted,
q_inverted_index).

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>
"""
import json, math, os, sys

import duckdb
import pandas as pd


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))  # full precision — last-ulp diff is a FAIL
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_sig(df):
    """Sorted-columns, pandas-sorted-rows canonical lines (driver model)."""
    df = df[sorted(df.columns)]
    # The driver sorts rows with pandas; unhashable cells (arrays) raise
    # TypeError here exactly as they do in the driver's harness.
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    lines = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for v in row:
            # normalize pandas NaT/NaN scalars that aren't plain float
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NaN" if isinstance(v, float) else "NULL")
            elif v is pd.NaT:
                vals.append("NULL")
            elif hasattr(v, "item") and not isinstance(v, (bytes, str)):
                vals.append(canon(v.item()))
            else:
                vals.append(canon(v))
        lines.append("\x1f".join(vals))
    # Sort the CANONICAL lines: values that compare equal on raw sort but
    # canonicalize differently (-0.0 vs 0.0, int 1 vs float 1.0 in object
    # columns) would otherwise land in engine-dependent order under the
    # stable mergesort, flipping the positional compare.
    return list(df.columns), sorted(lines)


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
    # Per-SF row-count pins for the rows-only keys (ADVICE r13 #2; sf0.1
    # layer VERDICT r17 #3): a key without an oracle still gets an exact
    # size check instead of a SKIP. Verify exports the pins matching the
    # SF it ran at (sf0.01 and sf0.1 are pinned; other SFs export none),
    # so this gate just loads whatever the paired Verify run wrote.
    pins = {}
    hash_exp, hash_act = {}, {}
    if os.path.basename(os.path.normpath(sfdir)) in ("sf0.01", "sf0.1"):
        try:
            with open(f"{outdir}/expected_rows.json") as f:
                pins = json.load(f)
        except FileNotFoundError:
            pass
        # content-hash pins (VERDICT r14 #2): Verify computes each pinned
        # key's canonical Spark-side hash from the SAME dumped parquet this
        # gate reads; a rows-only key whose content silently drifts now
        # FAILS here instead of passing on its (structurally invariant)
        # row count alone.
        try:
            with open(f"{outdir}/expected_hashes.json") as f:
                hash_exp = json.load(f)
            with open(f"{outdir}/actual_hashes.json") as f:
                hash_act = json.load(f)
        except FileNotFoundError:
            pass
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        if name not in oracles:
            if name in pins:
                # same continue-on-error contract as the oracle branch: one
                # unreadable output dir must not abort the remaining keys
                try:
                    n = con.execute(
                        f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                except Exception as e:
                    print(f"FAIL  {name}: pinned-count read error: {e}")
                    n_fail += 1
                    continue
                if n != pins[name]:
                    print(f"FAIL  {name}: rows {n} != pinned {pins[name]}")
                    n_fail += 1
                elif name in hash_exp and name not in hash_act:
                    print(f"FAIL  {name}: hash-pinned but Verify produced no "
                          "actual hash (hash computation failed?)")
                    n_fail += 1
                elif hash_act.get(name, hash_exp.get(name)) != hash_exp.get(name):
                    print(f"FAIL  {name}: content hash {hash_act[name]} != "
                          f"pinned {hash_exp[name]}")
                    n_fail += 1
                else:
                    tag = ("pinned count+hash" if name in hash_exp
                           else "pinned count, no oracle")
                    print(f"PASS  {name}: {n} rows ({tag})")
                    n_pass += 1
            else:
                print(f"SKIP  {name}: no oracle (rows-only check)")
                n_skip += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
            gc, gl = frame_sig(got)
        except Exception as e:
            print(f"FAIL  {name}: spark-side read/sort error: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
            ec, el = frame_sig(exp)
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL/sort error: {e}")
            n_fail += 1
            continue
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
