#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over the
same sfDir parquet tables, and compares values column-by-column
(columns sorted by name, exact equality; floats compared bitwise-ish
via == so any FP drift shows up).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in oracles:
        if not os.path.isdir(os.path.join(out_dir, name)):
            results[name] = "MISSING_RESULT (query failed in Verify)"
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)]) if files else pd.DataFrame()
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if len(got) == 0 else "")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        results[name] = compare(got, exp)

    fails = 0
    for name, r in sorted(results.items()):
        ok = r == "OK" or r.startswith("ROWS_ONLY rows=") and not r.endswith("EMPTY!")
        if not ok:
            fails += 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: {r}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    return 1 if fails else 0


def compare(got, exp):
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        return f"SCHEMA got={gc} exp={ec}"
    if len(got) != len(exp):
        return f"ROWCOUNT got={len(got)} exp={len(exp)}"
    got = got[gc].reset_index(drop=True)
    exp = exp[ec].reset_index(drop=True)
    # Dtype-strict: the driver's hash is type-sensitive (DuckDB SUM(int) ->
    # HUGEINT vs Spark BIGINT slipped through pandas == coercion in round 1).
    for c in gc:
        gd, ed = str(got[c].dtype), str(exp[c].dtype)
        if gd != ed and "object" not in (gd, ed):
            return f"DTYPE col={c} got={gd} exp={ed}"
    for c in gc:
        g, e = got[c], exp[c]
        for i in range(len(g)):
            gv, ev = g.iloc[i], e.iloc[i]
            if gv is None or (isinstance(gv, float) and math.isnan(gv)):
                if ev is None or (isinstance(ev, float) and math.isnan(ev)):
                    continue
                return f"VALUE col={c} row={i} got=NULL exp={ev!r}"
            try:
                same = gv == ev
                if hasattr(same, "all"):
                    same = bool(same.all())
            except Exception:
                same = str(gv) == str(ev)
            if not same:
                return f"VALUE col={c} row={i} got={gv!r} exp={ev!r}"
    return "OK"


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
