#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
parquet tables, and compares: row count, column names, and values
(exact; floats compared exactly first, then with tolerance report).
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # --only-present: skip queries Verify didn't dump (SPARK_GRAFT_ONLY
    # subset runs) instead of flagging them — local iteration aid only;
    # the driver always dumps the full set.
    only_present = "--only-present" in sys.argv
    if only_present:
        import os
        oracle = {n: s for n, s in oracle.items()
                  if os.path.isdir(f"{out_dir}/{n}")}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            failures += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            failures += 1
            continue
        g, e = canon(got), canon(exp)
        ok = True
        for c in g.columns:
            gv, ev = g[c], e[c]
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                ga = gv.astype(float).to_numpy()
                ea = ev.astype(float).to_numpy()
                exact = np.array_equal(ga, ea, equal_nan=True)
                if not exact:
                    with np.errstate(invalid="ignore"):
                        md = np.nanmax(np.abs(ga - ea)) if len(ga) else 0.0
                    print(f"FAIL {name}: col {c} float mismatch, max abs diff {md:.3e}")
                    ok = False
            else:
                gv = gv.astype(object).where(pd.notnull(gv), None)
                ev = ev.astype(object).where(pd.notnull(ev), None)
                neq = [(a, b) for a, b in zip(gv, ev) if a != b and not (a is None and b is None)]
                if neq:
                    print(f"FAIL {name}: col {c} mismatch, e.g. spark={neq[0][0]!r} oracle={neq[0][1]!r} ({len(neq)} rows)")
                    ok = False
        # dtype drift report (informational)
        for c in g.columns:
            if str(g[c].dtype) != str(e[c].dtype):
                print(f"  note {name}: dtype {c}: spark={g[c].dtype} oracle={e[c].dtype}")
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
        else:
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
