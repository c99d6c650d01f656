#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir]

1. (caller already ran) graft.Verify to dump each SparkEntry.queries
   result as parquet under outdir + oracle_sql.json.
2. For each query with an oracle: run the SQL in DuckDB over views named
   after the sfdir parquet tables, sort columns by name, sort rows,
   compare cell-by-cell (exact for non-floats, 1e-9 rel for floats).
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return a == b


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    # optional per-oracle timeout (seconds): at large sf some oracles
    # are deliberately quadratic (all-pairs jaccard) and cannot finish;
    # they report ORACLE_TIMEOUT instead of hanging the run
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 0

    def connect():
        c = duckdb.connect()
        for t in TABLES:
            p = f"{sfdir}/{t}.parquet"
            if os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c

    con = connect()

    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        mine = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(mine)})"
            continue
        timer = None
        fired = None
        if timeout > 0:
            import threading
            fired = threading.Event()
            cur = con

            def _interrupt():
                fired.set()
                cur.interrupt()

            timer = threading.Timer(timeout, _interrupt)
            timer.start()
        try:
            oracle = con.execute(oracles[name]).df()
        except duckdb.InterruptException:
            results[name] = f"ORACLE_TIMEOUT({timeout:.0f}s)"
            continue
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        finally:
            if timer is not None:
                timer.cancel()
                timer.join()  # wait out an in-flight callback
                if fired.is_set():
                    # the timer raced execute() returning: a stale
                    # interrupt may be parked on the connection and would
                    # kill the NEXT oracle instantly — rebuild it
                    con = connect()
        m, o = canon(mine), canon(oracle)
        if list(m.columns) != list(o.columns):
            results[name] = f"SCHEMA_MISMATCH mine={list(m.columns)} oracle={list(o.columns)}"
            continue
        if len(m) != len(o):
            results[name] = f"ROWCOUNT_MISMATCH mine={len(m)} oracle={len(o)}"
            continue
        bad = []
        for col in m.columns:
            mv, ov = m[col].tolist(), o[col].tolist()
            nbad = sum(0 if cells_equal(a, b) else 1 for a, b in zip(mv, ov))
            if nbad:
                bad.append(f"{col}:{nbad}")
        results[name] = "OK" if not bad else f"VALUE_MISMATCH {','.join(bad)}"

    npass = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY"))
    nskip = sum(1 for v in results.values() if v.startswith("ORACLE_TIMEOUT"))
    for name, res in sorted(results.items()):
        tag = ("PASS" if res == "OK" or res.startswith("ROWS_ONLY")
               else "SKIP" if res.startswith("ORACLE_TIMEOUT") else "FAIL")
        print(f"{tag:4} {name}: {res}")
    print(f"\n{npass}/{len(results)} pass" + (f" ({nskip} oracle-timeout)" if nskip else ""))
    sys.exit(0 if npass + nskip == len(results) else 1)


if __name__ == "__main__":
    main()
