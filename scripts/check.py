#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir] [oracle_timeout_sec]

1. (caller already ran) graft.Verify to dump each SparkEntry.queries
   result as parquet under outdir + oracle_sql.json.
2. For each query with an oracle: run the SQL in DuckDB over views named
   after the sfdir parquet tables, sort columns by name, sort rows, and
   compare EXACTLY — the driver's gate hashes rendered values, so this
   gate renders every cell to a canonical string (type-tagged: a
   Decimal('0.0494000') renders differently from the float 0.0494) and
   requires bit-identical representation. A numeric-only near-miss is
   reported as REPR_MISMATCH with the offending cells so the divergence
   class (decimal-vs-double, float noise) is visible at a glance.
"""
import glob
import json
import math
import os
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if not len(df):
        # DataFrame.apply on an empty frame raises (apply_empty_result
        # wraps an empty list in a columns-indexed Series); nothing to
        # sort anyway
        return df.reset_index(drop=True)
    # sort on rendered reprs, not raw values: mixed object columns
    # (Decimal vs float) and array columns are not totally ordered
    key = df.apply(lambda col: [cell_repr(v) for v in col], axis=0)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)


def cell_repr(v) -> str:
    """Canonical, type-tagged rendering — two cells hash-equal for the
    driver iff they render equal here. float and Decimal deliberately
    render differently: that is exactly the class the tolerant v1 of
    this gate let ship (r5's decimal-output regression)."""
    if v is None:
        return "␀"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "f:nan"
        return f"f:{f!r}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(cell_repr(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    # pd.NA / NaT and other scalar nulls
    try:
        if pd.isna(v):
            return "␀"
    except (TypeError, ValueError):
        pass
    return f"s:{v}"


def cells_close(a, b) -> bool:
    """Numeric near-equality — used only to CLASSIFY a failure (exact
    repr already diverged), never to pass it."""
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    try:
        af, bf = float(a), float(b)
    except (TypeError, ValueError):
        return False
    if math.isnan(af) and math.isnan(bf):
        return True
    return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))


def dtype_tag(col: pd.Series) -> str:
    """Representation-CLASS tag for a column. Widths are normalized
    (int32 == int64, float32 == float64) because the driver hashes
    rendered VALUES — `1` hashes equal across integer widths (its r05
    gate passed Spark's int32 rank vs DuckDB's int64), while a parquet
    DECIMAL renders `0.0494000` vs the DOUBLE's `0.0494` and fails.
    Width-level precision divergence (a float32 that can't represent
    the oracle's double) is still caught by the per-cell repr compare."""
    base = str(col.dtype)
    # unit/zone normalization: pandas read_parquet of Spark output is
    # datetime64[ns] while duckdb .df() yields datetime64[us] — a width
    # detail like int32/int64; the per-cell repr compare still catches
    # real value divergence
    if base.startswith("datetime64"):
        return "datetime"
    if base == "object":
        nn = col.dropna()
        if not len(nn):
            return "object<null>"  # caller treats as wildcard
        t = type(nn.iloc[0]).__name__
        if t == "int":
            return "int"
        if t == "float":
            return "float"
        # container-class normalization: list-valued parquet columns come
        # back as ndarray from pandas but list from duckdb .df()
        if t in ("ndarray", "list", "tuple"):
            return "array"
        return f"object<{t}>"
    if base.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if base.startswith(("float", "Float")):
        return "float"
    return base


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
        # dtype gate: representation class must match before values do
        dt_bad = []
        for c in m.columns:
            tm, to = dtype_tag(m[c]), dtype_tag(o[c])
            if tm != to and "object<null>" not in (tm, to):
                dt_bad.append(f"{c}({tm}!={to})")
        if dt_bad:
            results[name] = f"DTYPE_MISMATCH {','.join(dt_bad)}"
            continue
        # exact representation compare (the driver hashes values — a
        # representational divergence fails its gate even when every
        # cell is numerically equal)
        exact_bad, near_only = [], []
        for col in m.columns:
            mv, ov = m[col].tolist(), o[col].tolist()
            nbad = nnear = 0
            sample = None
            for a, b in zip(mv, ov):
                if cell_repr(a) == cell_repr(b):
                    continue
                nbad += 1
                if sample is None:
                    sample = f"{cell_repr(a)} vs {cell_repr(b)}"
                if cells_close(a, b):
                    nnear += 1
            if nbad:
                exact_bad.append(f"{col}:{nbad} (e.g. {sample})")
                if nnear == nbad:
                    near_only.append(col)
        if not exact_bad:
            results[name] = "OK"
        elif near_only and len(near_only) == len(exact_bad):
            results[name] = ("REPR_MISMATCH (numerically equal, representation "
                             f"differs) {'; '.join(exact_bad)}")
        else:
            results[name] = f"VALUE_MISMATCH {'; '.join(exact_bad)}"

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
