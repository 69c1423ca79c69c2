#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, sorts columns by name and rows by all columns, and compares values.
NOT part of the library — local feedback loop only.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            ignore_index=True)
    return df


def type_family(x):
    """Coarse type family for dtype-strict compare (mirrors the driver's
    type-sensitive hash): int-like, float-like, decimal, bool, str, etc."""
    import decimal

    import numpy as np
    if isinstance(x, (bool, np.bool_)):
        return "bool"
    if isinstance(x, (int, np.integer)):
        return "int"
    if isinstance(x, (float, np.floating)):
        return "float"
    if isinstance(x, decimal.Decimal):
        return "decimal"
    # normalize remaining numpy scalars (np.str_, np.bytes_, ...) to their
    # Python equivalents so np.str_ vs str compare as the same family
    if isinstance(x, np.generic):
        return type(x.item()).__name__
    return type(x).__name__


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    import numpy as np
    if isinstance(a, (list, tuple, np.ndarray)) or \
            isinstance(b, (list, tuple, np.ndarray)):
        try:
            la, lb = list(a), list(b)
        except TypeError:
            return False
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    # dtype-strict: an int64 engine value vs a float64/Decimal oracle value
    # is a FAIL even when numerically equal — the driver's hash is typed.
    if type_family(a) != type_family(b):
        return False
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    only_rows = []
    import glob
    import os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    for name in names:
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: cannot read engine output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY" if len(mine) > 0 else "ROWS-ONLY-EMPTY!"
            only_rows.append(f"{status:6s} {name}: {len(mine)} rows")
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(mine), canon(oracle)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs oracle "
                  f"{list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: {len(a)} rows vs oracle {len(b)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(a)):
            for c in a.columns:
                va, vb = a[c].iloc[i], b[c].iloc[i]
                if not cell_eq(va, vb):
                    bad = (i, c, va, vb)
                    break
            if bad:
                break
        if bad:
            i, c, va, vb = bad
            print(f"FAIL {name}: row {i} col {c}: engine={va!r} "
                  f"oracle={vb!r}")
            n_fail += 1
        else:
            print(f"PASS   {name}: {len(a)} rows")
            n_pass += 1
    for line in only_rows:
        print(line)
    print(f"\n{n_pass} pass, {n_fail} fail, {len(only_rows)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
