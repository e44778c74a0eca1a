#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare each
Verify-dumped parquet against its DuckDB oracle on the same sf dir.

Usage: python3 dev/check.py <sfDir> <verifyOutDir>
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
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    rows = df.sort_values(by=list(df.columns), kind="mergesort",
                          na_position="first").reset_index(drop=True)
    return rows


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = f"SPARK-MISSING ({type(e).__name__})"
            continue
        try:
            ref = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-ERR {e}"
            continue
        a, b = canon(mine), canon(ref)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA a={list(a.columns)} b={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWS mine={len(a)} oracle={len(b)}"
            continue
        bad = None
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                if not cell_eq(x, y):
                    bad = f"VALUE col={c} row={i}: mine={x!r} oracle={y!r}"
                    break
            if bad:
                break
        results[name] = bad or f"OK ({len(a)} rows)"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        flag = "  " if v.startswith("OK") else "❌"
        print(f"{flag} {name}: {v}")
    print(f"\n{n_ok}/{len(results)} oracle-checked queries OK")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
