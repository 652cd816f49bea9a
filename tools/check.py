#!/usr/bin/env python3
"""Local oracle self-check: replicate the driver's Verify -> DuckDB compare.

Usage:
  python3 tools/check.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or run
with --run to invoke it). For each <outDir>/<name> parquet result, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with views named
after the testdata tables, then compares: column names (sorted), row count,
and per-cell values after a stable sort over all columns.

This is builder-side tooling only — the engine itself is the Scala library.
"""
import decimal, json, math, subprocess, sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def type_class(v):
    """Coarse type class for driver-strict comparison: the driver hashes
    typed values, so int 5 vs float 5.0 (e.g. an uncast DuckDB HUGEINT
    surfacing as float64) must FAIL here too, not pass via Python ==."""
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    return "other"


def compare(name, spark_df, duck_df):
    sc = sorted(spark_df.columns)
    dc = sorted(duck_df.columns)
    if sc != dc:
        return f"SCHEMA mismatch: spark={sc} duck={dc}"
    if len(spark_df) != len(duck_df):
        return f"ROWS mismatch: spark={len(spark_df)} duck={len(duck_df)}"
    a = spark_df[sc].copy()
    b = duck_df[sc].copy()
    # canonicalize: lists -> tuples for sorting, decimals -> str, ts -> str
    for df in (a, b):
        for c in df.columns:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray" else v)
    ar = sorted([tuple(norm_cell(x) for x in row) for row in a.itertuples(index=False, name=None)], key=repr)
    br = sorted([tuple(norm_cell(x) for x in row) for row in b.itertuples(index=False, name=None)], key=repr)
    bad = 0
    first = None
    for i, (x, y) in enumerate(zip(ar, br)):
        for j, (xv, yv) in enumerate(zip(x, y)):
            eq = xv == yv  # exact — the driver hashes, so we demand exact
            if eq and type_class(xv) != type_class(yv):
                eq = False  # int 5 vs float 5.0: driver hashes these apart
            if not eq:
                bad += 1
                if first is None:
                    first = f"row {i} col {sc[j]}: spark={xv!r} duck={yv!r}"
                break
    if bad:
        return f"VALUE mismatch in {bad}/{len(ar)} rows; first: {first}"
    return None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    if "--run" in sys.argv:
        subprocess.run(["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'], check=True, cwd="/root/repo")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    names = sorted(d.name for d in Path(out_dir).iterdir() if d.is_dir())
    for name in names:
        if only and name not in only:
            continue
        spark_df = pd.read_parquet(Path(out_dir) / name)
        if name not in oracles:
            results[name] = f"rows-only: {len(spark_df)} rows" + (" EMPTY!" if len(spark_df) == 0 else "")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        err = compare(name, spark_df, duck_df)
        results[name] = err or "OK"
    for name in sorted(oracles):
        if name not in results and (not only or name in only):
            results[name] = "MISSING spark result (Verify failed?)"
    width = max(len(n) for n in results) if results else 0
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
    for name, v in sorted(results.items()):
        print(f"{name:<{width}}  {v}")
    print(f"-- {n_ok}/{len(results)} ok")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
