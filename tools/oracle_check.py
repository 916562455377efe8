"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs every registered query's Spark DataFrame and DuckDB SQL on the
same sf dir and compares row count, column names, and values strictly
(rows sorted by all columns; decimals compared by string, floats to
1e-9 relative). Usage:

    python tools/oracle_check.py [sf_dir] [name_prefix...]
"""

from __future__ import annotations

import decimal
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def duck_con(sf_dir: str):
    con = duckdb.connect()
    from torscrapper_spark.queries import TABLES

    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], decimal.Decimal):
                df[c] = df[c].map(lambda v: None if v is None else str(v))
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, na_position="first").reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    errs = []
    if len(a) != len(b):
        return [f"row count {len(a)} vs {len(b)}"]
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns {sorted(a.columns)} vs {sorted(b.columns)}"]
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            aa = pd.to_numeric(av, errors="coerce")
            bb = pd.to_numeric(bv, errors="coerce")
            both_nan = aa.isna() & bb.isna()
            close = both_nan | (
                (aa - bb).abs() <= 1e-9 * (1 + aa.abs() + bb.abs())
            )
            if not close.all():
                i = (~close).idxmax()
                errs.append(f"col {c} float mismatch @{i}: {av[i]!r} vs {bv[i]!r}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                errs.append(f"col {c} mismatch @{i}: {av[i]!r} vs {bv[i]!r}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:]
    from torscrapper_spark.queries import registry
    from torscrapper_spark.session import get_spark

    spark = get_spark("local[8]", shuffle_partitions=16)
    con = duck_con(sf_dir)
    reg = registry()
    n_pass = n_fail = n_rowsonly = 0
    for name, (fn, sql) in sorted(reg.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if sql is None:
            print(f"rows-only {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        errs = compare(sdf, ddf)
        if errs:
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows): " + "; ".join(errs[:3]))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
