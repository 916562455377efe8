"""Local stand-in for the driver's DuckDB-oracle comparison — STRICT.

Round-1 lesson (VERDICT.md "What's wrong" #1): the driver's value-hash
is representation-sensitive — a Spark int64 column and a DuckDB column
that widened to HUGEINT/DECIMAL(38,4) and came back from ``.df()`` as
float64 hash differently even when every value is equal. Round 1's
checker coerced both sides to float before comparing, which hid exactly
that class of mismatch and shipped 14 hash-fail queries.

This version predicts the driver's verdict instead of a looser one:

  * row count and column-name sets must match
  * per column, the dtype CLASS must match: int-kind vs int-kind (any
    width — driver-verified OK, q20's int32/int64 pair was green),
    float vs float, bool vs bool, string vs string, date-like vs
    date-like. int-vs-float is a FAIL even with equal values.
  * ``decimal.Decimal`` objects on either side are an automatic FAIL:
    DuckDB .df() returns widened decimals as float64 while Spark
    returns Decimal objects — the exact round-1 trap. Queries must not
    emit decimals; aggregate in integer units (cents) instead.
  * floats compare BIT-EXACT (NaN==NaN); anything order-dependent or
    engine-rounded must be reformulated, not tolerance-waved.

Rows are compared order-insensitively (sorted by the canonical string
form of every column), mirroring the driver's order-insensitive hash.

Usage:
    python tools/oracle_check.py [sf_dir] [name_prefix...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import struct
import sys
import time

import duckdb
import numpy as np
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


def col_class(s: pd.Series) -> str:
    """Dtype class used for strict parity (see module docstring)."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "date"
    if k == "O":
        sample = s.dropna()
        if len(sample) == 0:
            return "empty"
        v = sample.iloc[0]
        if isinstance(v, decimal.Decimal):
            return "DECIMAL-HAZARD"
        if isinstance(v, (datetime.date, datetime.datetime)):
            return "date"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, str):
            return "str"
        return "other"
    return k


def canon_cell(v) -> str:
    """Canonical string for one value, bit-exact for floats."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>" if pd.isna(v) else "nan"
        return struct.pack(">d", v).hex()
    if isinstance(v, (np.floating,)):
        f = float(v)
        return struct.pack(">d", f).hex()
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (datetime.datetime, pd.Timestamp)):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def canon_col(s: pd.Series) -> list[str]:
    if s.dtype.kind == "M":
        # datetime64 columns from DuckDB: date columns come back as
        # midnight timestamps; normalize to the date when that holds so
        # they compare equal to Spark's datetime.date objects
        ss = pd.to_datetime(s)
        nn = ss.dropna()
        if len(nn) and (nn.dt.normalize() == nn).all():
            return [
                "<NULL>" if pd.isna(v) else v.date().isoformat() for v in ss
            ]
        return ["<NULL>" if pd.isna(v) else v.isoformat() for v in ss]
    out = []
    for v in s:
        if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NA:
            out.append("<NULL>")
        else:
            out.append(canon_cell(v))
    return out


def compare(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(a) != len(b):
        return [f"row count {len(a)} vs {len(b)}"]
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns {sorted(a.columns)} vs {sorted(b.columns)}"]
    cols = sorted(a.columns)
    # dtype-class parity first (the driver-hash trap)
    for c in cols:
        ca, cb = col_class(a[c]), col_class(b[c])
        if "DECIMAL-HAZARD" in (ca, cb):
            errs.append(f"col {c}: Decimal output ({ca} vs {cb}) — reformulate in integer units")
            continue
        if ca != cb and "empty" not in (ca, cb):
            errs.append(f"col {c}: dtype class {ca} vs {cb} — driver hash will differ")
    if errs:
        return errs
    ta = sorted(zip(*[canon_col(a[c]) for c in cols]))
    tb = sorted(zip(*[canon_col(b[c]) for c in cols]))
    if ta != tb:
        for i, (ra, rb) in enumerate(zip(ta, tb)):
            if ra != rb:
                return [f"value mismatch at sorted row {i}: {ra} vs {rb}"]
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = [a for a in sys.argv[2:] if not a.startswith("-")]
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
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows): " + "; ".join(errs[:4]))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
